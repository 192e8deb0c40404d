package graft

import org.apache.spark.sql.functions._
import graft.functions.{Canon, DotProductDbl}

class NativeExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("RewriteDotProduct: Canon.dot plans execute the native kernel") {
    // must be a non-local relation — local literal input gets folded
    // into a LocalRelation before the optimized plan is inspectable
    val df = table("embeddings")
      .select(Canon.asDouble(col("embedding")).as("v"))
      .select(Canon.dot(col("v"), col("v")).as("d"))
    val optimized = df.queryExecution.optimizedPlan
    val hasNative = optimized.expressions.exists(_.exists {
      case _: DotProductDbl => true
      case _ => false
    })
    assert(hasNative, s"rule did not fire:\n$optimized")
  }

  test("native dot matches the HOF fold bit-for-bit on real embeddings") {
    // same session runs both: the HOF form (rule disabled via excluded
    // rules conf is global, so instead compare against a driver-side
    // fold over collected arrays — the definitional left fold)
    val rows = table("embeddings")
      .select(Canon.asDouble(col("embedding")).as("v"))
      .select(Canon.dot(col("v"), col("v")).as("d"), col("v"))
      .as[(Double, Seq[Double])].collect()
    rows.foreach { case (d, v) =>
      val expect = v.foldLeft(0.0)((acc, x) => acc + x * x)
      assert(d === expect) // exact, not approximate
    }
  }

  test("native dot null semantics mirror zip_with padding") {
    val df = Seq(
      (Seq(1.0, 2.0), Seq(3.0)),      // unequal length → null
      (Seq(1.0, 2.0), Seq(3.0, 4.0))  // equal → 11.0
    ).toDF("a", "b").select(Canon.dot(col("a"), col("b")).as("d"))
    val got = df.select(col("d")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq === Seq(None, Some(11.0)))
  }

  test("sortedIntersectCount: two-pointer merge over sorted arrays") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 7L), Seq(3L, 4L, 5L, 9L)), // {3,5}
      (Seq.empty[Long], Seq(1L, 2L)),              // 0
      (Seq(2L, 4L), Seq(2L, 4L))                   // 2
    ).toDF("a", "b")
      .select(Canon.sortedIntersectCount(col("a"), col("b")).as("c"))
    assert(df.as[Int].collect().toSeq === Seq(2, 0, 2))
  }

  test("sortedIntersectCount: int-array form (the r21 narrowed hashP " +
    "sets) matches the long form") {
    // the d26/p27 token sets are array<int> since r21 (every hashP
    // value < 2^31-1); the kernel must count identically on both types
    val df = Seq(
      (Seq(1, 3, 5, 7), Seq(3, 4, 5, 9)),            // {3,5}
      (Seq.empty[Int], Seq(1, 2)),                   // 0
      (Seq(2, 4), Seq(2, 4)),                        // 2
      (Seq(0, 2147483646), Seq(0, 2147483646))       // hashP extremes
    ).toDF("a", "b")
    val ints = df
      .select(Canon.sortedIntersectCount(col("a"), col("b")).as("c"))
    assert(ints.as[Int].collect().toSeq === Seq(2, 0, 2, 2))
    val longs = df
      .select(Canon.sortedIntersectCount(
        col("a").cast("array<bigint>"), col("b").cast("array<bigint>"))
        .as("c"))
    assert(longs.as[Int].collect().toSeq === Seq(2, 0, 2, 2))
  }

  test("native pqEncode matches the declarative HOF argmin on real vectors") {
    val m = 8
    val sub = 64 / m
    val e = table("embeddings").limit(200)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // hash-seeded 16-entry codebook, flat layout, exactly as pqCodebook
    val cbArr = e
      .withColumn("_h", Canon.hash60(concat(lit("pqseed|"), col("vec_id"))))
      .orderBy(col("_h").asc, col("vec_id").asc).limit(16)
      .agg(sort_array(collect_list(struct(col("_h"), col("vec_id"),
        col("v").as("cv")))).as("raw"))
      .select(transform(col("raw"), (c, i) => c.getField("cv")).as("cbs"))
      .withColumn("cbflat", flatten(col("cbs")))
    val joined = e.join(broadcast(cbArr))
    val native = joined
      .select(col("vec_id"), Canon.pqEncode(col("v"), col("cbflat"), m)
        .as("codes"))
    // declarative reference: per-subspace squared-L2 argmin via HOFs
    def ssd(a: org.apache.spark.sql.Column,
            b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0d), (acc, x) => acc + x)
    val hof = joined.select(col("vec_id"),
      transform(sequence(lit(0), lit(m - 1)), s => {
        val dists = transform(col("cbs"), c =>
          ssd(slice(col("v"), s * sub + 1, lit(sub)),
            slice(c, s * sub + 1, lit(sub))))
        (array_position(dists, array_min(dists)) - 1).cast("int")
      }).as("codes"))
    val a = native.as[(Long, Seq[Int])].collect().sortBy(_._1)
    val b = hof.as[(Long, Seq[Int])].collect().sortBy(_._1)
    assert(a.length === 200)
    assert(a.toSeq === b.toSeq)
  }

  test("jaccard via native intersect equals the array_intersect formula") {
    val docs = table("documents").limit(50)
    val native = graft.operators.Dedup.ngramJaccardPairs(docs, 0.0)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val d = docs.select(col("doc_id"), col("source"),
      array_distinct(transform(Canon.words(col("text")),
        w => Canon.hashP(w))).as("dw"))
    val reference = d.as("a")
      .join(d.as("b"), col("a.source") === col("b.source") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        (size(array_intersect(col("a.dw"), col("b.dw"))) /
          size(array_union(col("a.dw"), col("b.dw")))).as("j"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(native.keySet === reference.keySet)
    native.foreach { case (k, v) => assert(v === reference(k), s"pair $k") }
  }

  test("keptUncoveredPositions equals the per-position exists formula") {
    val k = 5
    val cases = Seq(
      (1L, 10, Seq(1)),               // head interval
      (2L, 10, Seq(6)),               // tail interval, exactly to n
      (3L, 10, Seq(8)),               // interval clipped past n
      (4L, 10, Seq(2, 4, 6)),         // overlapping chain
      (5L, 10, Seq(1, 6)),            // adjacent, full coverage
      (6L, 10, Seq.empty[Int]),       // no starts
      (7L, 3, Seq(1)),                // doc shorter than k
      (8L, 0, Seq.empty[Int]),        // empty doc
      (9L, 40, Seq(1, 2, 3, 17, 30, 31, 36)))
    val df = cases.toDF("id", "n", "starts")
      .select(col("id"), col("n").cast("int").as("n"),
        col("starts").cast("array<int>").as("starts"))
    val positions = when(col("n") >= 1, sequence(lit(1), col("n")))
      .otherwise(array().cast("array<int>"))
    val reference = filter(positions, p =>
      !exists(col("starts"), s => s <= p && p < s + lit(k)))
    val out = df.select(col("id"),
      Canon.keptUncoveredPositions(col("starts"), col("n"), k).as("a"),
      reference.as("b"))
      .as[(Long, Seq[Int], Seq[Int])].collect()
    out.foreach { case (id, a, b) => assert(a === b, s"case $id") }
  }

  /** Driver-side definitional CDC reference (the staged algebra the
    * kernel replaced, in plain Scala): hashP per word, ·31 polynomial
    * per k-window, boundary after window end e iff hash ≡ 0 mod
    * divisor and e < n, final boundary at n.
    */
  private def refCdc(text: String, k: Int, divisor: Long): Seq[String] = {
    val P = 2147483647L
    val w = text.split(" ", -1)
    val hw = w.map(x => java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils
        .md5Hex(x.getBytes("UTF-8")).substring(0, 15), 16) % P)
    val n = w.length
    val ends = (0 to n - k).flatMap { s =>
      val poly = (1 until k).foldLeft(hw(s))(
        (acc, j) => acc * 31L + hw(s + j)) % P
      if (poly % divisor == 0L && s + k < n) Some(s + k) else None
    } :+ n
    ends.foldLeft((0, Vector.empty[String])) { case ((prev, acc), e) =>
      (e, acc :+ w.slice(prev, e).mkString(" "))
    }._2
  }

  test("cdcChunks kernel equals the definitional reference on real " +
    "documents, under forced codegen and forced interpretation") {
    val docs = table("documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    assert(docs.length > 10)
    for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try {
        val got = table("documents")
          .select(col("doc_id"),
            Canon.cdcChunks(Canon.words(col("text")), 4, 16).as("c"))
          .as[(Long, Seq[String])].collect().toMap
        docs.foreach { case (id, text) =>
          val expect = refCdc(text, 4, 16)
          assert(got(id) === expect, s"doc $id mode $mode")
          // chunks reassemble the document exactly
          assert(got(id).mkString(" ") === text, s"reassembly $id")
        }
      } finally spark.conf.set(
        "spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
