package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.HeliumGraph

/** Property-based checks (SURVEY.md §5 item 3) over randomly generated
  * payment_v2 envelopes: key determinism, idempotency, explode
  * cardinality, endpoint coverage. Uses raw scalacheck generators with
  * fixed seeds (the scalatest bridge artifact isn't in the offline
  * cache); 5 sampled cases per property, each a real Spark job.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val addr = Gen.oneOf("a1", "b2", "c3", "d4", "e5")
  private val payment = for {
    amount <- Gen.chooseNum(1L, 1000000L)
    payee <- addr
  } yield (amount, payee)

  private val envelope = for {
    block <- Gen.chooseNum(1L, 500L)
    hash <- Gen.identifier.map(_.take(12))
    payer <- addr
    payments <- Gen.nonEmptyListOf(payment).map(_.take(5))
  } yield (block, block * 60, hash, "payment_v2",
    s"""{"hash":"$hash","fee":1,"nonce":1,"payer":"$payer","payments":[""" +
      payments.map { case (a, p) =>
        s"""{"amount":$a,"memo":null,"payee":"$p"}"""
      }.mkString(",") + "]}")

  private val envelopes = Gen.nonEmptyListOf(envelope).map(_.take(8))

  private def cases: Seq[List[(Long, Long, String, String, String)]] =
    (1 to 5).flatMap(i =>
      envelopes.apply(Gen.Parameters.default, Seed(42L + i)))

  test("explode cardinality: |edges| == Σ|payments|") {
    cases.foreach { rows =>
      val df = rows.toDF("block", "block_time", "hash", "type", "payload")
      val expected = rows.map(r =>
        "\"amount\"".r.findAllIn(r._5).length).sum
      assert(HeliumGraph.paymentV2Edges(df).count() === expected)
    }
  }

  test("key determinism + idempotency: transform(x ∪ x) dedups to transform(x)") {
    cases.foreach { rows =>
      val once = rows.toDF("block", "block_time", "hash", "type", "payload")
      val twice = (rows ++ rows)
        .toDF("block", "block_time", "hash", "type", "payload")
      val a = HeliumGraph.paymentV2Edges(once).dropDuplicates("_key")
        .orderBy("_key", "amount").collect().toSeq
      val b = HeliumGraph.paymentV2Edges(twice).dropDuplicates("_key")
        .orderBy("_key", "amount").collect().toSeq
      assert(a === b)
    }
  }

  // Random structurally-valid H3 cell: mode 1, random res/base/digits
  // (digit 0-6 within the resolution, 7 beyond it), avoiding the
  // pentagon leading-K case by construction.
  private val h3cellGen: Gen[Long] = for {
    res <- Gen.chooseNum(0, 15)
    base <- Gen.chooseNum(0L, 121L)
    digits <- Gen.listOfN(res, Gen.chooseNum(0L, 6L))
  } yield {
    val isPenta = graft.functions.H3Cell.PentagonBaseCells.contains(base)
    val fixed = // pentagon: bump a leading K (1) digit to J (2)
      if (!isPenta) digits
      else digits.zipWithIndex.map { case (d, i) =>
        if (d == 1L && digits.take(i).forall(_ == 0L)) 2L else d
      }
    var v = (1L << 59) | (res.toLong << 52) | (base << 45)
    fixed.zipWithIndex.foreach { case (d, i) =>
      v |= d << ((15 - (i + 1)) * 3)
    }
    ((res + 1) to 15).foreach(r => v |= 7L << ((15 - r) * 3))
    v
  }

  test("H3 parent truncation: valid, res-set, base-preserving, composable") {
    import graft.functions.H3Cell
    val cells = (1 to 60).flatMap(i =>
      h3cellGen.apply(Gen.Parameters.default, Seed(7L + i))).distinct
    val df = cells.toDF("c")
    val bad = df.filter(!H3Cell.isValid(col("c"))).count()
    assert(bad === 0L, "generated cells must be structurally valid")
    // for every r1 <= r2 <= res: parent(parent(c,r2),r1) == parent(c,r1),
    // parent is valid, has resolution r1 and the same base cell
    (0 to 15 by 5).foreach { r1 =>
      val r2 = math.min(r1 + 5, 15)
      val checked = df.filter(H3Cell.resolution(col("c")) >= r2)
        .select(col("c"),
          H3Cell.parent(H3Cell.parent(col("c"), r2), r1).as("two_step"),
          H3Cell.parent(col("c"), r1).as("one_step"))
      assert(checked.filter(col("two_step") =!= col("one_step")).count()
        === 0L)
      val p = checked.select(col("one_step").as("c"))
      assert(p.filter(!H3Cell.isValid(col("c"))).count() === 0L)
      assert(p.filter(H3Cell.resolution(col("c")) =!= r1).count() === 0L)
    }
    // parent at the cell's own resolution is the identity
    val own = df.select(col("c"),
      H3Cell.resolution(col("c")).as("r")).collect()
    own.take(8).foreach { row =>
      val c = row.getLong(0); val r = row.getLong(1).toInt
      val p = Seq(c).toDF("c")
        .select(H3Cell.parent(col("c"), r)).head().getLong(0)
      assert(p === c)
    }
  }

  test("endpoint coverage: every edge endpoint is in the account vertex set") {
    cases.foreach { rows =>
      val df = rows.toDF("block", "block_time", "hash", "type", "payload")
      val edges = HeliumGraph.paymentV2Edges(df)
      val keys = HeliumGraph.accountVertices(df)
        .select(concat(lit("accounts/"), col("_key")))
        .as[String].collect().toSet
      val endpoints = edges.select(col("_from")).as[String].collect() ++
        edges.select(col("_to")).as[String].collect()
      assert(endpoints.forall(keys.contains))
    }
  }

  private val docGen = for {
    n <- Gen.chooseNum(1, 40)
    ws <- Gen.listOfN(n, Gen.oneOf("a", "bb", "ccc", "dddd"))
  } yield ws.mkString(" ")

  private def docCases: Seq[List[String]] =
    (1 to 5).flatMap(i =>
      Gen.nonEmptyListOf(docGen).map(_.take(12))
        .apply(Gen.Parameters.default, Seed(1042L + i)))

  test("lengthGate: keep set is antitone in q and never empty") {
    docCases.foreach { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val lo = graft.operators.Pipeline.lengthGate(docs, 0.25)
        .select("doc_id").as[Long].collect().toSet
      val hi = graft.operators.Pipeline.lengthGate(docs, 0.75)
        .select("doc_id").as[Long].collect().toSet
      assert(hi.subsetOf(lo))
      assert(hi.nonEmpty) // the max-length doc always survives
    }
  }

  private val dimGen = for {
    w <- Gen.chooseNum(1L, 4000L)
    h <- Gen.chooseNum(1L, 4000L)
  } yield (w, h)

  test("aspectBuckets: scale-invariant and orientation-symmetric") {
    val dims = (1 to 5).flatMap(i =>
      Gen.listOfN(12, dimGen)
        .apply(Gen.Parameters.default, Seed(2042L + i))).flatten
    val base = dims.zipWithIndex
      .map { case ((w, h), i) => (i.toLong, w, h) }
      .toDF("doc_id", "width", "height")
    val scaled = dims.zipWithIndex
      .map { case ((w, h), i) => (i.toLong, 2 * w, 2 * h) }
      .toDF("doc_id", "width", "height")
    val flipped = dims.zipWithIndex
      .map { case ((w, h), i) => (i.toLong, h, w) }
      .toDF("doc_id", "width", "height")
    def buckets(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      graft.operators.Multimodal.aspectBuckets(df)
        .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    val b = buckets(base)
    assert(buckets(scaled) === b)  // exact integer argmin scales
    assert(buckets(flipped) === b) // long:short normalization
  }

  test("clusterSizeHistogram conserves docs and removable counts") {
    val labels = (1 to 5).flatMap(i =>
      Gen.listOfN(30, Gen.chooseNum(0L, 6L))
        .apply(Gen.Parameters.default, Seed(3042L + i)))
    labels.grouped(30).foreach { ls =>
      val clusters = ls.zipWithIndex
        .map { case (rep, i) => (i.toLong, rep) }
        .toDF("doc_id", "cluster_rep")
      val hist = graft.operators.Dedup.clusterSizeHistogram(clusters)
        .as[(Long, Long, Long, Long)].collect()
      assert(hist.map(_._3).sum === ls.size)          // Σ n_docs = docs
      assert(hist.map(_._4).sum ===                   // Σ removable =
        ls.size - ls.distinct.size)                   //  docs − clusters
    }
  }

  test("degreeAssortativity is a Pearson coefficient: |r| ≤ 1") {
    val edgeGen = for {
      a <- Gen.chooseNum(0L, 8L)
      b <- Gen.chooseNum(0L, 8L) if a != b
    } yield (math.min(a, b), math.max(a, b))
    (1 to 5).foreach { i =>
      val es = Gen.listOfN(14, edgeGen)
        .apply(Gen.Parameters.default, Seed(4042L + i)).get.distinct
      val r = graft.operators.GraphEtl.degreeAssortativity(
        es.toDF("a", "b")).as[(Long, Option[Double])].head()._2
      r.foreach(v => assert(math.abs(v) <= 1.0 + 1e-12))
    }
  }
}
