package graft

import org.apache.spark.sql.functions._

import graft.functions.Canon
import graft.operators.{Dedup, Similarity}

/** The injectFunction SQL surface: every named kernel reachable from
  * spark.sql(...) text must agree exactly with its Column-API form
  * (same Catalyst expression, so this pins the registration wiring,
  * not the kernel math — the kernels have their own specs).
  */
class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot SQL text equals Canon.dot over the embeddings table") {
    val e = table("embeddings")
      .select(col("vec_id"), Canon.asDouble(col("embedding")).as("v"))
    val api = e.select(col("vec_id"), Canon.dot(col("v"), col("v")))
      .as[(Long, Double)].collect().toMap
    e.createOrReplaceTempView("gf_e")
    val sql = spark.sql(
      "SELECT vec_id, graft_dot(v, v) FROM gf_e")
      .as[(Long, Double)].collect().toMap
    assert(sql === api) // exact: identical expression, identical fold
  }

  test("graft_simhash SQL text equals Dedup.simhash") {
    val api = Dedup.simhash(table("documents"))
      .as[(Long, Long)].collect().toMap
    table("documents").createOrReplaceTempView("gf_d")
    val sql = spark.sql(
      """SELECT doc_id, graft_simhash(transform(split(text, ' '),
        |  x -> CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)))
        |FROM gf_d""".stripMargin)
      .as[(Long, Long)].collect().toMap
    assert(sql === api)
  }

  test("graft_sorted_intersect / graft_max_run / graft_kept_uncovered " +
    "match their Column forms") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(3L, 4L, 5L), Seq(1L, 1L, 2L, 2L, 2L),
        Seq(2, 7), 10),
      (Seq.empty[Long], Seq(1L), Seq(4L), Seq.empty[Int], 3)
    ).toDF("a", "b", "s", "starts", "n")
    df.createOrReplaceTempView("gf_k")
    val api = df.select(
      Canon.sortedIntersectCount(col("a"), col("b")),
      Canon.maxRunLength(col("s")),
      Canon.keptUncoveredPositions(col("starts"), col("n"), 3))
      .as[(Long, Long, Seq[Int])].collect().toSeq
    val sql = spark.sql(
      """SELECT graft_sorted_intersect(a, b), graft_max_run(s),
        |  graft_kept_uncovered(starts, n, 3) FROM gf_k""".stripMargin)
      .as[(Long, Long, Seq[Int])].collect().toSeq
    assert(sql === api)
  }

  test("graft_pq_encode SQL text equals Canon.pqEncode") {
    // 2 subspaces of 2 dims, 2-code flat codebook
    val df = Seq((Seq(0.1d, 0.9d, 0.5d, 0.4d),
      Seq(0.0d, 1.0d, 1.0d, 0.0d, 1.0d, 1.0d, 0.0d, 0.0d)))
      .toDF("v", "cb")
    df.createOrReplaceTempView("gf_pq")
    val api = df.select(Canon.pqEncode(col("v"), col("cb"), 2))
      .as[Seq[Int]].head()
    val sql = spark.sql(
      "SELECT graft_pq_encode(v, cb, 2) FROM gf_pq")
      .as[Seq[Int]].head()
    assert(sql === api)
  }

  test("graft_cms_estimate SQL text equals Canon.cmsEstimate and " +
    "reads count_min_sketch's binary") {
    val df = spark.sql(
      "SELECT count_min_sketch(v, CAST(0.01 AS DOUBLE), " +
        "CAST(0.99 AS DOUBLE), 42) AS sk " +
        "FROM (SELECT CAST(id % 3 AS BIGINT) AS v FROM range(30))")
    df.createOrReplaceTempView("gf_cms")
    val api = df.select(Canon.cmsEstimate(col("sk"), lit(0L)))
      .as[Long].head()
    val sql = spark.sql(
      "SELECT graft_cms_estimate(sk, 0L) FROM gf_cms").as[Long].head()
    assert(sql === api)
    assert(api === 10L) // 10 exact occurrences, wide sketch: no collision
  }

  test("DESCRIBE FUNCTION shows the function name and usage intact") {
    val desc = spark.sql("DESCRIBE FUNCTION graft_dot")
      .as[String].collect().mkString("\n")
    assert(desc.contains("Function: graft_dot"))
    assert(desc.contains("left-fold dot product")) // usage, not name slot
  }

  test("constant kernel parameters must be integer literals") {
    val err = intercept[Exception] {
      spark.sql("SELECT graft_simhash(array(1L), CAST(id AS INT)) " +
        "FROM range(1)").collect()
    }
    assert(err.getMessage.contains("must be an INT literal"))
  }
}
