package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The co-located-join scale story (SURVEY.md §4.2 / build brief
  * "Partitioning & shuffle"): bucketing both fact tables on the join
  * key removes the per-query shuffle entirely — at 100 TB the
  * orders⨝lineitem exchange IS the cost, and bucketed layout pays it
  * once at write time instead of every query.
  */
class BucketingSpec extends SparkSpec {

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
    // Count exchanges in the final ADAPTIVE plan (AQE may rewrite)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    "Exchange".r.findAllIn(plan).count(_ => true)
  }

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val wh = Files.createTempDirectory("warehouse").toString
    val s: SparkSession = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s.conf.set("spark.sql.sources.bucketing.enabled", "true")

    Tables.load(s, sf0001, "orders")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b") // external: no warehouse write
      .mode("overwrite").saveAsTable("orders_b")
    Tables.load(s, sf0001, "lineitem")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b")
      .mode("overwrite").saveAsTable("lineitem_b")

    val bucketed = s.table("orders_b")
      .join(s.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    val unbucketed = Tables.load(s, sf0001, "orders")
      .join(Tables.load(s, sf0001, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))

    // same answer…
    assert(bucketed.collect().map(_.toSeq).toSet ===
      unbucketed.collect().map(_.toSeq).toSet)
    // …but the bucketed join itself needs no join-side exchange:
    // only the final single-partition-agg exchange remains, while the
    // unbucketed plan shuffles BOTH fact tables on the join key.
    assert(shuffleCount(bucketed) < shuffleCount(unbucketed),
      "bucketing should eliminate join-side exchanges")

    s.sql("DROP TABLE IF EXISTS orders_b")
    s.sql("DROP TABLE IF EXISTS lineitem_b")
  }

  test("hive-partitioned layout prunes non-matching partitions at scan") {
    val dir = Files.createTempDirectory("parted").toString + "/events"
    Tables.load(spark, sf0001, "events")
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .filter(col("event_type") === "click")
      .select(col("event_id"))
    val plan = q.queryExecution.executedPlan.toString
    // the predicate lands in PartitionFilters (directory-level skip,
    // no data read from other event types), not a post-scan Filter
    assert(plan.contains("PartitionFilters"))
    assert(plan.split("\n").exists(l =>
      l.contains("PartitionFilters") && l.contains("event_type")))
    // and only the matching partition's rows flow
    val expected = Tables.load(spark, sf0001, "events")
      .filter(col("event_type") === "click").count()
    assert(q.count() === expected)
  }
}
