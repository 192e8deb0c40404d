package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access layer for the driver-provided parquet star schema
  * (see /root/repo/TESTDATA.md). Centralizing reads keeps every query's
  * scan declarative so Catalyst can push filters/prune columns into the
  * parquet reader — at 100 TB the scan is the dominant cost and pushdown
  * is the first-order optimization.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** S9 (follower.py:77-95 DDL analog): register every table in the
    * session catalog so the surface is queryable via spark.sql. Edge
    * vs vertex collections are a column convention (_from/_to), not a
    * physical difference — no special DDL needed.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  /** Dimension tables small enough to broadcast at any scale factor.
    * region/nation are bounded (5/25 rows) regardless of SF; at 100 TB
    * they remain broadcast-joinable by construction.
    */
  val broadcastable: Set[String] = Set("region", "nation")
}
