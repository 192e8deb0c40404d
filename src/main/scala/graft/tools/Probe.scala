package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Sessions, Tables}
import graft.operators.Dedup

/** Ad-hoc plan/timing probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.tuned(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    docs.count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val orders = Tables.load(spark, "/root/testdata/sf0.1", "orders")
    val lineitem = Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
    orders.count(); lineitem.count()
    def noop(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    val g08 = graft.operators.GraphEtl.latestEdgePerPair(
      graft.operators.GraphEtl.paymentEdges(orders, lineitem))
    time("g08_warm")(noop(g08))
    time("g08_maxby")(noop(g08))
    val edges = graft.operators.GraphEtl.paymentEdges(orders, lineitem)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("_from"), col("_to"))
      .orderBy(col("timestamp").desc, col("block").desc, col("seq").desc,
        col("amount").desc)
    val winVer = edges.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("_from"), col("_to"), col("block"), col("seq"),
        col("amount").cast("double").as("amount"), col("timestamp"))
    time("g08_window")(noop(winVer))
    time("g08_window2")(noop(winVer))
    spark.stop()
  }
}
