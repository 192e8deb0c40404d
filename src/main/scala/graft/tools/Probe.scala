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
    def noop(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    val sf01 = "/root/testdata/sf0.1"
    val d05 = graft.SparkEntry.queries("d05_ngram_jaccard")
    time("d05_a")(noop(d05(spark, sf01)))
    time("d05_b")(noop(d05(spark, sf01)))
    time("d05_c")(noop(d05(spark, sf01)))
    spark.stop()
  }
}
