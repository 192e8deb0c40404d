package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen/scheduler and the parquet footers once so
    // whichever query the Map iterates first doesn't absorb session
    // startup (~5s) into its measurement.
    Tables.names.foreach(n =>
      try Tables.load(spark, sfDir, n).count()
      catch { case _: Throwable => () })
    // noop sink: forces FULL evaluation of every output column.
    // count() would let Catalyst prune the projections away and time
    // an empty scan for map-only queries.
    val results = SparkEntry.queries.map { case (name, fn) =>
      System.gc() // isolate queries from each other's garbage
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
