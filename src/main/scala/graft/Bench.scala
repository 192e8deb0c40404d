package graft
import java.nio.file.{Files, Paths}
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
    // Millisecond precision keeps the line SHORT: the harness captures a
    // bounded stdout tail, and full-precision doubles for 60+ queries
    // pushed the JSON's head out of the window (BENCH_r02 parsed:null).
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // Belt and braces for the harness parse: also persist to a file
    // (BENCH_LOCAL.json or args(0)) in case the stdout tail is clipped.
    val outPath = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json"))
    try Files.writeString(Paths.get(outPath), json + "\n")
    catch { case _: Throwable => () }
    spark.stop()
    // Printed AFTER spark.stop() (and with build.sbt's showSuccess off)
    // so this is the final line on stdout.
    println(json)
  }
}
