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
    // Plan-hygiene sweep: dump simple-mode plans for every registered
    // query and flag common scale red flags.
    val sf = "/root/testdata/sf0.01"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val flags = Seq(
          "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"),
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "no-pushed-filter" -> (plan.contains("PushedFilters: []") &&
            plan.contains("Filter (")),
          "sort-agg" -> plan.contains("SortAggregate")
        ).collect { case (f, true) => f }
        println(s"PLAN $name: ${if (flags.isEmpty) "clean" else flags.mkString(",")}")
      } catch { case e: Throwable =>
        println(s"PLAN $name: ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
