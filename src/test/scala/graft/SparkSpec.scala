package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session — Spark
  * getOrCreate makes this safe across suites).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(4)
  lazy val sf0001 = "/root/testdata/sf0.001"

  def table(name: String) = Tables.load(spark, sf0001, name)
}
