package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {

  test("salted sum/count equals direct groupBy on skewed data") {
    // 90% of rows share one hot key
    val df = spark.range(10000)
      .select(when(col("id") % 10 === 0, col("id") % 7)
        .otherwise(lit(999L)).as("k"),
        (col("id") % 100).cast("double").as("v"))
    val direct = df.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n_rows"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    val salted = Skew.saltedSumCount(df, Seq("k"), "v")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    assert(salted.keySet === direct.keySet)
    salted.foreach { case (k, (s, n)) =>
      assert(n === direct(k)._2)
      assert(math.abs(s - direct(k)._1) < 1e-6, s"key $k")
    }
  }

  test("salted dim join preserves the join result set") {
    val fact = table("orders").select("o_orderkey", "o_custkey")
    val dim = table("customer").select("c_custkey", "c_name")
    val direct = fact.join(dim, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_name").collect().map(_.toSeq).toSet
    val salted = Skew.saltedDimJoin(fact, dim, "o_custkey", "c_custkey")
      .select("o_orderkey", "c_name").collect().map(_.toSeq).toSet
    assert(salted === direct)
  }
}
