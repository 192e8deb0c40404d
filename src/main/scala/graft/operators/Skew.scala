package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (build brief: "salting for skew").
  *
  * AQE's skew-join splitting handles most runtime skew; salting is
  * the *planned* form for the pathologies AQE can't fix — a single
  * hot GROUP BY key whose partial aggregation still funnels into one
  * reducer, or a join key so hot one task owns it. Two-stage salted
  * aggregation spreads the hot key over `buckets` reducers in stage 1
  * and merges the per-salt partials in stage 2; algebraic aggregates
  * (sum/count/min/max) merge losslessly, so the result is identical
  * to the direct groupBy.
  */
object Skew {

  /** Two-stage salted sum+count per key. For exactly-mergeable value
    * types (integral, decimal) the result is identical to
    * `df.groupBy(keys).agg(sum, count)`; for float/double the two-stage
    * sum changes IEEE accumulation order, so results can differ in the
    * last ulp — cast the value column to decimal first when downstream
    * does exact (hash) comparison. Worth the second (tiny) shuffle only
    * when a key is hot enough to dominate a reducer.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     buckets: Int = 32): DataFrame = {
    val keyCols = keys.map(col)
    val salted = df
      .withColumn("_salt", pmod(spark_partition_id() +
        monotonically_increasing_id(), lit(buckets)))
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
    salted
      .groupBy(keyCols: _*)
      .agg(sum(col("_psum")).as(s"sum_$valueCol"),
        sum(col("_pcnt")).as("n_rows"))
  }

  /** Salted join of a skewed fact against a small dimension: the
    * dimension is exploded `buckets`× (one copy per salt) so each hot
    * fact key spreads over `buckets` tasks. Use when the dim is
    * broadcastable anyway but the JOIN OUTPUT of the hot key
    * overwhelms single tasks; for genuinely large dims, bucketing or
    * AQE skew-join is the tool instead.
    */
  def saltedDimJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                    dimKey: String, buckets: Int = 8): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets)))
    val explodedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1)).cast("array<bigint>")))
    saltedFact.join(explodedDim,
      saltedFact(factKey) === explodedDim(dimKey) &&
        saltedFact("_salt") === explodedDim("_salt"))
      .drop("_salt")
  }
}
