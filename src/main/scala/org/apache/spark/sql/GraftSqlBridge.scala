package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the private[sql] Column↔Expression converters —
  * the standard extension-library pattern for attaching custom
  * Catalyst expressions (graft.functions.*) to the public Column API.
  * Nothing else from the private surface is exposed.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  /** Wrap a hand-assembled logical plan as a DataFrame — needed once,
    * by graft.plans.LazyBuildParquet, to attach a relation whose file
    * listing is deferred behind the first action (VERDICT r17 #2).
    */
  def ofRows(spark: SparkSession,
             plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  /** RECURSIVE nullability relaxation (nested struct fields, array
    * containsNull, map valueContainsNull too) — what a plain
    * `spark.read.parquet` schema inference reports at every depth, so
    * a deferred-build relation's declared schema matches it exactly
    * (ADVICE r18; the top-level-only copy left nested types tighter).
    */
  def asNullable(s: types.StructType): types.StructType = s.asNullable
}
