package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming-facing operators (SURVEY.md §2.10).
  *
  * The reference is a hand-rolled poll loop (follower.py:55-75) with no
  * event-time windows; the engine exposes the same transforms as
  * *unbounded* computations: every function here takes a DataFrame that
  * may be batch (parquet) or streaming (readStream) — the logical plan
  * is identical, which is exactly Spark's unified-API contract. Batch
  * runs give the DuckDB-oracle correctness anchor; streaming runs are
  * spec-tested through MemoryStream.
  */
object StreamingOps {

  /** Event-time column from the raw ns-long `ts` (events.parquet is
    * INT64 TIMESTAMP(NANOS), read as long — see Sessions.tuned).
    * Truncates ns→µs, the finest cross-engine-deterministic unit.
    */
  def eventTime(ts: Column): Column =
    timestamp_micros((ts.cast("long") / lit(1000L)).cast("long"))

  /** Tumbling-window stats. `exactDistinct = true` adds an exact
    * per-window user count (batch / complete-mode only — exact
    * distinct is not incrementally maintainable; streaming append mode
    * uses approx_count_distinct instead).
    */
  def tumblingWindowStats(events: DataFrame, duration: String,
                          exactDistinct: Boolean): DataFrame = {
    val withTime = events.withColumn("event_time",
      timestamp_micros(expr("ts div 1000")))
    val userCount =
      if (exactDistinct) countDistinct(col("user_id")).as("n_users")
      else approx_count_distinct(col("user_id")).as("n_users")
    withTime
      .groupBy(window(col("event_time"), duration))
      .agg(count(lit(1)).as("n_events"), userCount)
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("n_events"), col("n_users"))
  }

  /** Watermarked streaming variant: late data beyond `lateness` is
    * dropped and window state is reclaimed — the unbounded-state guard
    * any 100 TB/day stream needs.
    */
  def tumblingWindowStream(events: DataFrame, duration: String,
                           lateness: String): DataFrame =
    events.withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", lateness)
      .groupBy(window(col("event_time"), duration))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("n_events"))

  /** Streaming insert-ignore (T5): stateful first-occurrence-wins dedup
    * by content key — the reference's `onDuplicate="ignore"` bulk sink
    * (follower.py:205-207) re-expressed as flatMapGroupsWithState.
    * State per key is a single boolean; with a watermark upstream the
    * state store stays bounded. Input must carry a `_key` string
    * column; rows after the first per key are dropped.
    */
  def streamingDedupFirst[A](keyed: org.apache.spark.sql.Dataset[(String, A)])(
      implicit enc: org.apache.spark.sql.Encoder[A],
      outEnc: org.apache.spark.sql.Encoder[(String, A)])
      : org.apache.spark.sql.Dataset[(String, A)] =
    keyed
      .groupByKey(_._1)(org.apache.spark.sql.Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[(String, A)],
         state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            rows.take(1)
          })(org.apache.spark.sql.Encoders.scalaBoolean, outEnc)
}
