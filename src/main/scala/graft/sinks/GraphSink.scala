package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sink boundary (SURVEY.md §2.1 S5-S7, §2.8 F8): the engine-internal
  * typed rows become schemaless JSON documents only HERE — matching
  * the reference's importBulk JSON bodies (follower.py:205-207) —
  * while everything upstream stays columnar.
  *
  * `to_json` drops null fields by default, which reproduces the
  * reference's conditionally-ABSENT document fields (tx_power /
  * processing_time_s omitted when the receipt is missing,
  * follower.py:194-198) from plain nullable columns — the N4
  * semantics bridge called out in SURVEY §7.4(3).
  *
  * A real ArangoDB connector would replace the parquet/json writers
  * behind the same three verbs; idempotency never depends on the
  * store: content-hash keys + in-batch dedup (+ overwrite-by-partition
  * in the Follower) give insert-ignore semantics on any sink.
  */
object GraphSink {

  /** Typed rows → one JSON document string per row (F8). */
  def toDocuments(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("doc"))

  /** S5: bulk insert-ignore — dedup on the content key inside the
    * batch, then append. The reference's onDuplicate="ignore" across
    * batches is the Follower's overwrite-by-batch-partition.
    */
  def insertIgnore(df: DataFrame, path: String): Unit =
    df.dropDuplicates("_key").write.mode(SaveMode.Append).parquet(path)

  /** S6: full dimension snapshot replace. */
  def replaceSnapshot(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)
}
