package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

import graft.operators.HeliumGraph
import graft.sinks.GraphSink
import graft.sources.HeliumBlockStreamProvider

/** The ENGINE-DRIVEN follower — the reference's poll loop
  * (follower.py:44-75) as one Structured Streaming query, composing
  * the three seams that are each unit-tested on their own into the
  * integration a real user runs first:
  *
  *   readStream(HeliumBlockStreamProvider)   — S1-S3, offsets = heights
  *     → HeliumGraph parity transforms       — P1-P4 / N1-N4
  *     → GraphSink insert-ignore commit      — S5 / F8 / T5
  *   with the engine's own WAL checkpointing — T1 / T2
  *
  * Division of labor vs [[HeliumFollower]] (the driver-loop parity
  * path): there the CALLER owns the cursor, retries, and checkpoint
  * ordering, mirroring the reference line by line; here Spark's
  * micro-batch engine owns offset tracking, trigger policy, and
  * recovery, which is the deployment shape a 1000-executor cluster
  * actually uses. HeliumBlockStreamSpec pins the two byte-identical
  * over the same fixture range, including across a mid-backfill kill
  * and WAL restart.
  *
  * Exactly-once effect (T5) without sink transactions: the WAL
  * serializes half-open immutable height ranges, and every epoch's
  * commit lands under `batch=<epochId>` via overwrite — a replayed
  * epoch (crash between sink write and WAL commit) REWRITES its own
  * partition with identical content-keyed rows instead of appending
  * duplicates. The account collection keeps the reference's
  * insert-ignore collapse deferred to read (the A3 distinct view),
  * exactly like the driver loop.
  */
object HeliumStreamFollower {

  /** One epoch's transform + commit — the follower.py:145-207 body
    * over an envelope micro-batch: the three collections, each
    * content-keyed, in-batch deduped, and committed by epoch
    * partition overwrite (idempotent under epoch replay).
    *
    * With an [[GraphSink.ImportTarget]], each committed partition is
    * read back and POSTed as importBulk bodies from the executors —
    * the driver loop's wire verb (HeliumFollower.write), same
    * read-back-what-the-store-holds discipline. A replayed epoch
    * re-POSTs its partition, which the store's onDuplicate=ignore
    * absorbs (every document carries its content-hash `_key`) — the
    * HTTP sink inherits T5 from the key discipline, not from any
    * sink-side transaction.
    */
  def commitBatch(env: DataFrame, sinkDir: String, batchId: Long,
                  importTarget: Option[GraphSink.ImportTarget] = None)
      : Unit = {
    val payments = HeliumGraph.paymentV1Edges(env)
      .unionByName(HeliumGraph.paymentV2Edges(env))
      .dropDuplicates("_key")
    val receipts = HeliumGraph.receiptEdges(env)
      .dropDuplicates("_key")
    val accounts = HeliumGraph.accountVertices(env)
    Seq(payments -> "payments", receipts -> "poc_receipts",
      accounts -> "accounts").foreach { case (df, c) =>
      df.write.mode(SaveMode.Overwrite)
        .parquet(s"$sinkDir/$c/batch=$batchId")
      importTarget.foreach { t =>
        GraphSink.importBulkPost(
          env.sparkSession.read.parquet(s"$sinkDir/$c/batch=$batchId"),
          t, c)
      }
    }
  }

  /** The configured query, trigger left to the caller (production
    * uses the default continuous polling; specs use Trigger.Once /
    * processAllAvailable). `startHeight` is the exclusive cursor seed
    * honored only on FIRST start — a restart recovers the committed
    * offset from the WAL at `checkpointDir` and ignores it.
    */
  def writer(spark: SparkSession, endpoint: String, sinkDir: String,
             checkpointDir: String, startHeight: Long,
             maxHeightsPerTrigger: Long = 0L, numPartitions: Int = 4,
             maxRetries: Int = 50, sleepMs: Long = 10000L,
             importTarget: Option[GraphSink.ImportTarget] = None)
      : DataStreamWriter[Row] =
    spark.readStream
      .format(classOf[HeliumBlockStreamProvider].getName)
      .option("endpoint", endpoint)
      .option("startHeight", startHeight.toString)
      .option("maxHeightsPerTrigger", maxHeightsPerTrigger.toString)
      .option("numPartitions", numPartitions.toString)
      .option("maxRetries", maxRetries.toString)
      .option("sleepMs", sleepMs.toString)
      .load()
      .writeStream
      .foreachBatch { (env: DataFrame, batchId: Long) =>
        commitBatch(env, sinkDir, batchId, importTarget)
      }
      .option("checkpointLocation", checkpointDir)

  /** Start with the default trigger (continuous micro-batch polling —
    * the reference loop's steady state).
    */
  def start(spark: SparkSession, endpoint: String, sinkDir: String,
            checkpointDir: String, startHeight: Long,
            maxHeightsPerTrigger: Long = 0L, numPartitions: Int = 4,
            maxRetries: Int = 50, sleepMs: Long = 10000L,
            importTarget: Option[GraphSink.ImportTarget] = None)
      : StreamingQuery =
    writer(spark, endpoint, sinkDir, checkpointDir, startHeight,
      maxHeightsPerTrigger, numPartitions, maxRetries, sleepMs,
      importTarget).start()
}
