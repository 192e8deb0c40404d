package graft

import java.nio.file.Files

import graft.sources.{HeliumBlockStreamProvider, JsonRpcClient, RpcTxnSource}

/** The DataSource V2 micro-batch face of the S1-S3 seam, driven by
  * Spark's own streaming engine against the stub node: offsets are
  * block heights in the engine WAL, fetches run executor-side, and the
  * rows must be EXACTLY what the batch-path source produces for the
  * same cursor range.
  */
class HeliumBlockStreamSpec extends SparkSpec {

  private def envelopeRows(df: org.apache.spark.sql.DataFrame) =
    df.select("block", "block_time", "hash", "type", "payload")
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq

  test("streams the block range in capped micro-batches, " +
    "row-parity with the batch source") {
    StubNode.withServer() { endpoint =>
      val ckpt = Files.createTempDirectory("hbs-ckpt").toString
      val q = spark.readStream
        .format(classOf[HeliumBlockStreamProvider].getName)
        .option("endpoint", endpoint)
        .option("startHeight", "99") // exclusive cursor seed
        .option("maxHeightsPerTrigger", "1")
        .option("numPartitions", "2")
        .option("maxRetries", "2").option("sleepMs", "0")
        .load()
        .writeStream.format("memory").queryName("helium_blocks_stream")
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        // parity: identical rows to the batch-path source over the
        // same (99, 102] range
        val batch = new RpcTxnSource(new JsonRpcClient(endpoint),
          maxRetries = 2, sleepMs = 0, sleep = _ => ())
          .fetchRange(spark, 99L, 102L).get
        val streamed = spark.sql("SELECT * FROM helium_blocks_stream")
        assert(envelopeRows(streamed) === envelopeRows(batch))
        assert(envelopeRows(streamed).nonEmpty)
        // the 1-height cap forced one micro-batch per block: 3 batches
        // moved data for heights 100..102
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        assert(dataBatches === 3,
          s"expected 3 capped batches, saw $dataBatches")
        // tip reached: another poll plans no work
        q.processAllAvailable()
        assert(spark.sql("SELECT * FROM helium_blocks_stream").count()
          === batch.count())
      } finally q.stop()
    }
  }

  test("uncapped: the whole backlog arrives in one micro-batch") {
    StubNode.withServer() { endpoint =>
      val ckpt = Files.createTempDirectory("hbs-ckpt2").toString
      val q = spark.readStream
        .format(classOf[HeliumBlockStreamProvider].getName)
        .option("endpoint", endpoint)
        .option("startHeight", "99")
        .option("maxRetries", "2").option("sleepMs", "0")
        .load()
        .writeStream.format("memory").queryName("helium_blocks_whole")
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        assert(q.recentProgress.count(_.numInputRows > 0) === 1)
        val batch = new RpcTxnSource(new JsonRpcClient(endpoint),
          maxRetries = 2, sleepMs = 0, sleep = _ => ())
          .fetchRange(spark, 99L, 102L).get
        assert(envelopeRows(
          spark.sql("SELECT * FROM helium_blocks_whole"))
          === envelopeRows(batch))
      } finally q.stop()
    }
  }
}
