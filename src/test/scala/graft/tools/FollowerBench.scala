package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.{Sessions, StubNode}
import graft.sinks.GraphSink
import graft.sources.HeliumFixtures
import graft.streaming.HeliumStreamFollower

/** End-to-end throughput of the ENGINE-DRIVEN follower (VERDICT r12
  * #4): every piece of the fetch → transform → sink → checkpoint loop
  * is spec-verified (HeliumBlockStreamSpec capstone), but the ETL the
  * north star names had no recorded throughput number. This drives
  * HeliumStreamFollower over an AMPLIFIED fixture block range — the
  * sf1eq trick applied to the chain: heights past 102 serve salted
  * copies of the three fixture blocks (txn hashes re-keyed per height,
  * so content keys stay unique and the N+1 transaction_get cost is
  * real) through the in-process StubNode over real HTTP — and records
  * blocks/s and committed rows/s per trigger configuration.
  *
  * Test scope (not graft/tools in main): it needs StubNode, which is
  * deliberately not part of the library surface. Run:
  *
  *   sbt -batch "Test/runMain graft.tools.FollowerBench [out.json] [heights]"
  *
  * Modes: uncapped (whole backfill in ONE epoch — commitBatch cost at
  * its largest, WAL cost at its smallest), capped at 100
  * heights/trigger (the admission-control steady state: epoch overhead
  * × heights/100), and capped + wire import (each committed partition
  * read back and POSTed as importBulk bodies — the reference's
  * follower.py:205-207 sink verb priced in).
  */
object FollowerBench {

  /** Salted-copy chain extension: heights 103..(99+n) each serve a
    * copy of fixture block 100+(h−100)%3 with block hash, prev_hash,
    * height, and every transaction hash re-keyed by height. Payload
    * JSON gets the same hash re-key (payments carry their hash
    * in-payload), so every height's documents produce distinct
    * content keys — nothing collapses in the insert-ignore sink.
    */
  def amplifiedChain(nHeights: Long)
      : (Map[Long, String], Map[String, String]) = {
    val base = HeliumFixtures.blockJsonByHeight
    val payloads = HeliumFixtures.payloadByHash
    val txRe = """"hash":"(tx\d+)"""".r
    val txnsOf: Map[Long, Seq[String]] = base.view.mapValues(j =>
      txRe.findAllMatchIn(j).map(_.group(1)).toSeq.distinct).toMap
    val blocks = Map.newBuilder[Long, String]
    val extraPayloads = Map.newBuilder[String, String]
    (103L to (99L + nHeights)).foreach { h =>
      val tmpl = 100L + ((h - 100L) % 3L)
      var j = base(tmpl)
        .replace(s""""height":$tmpl""", s""""height":$h""")
        .replace(s""""hash":"bh$tmpl"""", s""""hash":"bh$h"""")
        .replace(s""""prev_hash":"bh${tmpl - 1}"""",
          s""""prev_hash":"bh${h - 1}"""")
      txnsOf(tmpl).foreach { tx =>
        val salted = s"${tx}h$h"
        j = j.replace(s""""hash":"$tx"""", s""""hash":"$salted"""")
        extraPayloads += salted ->
          payloads(tx).replace(s""""hash":"$tx"""",
            s""""hash":"$salted"""")
      }
      blocks += h -> j
    }
    (blocks.result(), extraPayloads.result())
  }

  private def run(spark: SparkSession, endpoint: String,
                  startHeight: Long, cap: Long, wire: Boolean)
      : (Double, Map[String, Long]) = {
    val dir = Files.createTempDirectory("follower-bench").toString
    val target =
      if (wire) Some(GraphSink.ImportTarget(endpoint, "helium"))
      else None
    val t0 = System.nanoTime()
    val q = HeliumStreamFollower.start(spark, endpoint,
      s"$dir/sink", s"$dir/ckpt", startHeight = startHeight,
      maxHeightsPerTrigger = cap, numPartitions = 16,
      maxRetries = 2, sleepMs = 0L, importTarget = target,
      receiptRetentionBlocks = Some(7200L))
    try q.processAllAvailable() finally q.stop()
    val wall = (System.nanoTime() - t0) / 1e9
    val rows = Seq("payments", "poc_receipts", "accounts").map { c =>
      c -> spark.read.parquet(s"$dir/sink/$c").count()
    }.toMap
    (wall, rows)
  }

  /** Tail regime (VERDICT r14 #7): the follower AT TIP, per-block
    * end-to-end latency. The follower catches up to the stub's tip,
    * then the tip advances ONE height at a time; each sample times
    * block-published → rows-committed-and-checkpointed through the
    * live query (offset discovery, the block fetch + its N+1
    * transaction_gets, transform, parquet append, WAL commit). This
    * is the ENGINE term of tip-following latency; a production
    * ProcessingTime trigger adds its poll offset (≤ interval, mean
    * interval/2) on top — the engine term is what this library
    * controls, so that is the recorded number.
    */
  private def runTail(spark: SparkSession, endpoint: String,
                      tip: java.util.concurrent.atomic.AtomicLong,
                      nBlocks: Int): Seq[Double] = {
    val dir = Files.createTempDirectory("follower-tail").toString
    val q = HeliumStreamFollower.start(spark, endpoint,
      s"$dir/sink", s"$dir/ckpt", startHeight = tip.get() - 30L,
      maxHeightsPerTrigger = 0L, numPartitions = 16,
      maxRetries = 2, sleepMs = 0L,
      receiptRetentionBlocks = Some(7200L))
    try {
      q.processAllAvailable() // catch up to tip; absorbs query startup
      (1 to nBlocks).map { _ =>
        val t0 = System.nanoTime()
        tip.incrementAndGet()
        q.processAllAvailable()
        (System.nanoTime() - t0) / 1e9
      }
    } finally q.stop()
  }

  def main(args: Array[String]): Unit = {
    val nHeights = args.drop(1).headOption.map(_.toLong).getOrElse(1200L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (blocks, payloads) = amplifiedChain(nHeights)
    val modes = Seq(
      ("uncapped", 0L, false),
      ("capped100", 100L, false),
      ("capped100_wire", 100L, true))
    val lines = StubNode.withServer(
      extraBlocks = blocks, extraPayloads = payloads) { endpoint =>
      // Throwaway drain of the chain tail: absorbs stream startup +
      // commit-path codegen so mode 1 isn't charged the JVM warmup.
      run(spark, endpoint, startHeight = 99L + nHeights - 30L,
        cap = 0L, wire = true)
      modes.map { case (label, cap, wire) =>
        val (wall, rows) =
          run(spark, endpoint, startHeight = 99L, cap, wire)
        val committed = rows.values.sum
        f"""{"mode":"$label","heights":$nHeights,"wall_s":$wall%.2f,""" +
          f""""blocks_per_s":${nHeights / wall}%.1f,""" +
          f""""rows_per_s":${committed / wall}%.1f,""" +
          s""""rows":{${rows.toSeq.sorted.map { case (c, n) =>
            s""""$c":$n""" }.mkString(",")}}}"""
      }
    }
    // Tail regime: fresh server whose tip starts 30 below the chain
    // head, advanced one height per sample after catch-up.
    val nTail = 30
    val topHeight = 99L + nHeights
    val tailLine = StubNode.withServerTip(topHeight - nTail,
      extraBlocks = blocks, extraPayloads = payloads) { (endpoint, tip) =>
      val lat = runTail(spark, endpoint, tip, nTail).sorted
      def pct(p: Double): Double = lat((p * (lat.size - 1)).round.toInt)
      f"""{"mode":"tail_per_block","heights":$nTail,""" +
        f""""median_s":${pct(0.5)}%.3f,"p95_s":${pct(0.95)}%.3f,""" +
        f""""max_s":${lat.last}%.3f,""" +
        f""""blocks_per_s":${1.0 / pct(0.5)}%.1f}"""
    }
    spark.stop()
    val all = lines :+ tailLine
    val out = args.headOption.getOrElse("FOLLOWERBENCH.json")
    Files.writeString(java.nio.file.Paths.get(out),
      all.mkString("\n") + "\n")
    all.foreach(println)
  }
}
