package graft

import java.nio.file.Files

import graft.sources.{JsonRpcClient, RpcTxnSource}
import graft.streaming.HeliumFollower

/** The complete reference pipeline against a live (stub) node: cursor
  * loop → JSON-RPC fetch → parity transforms → three collections →
  * checkpoint — follower.py:44-75 end to end over real HTTP.
  */
class HeliumFollowerSpec extends SparkSpec {

  private def follower(endpoint: String, dir: String) =
    new HeliumFollower(spark,
      new RpcTxnSource(new JsonRpcClient(endpoint),
        maxRetries = 2, sleepMs = 0, sleep = _ => ()),
      s"$dir/sink", s"$dir/checkpoint.json", batchSize = 2L)

  test("backfills to the node tip and materializes all collections") {
    StubNode.withServer() { endpoint =>
      val dir = Files.createTempDirectory("hfollow").toString
      val f = follower(endpoint, dir)
      val tip = new JsonRpcClient(endpoint).height()
      assert(tip === 102L)
      assert(f.cursor() === -1L)
      // seed the cursor just below the first fixture block, as the
      // reference's first_block probe would (blocks 100..102 pending)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/checkpoint.json"),
        """{"sync_cursor": 99}""")
      assert(f.runToTip(tip) === tip)
      // payments: tx1 (dedup'd) + tx2 + 3×tx3 fan-out = 5 edges
      assert(f.collection("payments").count() === 5)
      // receipts: 2 witnesses of tx4 path[0] + 1 of tx5 = 3 edges
      assert(f.collection("poc_receipts").count() === 3)
      // accounts view: distinct of per-batch address sets
      val accounts = f.collection("accounts")
        .select("_key").distinct()
        .collect().map(_.getString(0)).toSet
      assert(accounts === Set("alice", "bob", "carol", "dave"))
      assert(f.step(tip).isEmpty) // at the tip → poll (T3)
    }
  }

  test("maxHeightsPerTrigger forces multi-batch backfill, same tables") {
    StubNode.withServer() { endpoint =>
      def backfill(cap: Option[Long]) = {
        val dir = Files.createTempDirectory("hfollowcap").toString
        val f = new HeliumFollower(spark,
          new RpcTxnSource(new JsonRpcClient(endpoint),
            maxRetries = 2, sleepMs = 0, sleep = _ => ()),
          s"$dir/sink", s"$dir/checkpoint.json", batchSize = 10L,
          maxHeightsPerTrigger = cap)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$dir/checkpoint.json"),
          """{"sync_cursor": 99}""")
        var steps = 0
        while (f.step(102L).isDefined) steps += 1
        (f, steps)
      }
      val (whole, wholeSteps) = backfill(None)      // one 10-height batch
      val (capped, cappedSteps) = backfill(Some(1L)) // 1 height per step
      assert(wholeSteps === 1 && cappedSteps === 3)
      // identical final collections either way: each capped step
      // commits + checkpoints atomically, so catch-up only changes
      // batch BOUNDARIES, never content
      for (c <- Seq("payments", "poc_receipts")) {
        def rows(f: HeliumFollower) = f.collection(c)
          .drop("batch") // partition boundary column differs by design
          .collect().map(_.toSeq.mkString("|")).sorted.toSeq
        assert(rows(capped) === rows(whole))
      }
      def accounts(f: HeliumFollower) = f.collection("accounts")
        .select("_key").distinct()
        .collect().map(_.getString(0)).toSet
      assert(accounts(capped) === accounts(whole))
    }
  }

  test("importTarget posts byte-exact importBulk bodies per collection") {
    StubNode.withServerImports() { (endpoint, imports) =>
      val dir = Files.createTempDirectory("hfollow").toString
      val f = new HeliumFollower(spark,
        new graft.sources.RpcTxnSource(
          new graft.sources.JsonRpcClient(endpoint),
          maxRetries = 2, sleepMs = 0, sleep = _ => ()),
        s"$dir/sink", s"$dir/checkpoint.json", batchSize = 2L,
        importTarget = Some(
          graft.sinks.GraphSink.ImportTarget(endpoint, "helium")))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/checkpoint.json"),
        """{"sync_cursor": 99}""")
      f.runToTip(102L)
      import scala.jdk.CollectionConverters._
      val posted = imports.asScala.toSeq
      // every POST hit the ArangoDB bulk-import path with
      // onDuplicate=ignore (the reference's insert-ignore verb)
      assert(posted.nonEmpty)
      posted.foreach { case (path, _) =>
        assert(path.startsWith("/_db/helium/_api/import?collection="))
        assert(path.contains("&type=list&onDuplicate=ignore"))
      }
      // per collection, the documents on the wire are byte-identical
      // to importBulkBodies over the committed batch partitions
      def docs(bodies: Seq[String]): Set[String] = bodies.flatMap { b =>
        assert(b.startsWith("[") && b.endsWith("]"))
        // compact to_json docs contain no nested objects/arrays here,
        // so splitting on "},{" recovers the exact document bytes
        b.stripPrefix("[").stripSuffix("]").split("\\},\\{")
          .filter(_.nonEmpty)
          .map(d => (if (d.startsWith("{")) d else "{" + d) +
            (if (d.endsWith("}")) "" else "}"))
      }.toSet
      for (c <- Seq("payments", "poc_receipts", "accounts")) {
        val wire = docs(posted.collect {
          case (p, b) if p.contains(s"collection=$c&") => b
        })
        val expected = (101L to 102L).flatMap { hi =>
          val part = s"$dir/sink/$c/batch=$hi"
          if (java.nio.file.Files.exists(java.nio.file.Paths.get(part)))
            graft.sinks.GraphSink
              .importBulkBodies(spark.read.parquet(part)).collect()
          else Seq.empty
        }
        assert(wire === docs(expected), s"collection $c wire mismatch")
        assert(wire.nonEmpty, s"collection $c posted nothing")
      }
    }
  }

  test("receipt retention drops expired batches; inventory refresh fires") {
    StubNode.withServer() { endpoint =>
      val dir = Files.createTempDirectory("hfollow").toString
      var refreshes = 0
      val f = new HeliumFollower(spark,
        new graft.sources.RpcTxnSource(
          new graft.sources.JsonRpcClient(endpoint),
          maxRetries = 2, sleepMs = 0, sleep = _ => ()),
        s"$dir/sink", s"$dir/checkpoint.json", batchSize = 1L,
        receiptRetentionBlocks = Some(1L),
        inventoryHeight = () => Some(-1000L),
        onInventoryRefresh = () => refreshes += 1)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/checkpoint.json"),
        """{"sync_cursor": 99}""")
      f.runToTip(102L)
      // batches 100..102 committed; retention=1 keeps only batches
      // >= cursor-1 = 101 → batch=100 dropped, 101/102 retained
      val kept = java.nio.file.Files
        .list(java.nio.file.Paths.get(s"$dir/sink/poc_receipts"))
        .iterator()
      import scala.jdk.CollectionConverters._
      val names = kept.asScala.map(_.getFileName.toString)
        .filter(_.startsWith("batch=")).toSet
      assert(names === Set("batch=101", "batch=102"))
      // inventory snapshot lags the cursor by far more than 500 at
      // every step → the T6 trigger fires once per committed batch
      assert(refreshes === 3)
      // payments are NOT subject to receipt retention
      assert(f.collection("payments").count() === 5)
    }
  }

  test("re-running a batch is idempotent (T5 overwrite-by-partition)") {
    StubNode.withServer() { endpoint =>
      val dir = Files.createTempDirectory("hfollow").toString
      val f = follower(endpoint, dir)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/checkpoint.json"),
        """{"sync_cursor": 99}""")
      f.runToTip(102L)
      val before = f.collection("payments").collect().map(_.toSeq).toSet
      // rewind the checkpoint (simulates a crash after sink commit but
      // before checkpoint write) and replay the last batch
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/checkpoint.json"),
        """{"sync_cursor": 101}""")
      f.runToTip(102L)
      val after = f.collection("payments").collect().map(_.toSeq).toSet
      assert(after === before, "replayed batch must replace, not append")
      assert(f.cursor() === 102L)
    }
  }
}
