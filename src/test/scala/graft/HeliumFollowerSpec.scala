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
