package graft

import java.nio.file.Files

import graft.operators.HeliumGraph
import graft.sinks.GraphSink
import graft.sources.HeliumFixtures

class GraphSinkSpec extends SparkSpec {
  import spark.implicits._

  test("F8/N4: null columns become ABSENT fields in sink documents") {
    val docs = GraphSink.toDocuments(
      HeliumGraph.receiptEdges(HeliumFixtures.txnEnvelopes(spark)))
      .as[String].collect()
    val withReceipt = docs.find(_.contains("\"hash\":\"tx4\"")).get
    val noReceipt = docs.find(_.contains("\"hash\":\"tx5\"")).get
    assert(withReceipt.contains("\"tx_power\":27"))
    assert(withReceipt.contains("\"processing_time_s\":0.25"))
    assert(!noReceipt.contains("tx_power")) // absent, not null
    assert(!noReceipt.contains("processing_time_s"))
  }

  test("S5: insert-ignore dedups on the content key within the batch") {
    val out = Files.createTempDirectory("sink").toString + "/edges"
    val edges = HeliumGraph.paymentV1Edges(
      HeliumFixtures.txnEnvelopes(spark)) // 3 rows, 2 distinct keys
    GraphSink.insertIgnore(edges, out)
    assert(spark.read.parquet(out).count() === 2)
  }

  test("S6: snapshot replace overwrites, not appends") {
    val out = Files.createTempDirectory("sink").toString + "/dim"
    val inv = graft.sources.Inventory.processInventory(
      graft.sources.Inventory.readCsv(spark,
        HeliumFixtures.inventoryCsv.toDS()))
    GraphSink.replaceSnapshot(inv, out)
    GraphSink.replaceSnapshot(inv, out)
    assert(spark.read.parquet(out).count() === 3)
  }
}
