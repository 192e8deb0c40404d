package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic in-code reference-domain fixtures (SURVEY.md §5 /
  * FIXTURES.md): raw JSON transaction payloads in the exact shape the
  * reference's node client returns, covering its documented edge
  * cases — multi-payment fan-out (follower.py:163), missing receipt
  * (follower.py:197-198), path[0]-only processing (follower.py:180),
  * payer==payee self-edge, duplicate transaction (content-key dedup),
  * and an undispatched type (dropped, follower.py:203).
  *
  * In-code rather than on-disk so the driver-facing NO-ORACLE queries
  * (h01-h05) are runnable from any sfDir without extra files.
  */
object HeliumFixtures {

  private val rows: Seq[(Long, Long, String, String, String)] = {
    def pv1(hash: String, amount: Long, payer: String, payee: String) =
      s"""{"hash":"$hash","amount":$amount,"fee":3,"nonce":1,""" +
        s""""payer":"$payer","payee":"$payee"}"""
    val receipts1 =
      """{"hash":"rcp1","challenger":"chg1","fee":0,"onion_key_hash":"ok1",
        |"request_block_hash":"rb1","secret":"s1","path":[
        | {"challengee":"hs1",
        |  "receipt":{"channel":5,"data":"d","datarate":"SF9BW125",
        |    "frequency":904.3,"gateway":"hs1","origin":"p2p","signal":-70,
        |    "snr":9.5,"timestamp":1700000001000000000,"tx_power":27},
        |  "witnesses":[
        |   {"channel":5,"datarate":"SF9BW125","frequency":904.3,
        |    "gateway":"hs2","is_valid":true,"packet_hash":"ph1",
        |    "signal":-90,"snr":3.25,"timestamp":1700000001250000000},
        |   {"channel":5,"datarate":"SF9BW125","frequency":904.3,
        |    "gateway":"hs3","is_valid":false,"packet_hash":"ph1",
        |    "signal":-105,"snr":-4.5,"timestamp":1700000001500000000}]},
        | {"challengee":"hs9","receipt":null,"witnesses":[
        |   {"channel":1,"datarate":"SF9BW125","frequency":904.1,
        |    "gateway":"hsX","is_valid":true,"packet_hash":"phX",
        |    "signal":-80,"snr":1.0,"timestamp":1700000002000000000}]}]}"""
        .stripMargin.replace("\n", "")
    val receipts2NoReceipt =
      """{"challenger":"chg2","fee":0,"onion_key_hash":"ok2","secret":"s2",
        |"path":[
        | {"challengee":"hs4","receipt":null,"witnesses":[
        |   {"channel":7,"datarate":"SF10BW125","frequency":905.1,
        |    "gateway":"hs5","is_valid":null,"packet_hash":"ph2",
        |    "signal":-99,"snr":0.5,"timestamp":1700000003000000000,
        |    "invalid_reason":null}]}]}"""
        .stripMargin.replace("\n", "")
    val pv2 =
      """{"hash":"tx3","fee":5,"nonce":2,"payer":"alice","payments":[
        | {"amount":100,"memo":"m1","payee":"bob"},
        | {"amount":250,"memo":null,"payee":"carol"},
        | {"amount":7,"memo":"self","payee":"alice"}]}"""
        .stripMargin.replace("\n", "")
    Seq(
      (100L, 1700000000L, "tx1", "payment_v1",
        pv1("tx1", 5000, "alice", "bob")),
      (100L, 1700000000L, "tx1", "payment_v1", // exact duplicate (T5)
        pv1("tx1", 5000, "alice", "bob")),
      (100L, 1700000000L, "tx2", "payment_v1", // self-edge
        pv1("tx2", 42, "dave", "dave")),
      (101L, 1700000060L, "tx3", "payment_v2", pv2),
      (101L, 1700000060L, "tx4", "poc_receipts_v1", receipts1),
      (102L, 1700000120L, "tx5", "poc_receipts_v2", receipts2NoReceipt),
      (102L, 1700000120L, "tx6", "add_gateway_v1", // undispatched type
        """{"hash":"tx6","gateway":"g1","owner":"o1","payer":null,"staking_fee":40000}"""))
  }

  /** Transaction envelopes (HeliumSchemas.txnEnvelope shape). */
  def txnEnvelopes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    rows.toDF("block", "block_time", "hash", "type", "payload")
  }

  /** The same envelope rows as a DuckDB VALUES body — the h01-h04
    * oracles are SELF-CONTAINED SQL (the driver's DuckDB session only
    * registers the sf tables), so the fixture is inlined from the one
    * source of truth above; the oracle re-derives the reference
    * transforms (follower.py:145-202) with DuckDB JSON functions.
    */
  def envelopeValuesSql: String =
    "env(block, block_time, hash, type, payload) AS (VALUES\n  " +
      rows.map { case (b, t, h, tp, pl) =>
        s"($b, $t, '$h', '$tp', '${pl.replace("'", "''")}')"
      }.mkString(",\n  ") + ")"

  /** Inventory CSV rows (header dropped) as a DuckDB VALUES body;
    * empty CSV fields become NULL, matching the Spark CSV reader.
    */
  def inventoryValuesSql: String =
    "inv(address, owner, location, name) AS (VALUES\n  " +
      inventoryCsv.tail.map { line =>
        line.split(",", -1).map { f =>
          if (f.isEmpty) "NULL" else s"'${f.replace("'", "''")}'"
        }.mkString("(", ", ", ")")
      }.mkString(",\n  ") + ")"

  /** Block headers with their transaction listings (N3 input). */
  def blocks(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val listing = rows.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (height, txns) =>
        (s"bh$height", height, s"bh${height - 1}", txns.head._2,
          txns.map(t => (t._3, t._4)).distinct)
    }
    listing.toDF("hash", "height", "prev_hash", "time", "transactions")
      .selectExpr("hash", "height", "prev_hash", "time",
        "transform(transactions, t -> named_struct('hash', t._1, 'type', t._2)) AS transactions")
  }

  /** Raw per-height block JSON exactly as a node's block_get returns
    * it (client.py:25-36 result subtree) — backs the stub JSON-RPC
    * server in JsonRpcSpec.
    */
  def blockJsonByHeight: Map[Long, String] =
    rows.groupBy(_._1).map { case (height, txns) =>
      val listing = txns.map(t => s"""{"hash":"${t._3}","type":"${t._4}"}""")
        .distinct.mkString(",")
      height ->
        (s"""{"hash":"bh$height","height":$height,""" +
          s""""prev_hash":"bh${height - 1}","time":${txns.head._2},""" +
          s""""transactions":[$listing]}""")
    }

  /** Raw txn payload JSON by hash (transaction_get result subtree). */
  def payloadByHash: Map[String, String] =
    rows.map(t => t._3 -> t._5).toMap

  /** Gateway-inventory CSV lines (S4 fixture; loaders.py:24-37 shape —
    * header + rows, with one all-null-location row that P7 drops).
    */
  val inventoryCsv: Seq[String] = Seq(
    "address,owner,location,name",
    "hs1,own1,8c2a1072b59ffff,happy-fox",
    "hs2,own2,8c2a1072b5b001f,tall-owl",
    "hs3,own3,,silent-elk", // null location → dropped by na.drop
    "hs4,own4,8c2a10725a4abff,brave-ant")

  val inventoryCsvName: String = "gateway_inventory_1234567.csv.gz"
}
