package graft.sources

import org.apache.spark.sql.types._

/** Declared schemas mirroring the reference's pydantic models
  * (SURVEY.md §1.2; /root/reference models/ — block.py:5-15,
  * transactions/payment_v1.py:4-11, payment_v2.py:5-17,
  * poc_receipts_v1.py:5-43, poc_receipts_v2.py:5-46,
  * add_gateway_v1.py:4-9).
  *
  * Ints that carry amounts/heights/ns-timestamps are LongType
  * (§1.3 — they overflow Int); pydantic Optionals are nullable fields.
  * Ingestion is schema-ON-read: raw JSON payloads parse through these
  * with from_json, so a malformed payload yields nulls (the engine's
  * analog of the reference's ValidationError retry path, T4) instead
  * of failing the batch.
  */
object HeliumSchemas {

  val blockTransaction: StructType = StructType(Seq(
    StructField("hash", StringType, nullable = false),
    StructField("type", StringType, nullable = false)))

  val block: StructType = StructType(Seq(
    StructField("hash", StringType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("prev_hash", StringType, nullable = false),
    StructField("time", LongType, nullable = false), // unix seconds
    StructField("transactions", ArrayType(blockTransaction),
      nullable = false)))

  val paymentV1: StructType = StructType(Seq(
    StructField("hash", StringType, nullable = false),
    StructField("amount", LongType, nullable = false),
    StructField("fee", LongType, nullable = false),
    StructField("nonce", LongType, nullable = false),
    StructField("payer", StringType, nullable = false),
    StructField("payee", StringType, nullable = false)))

  val paymentV2Payment: StructType = StructType(Seq(
    StructField("amount", LongType, nullable = false),
    StructField("memo", StringType, nullable = true),
    StructField("payee", StringType, nullable = false)))

  val paymentV2: StructType = StructType(Seq(
    StructField("hash", StringType, nullable = false),
    StructField("fee", LongType, nullable = false),
    StructField("nonce", LongType, nullable = false),
    StructField("payer", StringType, nullable = false),
    StructField("payments", ArrayType(paymentV2Payment),
      nullable = false)))

  val witness: StructType = StructType(Seq(
    StructField("channel", LongType, nullable = false),
    StructField("datarate", StringType, nullable = false),
    StructField("frequency", DoubleType, nullable = false),
    StructField("gateway", StringType, nullable = false),
    StructField("is_valid", BooleanType, nullable = true),
    StructField("packet_hash", StringType, nullable = false),
    StructField("signal", LongType, nullable = false),
    StructField("snr", DoubleType, nullable = false),
    StructField("timestamp", LongType, nullable = false), // unix ns
    // v2 extension (poc_receipts_v2.py:15); null for v1 payloads
    StructField("invalid_reason", StringType, nullable = true)))

  val receipt: StructType = StructType(Seq(
    StructField("channel", LongType, nullable = false),
    StructField("data", StringType, nullable = false),
    StructField("datarate", StringType, nullable = true),
    StructField("frequency", DoubleType, nullable = false),
    StructField("gateway", StringType, nullable = false),
    StructField("origin", StringType, nullable = false),
    StructField("signal", LongType, nullable = false),
    StructField("snr", DoubleType, nullable = false),
    StructField("timestamp", LongType, nullable = false), // unix ns
    StructField("tx_power", LongType, nullable = true)))

  val pathElement: StructType = StructType(Seq(
    StructField("challengee", StringType, nullable = false),
    StructField("receipt", receipt, nullable = true), // may be absent
    StructField("witnesses", ArrayType(witness), nullable = false)))

  /** v1 and v2 receipts share this transform-relevant shape; v2 has no
    * own `hash` field (poc_receipts_v2.py:37-46) — the follower uses
    * the block-listing hash for both (follower.py:191), which is why
    * the ingest layer carries the listing hash alongside the payload.
    */
  val pocReceipts: StructType = StructType(Seq(
    StructField("hash", StringType, nullable = true),
    StructField("challenger", StringType, nullable = false),
    StructField("fee", LongType, nullable = false),
    StructField("onion_key_hash", StringType, nullable = false),
    StructField("path", ArrayType(pathElement), nullable = false),
    StructField("request_block_hash", StringType, nullable = true),
    StructField("secret", StringType, nullable = false)))

  /** Declared but never dispatched in the reference (follower.py:203). */
  val addGatewayV1: StructType = StructType(Seq(
    StructField("hash", StringType, nullable = false),
    StructField("gateway", StringType, nullable = false),
    StructField("owner", StringType, nullable = false),
    StructField("payer", StringType, nullable = true),
    StructField("staking_fee", LongType, nullable = false)))

  /** Ingest envelope: one row per fetched transaction — the listing
    * metadata (block height/time, listing hash, type) plus the raw
    * JSON payload (S1/S2: the engine's boundary with the JSON-RPC
    * client; fixtures and a live feed are interchangeable here).
    */
  val txnEnvelope: StructType = StructType(Seq(
    StructField("block", LongType, nullable = false),
    StructField("block_time", LongType, nullable = false), // unix s
    StructField("hash", StringType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("payload", StringType, nullable = false)))
}
