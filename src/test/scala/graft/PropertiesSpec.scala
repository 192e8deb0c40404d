package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.HeliumGraph

/** Property-based checks (SURVEY.md §5 item 3) over randomly generated
  * payment_v2 envelopes: key determinism, idempotency, explode
  * cardinality, endpoint coverage. Uses raw scalacheck generators with
  * fixed seeds (the scalatest bridge artifact isn't in the offline
  * cache); 5 sampled cases per property, each a real Spark job.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val addr = Gen.oneOf("a1", "b2", "c3", "d4", "e5")
  private val payment = for {
    amount <- Gen.chooseNum(1L, 1000000L)
    payee <- addr
  } yield (amount, payee)

  private val envelope = for {
    block <- Gen.chooseNum(1L, 500L)
    hash <- Gen.identifier.map(_.take(12))
    payer <- addr
    payments <- Gen.nonEmptyListOf(payment).map(_.take(5))
  } yield (block, block * 60, hash, "payment_v2",
    s"""{"hash":"$hash","fee":1,"nonce":1,"payer":"$payer","payments":[""" +
      payments.map { case (a, p) =>
        s"""{"amount":$a,"memo":null,"payee":"$p"}"""
      }.mkString(",") + "]}")

  private val envelopes = Gen.nonEmptyListOf(envelope).map(_.take(8))

  private def cases: Seq[List[(Long, Long, String, String, String)]] =
    (1 to 5).flatMap(i =>
      envelopes.apply(Gen.Parameters.default, Seed(42L + i)))

  test("explode cardinality: |edges| == Σ|payments|") {
    cases.foreach { rows =>
      val df = rows.toDF("block", "block_time", "hash", "type", "payload")
      val expected = rows.map(r =>
        "\"amount\"".r.findAllIn(r._5).length).sum
      assert(HeliumGraph.paymentV2Edges(df).count() === expected)
    }
  }

  test("key determinism + idempotency: transform(x ∪ x) dedups to transform(x)") {
    cases.foreach { rows =>
      val once = rows.toDF("block", "block_time", "hash", "type", "payload")
      val twice = (rows ++ rows)
        .toDF("block", "block_time", "hash", "type", "payload")
      val a = HeliumGraph.paymentV2Edges(once).dropDuplicates("_key")
        .orderBy("_key", "amount").collect().toSeq
      val b = HeliumGraph.paymentV2Edges(twice).dropDuplicates("_key")
        .orderBy("_key", "amount").collect().toSeq
      assert(a === b)
    }
  }

  test("endpoint coverage: every edge endpoint is in the account vertex set") {
    cases.foreach { rows =>
      val df = rows.toDF("block", "block_time", "hash", "type", "payload")
      val edges = HeliumGraph.paymentV2Edges(df)
      val keys = HeliumGraph.accountVertices(df)
        .select(concat(lit("accounts/"), col("_key")))
        .as[String].collect().toSet
      val endpoints = edges.select(col("_from")).as[String].collect() ++
        edges.select(col("_to")).as[String].collect()
      assert(endpoints.forall(keys.contains))
    }
  }
}
