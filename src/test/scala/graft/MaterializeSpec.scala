package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import graft.operators.{Dedup, GraphEtl, TextAnalysis}

/** The Materialize seam must be a pure deployment knob: every strategy
  * produces identical operator results. Exercised on the three
  * materialization shapes the operators use — a driver-checked fixpoint
  * (dupClustersShortcut / connectedComponents), a fixed-round iteration
  * (pageRankFixedPoint), and a materialize-once reused base
  * (topTfidfTerms).
  */
class MaterializeSpec extends SparkSpec {

  private lazy val docs = table("documents")
  private lazy val orders = table("orders")

  private def edges = orders
    .select((col("o_custkey") % 40).as("a"), (col("o_orderkey") % 40).as("b"))
    .filter(col("a") =!= col("b")).distinct()

  private def snapshot(df: DataFrame): Seq[String] = {
    val names = df.columns.sorted
    df.select(names.map(col).toIndexedSeq: _*).collect()
      .map(_.toSeq.mkString("|")).sorted.toSeq
  }

  private def underEach(body: => DataFrame): Map[String, Seq[String]] = {
    val dir = Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    Seq(
      "local" -> Materialize.LocalCheckpoint,
      "reliable" -> Materialize.ReliableCheckpoint,
      "replicated" -> Materialize.PersistReplicated
    ).map { case (name, s) =>
      name -> Materialize.withStrategy(s)(snapshot(body))
    }.toMap
  }

  test("connectedComponents fixpoint: identical under all strategies") {
    val r = underEach(GraphEtl.connectedComponents(edges))
    assert(r("local").nonEmpty)
    assert(r("reliable") === r("local"))
    assert(r("replicated") === r("local"))
  }

  test("dedup cluster fixpoint: identical under all strategies") {
    val pairs = edges.limit(60)
      .select(col("a").as("doc_a"), col("b").as("doc_b"))
    val r = underEach(Dedup.dupClustersShortcut(pairs))
    assert(r("local").nonEmpty)
    assert(r("reliable") === r("local"))
    assert(r("replicated") === r("local"))
  }

  test("pageRank rounds: identical ranks under all strategies") {
    val e = orders.select((col("o_custkey") % 30).as("_from"),
      (col("o_orderkey") % 30).as("_to"))
      .filter(col("_from") =!= col("_to"))
    val r = underEach(GraphEtl.pageRankFixedPoint(e, iters = 3))
    assert(r("local").nonEmpty)
    assert(r("reliable") === r("local"))
    assert(r("replicated") === r("local"))
  }

  test("tfidf materialize-once base: identical terms under all strategies") {
    val r = underEach(TextAnalysis.topTfidfTerms(docs.limit(100), k = 3))
    assert(r("local").nonEmpty)
    assert(r("reliable") === r("local"))
    assert(r("replicated") === r("local"))
  }

  test("two-stage rank pin (TwoStage.rangeParted): identical grade " +
    "table under all strategies") {
    // r15: the pin is the CORRECTNESS mechanism of every two-stage
    // global rank (SURVEY §8.5 pathology #3 — the boundary-redraw
    // bug), and on a cluster it runs under ReliableCheckpoint; the
    // exact n/k grade algebra must not depend on which strategy
    // pinned the boundary draw.
    val r = underEach(graft.operators.Pipeline.pruningCurve(
      docs.limit(400), nBuckets = 4))
    assert(r("local").size === 4)
    assert(r("reliable") === r("local"))
    assert(r("replicated") === r("local"))
  }

  test("pre-pin + post-pin composition (samplePerGroup): identical " +
    "ranks under all strategies") {
    // r16: the corpus-scan sites now pin TWICE — the narrow base
    // pre-pin (so the boundary-sampling job doesn't re-run the
    // derived scan) and the post-exchange pin (the boundary draw).
    // Both are Materialize-strategy seams, and the exact-N-per-group
    // selection must be strategy-independent through the pair.
    val r = underEach(graft.operators.Pipeline.samplePerGroup(
      docs.limit(300), n = 20))
    assert(r("local").nonEmpty)
    assert(r("reliable") === r("local"))
    assert(r("replicated") === r("local"))
  }

  test("hashRank two-stage ring rank (hierBeamSearch): identical " +
    "frontier under all strategies") {
    // r16: the md5-ring global rank (searchGraph fingers + hier
    // pilots) moved onto the TwoStage template; the walk's output
    // must not depend on which strategy pinned the ring rank's
    // boundary draw.
    val emb = table("embeddings").limit(200)
    val r = underEach(graft.operators.Similarity.hierBeamSearch(
      emb, k = 3, beam = 4, rounds = 2, graphK = 3, descentRounds = 2))
    assert(r("local").nonEmpty)
    assert(r("reliable") === r("local"))
    assert(r("replicated") === r("local"))
  }

  test("statsReset: identical rows under all strategies, and the " +
    "result re-enters as a leaf plan") {
    // r17: the g26 move rounds materialize through statsReset (the
    // checkpoint stats-digit-compounding pathology, SURVEY §8.5 #4).
    // The reset must stay a pure deployment/estimation knob: same
    // rows under every strategy, and the returned frame's plan must
    // be a fresh LEAF (no inherited lineage, no inherited stats).
    val base = docs.limit(50).select(col("doc_id"), col("lang"))
    val r = underEach(Materialize.statsReset(
      base.groupBy(col("lang")).count()))
    assert(r("local").nonEmpty)
    assert(r("reliable") === r("local"))
    assert(r("replicated") === r("local"))
    val reset = Materialize.statsReset(base.groupBy(col("lang")).count())
    assert(reset.queryExecution.analyzed.collectLeaves().size === 1)
    // row identity against the un-reset seam
    assert(snapshot(reset) ===
      snapshot(base.groupBy(col("lang")).count()))
  }

  test("g26 ladder (statsReset consumer): identical audit row under " +
    "all strategies") {
    val e = orders
      .select((col("o_custkey") % 40).as("a"), (col("o_orderkey") % 40).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val r = underEach(GraphEtl.louvainLadderMoves(e, 1, 2, 1))
    assert(r("local").size === 1)
    assert(r("reliable") === r("local"))
    assert(r("replicated") === r("local"))
  }

  test("withStrategy restores the previous strategy") {
    assert(Materialize.strategy === Materialize.LocalCheckpoint)
    Materialize.withStrategy(Materialize.ReliableCheckpoint) {
      assert(Materialize.strategy === Materialize.ReliableCheckpoint)
    }
    assert(Materialize.strategy === Materialize.LocalCheckpoint)
  }
}
