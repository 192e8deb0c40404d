package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Canon

/** End-to-end corpus curation (the §2.12 operators COMPOSED — the
  * actual shape of a pre-training data pipeline):
  *
  *   quality filter → exact dedup (keep min doc_id) → MinHash-LSH
  *   candidate pairs → connected-component clusters → keep each
  *   cluster's canonical survivor → per-language corpus summary.
  *
  * Every stage is one of the individually-oracle-checked operators;
  * this query checks their composition end to end. Scale shape: two
  * aggregate shuffles (dedup key, final summary) + the LSH band join
  * + the tiny fixpoint loop on the candidate graph — no stage is
  * O(n²) in the corpus.
  */
object Pipeline {

  /** Reproducible train/val/test assignment by CONTENT HASH — not
    * rand(): the same document lands in the same split on any
    * cluster, any partitioning, any rerun (and survives re-ingestion,
    * since the key is content-derived). 96/2/2 via hash mod 100.
    * Returns per-(lang, split) counts — the mixture table a training
    * job consumes.
    */
  def hashSplit(documents: DataFrame): DataFrame = {
    val bucket = Canon.hash60(md5(col("text"))) % 100
    documents
      .withColumn("split",
        when(bucket < 96, "train").when(bucket < 98, "val")
          .otherwise("test"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Deterministic stratified sampling: per-language keep rates
    * applied by CONTENT-HASH bucket (same invariances as hashSplit —
    * partition-independent, rerun-stable, survives re-ingestion).
    * The standard data-mixture move: downweight the dominant language
    * without a rand() in sight. `rates` maps lang → percent kept;
    * unlisted languages keep everything. Row-local filter, no shuffle.
    */
  def stratifiedSample(documents: DataFrame,
                       rates: Map[String, Int] = Map("en" -> 50))
      : DataFrame = {
    val bucket = Canon.hash60(md5(concat(lit("sample|"), col("text")))) % 100
    val keepPct = rates.foldLeft(lit(100)) { case (acc, (lang, pct)) =>
      when(col("lang") === lang, lit(pct)).otherwise(acc)
    }
    documents
      .filter(bucket < keepPct)
      .select(col("doc_id"), col("lang"))
  }

  /** Token-BUDGET mixture sampling: per language, keep documents — in
    * deterministic content-hash order — until the language's token
    * budget is reached (the first doc to cross the line is kept, so
    * every budget is met, not undershot). This is the data-mixing
    * primitive when targets are token counts rather than rates:
    * "english: 1M tokens, code: 250k tokens".
    *
    * Determinism: the scan order is (hash60(md5(text)), doc_id) —
    * content-derived, so the selection is identical on any cluster,
    * any partitioning, any rerun. Scale: one window partitioned BY
    * LANGUAGE computes the running token sum — a per-partition sort,
    * never a global one; languages are the natural mixture partitions
    * and each sorts independently. `budgets` maps lang → token budget;
    * unlisted languages are kept whole.
    */
  def tokenBudgetSample(documents: DataFrame,
                        budgets: Map[String, Long]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(col("ord"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    val budget = budgets.foldLeft(lit(Long.MaxValue)) {
      case (acc, (lang, b)) =>
        when(col("lang") === lang, lit(b)).otherwise(acc)
    }
    documents
      .select(col("doc_id"), col("lang"),
        size(Canon.words(col("text"))).cast("long").as("n_tokens"),
        Canon.hash60(md5(col("text"))).as("ord"))
      .withColumn("tokens_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("tokens_before") < budget)
      .select(col("doc_id"), col("lang"), col("n_tokens"))
  }

  def corpusPipeline(documents: DataFrame,
                     minTokens: Int = 30): DataFrame = {
    val q = documents
      .withColumn("n_tokens", size(Canon.words(col("text"))))
      .filter(col("n_tokens") >= minTokens)
    // exact dedup: survivors are the min doc_id per content key
    val keep = q.groupBy(md5(col("text")).as("k"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val surv = q.join(keep, Seq("doc_id"), "left_semi")
    // near-dup clusters over the survivors; drop non-canonical members
    val clusters = Dedup.dupClusters(
      Dedup.lshCandidatePairs(Dedup.minhashSignature(surv)))
    val dropIds = clusters.filter(col("doc_id") =!= col("cluster_rep"))
      .select(col("doc_id"))
    val fin = surv.join(dropIds, Seq("doc_id"), "left_anti")
    fin.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"))
  }
}
