package graft

import graft.operators.Pipeline

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("decontaminatedSplit drops contaminated docs before splitting") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta", "b", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val batch = Seq(
      // shares the 5-shingle "alpha beta gamma delta epsilon"
      (1L, "alpha beta gamma delta epsilon different tail", "s", "en"),
      (2L, "totally unrelated words in this document here", "s", "en"),
      (3L, "other clean text entirely unlike the benchmark", "s", "de")
    ).toDF("doc_id", "text", "source", "lang")
    val out = Pipeline.decontaminatedSplit(batch, bench)
      .groupBy("lang").sum("n_docs")
      .as[(String, Long)].collect().toMap
    // doc 1 is contaminated and must not be counted in any split
    assert(out === Map("en" -> 1L, "de" -> 1L))
  }

  test("tokenBudgetSample keeps hash-ordered docs until the budget is met") {
    val docs = Seq(
      (0L, "a b c d e", "en"),      // 5 tokens
      (1L, "f g h i j", "en"),      // 5 tokens
      (2L, "k l m n o", "en"),      // 5 tokens
      (3L, "p q r", "de")           // other lang: kept whole
    ).toDF("doc_id", "text", "lang")
    // budget 7: in hash order, the first doc enters at tokens_before=0
    // and the second at 5 (< 7, kept — budgets are met, not
    // undershot); the third sits at 10 and is cut
    val out = Pipeline.tokenBudgetSample(docs, Map("en" -> 7L))
    val en = out.filter($"lang" === "en").count()
    assert(en === 2L)
    assert(out.filter($"lang" === "de").count() === 1L)
    // deterministic under repartitioning
    val again = Pipeline.tokenBudgetSample(docs.repartition(7),
      Map("en" -> 7L)).select("doc_id").as[Long].collect().toSet
    assert(again === out.select("doc_id").as[Long].collect().toSet)
  }
}
