package graft

import graft.operators.Pipeline

class PipelineSpec extends SparkSpec {
  import spark.implicits._

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
