package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.PlanCheck

/** The PLANCHECK drift gate's pure logic: classifier, artifact
  * round-trip, and the pair diff that decides pass/fail. The full-plan
  * sweep itself runs out-of-JVM (`runMain graft.tools.PlanCheck`) —
  * this spec pins the pieces that make its exit code trustworthy.
  */
class PlanCheckSpec extends AnyFunSuite {

  test("flagsOf classifies each red-flag class independently") {
    assert(PlanCheck.flagsOf("… BroadcastNestedLoopJoin BuildRight …")
      === Seq("BroadcastNestedLoopJoin"))
    assert(PlanCheck.flagsOf("… CartesianProduct …")
      === Seq("CartesianProduct"))
    // no-pushed-filter needs BOTH an empty pushdown AND a Filter node
    assert(PlanCheck.flagsOf("Scan parquet PushedFilters: []")
      === Seq.empty)
    assert(PlanCheck.flagsOf(
      "Filter (x > 1)\n+- Scan parquet PushedFilters: []")
      === Seq("no-pushed-filter"))
    assert(PlanCheck.flagsOf("SortAggregate(key=[…])") === Seq("sort-agg"))
    assert(PlanCheck.flagsOf("Generate explode(a)\n   +- Generate posexplode(b)")
      === Seq("stacked-generate"))
    // an intervening node breaks the stacked-generate adjacency
    assert(PlanCheck.flagsOf(
      "Generate explode(a)\n+- Project x\n   +- Generate posexplode(b)")
      === Seq.empty)
    assert(PlanCheck.flagsOf("WholeStageCodegen HashAggregate") === Seq.empty)
  }

  test("render → committedPairs round-trips the (query, flag) set") {
    val flagged = Map(
      "q99_example" -> Seq("sort-agg", "BroadcastNestedLoopJoin"),
      "d99_other" -> Seq("no-pushed-filter"))
    val tmp = java.nio.file.Files.createTempFile("plancheck", ".json")
    java.nio.file.Files.writeString(tmp, PlanCheck.render("/sf", flagged))
    val pairs = PlanCheck.committedPairs(tmp.toString)
    assert(pairs === Set(
      "q99_example" -> "sort-agg",
      "q99_example" -> "BroadcastNestedLoopJoin",
      "d99_other" -> "no-pushed-filter"))
    java.nio.file.Files.delete(tmp)
  }

  test("a missing artifact yields zero committed pairs (everything drifts)") {
    assert(PlanCheck.committedPairs("/nonexistent/PLANCHECK.json").isEmpty)
  }
}
