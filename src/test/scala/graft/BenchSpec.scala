package graft

import org.scalatest.funsuite.AnyFunSuite

/** The frozen-anchor parser's pure logic (ADVICE r16): the guard's
  * input must slice exactly the medians OBJECT, stay disarmed off-SF,
  * and parse a committed closing artifact (which carries host numerics
  * and baseline_ratios keyed by the SAME query names AFTER the
  * medians) without letting later values overwrite medians.
  */
class BenchSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.1"

  test("a plain BENCH_BASELINE-format file parses its medians map") {
    val txt =
      s"""{"source":"x","sf":"$sf","cpus":32,"reps":3,
         |"median_total":1.5,"frozen_at_round":16,
         |"medians":{"q01_agg":0.5,"g10_pagerank":1.0}}""".stripMargin
    assert(Bench.parseBaseline(txt, sf) ===
      Map("q01_agg" -> 0.5, "g10_pagerank" -> 1.0))
  }

  test("BENCH_LOCAL-format trailing sections cannot overwrite medians " +
    "(the ADVICE r16 regex-to-EOF bug)") {
    // host.cpu_mhz numerics AND baseline_ratios under the SAME query
    // names follow the medians object — the old parser read to EOF
    // and toMap's later-wins let the 9.99 ratio replace the median
    val txt =
      s"""{"metric":"total","value":2.0,"sf":"$sf",
         |"queries":{"q01_agg":0.7},
         |"medians":{"q01_agg":0.5,"g10_pagerank":1.0},
         |"host":{"loadavg":"1 2 3","cpu_mhz":{"min":2100,"max":2100,
         |"mean":2100},"captured_at":"t"},
         |"baseline_ratios":{"q01_agg":9.99,"g10_pagerank":8.88}}"""
        .stripMargin
    assert(Bench.parseBaseline(txt, sf) ===
      Map("q01_agg" -> 0.5, "g10_pagerank" -> 1.0))
  }

  test("an off-SF anchor disarms the guard entirely") {
    val txt =
      """{"sf":"/root/testdata/sf0.01","medians":{"q01_agg":0.5}}"""
    assert(Bench.parseBaseline(txt, sf) === Map.empty)
  }

  test("a file with no medians key throws (caller maps it to no-anchor)") {
    intercept[NoSuchElementException] {
      Bench.parseBaseline(s"""{"sf":"$sf","queries":{"a":1}}""", sf)
    }
  }

  test("the literal word medians inside an earlier string value cannot " +
    "hijack the scan (ADVICE r17)") {
    // The old indexOf-based scan found the quoted word inside the
    // free-text source narrative and sliced the NEXT brace — the
    // queries object — arming the guard against run-1 times.
    val txt =
      s"""{"source":"re-frozen from the \\"medians\\" of the closing run",
         |"sf":"$sf",
         |"queries":{"q01_agg":9.99},
         |"medians":{"q01_agg":0.5}}""".stripMargin
    assert(Bench.parseBaseline(txt, sf) === Map("q01_agg" -> 0.5))
  }

  test("a null or numeric medians value throws instead of slicing a " +
    "later object (ADVICE r17)") {
    intercept[NoSuchElementException] {
      Bench.parseBaseline(
        s"""{"sf":"$sf","medians":null,"host":{"cpu_mhz":{"min":2100}}}""",
        sf)
    }
    intercept[NoSuchElementException] {
      Bench.parseBaseline(s"""{"sf":"$sf","medians":3}""", sf)
    }
  }

  test("the re-frozen BENCH_BASELINE.json parses: 246 medians (r19 " +
    "freeze, pretty-printed JSON) despite the word medians in its own " +
    "source narrative") {
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get("BENCH_BASELINE.json"))
    val parsed = Bench.parseBaseline(txt, sf)
    assert(parsed.size === 246)
    assert(parsed("p27_verified_lsh_funnel") > 10.0)
    // the r19 entrants are anchored for the first time
    assert(parsed.contains("m12_multimodal_funnel"))
    assert(parsed.contains("d32_semantic_decontaminate"))
    assert(parsed.contains("d33_decontamination_recall"))
    assert(parsed("g28_louvain_fixpoint_ladder") > 10.0)
  }

  test("the r20 closing artifact (the r21 freeze source) parses: " +
    "250 medians, values not ratios") {
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get("BENCH_R20_CLOSING.json"))
    val parsed = Bench.parseBaseline(txt, sf)
    assert(parsed.size === 250)
    assert(parsed.contains("h09_witness_reach"))
    // baseline_ratios follows medians in this format: g29 has no
    // ratio (new entrant) and p26's median is >10 s while its ratio
    // is ~1 — a to-EOF parse would have returned the ratio
    assert(parsed("g29_leiden_ladder") > 10.0)
    assert(parsed("p26_exact_vs_lsh_funnel") > 10.0)
  }

  test("the r19 freeze is a pure transform of the committed closing " +
    "artifact: every anchor median byte-equal to " +
    "BENCH_R19_CLOSING.json's") {
    val anchor = Bench.parseBaseline(java.nio.file.Files.readString(
      java.nio.file.Paths.get("BENCH_BASELINE.json")), sf)
    val closing = Bench.parseBaseline(java.nio.file.Files.readString(
      java.nio.file.Paths.get("BENCH_R19_CLOSING.json")), sf)
    assert(anchor.size === 246 && closing.size === 246)
    assert(anchor === closing)
  }

  test("the committed closing artifact parses end-to-end: all medians, " +
    "median values (not ratios)") {
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get("BENCH_R17_CLOSING.json"))
    val parsed = Bench.parseBaseline(txt, sf)
    assert(parsed.size === 240)
    // the ratio section carries s51 at ~0.23; the median is ~0.82 —
    // a to-EOF parse would have returned the ratio
    assert(parsed("s51_ivfpq_index_roundtrip") > 0.5)
  }

  test("summary-tier name lists cap with a SEPARATE truncated flag " +
    "(ADVICE r19: arrays stay pure name lists)") {
    assert(Bench.names(Seq("a", "b"), "tripped") === """["a","b"]""")
    assert(Bench.names(Seq.empty, "tripped") === "[]")
    val many = (1 to 30).map(i => s"q$i")
    val capped = Bench.names(many, "tripped")
    assert(capped.endsWith("""],"tripped_truncated":true""") &&
      capped.contains("\"q20\"") && !capped.contains("\"q21\"") &&
      !capped.contains("..."))
  }

  test("the committed r18 medians artifact (the r19 freeze source) " +
    "parses: 242 medians, values not ratios") {
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get("BENCH_R18_MEDIANS.json"))
    val parsed = Bench.parseBaseline(txt, sf)
    assert(parsed.size === 242)
    // baseline_ratios follows medians in this format; s51's ratio is
    // ~0.88 vs its median ~0.72 — equal-ish here, so pin a row where
    // they differ by construction: g27 has ratio ≈ null (new in r18,
    // anchored), m11 likewise — check a heavy row's magnitude instead
    assert(parsed("p26_exact_vs_lsh_funnel") > 10.0)
  }

  test("the committed r19 closing artifact (the r20 freeze source) " +
    "parses: all 246 medians including the four r19 entrants") {
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get("BENCH_R19_CLOSING.json"))
    val parsed = Bench.parseBaseline(txt, sf)
    assert(parsed.size === 246)
    Seq("m12_multimodal_funnel", "d32_semantic_decontaminate",
      "d33_decontamination_recall", "g28_louvain_fixpoint_ladder")
      .foreach(q => assert(parsed.contains(q), q))
    assert(parsed("g28_louvain_fixpoint_ladder") > 5.0)
  }
}
