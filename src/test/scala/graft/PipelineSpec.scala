package graft

import org.apache.spark.sql.functions.{col, countDistinct}
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

  test("exactVsLshFunnel: the delta row is exact minus lsh " +
    "componentwise, the exact side catches the planted J=1 pair, " +
    "and survivors + dropped partition the corpus") {
    // docs 1/2 are identical (J = 1: exact MUST pair them; their
    // minhash signatures are identical too, so LSH buckets them);
    // docs 3/4 share 9 of 10 distinct words (J = 0.9 ≥ 4/5: exact
    // MUST pair them; LSH may or may not); 5/6 are unrelated.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "one two three four five six seven eight nine eleven"),
      (5L, "completely different words live in this document here now"),
      (6L, "unrelated filler text occupying the corpus tail slot okay")
    ).toDF("doc_id", "text")
    val rows = Pipeline.exactVsLshFunnel(docs)
      .collect().map(r => r.getString(0) ->
        (1 to 6).map(r.getLong).toVector).toMap
    assert(rows.keySet === Set("exact", "lsh", "delta"))
    assert(rows("delta") ===
      rows("exact").zip(rows("lsh")).map { case (a, b) => a - b })
    val Vector(xPairs, _, xClusters, xDropped, xSurvivors, _) =
      rows("exact")
    assert(xPairs === 2L) // (1,2) exact, (3,4) at J = 0.9
    assert(xClusters === 2L)
    assert(xDropped === 2L) // docs 2 and 4 lose to their min-id reps
    assert(xSurvivors === 4L)
    assert(xDropped + xSurvivors === 6L)
    // identical docs have identical signatures: LSH cannot miss (1,2)
    assert(rows("lsh")(3) >= 1L)
  }

  test("exactVsLshVerifiedFunnel: lsh_verified is a subset of exact " +
    "(shared acceptance predicate), both deltas are componentwise, " +
    "and the verify keeps the planted J=1 pair") {
    // same fixture as the p26 test: (1,2) identical (J=1 — LSH
    // cannot miss, verify must keep); (3,4) at J=0.9 ≥ 4/5 (exact
    // must pair; LSH may or may not); 5/6 unrelated.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "one two three four five six seven eight nine eleven"),
      (5L, "completely different words live in this document here now"),
      (6L, "unrelated filler text occupying the corpus tail slot okay")
    ).toDF("doc_id", "text")
    val rows = Pipeline.exactVsLshVerifiedFunnel(docs)
      .collect().map(r => r.getString(0) ->
        (1 to 6).map(r.getLong).toVector).toMap
    assert(rows.keySet === Set("exact", "lsh_raw", "lsh_verified",
      "delta_raw", "delta_verified"))
    assert(rows("delta_raw") ===
      rows("exact").zip(rows("lsh_raw")).map { case (a, b) => a - b })
    assert(rows("delta_verified") ===
      rows("exact").zip(rows("lsh_verified")).map { case (a, b) => a - b })
    // the verify applies d26's EXACT acceptance predicate to the d03
    // candidates, so verified ⊆ exact holds componentwise on the
    // monotone counts (pairs, dropped) — the delta_verified row can
    // never go negative on those columns
    assert(rows("lsh_verified")(0) <= rows("exact")(0)) // n_pairs
    assert(rows("lsh_verified")(3) <= rows("exact")(3)) // n_dropped
    // ...and is a filter of the raw candidates
    assert(rows("lsh_verified")(0) <= rows("lsh_raw")(0))
    // identical docs: LSH buckets them, the verify keeps J=1
    assert(rows("lsh_verified")(0) >= 1L)
    assert(rows("exact")(0) === 2L)
  }

  test("lshVerifiedPairs: the standalone verify tier equals d26's " +
    "acceptance applied to d03's candidates — subset both ways " +
    "(VERDICT r17 #6)") {
    val docs = table("documents")
    val verified = Pipeline.lshVerifiedPairs(docs)
      .as[(Long, Long)].collect().toSet
    val raw = graft.operators.Dedup.lshCandidatePairs(
      graft.operators.Dedup.minhashSignature(docs))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val exact = graft.operators.Dedup.prefixJaccardJoin(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(verified.subsetOf(raw), "verify invented a pair")
    assert(verified.subsetOf(exact),
      "verify accepted a pair d26's exact predicate rejects")
    assert(verified === (raw & exact),
      "verify dropped a candidate that IS an exact pair — the tier " +
        "must be exactly d26's acceptance restricted to candidates")
    assert(verified.nonEmpty, "fixture corpus has no verified pair")
  }

  test("chunkDocuments: overlap grid, short tail, no redundant chunk") {
    val words200 = (0 until 200).map(i => s"w$i").mkString(" ")
    val words100 = (0 until 100).map(i => s"w$i").mkString(" ")
    val docs = Seq((0L, words200), (1L, words100), (2L, "a b c"))
      .toDF("doc_id", "text")
    val out = Pipeline.chunkDocuments(docs, chunkTokens = 128, overlap = 32)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    // doc 0 (200 tokens): starts 0 and 96 (96 < 200-32); second chunk
    // is 104 tokens (clipped at the end)
    // doc 1 (100 tokens): 100-32=68 → only start 0, one short chunk
    // doc 2 (3 tokens): one 3-token chunk
    assert(out.map(r => (r._1, r._2, r._3, r._4)) === Seq(
      (0L, 0L, 0L, 128L), (0L, 1L, 96L, 104L),
      (1L, 0L, 0L, 100L), (2L, 0L, 0L, 3L)))
    assert(out(1)._5.startsWith("w96 w97") && out(1)._5.endsWith("w199"))
    assert(out(3)._5 === "a b c")
    // consecutive chunks share exactly `overlap` words
    val c0 = out(0)._5.split(" ").toSeq
    val c1 = out(1)._5.split(" ").toSeq
    assert(c0.takeRight(32) === c1.take(32))
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

  test("samplePerGroup: exactly n per language, contiguous ranks, " +
    "matches the single-window definition") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = (0L until 30L)
      .map(i => (i, s"doc number $i", if (i % 3 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val out = Pipeline.samplePerGroup(docs, 4L)
      .as[(Long, String, Long)].collect()
    assert(out.count(_._2 == "en") === 4)
    assert(out.count(_._2 == "de") === 4)
    assert(out.filter(_._2 == "en").map(_._3).sorted ===
      Array(1L, 2L, 3L, 4L))
    // the two-stage rank equals the plain per-language window
    val expected = docs
      .select(col("doc_id"), col("lang"),
        graft.functions.Canon.hash60(md5(col("text"))).as("ord"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("ord"), col("doc_id")))
        .cast("long"))
      .filter(col("rank") <= 4)
      .select(col("doc_id"), col("lang"), col("rank"))
      .as[(Long, String, Long)].collect().toSet
    assert(out.toSet === expected)
    // partitioning-independent; a group smaller than n returns whole
    val rep = Pipeline.samplePerGroup(docs.repartition(7), 4L)
      .as[(Long, String, Long)].collect().toSet
    assert(rep === out.toSet)
    assert(Pipeline.samplePerGroup(docs.filter($"doc_id" < 2), 4L)
      .count() === 2L)
  }
  test("epochOrder: gapless round-robin interleave across languages") {
    val docs = Seq(
      (0L, "en", "aaa"), (1L, "en", "bbb"), (2L, "en", "ccc"),
      (3L, "fr", "ddd"), (4L, "fr", "eee"),
      (5L, "de", "fff")
    ).toDF("doc_id", "lang", "text")
    val out = Pipeline.epochOrder(docs)
      .as[(Long, String, Long, Long)].collect()
    // epoch_pos is a gapless 1..n permutation
    assert(out.map(_._4).sorted === (1L to 6L).toArray)
    // every round-r position precedes every round-(r+1) position
    val byRound = out.groupBy(_._3).view.mapValues(_.map(_._4)).toMap
    assert(byRound(1L).max < byRound(2L).min)
    // round 1 holds one doc of EVERY language
    assert(out.filter(_._3 == 1L).map(_._2).sorted === Array("de", "en", "fr"))
    // de is exhausted after round 1; later rounds shrink
    assert(byRound(2L).length === 2 && byRound(3L).length === 1)
    // deterministic under any input partitioning
    val rep = Pipeline.epochOrder(docs.repartition(5))
      .as[(Long, String, Long, Long)].collect()
    assert(rep.sortBy(_._1) === out.sortBy(_._1))
  }

  test("lengthGate: percentile_disc threshold keeps the upper tail") {
    // token counts 1..8, q=0.25: ceil(0.25·8)=2 → threshold 2,
    // so only the 1-token doc is dropped.
    val docs = (1 to 8)
      .map(n => (n.toLong, Seq.fill(n)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Pipeline.lengthGate(docs, 0.25)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._2) === (2L to 8L).toArray)
    // duplicate values: [1,5,5,5] at q=0.5: ceil(2)=2 → cum(1)=1,
    // cum(5)=4 → threshold 5 keeps the three 5-token docs.
    val dup = Seq((0L, "w"), (1L, "w w w w w"), (2L, "v v v v v"),
      (3L, "u u u u u")).toDF("doc_id", "text")
    val kept = Pipeline.lengthGate(dup, 0.5)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(kept.map(_._1) === Array(1L, 2L, 3L))
  }

  test("curriculumOrder: easy-to-hard total order, gapless positions") {
    val docs = Seq(
      (0L, "aa aa"),  // mean 2
      (1L, "b b"),    // mean 1 → first
      (2L, "cccc")    // mean 4 → last
    ).toDF("doc_id", "text")
    val out = Pipeline.curriculumOrder(docs)
      .as[(Long, Double, Long)].collect().sortBy(_._3)
    assert(out.map(_._1) === Array(1L, 0L, 2L))
    assert(out.map(_._3) === Array(1L, 2L, 3L))
    // deterministic under any input partitioning
    val rep = Pipeline.curriculumOrder(docs.repartition(5))
      .as[(Long, Double, Long)].collect().sortBy(_._3)
    assert(rep === out)
  }

  test("balancedShards: serpentine deal balances token sums, " +
    "partition-independent") {
    val docs = table("documents")
    val out = Pipeline.balancedShards(docs, numShards = 8)
    // every doc assigned exactly once, shards dense in [0, 8)
    assert(out.count() === docs.count())
    val sums = out.groupBy("shard").agg(
      org.apache.spark.sql.functions.sum("n_tokens").as("t"))
      .as[(Int, Long)].collect().toMap
    assert(sums.keySet === (0 until 8).toSet)
    // serpentine LPT on size-sorted docs: near-equal shard totals
    // (the bound is loose — the guarantee under test is "no straggler
    // shard", not optimality)
    val mx = sums.values.max.toDouble
    val mn = sums.values.min.toDouble
    assert(mx / mn <= 1.25, s"shard imbalance $mx/$mn")
    // deterministic under any input partitioning
    val rep = Pipeline.balancedShards(docs.repartition(7), numShards = 8)
      .as[(Long, Int, Long)].collect().sorted
    assert(rep === out.as[(Long, Int, Long)].collect().sorted)
  }

  test("zorderLayout: contiguous z-ranges, shard sizes within one " +
    "row, per-shard key spans beat the global span, " +
    "partition-independent") {
    val li = table("lineitem")
    val out = Pipeline.zorderLayout(li, numShards = 8)
      .orderBy("shard")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    // (shard, n_rows, z_min, z_max, pk_min, pk_max, sk_min, sk_max)
    assert(out.map(_._1).toSeq === (0L until 8L))
    assert(out.map(_._2).sum === li.count())
    // the (rank−1)·S div N cut gives sizes within one row of equal
    assert(out.map(_._2).max - out.map(_._2).min <= 1L)
    // shards are contiguous, non-overlapping z-ranges
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3, s"z-ranges overlap: $a vs $b")
    }
    // the point of the layout: per-file key spans (what footer-stat
    // pruning sees) are much tighter than the global span, on BOTH
    // dimensions at once
    val pkSpan = out.map(r => r._6 - r._5).sum.toDouble / out.length
    val skSpan = out.map(r => r._8 - r._7).sum.toDouble / out.length
    val pkAll = out.map(_._6).max - out.map(_._5).min
    val skAll = out.map(_._8).max - out.map(_._7).min
    assert(pkSpan < 0.8 * pkAll, s"partkey span $pkSpan vs global $pkAll")
    assert(skSpan < 0.8 * skAll, s"suppkey span $skSpan vs global $skAll")
    // deterministic under any input partitioning
    val rep = Pipeline.zorderLayout(li.repartition(7), numShards = 8)
      .orderBy("shard")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rep === out)
  }

  test("corpusReport: cell counts and corpus shares") {
    val docs = Seq(
      (0L, "a b c", "en", "web"), (1L, "d e", "en", "web"),
      (2L, "f", "de", "book")
    ).toDF("doc_id", "text", "lang", "source")
    val out = Pipeline.corpusReport(docs)
      .as[(String, String, Long, Long, Double, Double)]
      .collect().sortBy(_._1)
    assert(out === Array(
      ("de", "book", 1L, 1L, 1.0 / 3, 1.0 / 6),
      ("en", "web", 2L, 5L, 2.0 / 3, 5.0 / 6)))
  }

  test("corpusFunnel: per-stage doc/token attrition over the p01 chain") {
    val thirty = (0 until 30).map(i => s"t$i").mkString(" ")
    // docs 3/4 share a 15-word prefix X and have unique 15-word tails:
    // 11 of 26 5-windows duplicated (0.42 ≤ τ=0.5, so BOTH survive the
    // window stage) while their minhash band 0 collides (verified
    // deterministic md5 arithmetic), so LSH clusters them and the
    // canonical stage keeps only min-id doc 3. A heavier overlap (e.g.
    // doc + " extra") would drop BOTH members at the window stage
    // instead — d21's Lee-et-al. doc-granularity semantics.
    val x = (0 until 15).map(i => s"x$i")
    val nearA = (x ++ (0 until 15).map(i => s"u0_$i")).mkString(" ")
    val nearB = (x ++ (0 until 15).map(i => s"v2_$i")).mkString(" ")
    val rep = (0 until 6).map(_ => "p q r s t").mkString(" ")
    val docs = Seq(
      (0L, "too short to pass", "en", "web"),      // fails quality gate
      (1L, thirty, "en", "web"),                   // canonical survivor
      (2L, thirty, "en", "web"),                   // exact dup of 1
      (3L, nearA, "en", "web"),                    // near-dup pair, kept
      (4L, nearB, "en", "web"),                    // near-dup pair, dropped
      (5L, rep, "en", "web")                       // in-doc repetition:
                                                   // every window dup'd,
                                                   // window stage drops it
    ).toDF("doc_id", "text", "lang", "source")
    val out = Pipeline.corpusFunnel(docs)
      .as[(Int, String, Long, Long)].collect().sortBy(_._1)
    assert(out(0) === ((0, "raw", 6L, 4L + 5 * 30L)))
    assert(out(1) === ((1, "quality_gate", 5L, 5 * 30L)))
    // exact dedup drops doc 2 (same content as 1, higher id)
    assert(out(2) === ((2, "exact_dedup", 4L, 4 * 30L)))
    // windowed-dup removal drops the fully-self-repetitive doc 5
    assert(out(3) === ((3, "window_dedup", 3L, 3 * 30L)))
    // near-dup clustering keeps only the canonical min-id member
    assert(out(4) === ((4, "neardup_canonical", 2L, 2 * 30L)))
    // monotone: every stage can only lose docs and tokens
    assert(out.map(_._3).sliding(2).forall(p => p(0) >= p(1)))
    assert(out.map(_._4).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("skippingProbe: z-order layout prunes diagonal predicates the " +
    "natural layout cannot; partition-independent") {
    // diagonal key correlation (partkey ≈ suppkey ≈ i) written in a
    // scrambled natural order: footer stats under the natural layout
    // span the whole key range, the z-order layout localizes both dims
    val n = 256
    val rows = (0 until n).map { i =>
      ((i * 37) % n + 1L, 1L, i.toLong, i.toLong)
    }
    val li = rows.toDF("l_orderkey", "l_linenumber",
      "l_partkey", "l_suppkey")
    def run(df: org.apache.spark.sql.DataFrame) =
      Pipeline.skippingProbe(df, numShards = 8, nPreds = 4,
          numPartitions = 4)
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val out = run(li)
    assert(out.map(_._1) === (0L until 4L))
    assert(out.forall(_._2 === 8L))
    // every predicate selects SOME rows, so at least one shard scans
    assert(out.forall(r => r._3 >= 1L && r._4 >= 1L))
    // the z-order must beat the natural layout on every diagonal box,
    // and the natural layout's scrambled footers prune ~nothing
    assert(out.forall(r => r._3 < r._4))
    assert(out.map(_._4).sum >= 8L * 3)
    // two-stage-rank discipline: input partitioning must not matter
    assert(run(li.repartition(7)) === out)
  }

  test("cdcUpsert: SCD2 interval chain, tie-broken by event_id; " +
    "cdcSnapshot equals the sort-free is_current slice") {
    // ns-long ts (the Tables.tsUs LongType arm); user 7 has an exact
    // ts tie between events 2 and 3 — event_id must break it.
    val ev = Seq(
      (1L, 1000000000L, 7L, "signup", 1.0),
      (2L, 2000000000L, 7L, "purchase", 2.0),
      (3L, 2000000000L, 7L, "error", 3.0), // tied ts, higher id → later
      (4L, 3000000000L, 7L, "purchase", 4.0),
      (5L, 5000000000L, 8L, "signup", 5.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val scd = Pipeline.cdcUpsert(ev)
      .select("user_id", "version", "event_id", "valid_from_us",
        "valid_to_us", "is_current")
      .as[(Long, Long, Long, Long, Long, Boolean)]
      .collect().sortBy(r => (r._1, r._2))
    // user 7: versions 1..4 in (ts, event_id) order
    assert(scd.filter(_._1 == 7L).map(_._3).toSeq === Seq(1L, 2L, 3L, 4L))
    // half-open chain: each valid_to is the next valid_from
    scd.groupBy(_._1).values.foreach { vs =>
      val s = vs.sortBy(_._2)
      s.sliding(2).foreach {
        case Array(a, b) => assert(a._5 === b._4)
        case _ =>
      }
      // exactly one open current version per key, the last one
      assert(s.count(_._6) === 1)
      assert(s.last._6 && s.last._5 === Pipeline.ScdOpenEndUs)
      assert(s.map(_._2).toSeq === (1L to s.length.toLong))
    }
    // the tied pair: event 2 precedes event 3, and the tie makes
    // version 2's interval empty ([2s, 2s) in µs)
    val tied = scd.filter(r => r._1 == 7L && (r._3 == 2L || r._3 == 3L))
    assert(tied.map(r => (r._3, r._4, r._5)).toSeq ===
      Seq((2L, 2000000L, 2000000L), (3L, 2000000L, 3000000L)))
    // snapshot (one hash agg, no sort) ≡ the is_current slice
    val snap = Pipeline.cdcSnapshot(ev)
    val cur = Pipeline.cdcUpsert(ev).filter($"is_current")
      .select(snap.columns.map(org.apache.spark.sql.functions.col): _*)
    assert(snap.except(cur).isEmpty && cur.except(snap).isEmpty)
  }

  test("timeTravelGrid: each instant sees exactly the versions " +
    "active then; pre-first-change users absent; boundary instant " +
    "sees the new version") {
    // µs times — user 7 changes at 0 and 100, user 8 at 40.
    // mn=0, mx=100 → grid instants 25, 50, 75, 100.
    val ev = Seq(
      (1L, 0L, 7L, "a", 1.0),
      (2L, 100L, 7L, "b", 2.0),
      (3L, 40L, 8L, "c", 3.0)
    ).map { case (id, us, u, t, v) => (id, us * 1000L, u, t, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Pipeline.timeTravelGrid(ev)
      .select("grid_i", "grid_ts_us", "user_id", "version")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._3))
    assert(out === Array(
      (1L, 25L, 7L, 1L),
      (2L, 50L, 7L, 1L), (2L, 50L, 8L, 1L),
      (3L, 75L, 7L, 1L), (3L, 75L, 8L, 1L),
      (4L, 100L, 7L, 2L), (4L, 100L, 8L, 1L)))
  }

  test("shardManifest: totals cover the corpus exactly once; " +
    "checksum is partition-order-independent and content-sensitive") {
    val docs = (0L until 50L).map(i =>
        (i, Seq.fill(3 + (i % 5).toInt)(s"tok$i").mkString(" "), "s", "en"))
      .toDF("doc_id", "text", "source", "lang")
    def run(df: org.apache.spark.sql.DataFrame) =
      Pipeline.shardManifest(df, numShards = 4)
        .as[(Int, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val out = run(docs)
    assert(out.map(_._2).sum === 50L) // every doc in exactly one shard
    assert(out.map(_._3).sum ===
      (0L until 50L).map(i => 3 + (i % 5)).sum)
    assert(run(docs.repartition(7)) === out)
    // flipping one document's content changes the manifest (the md5
    // tiebreak may also reseat same-length docs, so the assertion is
    // sensitivity, not locality) while the corpus totals hold
    val flipped = docs.withColumn("text",
      org.apache.spark.sql.functions.when($"doc_id" === 7L,
        org.apache.spark.sql.functions.regexp_replace($"text", "tok7", "kot7"))
        .otherwise($"text"))
    val out2 = run(flipped)
    assert(out2.map(r => (r._2, r._3)).toSeq.map(_._1).sum === 50L)
    assert(out2.map(_._6).toSeq !== out.map(_._6).toSeq)
  }

  test("mixtureSolver: hand-checked plan — scarce language binds at " +
    "exactly the epoch cap, abundant language under-fills") {
    // en: 100 tokens → w=10; de: 400 tokens → w=20; W=30; cap=3.
    // cap_n: en (3·100·30)//10 = 900, de (3·400·30)//20 = 1800 →
    // N=900, en binding. planned: en 900·10//30=300, de 600.
    // epochs: en 300e6//100 = 3.0e6 (exactly the cap), de 1.5e6.
    val docs = Seq(
      (1L, Seq.fill(60)("w").mkString(" "), "s", "en"),
      (2L, Seq.fill(40)("w").mkString(" "), "s", "en"),
      (3L, Seq.fill(400)("w").mkString(" "), "s", "de")
    ).toDF("doc_id", "text", "source", "lang")
    val out = Pipeline.mixtureSolver(docs)
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out("en") === ((100L, 10L, 300L, 3000000L, true)))
    assert(out("de") === ((400L, 20L, 600L, 1500000L, false)))
  }

  test("clusterSafeFolds: dup clusters never straddle folds, " +
    "singletons rep themselves, partition-independent") {
    val text = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, text), (2L, text), // identical → one LSH cluster, rep 1
      (3L, (31 to 60).map(i => s"tok$i").mkString(" "))) // singleton
      .toDF("doc_id", "text")
    val out = graft.operators.Pipeline.clusterSafeFolds(docs, k = 5)
      .as[(Long, Long, Long)].collect()
    assert(out.length === 3)
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._2 === 1L && byId(2L)._2 === 1L)
    // the leakage guarantee: cluster members share the fold
    assert(byId(1L)._3 === byId(2L)._3)
    assert(byId(3L)._2 === 3L)
    assert(out.forall(r => r._3 >= 0L && r._3 < 5L))
    // identity form: every cluster maps to exactly one fold
    assert(graft.operators.Pipeline.clusterSafeFolds(docs, k = 5)
      .groupBy(col("cluster_rep"))
      .agg(countDistinct(col("fold")).as("nf"))
      .filter(col("nf") =!= 1L).isEmpty)
    assert(graft.operators.Pipeline
      .clusterSafeFolds(docs.repartition(7), k = 5)
      .as[(Long, Long, Long)].collect().toSet === out.toSet)
  }

  test("corpusDrift: hand-computed JS on a mirrored 2/1 vs 1/2 source " +
    "mix; identical mixes score exactly 0") {
    // A (even ids): s0×2, s1×1; B (odd): s0×1, s1×2 → p = (2/3, 1/3),
    // q mirrored. Quantized: l(4/3) = 287682, l(2/3) = −405466 →
    // Σ a·l1 = Σ b·l2 = 169898 micro-nats, JS = 2·(169898/6)/1e6
    val docs = Seq(
      (0L, "x y", "s0"), (2L, "x y", "s0"), (4L, "x y", "s1"),
      (1L, "x y", "s0"), (3L, "x y", "s1"), (5L, "x y", "s1")
    ).toDF("doc_id", "text", "source")
    val r = graft.operators.Pipeline.corpusDrift(docs).head()
    assert(r.getAs[Long]("n_sources") === 2L)
    assert(r.getAs[Long]("docs_a") === 3L && r.getAs[Long]("docs_b") === 3L)
    val exp = (169898.0 / 6.0 + 169898.0 / 6.0) / 1e6
    assert(r.getAs[Double]("js_docs_nats") === exp)
    // uniform 2-token docs: token mix ≡ doc mix, same divergence
    assert(r.getAs[Double]("js_tokens_nats") === exp)
    assert(math.abs(exp - (2.0 / 3 * math.log(4.0 / 3) +
      1.0 / 3 * math.log(2.0 / 3))) < 2e-6) // vs the analytic JS
    // identical mixes in both halves → every log ratio is ln 1 → 0
    val flat = Seq((0L, "x y", "s0"), (1L, "x y", "s0"),
      (2L, "x y", "s1"), (3L, "x y", "s1"))
      .toDF("doc_id", "text", "source")
    val r0 = graft.operators.Pipeline.corpusDrift(flat).head()
    assert(r0.getAs[Double]("js_docs_nats") === 0.0)
    assert(r0.getAs[Double]("js_tokens_nats") === 0.0)
    assert(graft.operators.Pipeline.corpusDrift(docs.repartition(5))
      .head() === r)
  }

  test("pruningCurve: grades rank by score, cumulative yield reaches " +
    "the whole corpus, partition-independent") {
    // scores: A "a b c d" = 1.0 (all distinct, all alnum);
    // C "x y !!" = 1 · 4/6 ≈ 0.667; D "m m n n" = 0.5; B "a a a a" =
    // 0.25 → two grades of two docs each
    val docs = Seq(
      (1L, "a b c d"), (2L, "a a a a"), (3L, "x y !!"), (4L, "m m n n")
    ).toDF("doc_id", "text")
    val out = graft.operators.Pipeline.pruningCurve(docs, nBuckets = 2)
      .orderBy("bucket")
      .as[(Long, Double, Long, Long, Long, Long, Double)].collect()
    assert(out.length === 2)
    val (b0, b1) = (out(0), out(1))
    assert(b0._1 === 0L && b0._3 === 2L && b0._4 === 7L &&
      b0._5 === 2L && b0._6 === 7L)
    assert(math.abs(b0._2 - 4.0 / 6.0) < 1e-12) // grade floor = C's score
    assert(math.abs(b0._7 - 7.0 / 15.0) < 1e-12)
    assert(b1._1 === 1L && b1._2 === 0.25 && b1._3 === 2L &&
      b1._5 === 4L && b1._6 === 15L && b1._7 === 1.0)
    // the cut is rank-stable under physical layout
    val re = graft.operators.Pipeline
      .pruningCurve(docs.repartition(5), nBuckets = 2)
      .orderBy("bucket")
      .as[(Long, Double, Long, Long, Long, Long, Double)].collect()
    assert(re.toSeq === out.toSeq)
  }
}
