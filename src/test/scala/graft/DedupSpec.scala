package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "s0"),
    (1L, "the quick brown fox jumps over the lazy dog", "s0"), // exact dup
    (2L, "the quick brown fox jumps over the lazy cat", "s0"), // near dup
    (3L, "completely different words appear in this one here", "s1"),
    (4L, "completely different words appear in this one here", "s1")
  ).toDF("doc_id", "text", "source")

  test("exactDedup collapses identical texts, keeps min doc_id") {
    val out = Dedup.exactDedup(docs)
      .orderBy("first_doc_id")
      .select("first_doc_id", "n_dups").as[(Long, Long)].collect()
    assert(out === Array((0L, 2L), (2L, 1L), (3L, 2L)))
  }

  test("minhash signatures are equal iff shingle sets are equal") {
    val sig = Dedup.minhashSignature(docs).orderBy("doc_id").collect()
    assert(sig(0).toSeq.tail === sig(1).toSeq.tail) // dup: same sig
    assert(sig(3).toSeq.tail === sig(4).toSeq.tail)
    assert(sig(0).toSeq.tail !== sig(3).toSeq.tail) // unrelated differ
  }

  test("lshCandidatePairs surfaces duplicate pairs, ordered a<b") {
    val pairs = Dedup.lshCandidatePairs(Dedup.minhashSignature(docs))
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L))) // identical docs always collide
    assert(pairs.contains((3L, 4L)))
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("incrementalLshDedup: batch anchor equals a sequential online " +
    "replay; short docs trivially kept; streaming per-bucket state " +
    "path agrees") {
    val corpus = docs.union(Seq(
      (5L, "the quick brown fox jumps over the lazy dog", "s0"), // dup of 0
      (6L, "yo hi", "s2") // too short for a shingle: no bands, kept
    ).toDF("doc_id", "text", "source"))
    val out = Dedup.incrementalLshDedup(corpus)
      .as[(Long, Boolean, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    // sequential online replay over independently re-derived buckets:
    // first occupant of each bucket wins, every arrival registers
    val bk = Dedup.minhashSignature(corpus)
      .select(col("doc_id"), explode(array((0 until 4).map { j =>
        md5(concat_ws("|", lit(j), col(s"m${2 * j}"),
          col(s"m${2 * j + 1}")))
      }: _*)).as("bk"))
      .as[(Long, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSeq).toMap
    val degenerate = (0 until 4).map { j =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j".getBytes("UTF-8")).map("%02x".format(_)).mkString
    }.toSet
    val firstOccupant = scala.collection.mutable.Map.empty[String, Long]
    val replay = corpus.select(col("doc_id")).as[Long].collect().sorted
      .map { id =>
        val buckets = bk.getOrElse(id, Seq.empty)
          .filterNot(degenerate)
        val earlier = buckets.flatMap(firstOccupant.get).filter(_ < id)
        buckets.foreach(b =>
          if (!firstOccupant.contains(b)) firstOccupant(b) = id)
        id -> ((earlier.isEmpty,
          if (earlier.isEmpty) None else Some(earlier.min)))
      }.toMap
    assert(out === replay)
    assert(out(5L) === ((false, Some(0L)))) // dup-of-dup → FIRST arrival
    assert(out(6L) === ((true, None)))      // no bands → kept

    // unbounded path: streamingDedupFirst keyed per bucket IS the
    // online index — replaying its (bucket → first doc) table through
    // the same algebra reproduces the batch verdicts
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long)]
    val q = graft.streaming.StreamingOps.streamingDedupFirst(mem.toDS())
      .writeStream.format("memory").queryName("lsh_idx")
      .outputMode("append").start()
    try {
      // strict arrival order: one doc's buckets per micro-batch
      corpus.select(col("doc_id")).as[Long].collect().sorted.foreach {
        id =>
          val rows = bk.getOrElse(id, Seq.empty).filterNot(degenerate)
            .map(b => (b, id))
          if (rows.nonEmpty) { mem.addData(rows: _*); q.processAllAvailable() }
      }
      val first = spark.sql("SELECT * FROM lsh_idx")
        .as[(String, Long)].collect().toMap
      val streamed = corpus.select(col("doc_id")).as[Long].collect()
        .map { id =>
          val earlier = bk.getOrElse(id, Seq.empty).filterNot(degenerate)
            .flatMap(first.get).filter(_ < id)
          id -> ((earlier.isEmpty,
            if (earlier.isEmpty) None else Some(earlier.min)))
        }.toMap
      assert(streamed === out)

      // st11's batch anchor emits exactly the docs the streamed
      // verdicts keep (the ingest filter's output contract)
      val st11 = graft.streaming.StreamingOps.ingestDedupBatch(corpus)
        .select(col("doc_id")).as[Long].collect().toSet
      assert(st11 === streamed.filter(_._2._1).keySet)
    } finally q.stop()
  }

  test("docs shorter than the shingle width never become LSH candidates") {
    val short = Seq(
      (10L, "one two", "s0"), (11L, "three four", "s0"), // < 3 words
      (12L, "a b c d e f", "s0"), (13L, "a b c d e f", "s0")
    ).toDF("doc_id", "text", "source")
    val pairs = Dedup.lshCandidatePairs(Dedup.minhashSignature(short))
      .as[(Long, Long)].collect().toSet
    // the two short docs must NOT pair via the degenerate null band
    assert(pairs === Set((12L, 13L)))
  }

  test("simhash: identical texts equal, hamming distance small for near-dups") {
    val sh = Dedup.simhash(docs).orderBy("doc_id").as[(Long, Long)]
      .collect().map(_._2)
    assert(sh(0) === sh(1))
    val near = java.lang.Long.bitCount(sh(0) ^ sh(2))
    val far = java.lang.Long.bitCount(sh(0) ^ sh(3))
    assert(near <= 24, s"near-dup hamming=$near of 64")
    assert(near < far, s"near ($near) should beat unrelated ($far)")
    // hash60 < 2^60, so bits 60-63 are never set
    assert(sh.forall(v => v >= 0 && v < (1L << 60)))
  }

  test("ngramJaccardPairs computes |A∩B|/|A∪B| within source blocks") {
    val out = Dedup.ngramJaccardPairs(docs, 0.0)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out((0L, 1L)) === 1.0)
    assert(out((3L, 4L)) === 1.0)
    // fox-doc vs cat-doc distinct words: 7 shared of 9 union
    assert(math.abs(out((0L, 2L)) - 7.0 / 9.0) < 1e-15)
    // cross-source pair (0,3) must not appear: blocked
    assert(!out.contains((0L, 3L)))
  }

  test("simhashNearDups pairs identical docs and verifies hamming") {
    val out = Dedup.simhashNearDups(docs)
      .as[(Long, Long, Long)].collect().toSet
    assert(out.contains((0L, 1L, 0L))) // identical → hamming 0
    assert(out.contains((3L, 4L, 0L)))
    assert(out.forall { case (a, b, h) => a < b && h <= 3 })
  }

  test("simhashNearDups maxBucket caps a degenerate hot band") {
    // 50 identical docs collapse to ONE sketch → every band is a hot
    // bucket of 50; an uncapped join would emit 50·49/2 pairs per band
    val degen = (0L until 50L).map(i => (i, "same text every time", "s0"))
      .toDF("doc_id", "text", "source")
    val capped = Dedup.simhashNearDups(degen, maxBucket = 10)
    assert(capped.isEmpty, "buckets over the cap must be skipped")
    val uncapped = Dedup.simhashNearDups(degen, maxBucket = 1000)
    assert(uncapped.count() === 50L * 49 / 2)
  }

  test("ngramJaccardPairs maxBlock skips oversized source blocks") {
    // block s0 has 3 docs (over a cap of 2) → contributes no pairs;
    // block s1 stays under the cap and still pairs
    val out = Dedup.ngramJaccardPairs(docs, 0.0, maxBlock = 2)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    assert(out === Set((3L, 4L)))
  }

  test("containmentPairs detects subset docs that Jaccard misses") {
    // doc 5's word set is a strict subset of doc 0's: containment from
    // the small side is 1.0 while Jaccard is only 4/8
    val d = docs.union(Seq((5L, "the quick brown fox", "s0"))
      .toDF("doc_id", "text", "source"))
    val out = Dedup.containmentPairs(d, 0.9)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out((0L, 5L)) === ((0.5, 1.0)))
    assert(out((0L, 1L)) === ((1.0, 1.0)))
    // the same threshold on Jaccard misses the subset pair entirely
    val jac = Dedup.ngramJaccardPairs(d, 0.9)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    assert(!jac.contains((0L, 5L)))
    // near-dup (7/8 overlap) pair stays below the 0.9 bar both ways
    assert(!out.contains((0L, 2L)))
  }

  test("bloomDecontaminate and containmentPairs are partitioning-independent") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta", "b"))
      .toDF("doc_id", "text", "source")
    val d13a = Dedup.bloomDecontaminate(docs, bench)
      .as[(Long, Long, Boolean)].collect().toSet
    val d13b = Dedup.bloomDecontaminate(docs.repartition(7),
      bench.repartition(3)).as[(Long, Long, Boolean)].collect().toSet
    assert(d13a === d13b)
    val d14a = Dedup.containmentPairs(docs, 0.5)
      .as[(Long, Long, Double, Double)].collect().toSet
    val d14b = Dedup.containmentPairs(docs.repartition(7), 0.5)
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(d14a === d14b && d14a.nonEmpty)
  }

  test("dupClusters: transitive closure labels components by min doc_id") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val out = Dedup.dupClusters(pairs).orderBy("doc_id")
      .as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L)))
  }

  test("dupClustersShortcut: pointer jumping collapses a long chain fast") {
    // path graph 0-1-2-…-39: plain propagation needs ~40 rounds (the
    // default maxIters=20 would NOT converge); shortcutting must label
    // the whole chain 0 within its default budget
    val chain = (0L until 39L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = Dedup.dupClustersShortcut(chain)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.length === 40)
    assert(out.forall(_._2 === 0L), "every chain node labels to the min")
    // equivalence with the plain fixpoint (given enough rounds) on a
    // mixed shape: two components + a triangle
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (7L, 9L), (9L, 8L))
      .toDF("doc_a", "doc_b")
    val fast = Dedup.dupClustersShortcut(pairs)
      .as[(Long, Long)].collect().toSet
    val slow = Dedup.dupClusters(pairs)
      .as[(Long, Long)].collect().toSet
    assert(fast === slow)
  }

  test("dedupAgainstCorpus: exact membership + LSH candidate counts") {
    val corpus = docs.filter("doc_id IN (0, 3)")
    val batch = docs.filter("doc_id IN (1, 2, 4)")
    val out = Dedup.dedupAgainstCorpus(batch, corpus)
      .orderBy("doc_id").as[(Long, Boolean, Long)].collect()
    // doc1 = exact dup of corpus doc0; doc4 = exact dup of corpus doc3;
    // doc2 is a near-dup of doc0 only
    assert(out.map(r => (r._1, r._2)).toSeq ===
      Seq((1L, true), (2L, false), (4L, true)))
    assert(out(0)._3 >= 1L) // identical doc always shares bands
    assert(out(2)._3 >= 1L)
  }

  test("decontaminate flags batch docs sharing a 5-shingle with the benchmark") {
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta", "b")
    ).toDF("doc_id", "text", "source")
    val batch = Seq(
      // shares the 5-shingle "beta gamma delta epsilon zeta"
      (1L, "x beta gamma delta epsilon zeta y", "s"),
      (2L, "totally unrelated words in this document here", "s"),
      (3L, "al be ga", "s") // < 5 words: no shingles at all
    ).toDF("doc_id", "text", "source")
    val out = Dedup.decontaminate(batch, bench)
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(out.map(r => (r._1, r._3)) ===
      Seq((1L, true), (2L, false), (3L, false)))
    assert(out.head._2 >= 1L)
  }

  test("bloomDecontaminate flags the planted overlap and nothing else") {
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta", "b")
    ).toDF("doc_id", "text", "source")
    val batch = Seq(
      // shares the 5-shingle "beta gamma delta epsilon zeta"
      (1L, "x beta gamma delta epsilon zeta y", "s"),
      (2L, "totally unrelated words in this document here", "s"),
      (3L, "al be ga", "s") // < 5 words: no shingles, never flagged
    ).toDF("doc_id", "text", "source")
    val out = Dedup.bloomDecontaminate(batch, bench)
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(out.map(r => (r._1, r._3)) ===
      Seq((1L, true), (2L, false), (3L, false)))
    assert(out.head._2 >= 1L)
    // sketch agrees with the exact operator on this fixture (no false
    // positives at mBits=2^16 — deterministic hashes, so stable)
    val exact = Dedup.decontaminate(batch, bench)
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(out.map(r => (r._1, r._3)) === exact.map(r => (r._1, r._3)))
    // a tiny filter (64 bits) must STILL flag the true positive —
    // Bloom filters have no false negatives at any size
    val tiny = Dedup.bloomDecontaminate(batch, bench, mBits = 64)
      .filter(col("doc_id") === 1L).as[(Long, Long, Boolean)].head()
    assert(tiny._3)
  }

  test("embeddingNearDups finds the planted duplicate vector pair") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.0f, 0.0f), 0),  // dup of 0, same label
      (2L, Array(0.0f, 1.0f, 0.0f), 0),  // orthogonal
      (3L, Array(1.0f, 0.0f, 0.0f), 1)   // dup of 0, other label: blocked
    ).toDF("vec_id", "embedding", "label")
    val out = Dedup.embeddingNearDups(emb, 0.99)
      .as[(Long, Long, Double)].collect()
    assert(out.map(r => (r._1, r._2)).toSet === Set((0L, 1L)))
    assert(out.head._3 === 1.0)
  }

  test("embeddingNearDups maxBlock skips a hot label block") {
    // label 0 holds 40 identical vectors (an uncapped block would emit
    // 40·39/2 pairs); label 1 stays under the cap and still pairs
    val hot = (0L until 40L).map(i => (i, Array(1.0f, 0.0f), 0))
    val cool = Seq((100L, Array(0.0f, 1.0f), 1), (101L, Array(0.0f, 1.0f), 1))
    val emb = (hot ++ cool).toDF("vec_id", "embedding", "label")
    val capped = Dedup.embeddingNearDups(emb, 0.99, maxBlock = 10)
      .as[(Long, Long, Double)].collect()
    assert(capped.map(r => (r._1, r._2)).toSet === Set((100L, 101L)),
      "hot-label pairs must be skipped, cool-label pairs kept")
    val uncapped = Dedup.embeddingNearDups(emb, 0.99, maxBlock = 1000)
    assert(uncapped.count() === 40L * 39 / 2 + 1)
    // the skip is surfaced, not silent: exactly one label is over-cap
    assert(Dedup.overCapLabels(emb, maxBlock = 10) === 1L)
    assert(Dedup.overCapLabels(emb, maxBlock = 1000) === 0L)
  }

  test("dupClustersShortcut throws rather than return non-converged labels") {
    // a 6-node path cannot converge in a single pointer-jumping round;
    // exiting silently would hand back known-wrong (non-component-min)
    // labels on a hash-gated surface
    val chain = (0L until 5L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val ex = intercept[IllegalStateException] {
      Dedup.dupClustersShortcut(chain, maxIters = 1)
    }
    assert(ex.getMessage.contains("did not converge"))
  }
  test("segmentDedup keeps globally-first segments, rebuilds docs") {
    val docs = Seq(
      (0L, "a b c d e f g h i j"),   // segs: "a b c d e", "f g h i j"
      (1L, "a b c d e x y z w v"),   // first seg duplicates doc 0's
      (2L, "q r s"),                 // one short tail segment
      (3L, "f g h i j")              // entirely duplicated -> empty
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(out === Array(
      (0L, 2L, 2L, "a b c d e f g h i j"),
      (1L, 2L, 1L, "x y z w v"),
      (2L, 1L, 1L, "q r s"),
      (3L, 1L, 0L, "")))
    // first-occurrence rule is a total order on (doc_id, seg_idx):
    // identical under any input partitioning
    val rep = Dedup.segmentDedup(docs.repartition(7))
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(rep === out)
  }
  test("dedupWeights: 1/cluster-size, singletons weigh 1.0") {
    val clusters = Seq((0L, 0L), (1L, 0L), (3L, 3L), (4L, 3L))
      .toDF("doc_id", "cluster_rep")
    val out = Dedup.dedupWeights(docs, clusters)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(out === Array(
      (0L, 2L, 0.5), (1L, 2L, 0.5), (2L, 1L, 1.0),
      (3L, 2L, 0.5), (4L, 2L, 0.5)))
  }

  test("jaccardEstimatePairs: identical docs estimate and verify at 1.0") {
    val text = "alpha beta gamma delta epsilon"
    val docs = Seq((0L, text), (1L, text),
      (2L, "zeta eta theta iota kappa lambda"))
      .toDF("doc_id", "text")
    val out = Dedup.jaccardEstimatePairs(docs)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(out === Array((0L, 1L, 1.0, 1.0, 0.0)))
  }

  test("bbitMinhashPairs: identical docs estimate 1.0 at both widths; " +
    "b-bit agreement dominates full-width agreement") {
    val text = "alpha beta gamma delta epsilon"
    val docs = Seq((0L, text), (1L, text),
      (2L, "zeta eta theta iota kappa lambda"))
      .toDF("doc_id", "text")
    val out = Dedup.bbitMinhashPairs(docs)
      .as[(Long, Long, Double, Double, Double, Double, Double)].collect()
    // identical docs: full sig equal → low bits equal → both
    // estimators at exactly 1.0 ((4·8 − 8)/24 = 1), zero error
    assert(out === Array((0L, 1L, 1.0, 1.0, 1.0, 0.0, 0.0)))

    // near-dup corpus: full-width value agreement IMPLIES low-bit
    // agreement, so est_bbit ≥ (4·(8·est_full) − 8)/24 on every pair,
    // and the corrected estimator never exceeds 1
    val near = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today ok"),
      (1L, "the quick brown fox jumps over the lazy cat today ok"),
      (2L, "the quick brown fox jumps over the lazy dog today ok"))
      .toDF("doc_id", "text")
    val rows = Dedup.bbitMinhashPairs(near)
      .as[(Long, Long, Double, Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, estF, estB, exact, errF, errB) =>
      assert(estB >= (4.0 * (8 * estF) - 8) / 24 - 1e-12)
      assert(estB <= 1.0 + 1e-12)
      assert(math.abs(errF - math.abs(estF - exact)) < 1e-12)
      assert(math.abs(errB - math.abs(estB - exact)) < 1e-12)
    }
  }

  test("editDistancePairs: exact char-level verdicts; length-" +
    "incompatible candidates skip the kernel with NULL distance") {
    val base = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (0L, base), (1L, base), // identical: lev 0, sim 100
      (2L, "alpha beta gamma delta epsilox"), // one char: lev 1
      (3L, base + " " + base + " " + base) // 3×: length filter fires
    ).toDF("doc_id", "text")
    val out = Dedup.editDistancePairs(docs)
      .as[(Long, Long, Option[Long], Long, Option[Long], Boolean)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6)))
      .toMap
    assert(out((0L, 1L)) === ((Some(0L), 30L, Some(100L), true)))
    assert(out((0L, 2L)) === ((Some(1L), 30L, Some(96L), true)))
    // (92 − 62)·100 = 3000 > 20·92: hopeless — kernel skipped, the
    // verdict still exact (lev ≥ length diff forces sim < 80)
    assert(out((0L, 3L)) === ((None, 92L, None, false)))
    assert(out((1L, 3L)) === ((None, 92L, None, false)))
    // tightening τ flips the one-char pair, never the identical one
    val strict = Dedup.editDistancePairs(docs, tauPct = 100)
      .as[(Long, Long, Option[Long], Long, Option[Long], Boolean)]
      .collect().map(r => (r._1, r._2) -> r._6).toMap
    assert(strict((0L, 1L)) && !strict((0L, 2L)))
  }

  test("lshDetectionCurve: analytic curve brackets the candidate flag") {
    val text = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (0L, text, "web"), (1L, text, "web"),
      (2L, "zeta eta theta iota kappa", "web"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.lshDetectionCurve(docs)
      .as[(Long, Long, Double, Double, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // identical docs: j = 1, p = 1, and the banding must find them
    assert(out((0L, 1L)) === ((1.0, 1.0, true)))
    // disjoint docs: j = 0, p = 0, not candidates
    assert(out((0L, 2L)) === ((0.0, 0.0, false)))
    assert(out((1L, 2L)) === ((0.0, 0.0, false)))
  }

  test("windowDupFrac: cross-doc and IN-doc repeated windows count") {
    val docs = Seq(
      (0L, "a b c d e f"),   // windows [a..e],[b..f]; first shared
      (1L, "a b c d e x"),   // windows [a..e],[b..x]; first shared
      // 3× repetition of a 5-word phrase: EVERY window content
      // recurs, so dup_frac = 1.0 — invisible to distinct-shingle
      // boilerplate but caught positionally
      (2L, "p q r s t p q r s t p q r s t")
    ).toDF("doc_id", "text")
    val out = Dedup.windowDupFrac(docs)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out === Array(
      (0L, 2L, 1L, 0.5), (1L, 2L, 1L, 0.5), (2L, 11L, 11L, 1.0)))
  }

  test("windowDupRemoval: drops high-dup docs, keeps short no-window docs") {
    val docs = Seq(
      (0L, "a b c d e f"),   // dup_frac 0.5 (first window shared with 1)
      (1L, "a b c d e x"),   // dup_frac 0.5
      (2L, "p q r s t p q r s t p q r s t"), // dup_frac 1.0 → dropped
      (3L, "u v w"),         // < 5 words: no windows, kept with 0.0
      (4L, "g h i j k l m")  // all windows unique, kept
    ).toDF("doc_id", "text")
    val out = Dedup.windowDupRemoval(docs, tau = 0.5)
      .select("doc_id", "n_windows", "n_dup_windows", "dup_frac")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out === Array(
      (0L, 2L, 1L, 0.5), (1L, 2L, 1L, 0.5),
      (3L, 0L, 0L, 0.0), (4L, 3L, 0L, 0.0)))
    // tightening the threshold drops the half-duplicated pair too
    val strict = Dedup.windowDupRemoval(docs, tau = 0.25)
      .select("doc_id").as[Long].collect().sorted
    assert(strict === Array(3L, 4L))
  }

  test("windowDupMask removes covered spans, keeps clean docs intact") {
    val docs = Seq(
      // docs 0/1 share their first 5-word window "a b c d e": in both,
      // positions 1..5 are covered (window start 1), tails survive
      (0L, "a b c d e f g"),
      (1L, "a b c d e x y"),
      (2L, "all words here are unique in corpus"), // untouched
      (3L, "u v")                                  // < k words: untouched
    ).toDF("doc_id", "text")
    val out = Dedup.windowDupMask(docs)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out === Array(
      (0L, 7L, 5L, "f g"),
      (1L, 7L, 5L, "x y"),
      (2L, 7L, 0L, "all words here are unique in corpus"),
      (3L, 2L, 0L, "u v")))
  }

  test("windowDupMask: in-doc repetition masks every covered position") {
    // "p q r s t" repeats 3x: every window recurs, all 15 words covered
    val docs = Seq(
      (0L, "p q r s t p q r s t p q r s t"),
      (1L, "calm unrelated filler words beyond any window here")
    ).toDF("doc_id", "text")
    val r = Dedup.windowDupMask(docs)
      .filter($"doc_id" === 0L)
      .as[(Long, Long, Long, String)].head()
    assert(r === ((0L, 15L, 15L, "")))
  }

  test("windowDupMask: fully-duplicated long doc stays linear and empties") {
    // 1000 words, EVERY position a duplicated-window start — the
    // pathological case the merged-interval kernel keeps O(words):
    // the quadratic per-position exists scan would do ~10^6 probes/doc.
    val phrase = (0 until 200).map(_ => "p q r s t").mkString(" ")
    val docs = Seq(
      (0L, phrase),
      // same phrase with a unique island in the middle: the island
      // words (and nothing else) survive masking — positions covered
      // by windows straddling the island boundary stay masked
      (1L, ((0 until 100).map(_ => "p q r s t") ++ Seq("lone island words")
        ++ (0 until 100).map(_ => "p q r s t")).mkString(" "))
    ).toDF("doc_id", "text")
    val out = Dedup.windowDupMask(docs)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out(0) === ((0L, 1000L, 1000L, "")))
    assert(out(1) === ((1L, 1003L, 1000L, "lone island words")))
  }

  test("clusterSizeHistogram: sizes, cluster counts, removable docs") {
    // two clusters of 2 and one cluster of 3
    val clusters = Seq((0L, 0L), (1L, 0L), (2L, 2L), (3L, 2L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("doc_id", "cluster_rep")
    val out = Dedup.clusterSizeHistogram(clusters)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out === Array((2L, 2L, 4L, 2L), (3L, 1L, 3L, 2L)))
  }

  test("sourceOverlapMatrix: shared shingles per source pair, zeros " +
    "kept, exact Jaccard") {
    def txt(tag: String) = (0 until 12).map(j => s"${tag}_w$j").mkString(" ")
    val docs = Seq(
      (0L, txt("x"), "s1"),  // 8 shingles, copied into s2
      (1L, txt("a"), "s1"),  // 8 shingles unique to s1
      (2L, txt("x"), "s2"),  // the shared doc
      (3L, txt("b"), "s3"),  // s3 shares nothing
      (4L, txt("c"), "s3")
    ).toDF("doc_id", "text", "source")
    val out = Dedup.sourceOverlapMatrix(docs)
      .as[(String, String, Long, Long, Long, Double)]
      .collect().sortBy(r => (r._1, r._2))
    // all 3 unordered pairs present, zeros included
    assert(out.map(r => (r._1, r._2)).toSeq ===
      Seq(("s1", "s2"), ("s1", "s3"), ("s2", "s3")))
    assert(out(0) === (("s1", "s2", 16L, 8L, 8L, 8.0 / 16.0)))
    assert(out(1) === (("s1", "s3", 16L, 16L, 0L, 0.0)))
    assert(out(2) === (("s2", "s3", 8L, 16L, 0L, 0.0)))
  }

  test("sketchOverlap: exact counts + HLL estimate inside the bound; " +
    "a zero bound flips the gate") {
    // 30 batch docs, 10 bench docs; bench docs 0-4 are verbatim
    // copies of batch docs 0-4 → a real shingle overlap, while the
    // rest of each side is disjoint vocabulary.
    def txt(side: String, i: Int) =
      (0 until 12).map(j => s"${side}_${i}_w$j").mkString(" ")
    val batch = (0 until 30).map(i => (i.toLong, txt("a", i)))
      .toDF("doc_id", "text")
    val bench = ((0 until 5).map(i => (100L + i, txt("a", i))) ++
      (5 until 10).map(i => (100L + i, txt("b", i))))
      .toDF("doc_id", "text")
    val out = Dedup.sketchOverlap(batch, bench)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length === 1)
    val (nA, nB, nOv, ok) = out.head
    // 12 words → 8 distinct 5-shingles per doc, all globally distinct
    assert(nA === 30L * 8)
    assert(nB === 10L * 8)
    assert(nOv === 5L * 8) // exactly the 5 copied docs' shingles
    assert(ok === 1L)
    // the gate CAN fail: at lgK=4 (16 registers, dense, real
    // estimation error on 240 items) a zero error budget rejects —
    // at the default lgK the sketch is still in sparse/exact mode
    // here, so the flip needs a genuinely lossy sketch
    val strict = Dedup.sketchOverlap(batch, bench, lgConfigK = 4,
        boundScale = 0.0)
      .as[(Long, Long, Long, Long)].collect().head
    assert(strict._4 === 0L)
  }

  test("cluster provenance rollup: members sorted, rep is the " +
    "member minimum, sizes match the labeling") {
    import org.apache.spark.sql.functions._
    val prov = Dedup.clusterMembers(
      Dedup.dupClusters(Dedup.lshCandidatePairs(
        Dedup.minhashSignature(docs))))
      .as[(Long, Long, String)].collect()
    assert(prov.nonEmpty)
    prov.foreach { case (rep, n, members) =>
      val ids = members.split('|').map(_.toLong)
      assert(ids.length === n)
      assert(ids.sorted.sameElements(ids))
      assert(ids.min === rep)
    }
  }

  test("prefixJaccardJoin: finds exactly the brute-force ≥ 4/5 pair " +
    "set (no false negatives, no false positives); partition-" +
    "independent") {
    // 1↔4 identical (J=1); 1↔2 share 9 of 11 distinct words
    // (J = 9/11 ≈ 0.818 ≥ 0.8); 3 is disjoint; 5 shares 7 of 10
    // with 1 (J = 7/13 ≈ 0.54 < 0.8)
    val w = (1 to 10).map(i => s"w$i")
    val pj = Seq(
      (1L, w.mkString(" ")),
      (2L, (w.drop(1) :+ "x1").mkString(" ")),
      (3L, (1 to 10).map(i => s"z$i").mkString(" ")),
      (4L, w.mkString(" ")),
      (5L, (w.take(7) ++ Seq("y1", "y2", "y3")).mkString(" "))
    ).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.prefixJaccardJoin(df)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val out = run(pj)
    // brute-force truth over all 10 pairs
    val sets = Map(1L -> w.toSet, 2L -> (w.drop(1) :+ "x1").toSet,
      3L -> (1 to 10).map(i => s"z$i").toSet, 4L -> w.toSet,
      5L -> (w.take(7) ++ Seq("y1", "y2", "y3")).toSet)
    val truth = (for {
      a <- sets.keys; b <- sets.keys if a < b
      i = (sets(a) intersect sets(b)).size
      u = (sets(a) union sets(b)).size
      if 5 * i >= 4 * u
    } yield (a, b)).toSet
    assert(truth === Set((1L, 2L), (1L, 4L), (2L, 4L)))
    assert(out === truth)
    assert(run(pj.repartition(7)) === out)
  }

  test("cdcChunkProfile: chunk accounting identities and the empty-doc " +
    "convention") {
    val text = (1 to 60).map(i => s"word$i").mkString(" ")
    val docs = Seq((1L, text), (2L, "")).toDF("doc_id", "text")
    val out = Dedup.cdcChunkProfile(docs).orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getAs[Long]("n_words") === 60L)
    assert(r1.getAs[Long]("n_chunks") >= 1L)
    assert(r1.getAs[Long]("max_chunk_words") <= 60L)
    assert(r1.getAs[Double]("mean_chunk_words") ===
      60.0 / r1.getAs[Long]("n_chunks"))
    // empty text is the [""] single-token convention: one "" chunk
    val r2 = out(1)
    assert(r2.getAs[Long]("n_words") === 1L)
    assert(r2.getAs[Long]("n_chunks") === 1L)
    assert(r2.getAs[Long]("max_chunk_words") === 1L)
  }

  test("cdcDedupStats: identical docs halve the chunk store; " +
    "distinct-word docs save nothing; partition-independent") {
    val text = (1 to 60).map(i => s"word$i").mkString(" ")
    val dup = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val r = Dedup.cdcDedupStats(dup).head()
    assert(r.getAs[Long]("n_words_total") === 120L)
    assert(r.getAs[Long]("n_words_saved") === 60L)
    assert(r.getAs[Double]("dedup_ratio") === 0.5)
    assert(r.getAs[Long]("n_chunk_occurrences") ===
      2L * r.getAs[Long]("n_distinct_chunks"))
    val solo = Seq((1L, text)).toDF("doc_id", "text")
    assert(Dedup.cdcDedupStats(solo).head()
      .getAs[Long]("n_words_saved") === 0L)
    assert(Dedup.cdcDedupStats(dup.repartition(7)).head() === r)
  }

  test("CDC chunks are insertion-robust: a head edit leaves the tail " +
    "chunks shared (the property fixed windows lack)") {
    val tail = (1 to 120).map(i => s"word$i").mkString(" ")
    val docs = Seq((1L, tail), (2L, s"inserted prefix $tail"))
      .toDF("doc_id", "text")
    val r = Dedup.cdcDedupStats(docs).head()
    // boundaries are content-defined, so past the first surviving
    // boundary doc 2's chunks are byte-identical to doc 1's — shared
    // chunk mass MUST appear (fixed k-word windows would shift every
    // segment and share nothing)
    assert(r.getAs[Long]("n_words_saved") > 0L,
      s"no shared chunks: $r")
    // the contrast: d15's fixed segments over the same pair share 0
    val fixedShared = Dedup.segmentDedup(docs)
      .agg(sum(col("n_segments") - col("n_kept"))).head().getLong(0)
    assert(fixedShared === 0L)
  }
}
