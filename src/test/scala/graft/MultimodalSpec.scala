package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((0L, "hello world"), (1L, "abc"))
    .toDF("doc_id", "text")

  test("binaryMeta: byte length, md5, head bytes of the payload") {
    val r = Multimodal.binaryMeta(docs).orderBy("doc_id").collect()
    assert(r(0).getAs[Int]("byte_len") === 11)
    assert(r(1).getAs[String]("content_md5") ===
      "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
    assert(r(1).getAs[String]("head_hex") === "616263")
  }

  test("decodeMeta: stub decoder is deterministic arithmetic on md5") {
    val r = Multimodal.decodeMeta(docs).orderBy("doc_id").collect()
    val h = java.lang.Long.parseLong("900150983cd24fb", 16) // md5("abc")
    val row1 = r(1)
    assert(row1.getAs[Long]("byte_len") === 3L)
    assert(row1.getAs[Long]("width") === 64L + h % 193L)
    assert(row1.getAs[Long]("height") === 64L + (h / 193L) % 129L)
    assert(row1.getAs[Long]("n_frames") === 1L + 3L % 7L)
  }

  test("decodeMeta plumbing survives multiple partitions") {
    val many = spark.range(100)
      .selectExpr("id AS doc_id", "concat('doc ', id) AS text")
      .repartition(7)
    val out = Multimodal.decodeMeta(many)
    assert(out.count() === 100)
    assert(out.select("doc_id").distinct().count() === 100)
  }
  test("imageFilter: rules match decoded metadata, conjunction binds") {
    val docs = Seq(
      (0L, "tiny"),                              // 4 bytes: fails bytes
      (1L, ("x" * 100))                          // 100 bytes: passes bytes
    ).toDF("doc_id", "text")
    val meta = Multimodal.decodeMeta(docs)
      .as[Multimodal.MediaMeta].collect().map(m => m.doc_id -> m).toMap
    val out = Multimodal.imageFilter(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!out(0L).getAs[Boolean]("rule_bytes"))
    assert(out(1L).getAs[Boolean]("rule_bytes"))
    out.foreach { case (id, r) =>
      val m = meta(id)
      assert(r.getAs[Long]("width") === m.width)
      assert(r.getAs[Long]("height") === m.height)
      val aspect = math.max(m.width, m.height).toDouble /
        math.min(m.width, m.height)
      assert(r.getAs[Double]("aspect") === aspect)
      assert(r.getAs[Boolean]("image_ok") ===
        (r.getAs[Boolean]("rule_min_dim") &&
          r.getAs[Boolean]("rule_aspect") &&
          r.getAs[Boolean]("rule_bytes")))
    }
  }

  test("visionTokens: patch grid + CLS, budget gate binds") {
    val decoded = Seq(
      (1L, 64L, 64L),    // 2×2 patches → 5 tokens, fits
      (2L, 256L, 256L),  // 8×8 → 65 tokens, over the 64 budget
      (3L, 31L, 100L)    // narrower than one patch → 0 patches, 1 token
    ).toDF("doc_id", "width", "height")
    val out = Multimodal.visionTokens(decoded)
      .select("doc_id", "n_patches", "vision_tokens", "fits_budget")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out === Array(
      (1L, 4L, 5L, true), (2L, 64L, 65L, false), (3L, 0L, 1L, true)))
  }

  test("aspectBuckets: exact nearest-ratio argmin with ladder tie-break") {
    val decoded = Seq(
      (1L, 100L, 100L),  // exactly 1:1
      (2L, 160L, 90L),   // exactly 16:9
      (3L, 90L, 160L),   // 16:9 portrait
      (4L, 4000L, 3000L), // 4:3
      (5L, 150L, 100L),  // 3:2
      (6L, 250L, 100L),  // 2.5 → nearest is 2:1
      (7L, 9L, 8L)       // 1.125 = midway 1:1 / 5:4 → ladder-first 1:1
    ).toDF("doc_id", "width", "height")
    val out = Multimodal.aspectBuckets(decoded)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String, String)].collect()
    assert(out.map(r => (r._4, r._5)) === Array(
      ("landscape", "1:1"), ("landscape", "16:9"), ("portrait", "16:9"),
      ("landscape", "4:3"), ("landscape", "3:2"), ("landscape", "2:1"),
      ("landscape", "1:1")))
  }

  test("multimodalPack: combined cost = text + vision tokens; " +
    "per-shard layout gapless; spanning math exact at a small seqLen") {
    val docs = (0L until 20L).map(i =>
        (i, Seq.fill(5 + (i % 7).toInt)(s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val seqLen = 50L
    val out = Multimodal.multimodalPack(docs, seqLen = seqLen,
        numShards = 4)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    val vis = Multimodal.visionTokens(Multimodal.decodeMeta(docs))
      .select("doc_id", "vision_tokens")
      .as[(Long, Long)].collect().toMap
    assert(out.length === 20)
    out.foreach { case (id, _, txt, v, n, _, _, _) =>
      assert(v === vis(id) && n === txt + v)
    }
    // within each shard: tok_start (= seq_id·seqLen + offset) chains
    // gaplessly, and n_seqs_spanned counts the windows the doc crosses
    out.groupBy(_._2).values.foreach { shard =>
      val rows = shard.map { case (_, _, _, _, n, sid, off, span) =>
        (sid * seqLen + off, n, span)
      }.sortBy(_._1)
      rows.zip(rows.scanLeft(0L)(_ + _._2)).foreach {
        case ((start, n, span), expectedStart) =>
          assert(start === expectedStart)
          assert(span === (start + n - 1) / seqLen - start / seqLen + 1)
      }
      // the fixture's docs exceed one window per shard, so at least
      // one doc must span a boundary
      assert(rows.map(_._3).max >= 2L)
    }
  }

  test("smartResize: hand-computed snap / shrink / expand branches; " +
    "shrink never exceeds the pixel cap") {
    import spark.implicits._
    val decoded = Seq(
      (1L, 200L, 150L), // snap 196×140 > cap → shrink to 140×84
      (2L, 64L, 64L),   // snaps to 56×56 = exactly minPixels: kept
      (3L, 32L, 32L),   // snap 28×28 < min → expand ×1.75 to 56×56
      (4L, 400L, 28L)   // ultra-wide, inside budget: snap only
    ).toDF("doc_id", "width", "height")
    val out = graft.operators.Multimodal.smartResize(decoded)
      .select("doc_id", "target_w", "target_h", "n_patches", "n_tokens")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) === ((140L, 84L, 60L, 15L)))
    assert(out(2L) === ((56L, 56L, 16L, 4L)))
    assert(out(3L) === ((56L, 56L, 16L, 4L)))
    assert(out(4L) === ((392L, 28L, 56L, 14L)))
    // cap invariant across a dimension sweep (the floor-shrink proof)
    val sweep = (1L to 60L).flatMap(i => Seq((i, 60 + 7 * i, 310 - 4 * i)))
      .toDF("doc_id", "width", "height")
    val caps = graft.operators.Multimodal.smartResize(sweep)
      .select("target_w", "target_h").as[(Long, Long)].collect()
    assert(caps.forall { case (w, h) => w * h <= 15680L })
    assert(caps.forall { case (w, h) => w % 28 == 0 && h % 28 == 0 })
  }

  test("StubFeaturizer: one 60-bit hash per byte 4-gram, hash60 " +
      "algebra, short payloads empty") {
    val out = Multimodal.StubFeaturizer.featurizeBatch(Iterator(
      (1L, "abcdef".getBytes("UTF-8")), (2L, "abc".getBytes("UTF-8"))))
      .toMap
    assert(out(2L).isEmpty) // < 4 bytes: no shingle
    assert(out(1L).length === 3) // "abcd","bcde","cdef"
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_))
        .mkString.take(15), 16)
    assert(out(1L).toSeq === Seq(h60("abcd"), h60("bcde"), h60("cdef")))
  }

  /** Deterministic non-repetitive fixture text (explicit LCG — no
    * dependence on scala.util.Random's implementation).
    */
  private def lcgText(n: Int, seed: Long): String = {
    val sb = new StringBuilder
    var x = seed
    (0 until n).foreach { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      sb.append(('a' + ((x >>> 33) % 26)).toChar)
    }
    sb.toString
  }

  test("mediaNearDupSurvivors: exact copy and tail-edited copy " +
      "cluster with the base, unrelated doc stays out, canonical = " +
      "largest payload then smallest id; partitioning-independent") {
    val base = lcgText(2000, 12345L)
    val media = Seq(
      (10L, base),              // base
      (11L, base),              // exact duplicate: fingerprint hamming 0
      (12L, base + "zq"),       // 2 appended chars: 2 of 1999 shingles new
      (40L, lcgText(2000, 777L)) // unrelated payload
    ).toDF("doc_id", "text")
    // the fixture's premise, asserted: the tail edit stays inside the
    // banded hamming radius, the unrelated doc far outside it
    val fp = Multimodal.mediaFingerprint(media)
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(fp(a) ^ fp(b))
    assert(fp(10L) === fp(11L))
    assert(ham(10L, 12L) <= 3, s"tail-edit hamming ${ham(10L, 12L)}")
    assert(ham(10L, 40L) > 3)
    val out = Multimodal.mediaNearDupSurvivors(media)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.length === 1) // one cluster; the unrelated doc absent
    val (rep, canon, bytes, nDocs, nRemoved) = out.head
    assert(rep === 10L)
    assert(canon === 12L) // largest payload (2002 bytes) wins
    assert(bytes === 2002L)
    assert((nDocs, nRemoved) === ((3L, 2L)))
    // equal-length tie inside a cluster: smallest doc_id
    val tie = Multimodal.mediaNearDupSurvivors(
      Seq((7L, base), (3L, base)).toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(tie.head._1 === 3L && tie.head._2 === 3L)
    // partitioning-independence of the full compose
    val repart = Multimodal.mediaNearDupSurvivors(media.repartition(7))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(repart.sorted.toSeq === out.sorted.toSeq)
  }

  test("mediaNearDupSurvivors: featureless payloads (< 4 bytes) are " +
      "excluded, never merged as fake hamming-0 duplicates") {
    // ADVICE r18: every < 4-byte payload has an EMPTY feature array,
    // so all of them share simhash 0 — unfiltered, three unrelated
    // tiny payloads would merge into one "near-dup" cluster.
    val base = lcgText(2000, 9L)
    val media = Seq(
      (1L, "a"), (2L, "xy"), (3L, "pqr"), // featureless, all unrelated
      (20L, base), (21L, base)            // one real dup pair
    ).toDF("doc_id", "text")
    val out = Multimodal.mediaNearDupSurvivors(media)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.length === 1) // ONLY the real pair clusters
    assert(out.head._1 === 20L && out.head._4 === 2L)
  }

  test("multimodalFunnel: stage rows reconcile with the component " +
      "gates (m06 rules, m11 survivors, m08 token budget); attrition " +
      "monotone in docs, bytes, and tokens") {
    import org.apache.spark.sql.functions.{col, expr, sum => fsum}
    // seed 1: the 2000-char payload's stub-decoded dims (213×180)
    // PASS the m06 rules, so the dup pair reaches stage 2
    val base = lcgText(2000, 1L)
    val docs = (Seq((100L, base), (101L, base)) ++ // one near-dup pair
      (0L until 30L).map(i =>
        (i, lcgText(120 + 37 * i.toInt % 600, 1000L + i))))
      .toDF("doc_id", "text")
    val f = Multimodal.multimodalFunnel(docs).orderBy("stage").collect()
    assert(f.map(_.getAs[String]("stage_name")).toSeq ===
      Seq("raw", "image_rules", "neardup_canonical", "token_budget"))
    def nums(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_bytes"),
        r.getAs[Long]("n_vision_tokens"))
    // monotone attrition across all three measures
    (0 to 2).foreach { i =>
      val (d0, b0, v0) = nums(f(i)); val (d1, b1, v1) = nums(f(i + 1))
      assert(d1 <= d0 && b1 <= b0 && v1 <= v0, s"stage $i -> ${i + 1}")
    }
    // stage 0: whole-corpus totals
    assert(nums(f(0))._1 === 32L)
    // stage 1 reconciles with m06's image_ok verdict
    val okDocs = Multimodal.imageFilter(docs).filter(col("image_ok"))
    assert(nums(f(1))._1 === okDocs.count())
    // stage 2 reconciles with m11 over the stage-1 survivors: each
    // cluster keeps exactly its canonical, so docs fall by Σ n_removed
    val surv = docs.join(okDocs.select(col("doc_id")), Seq("doc_id"),
      "left_semi")
    val removed = Multimodal.mediaNearDupSurvivors(surv)
      .agg(fsum(col("n_removed"))).collect().head.getLong(0)
    assert(nums(f(2))._1 === nums(f(1))._1 - removed)
    // the fixture's dup pair survives the rules, so stage 2 drops ≥ 1
    assert(removed >= 1L)
    // stage 3 reconciles with m08's arithmetic at the funnel's budget:
    // count survivors whose vision tokens exceed 24 among stage-2 docs
    val tok = Multimodal.visionTokens(Multimodal.decodeMeta(docs))
      .select(col("doc_id"), col("vision_tokens"))
    // stage-2 survivor ids = ok ids minus the removed non-canonicals;
    // reconstruct via the funnel identity instead: stage3 must equal
    // the number of stage-2 docs fitting the budget, which is bounded
    // by the all-docs fit count and at least stage2 - all-docs misses
    val fitsAll = tok.filter(col("vision_tokens") <= 24).count()
    val missAll = tok.filter(col("vision_tokens") > 24).count()
    assert(nums(f(3))._1 <= fitsAll)
    assert(nums(f(3))._1 >= nums(f(2))._1 - missAll)
    // the fixture spans the token range, so the budget gate is real
    assert(missAll >= 1L && fitsAll >= 1L)
    // partitioning-independence of the whole funnel compose
    val rep = Multimodal.multimodalFunnel(docs.repartition(7))
      .orderBy("stage").collect()
    assert(rep.map(nums).toSeq === f.map(nums).toSeq)
  }
}
