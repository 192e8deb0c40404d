package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("qualityScore computes the documented signals") {
    val docs = Seq((0L, "the the a b")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(docs).head()
    assert(r.getAs[Int]("n_chars_calc") === 11)
    assert(r.getAs[Int]("n_tokens") === 4)
    assert(r.getAs[Double]("avg_wlen") === 8.0 / 4)   // 3+3+1+1 chars
    assert(r.getAs[Double]("stopword_ratio") === 3.0 / 4)
    assert(r.getAs[Double]("uniq_ratio") === 3.0 / 4)
    assert(r.getAs[Double]("alnum_ratio") === 1.0) // all chars alnum/space
    assert(!r.getAs[Boolean]("quality_ok")) // < 30 tokens
  }

  test("tokenCounts: whitespace vs regex vs subword estimate") {
    val docs = Seq((0L, "alpha beta42 x")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(docs).head()
    assert(r.getAs[Int]("ws_tokens") === 3)
    // regex [a-z]+|[0-9]+|\S: alpha, beta, 42, x
    assert(r.getAs[Int]("re_tokens") === 4)
    // ceil(5/4)+ceil(6/4)+ceil(1/4) = 2+2+1
    assert(r.getAs[Long]("subword_est") === 5L)
  }

  test("fingerprints: md5 stable, rolling hash order-sensitive") {
    val docs = Seq(
      (0L, "a b c"), (1L, "a b c"), (2L, "c b a")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.fingerprints(docs).orderBy("doc_id").collect()
    assert(r(0).getString(1) === r(1).getString(1))
    assert(r(0).getLong(2) === r(1).getLong(2))
    assert(r(0).getLong(2) !== r(2).getLong(2)) // order matters
  }

  test("repetitionSignals: duplicate- and top-bigram fractions") {
    val docs = Seq(
      (0L, "a b a b a b"),   // bigrams: ab ba ab ba ab → 5, 2 distinct
      (1L, "v w x y z")      // 4 bigrams, all distinct
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(out(0) === ((0L, 5L, 2L, 3.0 / 5, 3.0 / 5)))
    assert(out(1) === ((1L, 4L, 4L, 0.0, 1.0 / 4)))
  }

  test("vocabulary: two-stage global rank equals the definitional order") {
    val docs = Seq(
      (0L, "b b b a a c"), (1L, "a d c b"), (2L, "e a b")
    ).toDF("doc_id", "text")
    // force several range partitions so the offset stage is exercised
    val out = TextAnalysis.vocabulary(docs, rankPartitions = 3)
      .orderBy("rank").as[(String, Long, Int)].collect().toSeq
    // counts: b=5 a=4 c=2 d=1 e=1 → rank by (n desc, word asc)
    assert(out === Seq(("b", 5L, 1), ("a", 4L, 2), ("c", 2L, 3),
      ("d", 1L, 4), ("e", 1L, 5)))
  }

  test("topTfidfTerms ranks distinguishing words above common ones") {
    // "zebra" appears 2× in doc 0 only; "the" is in every doc — the
    // distinctive term must outrank the ubiquitous one
    val docs = Seq(
      (0L, "the zebra and the zebra again"),
      (1L, "the cat sat on the mat"),
      (2L, "the dog ate the bone"),
      (3L, "the bird saw the worm")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.topTfidfTerms(docs, k = 3, minDf = 1L)
      .filter(col("doc_id") === 0L)
      .orderBy("rank")
      .select("word", "tfidf", "rank").as[(String, Double, Int)].collect()
    // zebra: tf=2,df=1 → 2·5/2 = 5; again/and: tf=1,df=1 → 2.5 (word
    // tie-break: "again" < "and"); the: tf=2,df=4 → 2·5/5 = 2
    assert(out.map(_._1).toSeq === Seq("zebra", "again", "and"))
    assert(out.map(_._2).toSeq === Seq(5.0, 2.5, 2.5))
  }

  test("bigramCounts: top successors per word, count then word tie-break") {
    val docs = Seq(
      (0L, "a b a b a c"), // bigrams: ab ba ab ba ac
      (1L, "a b"),         // +1 ab
      (2L, "z")            // single word: no bigrams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramCounts(docs, k = 2)
      .as[(String, String, Long, Int)].collect().toSet
    // a→b 3×, a→c 1×; b→a 2×; c→(nothing: doc ends)
    assert(out === Set(("a", "b", 3L, 1), ("a", "c", 1L, 2),
      ("b", "a", 2L, 1)))
  }

  test("piiRedact counts and scrubs planted emails, IPs, and phones") {
    val docs = Seq(
      (0L, "contact alice@example.com or 555-123-4567 now"),
      (1L, "server 10.0.0.1 responded"),
      (2L, "clean text with no pii at all")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiRedact(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3, r._4)) === Seq(
      (0L, 1L, 0L, 1L), (1L, 0L, 1L, 0L), (2L, 0L, 0L, 0L)))
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0)._5 === md5Hex("contact <EMAIL> or <PHONE> now"))
    assert(out(1)._5 === md5Hex("server <IP> responded"))
    assert(out(2)._5 === md5Hex("clean text with no pii at all"))
  }

  test("rarityScore: mean/min df and hapax fraction per doc") {
    val docs = Seq(
      (0L, "the the zebra"), // the: df 2; zebra: df 1 (hapax)
      (1L, "the cat")        // cat: df 1
    ).toDF("doc_id", "text")
    val out = TextAnalysis.rarityScore(docs).orderBy("doc_id")
      .as[(Long, Long, Double, Long, Double)].collect().toSeq
    // doc 0: dfs (2,2,1) → mean 5/3, min 1, hapax 1/3
    // doc 1: dfs (2,1) → mean 3/2, min 1, hapax 1/2
    assert(out === Seq(
      (0L, 3L, 5.0 / 3, 1L, 1.0 / 3),
      (1L, 2L, 3.0 / 2, 1L, 1.0 / 2)))
  }

  test("boilerplateFrac: df > minDocs counts the containing doc itself") {
    // shingle "x y z" appears in docs 0,1,2 → df=3, i.e. 2 OTHER docs;
    // with minDocs=2 the predicate df > 2 requires >= 2 other docs, so
    // it is common; the unique tails are not
    val docs = Seq(
      (0L, "x y z a b c"),   // 4 shingles, 1 common
      (1L, "x y z d e f"),
      (2L, "x y z g h i"),
      (3L, "p q r s t u")    // no common shingles
    ).toDF("doc_id", "text")
    val out = TextAnalysis.boilerplateFrac(docs, k = 3, minDocs = 2L)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      (0L, 4L, 1L, 0.25), (1L, 4L, 1L, 0.25),
      (2L, 4L, 1L, 0.25), (3L, 4L, 0L, 0.0)))
    // minDocs=3 would require >= 3 other docs: nothing qualifies
    val strict = TextAnalysis.boilerplateFrac(docs, k = 3, minDocs = 3L)
      .agg(sum("n_common")).as[Long].head()
    assert(strict === 0L)
  }

  test("lmCoverage: bigrams beyond the top-k successor table " +
    "fall out of the LM") {
    val docs = Seq(
      (1L, "a b a c"), // bigrams (a,b) (b,a) (a,c)
      (2L, "a b"),
      (3L, "solo")     // < 2 words: no bigrams, excluded
    ).toDF("doc_id", "text")
    // counts: (a,b)=2 (b,a)=1 (a,c)=1 → k=1 LM = {(a,b), (b,a)}
    val out = TextAnalysis.lmCoverage(docs, k = 1)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 3L, 2L, 2.0 / 3.0)))
    assert(out(2L) === ((2L, 1L, 1L, 1.0)))
    assert(!out.contains(3L))
    assert(out.size === 2)
    // k=3 admits every successor here: full coverage
    val full = TextAnalysis.lmCoverage(docs, k = 3)
      .as[(Long, Long, Long, Double)].collect()
    assert(full.forall(_._4 === 1.0))
  }

  test("langId scores every profile and predicts deterministically") {
    val docs = Seq(
      (0L, "the cat is on the mat"),   // en stopwords
      (1L, "el perro y la casa de que") // es stopwords
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langId(docs).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("lang_pred") === "en")
    assert(out(1).getAs[String]("lang_pred") === "es")
    assert(out(0).getAs[Double]("s_en") === 3.0 / 6)
  }
  test("gopherRules: each rule binds on its own column") {
    val pass50 = (1 to 45).map(i => s"word$i").mkString(" ") +
      " the a of and is"                      // 50 words, 5 stopwords
    val docs = Seq(
      (0L, pass50),                           // passes every rule
      (1L, "foo foo foo foo")                 // short, no stops, top=1.0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs).orderBy("doc_id").collect()
    val d0 = out(0)
    assert(d0.getAs[Int]("n_words") === 50)
    assert(d0.getAs[Int]("n_stop_distinct") === 5)
    assert(d0.getAs[Double]("top_word_frac") === 1.0 / 50)
    assert(d0.getAs[Boolean]("gopher_ok"))
    val d1 = out(1)
    assert(!d1.getAs[Boolean]("rule_word_count"))
    assert(!d1.getAs[Boolean]("rule_stopwords"))
    assert(!d1.getAs[Boolean]("rule_top_word"))
    assert(d1.getAs[Double]("top_word_frac") === 1.0)
    assert(d1.getAs[Boolean]("rule_symbols") &&
      d1.getAs[Boolean]("rule_ellipsis"))
    assert(!d1.getAs[Boolean]("gopher_ok"))
  }

  test("readabilitySignals: vowel-group syllables, complex fraction") {
    // banana → a|a|a = 3 groups; x → 0 groups, floored to 1;
    // stream → ea = 1; idea → i|ea = 2.
    val docs = Seq((0L, "banana x stream idea")).toDF("doc_id", "text")
    val r = TextAnalysis.readabilitySignals(docs).head()
    assert(r.getAs[Long]("n_words") === 4L)
    assert(r.getAs[Long]("n_syllables") === 7L)
    assert(r.getAs[Double]("mean_syl") === 7.0 / 4)
    assert(r.getAs[Double]("complex_frac") === 1.0 / 4)
  }

  test("mattr: windowed distinct fractions, short docs drop") {
    val docs = Seq(
      // 4 words, window 3: windows [a b a] (2 distinct), [b a b]
      // (2 distinct) → mattr = 4 / (2·3)
      (0L, "a b a b"),
      // all distinct → mattr 1.0
      (1L, "p q r s"),
      (2L, "too short")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.mattr(docs, window = 3)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(out === Array((0L, 2L, 4.0 / 6), (1L, 2L, 1.0)))
  }

  test("importanceWeights: target-like features outscore off-target, " +
    "feature counts exact, partition-independent") {
    val docs = Seq(
      (0L, "alpha beta alpha beta", "en"),
      (1L, "alpha beta gamma", "en"),
      // de doc re-using the en vocabulary: every feature has high
      // target counts → high score
      (2L, "alpha beta", "de"),
      // de doc with vocabulary no en doc shares: ct = 0 everywhere
      (3L, "zeta eta theta", "de")
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.importanceWeights(docs, "en")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    // unigrams + (n-1) bigrams per doc
    assert(out.map(r => r._1 -> r._2).toMap ===
      Map(0L -> 7L, 1L -> 5L, 2L -> 3L, 3L -> 5L))
    val score = out.map(r => r._1 -> r._3).toMap
    assert(score(2L) > score(3L),
      "en-vocabulary de doc must outscore off-target de doc")
    assert(score(0L) > score(3L))
    val again = TextAnalysis
      .importanceWeights(docs.repartition(7), "en")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq === again.toSeq)
  }

  test("importanceWeights fidelity probe: rank agreement with DSIR's " +
    "mean-log-ratio") {
    // The shipped score deviates from DSIR once (arithmetic mean of
    // fixed-point ratios instead of mean log-ratio, for
    // bit-determinism). This probe quantifies what that deviation
    // costs IN RANKINGS on the real fixture corpus: Spearman rho
    // between the two scores, plus overlap of the top-quartile
    // selection (the decision a DSIR pipeline actually takes).
    val docs = table("documents")
    val shipped = TextAnalysis.importanceWeights(docs, "en")
      .select("doc_id", "dsir_score")
      .as[(Long, Double)].collect().toMap
    // DSIR's form, plain doubles: mean over features of
    // ln((ct+1)/(cr+1)) — the importanceWeights pipeline with the
    // fixed-point ratio swapped for the log
    val w = graft.functions.Canon.words(col("text"))
    val feats = docs
      .select(col("doc_id"), col("lang"), w.as("w"))
      .select(col("doc_id"), col("lang"),
        explode(concat(
          transform(col("w"), x => concat(lit("u|"), x)),
          transform(graft.functions.Canon.shingles(col("w"), 2), x =>
            concat(lit("b|"), x)))).as("f"))
      .select(col("doc_id"), col("lang"),
        (graft.functions.Canon.hash60(col("f")) % 1024).as("b"))
    val lm = feats.groupBy(col("b"))
      .agg(count(lit(1)).as("cr"),
        count(when(col("lang") === "en", 1)).as("ct"))
    val reference = feats.join(broadcast(lm), Seq("b"))
      .groupBy(col("doc_id"))
      .agg((sum(log((col("ct") + 1).cast("double") / (col("cr") + 1))) /
        count(lit(1))).as("log_score"))
      .as[(Long, Double)].collect().toMap
    assert(shipped.keySet === reference.keySet)
    val ids = shipped.keySet.toArray.sorted
    def avgRanks(score: Map[Long, Double]): Map[Long, Double] = {
      val sorted = ids.sortBy(id => (score(id), id))
      sorted.zipWithIndex.groupBy { case (id, _) => score(id) }
        .values.flatMap { grp =>
          val r = grp.map(_._2 + 1.0).sum / grp.length
          grp.map { case (id, _) => id -> r }
        }.toMap
    }
    val ra = avgRanks(shipped)
    val rb = avgRanks(reference)
    val n = ids.length.toDouble
    val ma = ra.values.sum / n
    val mb = rb.values.sum / n
    val cov = ids.map(i => (ra(i) - ma) * (rb(i) - mb)).sum
    val va = math.sqrt(ids.map(i => math.pow(ra(i) - ma, 2)).sum)
    val vb = math.sqrt(ids.map(i => math.pow(rb(i) - mb, 2)).sum)
    val rho = cov / (va * vb)
    // top-quartile selection overlap (the threshold decision)
    val kSel = ids.length / 4
    val selA = ids.sortBy(id => (-shipped(id), id)).take(kSel).toSet
    val selB = ids.sortBy(id => (-reference(id), id)).take(kSel).toSet
    val overlap = selA.intersect(selB).size.toDouble / kSel
    info(f"spearman rho = $rho%.4f, top-quartile overlap = $overlap%.3f")
    // recorded in SURVEY §8.2 (t18 row); the floors pin the measured
    // agreement so a future scoring change that degrades fidelity
    // fails loudly rather than silently
    assert(rho >= 0.85, f"Spearman rho $rho%.4f below the measured floor")
    assert(overlap >= 0.8, f"selection overlap $overlap%.3f below floor")
  }

  test("perplexity: add-one smoothed micro-nat surprisal, hand-checked") {
    // corpus: tokens a,b,a,b,c → V=3; bigrams (a,b)x2, (b,c)x1
    // contexts: c1(a)=2, c1(b)=1
    val docs = Seq((0L, "a b"), (1L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.perplexity(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val smAB = math.floor(math.log(5.0 / 3.0) * 1e6).toLong // 510825
    val smBC = math.floor(math.log(4.0 / 2.0) * 1e6).toLong // 693147
    assert(smAB === 510825L && smBC === 693147L)
    assert(out === Seq(
      (0L, 1L, smAB, smAB.toDouble / 1 / 1e6),
      (1L, 2L, smAB + smBC, (smAB + smBC).toDouble / 2 / 1e6)))
  }

  test("bpeMerges: greedy merge order with count-then-lex tie-break") {
    val docs = Seq((0L, "low low lower")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeMerges(docs, rounds = 3)
      .orderBy("merge_round")
      .as[(Int, String, String, String, Long)].collect().toSeq
    // r1: (l,o)=3 ties (o,w)=3 → lex picks (l,o); r2: (lo,w)=3;
    // r3: only "lower" has pairs left → (low,e)=1 ties (e,r)=1 → (e,r)
    assert(out === Seq(
      (1, "l", "o", "lo", 3L),
      (2, "lo", "w", "low", 3L),
      (3, "e", "r", "er", 1L)))
  }

  test("bpeMerges: delimiter-consuming replace merges odd runs " +
    "every-other (spec-pins the batch≡oracle convention)") {
    val docs = Seq((0L, "aaa")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeMerges(docs, rounds = 2)
      .orderBy("merge_round")
      .as[(Int, String, String, String, Long)].collect().toSeq
    // " a a a ": (a,a) counted twice (overlapping statistics), but the
    // single-pass replace consumes the shared delimiter → " aa a ",
    // so round 2 merges (aa, a), not (a, a) again
    assert(out === Seq((1, "a", "a", "aa", 2L), (2, "aa", "a", "aaa", 1L)))
  }

  test("bpeMerges: merge exhaustion leaves later rounds as no-ops") {
    val docs = Seq((0L, "ab ab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeMerges(docs, rounds = 3)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(out === Seq((1, "a", "b", "ab", 2L)))
  }

  test("bpeFertility: the under-served language pays more tokens per " +
    "word under the shared vocab") {
    val docs = Seq((0L, "low low", "en"), (1L, "lower", "de"))
      .toDF("doc_id", "text", "lang")
    // same training corpus as the tokenize fixture: merges (l,o),(lo,w)
    val out = TextAnalysis.bpeFertility(docs, rounds = 2)
      .orderBy("lang").collect()
    val de = out(0); val en = out(1)
    assert(en.getAs[Long]("n_words") === 2L)
    assert(en.getAs[Long]("n_bpe_tokens") === 2L)
    assert(en.getAs[Double]("tokens_per_word") === 1.0)
    assert(en.getAs[Double]("chars_per_token") === 3.0)
    assert(de.getAs[Long]("n_words") === 1L)
    assert(de.getAs[Long]("n_bpe_tokens") === 3L)
    assert(de.getAs[Double]("tokens_per_word") === 3.0)
    assert(de.getAs[Double]("chars_per_token") === 5.0 / 3)
  }

  test("bpeTokenize: learned-vocab token accounting + compression") {
    val docs = Seq((0L, "low low lower")).toDF("doc_id", "text")
    // after 2 merges: low → [low] (1 sym), lower → [low, e, r] (3 syms)
    val r = TextAnalysis.bpeTokenize(docs, rounds = 2).head()
    assert(r.getAs[Long]("n_words") === 3L)
    assert(r.getAs[Long]("n_chars") === 11L)
    assert(r.getAs[Long]("n_bpe_tokens") === 5L)
    assert(r.getAs[Double]("chars_per_token") === 11.0 / 5)
  }

  test("textRankKeywords: hand-traced integer PageRank on the star " +
    "graph; minCount prunes rare pairs; partition-independent") {
    // "a b a c a d": canonical pairs (a,b)×2, (a,c)×2, (a,d)×1 —
    // minCount=2 keeps the star a–{b,c}. Hand-traced 3 rounds of the
    // g10 integer fixed point: a=1741625, b=c=629187.
    val docs = Seq((1L, "a b a c a d")).toDF("doc_id", "text")
    val out = TextAnalysis.textRankKeywords(docs, minCount = 2,
        topK = 3, iters = 3)
      .as[(String, Long, Int)].collect().toSeq
    assert(out === Seq(("a", 1741625L, 1), ("b", 629187L, 2),
      ("c", 629187L, 3)))
    assert(TextAnalysis.textRankKeywords(docs.repartition(7),
      minCount = 2, topK = 3, iters = 3)
      .as[(String, Long, Int)].collect().toSeq === out)
    // regular graph (one edge): both endpoints hold the 1e6 fixpoint
    val k2 = Seq((1L, ("x y " * 6).trim)).toDF("doc_id", "text")
    val r = TextAnalysis.textRankKeywords(k2, minCount = 5, topK = 5,
        iters = 3).as[(String, Long, Int)].collect().toSeq
    assert(r === Seq(("x", 1000000L, 1), ("y", 1000000L, 2)))
  }

  test("zipfFit: exact −1 power law recovers slope −1; degenerate " +
    "single-rank vocab yields NULL; partition-independent") {
    // counts 600/300/200/150/120 = 600/k: ln(n_k) = ln 600 − ln k, an
    // exact −1 line through quantized points (quantization moves x
    // and y by < 1e-6 nats, so the fitted slope sits within 1e-5)
    val text = (1 to 5).flatMap(k => Seq.fill(600 / k)(s"w$k"))
    val docs = Seq((1L, text.mkString(" "))).toDF("doc_id", "text")
    val r = TextAnalysis.zipfFit(docs).head()
    assert(r.getAs[Long]("n_terms") === 5L)
    assert(math.abs(r.getAs[Double]("slope") - (-1.0)) < 1e-5)
    assert(math.abs(r.getAs[Double]("intercept") - math.log(600.0)) < 1e-5)
    assert(TextAnalysis.zipfFit(docs.repartition(7)).head() === r)
    // one distinct rank → NULL fit, not ÷0
    val mono = Seq((1L, "same")).toDF("doc_id", "text")
    val r1 = TextAnalysis.zipfFit(mono).head()
    assert(r1.getAs[Long]("n_terms") === 1L)
    assert(r1.isNullAt(r1.fieldIndex("slope")))
    assert(r1.isNullAt(r1.fieldIndex("intercept")))
  }

  test("pmiCollocations: hand-computed PMI on planted phrases; " +
    "min-count floor cuts hapax pairs; partition-independent") {
    // "a b"×5 ++ "c d"×5 in one doc: bigrams (a,b)=5, (b,a)=4,
    // (b,c)=1, (c,d)=5, (d,c)=4 → N=19; only (a,b),(c,d) clear the
    // floor; both have c1=c2=5 → PMI = ln(5·19/25) = ln 3.8
    val text = (Seq.fill(5)("a b") ++ Seq.fill(5)("c d")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val exp = math.floor(math.log(3.8) * 1e6).toLong
    val out = TextAnalysis.pmiCollocations(docs)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("a", "b", 5L, 5L, 5L, exp),
      ("c", "d", 5L, 5L, 5L, exp)))
    assert(TextAnalysis.pmiCollocations(docs.repartition(7))
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
      === out)
    // a genuine collocation outranks a frequent-but-independent pair:
    // "x y" always adjacent vs "p"/"q" co-frequent but shuffled
    val mixed = Seq((1L, (Seq.fill(8)("x y") ++
      Seq.fill(8)("p q") ++ Seq.fill(8)("q p")).mkString(" ")))
      .toDF("doc_id", "text")
    val m = TextAnalysis.pmiCollocations(mixed)
      .as[(String, String, Long, Long, Long, Long)].collect()
    val pmi = m.map(r => (r._1, r._2) -> r._6).toMap
    assert(pmi(("x", "y")) > pmi(("p", "q")))
  }
}
