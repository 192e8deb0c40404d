package graft

class EntrySpec extends SparkSpec {

  test("entry (driver smoke) returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; oracle SQL is single-statement") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert((os -- qs).isEmpty, s"oracles without queries: ${os -- qs}")
    // a stray semicolon would break the driver's duckdb .sql() call
    assert(SparkEntry.oracleSql.values.forall(!_.contains(";")))
  }

  test("approx distinct is within 5% of exact per group") {
    val exact = graft.operators.Relational
      .distinctCounts(table("lineitem"))
      .select("l_returnflag", "n_parts")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = graft.operators.Relational
      .approxDistinctCounts(table("lineitem"))
      .select("l_returnflag", "n_parts_approx")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val a = approx(k).toDouble
      assert(math.abs(a - n) / n <= 0.05, s"group $k: approx $a vs $n")
    }
  }

  test("q20b error contract: within_bound is 1 everywhere, and the " +
    "bound actually bites") {
    val li = table("lineitem")
    val ok = graft.operators.Relational.approxDistinctError(li)
      .select("within_bound").collect().map(_.getLong(0))
    assert(ok.nonEmpty && ok.forall(_ == 1L))
    // sanity that the gate CAN fail: an absurdly tight bound flips it
    val tight = graft.operators.Relational
      .approxDistinctError(li, rsd = 0.02, bound = 0.0)
      .select("within_bound").collect().map(_.getLong(0))
    assert(tight.exists(_ == 0L),
      "bound=0 should fail unless the sketch is exact by coincidence")
  }

  test("q37 quantile error contract: within_bound is 1 everywhere, " +
    "and the bound actually bites") {
    val li = table("lineitem")
    val ok = graft.operators.Relational.approxQuantileError(li)
      .select("within_bound").collect().map(_.getLong(0))
    assert(ok.nonEmpty && ok.forall(_ == 1L))
    // boundScale=0 leaves only the ±1-rank rounding slack: the GK
    // summary at accuracy=100 is compressed well past exact-median
    // resolution on these group sizes, so some group must fail —
    // unless the sketch lands exactly on the median by coincidence.
    val tight = graft.operators.Relational
      .approxQuantileError(li, accuracy = 100, boundScale = 0.0)
      .select("within_bound").collect().map(_.getLong(0))
    assert(tight.exists(_ == 0L),
      "boundScale=0 should fail unless the sketch is exact by coincidence")
  }

  test("q38 heavy-hitter contract: within_bound is 1 everywhere, " +
    "estimates never underestimate, and collisions actually bite") {
    val li = table("lineitem")
    val ok = graft.operators.Relational.heavyHitterError(li)
      .select("within_bound").collect().map(_.getLong(0))
    assert(ok.nonEmpty && ok.forall(_ == 1L))
    // The overestimate-only property is structural (counters only
    // add): it must hold at ANY width, even one forcing collisions.
    val coarse = graft.operators.Relational
      .heavyHitterError(li, eps = 0.5, boundScale = 1e9)
      .select("within_bound").collect().map(_.getLong(0))
    assert(coarse.forall(_ == 1L),
      "overestimate-only must hold even with a ~4-cell-wide sketch")
    // ...and at that width the fixture's ~10 suppkeys MUST collide
    // somewhere, so demanding est == exact (boundScale=0) has to
    // fail: the gate can fail.
    val tight = graft.operators.Relational
      .heavyHitterError(li, eps = 0.5, boundScale = 0.0)
      .select("within_bound").collect().map(_.getLong(0))
    assert(tight.exists(_ == 0L),
      "a ~4-cell sketch over ~10 keys should collide somewhere")
  }

  test("every registered query evaluates non-empty at sf0.001") {
    // Legitimately empty at tiny SF: every customer has an order
    // (q10), the cursor window starts past the 1000-event table (g06),
    // and threshold/collision queries may find nothing at 50 docs.
    val allowedEmpty = Set("q10_anti_join", "g06_cursor_batch",
      "d03_lsh_pairs", "d05_ngram_jaccard", "d06_embedding_neardup")
    val empty = SparkEntry.queries.collect {
      case (name, fn) if !allowedEmpty(name) &&
        fn(spark, sf0001).isEmpty => name
    }
    assert(empty.isEmpty, s"unexpectedly empty: $empty")
  }

  test("groupQuantiles: exact percentile_disc ranks, partition-stable") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // group A: 1..4 -> ranks ceil(1)=1, ceil(2)=2, ceil(3)=3
    // group B: 10..50 by 10 -> ranks ceil(1.25)=2, ceil(2.5)=3, ceil(3.75)=4
    val li = (
      (1 to 4).map(i => ("A", i.toDouble, i.toLong, i)) ++
      (1 to 5).map(i => ("B", i * 10.0, 100L + i, i))
    ).toDF("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber")
    val out = graft.operators.Relational.groupQuantiles(li)
      .orderBy("l_returnflag")
      .as[(String, Double, Double, Double, Long)].collect()
    assert(out === Array(
      ("A", 1.0, 2.0, 3.0, 4L),
      ("B", 20.0, 30.0, 40.0, 5L)))
    val rep = graft.operators.Relational
      .groupQuantiles(li.repartition(7), numPartitions = 3)
      .orderBy("l_returnflag")
      .as[(String, Double, Double, Double, Long)].collect()
    assert(rep === out)
  }

  test("q40: NOT IN with a null in the subquery is empty; the " +
    "null-free form agrees with NOT EXISTS") {
    import spark.implicits._
    val out = SparkEntry.queries("q40_null_aware_antijoin")(spark, sf0001)
      .as[(Long, Long, Long)].collect().head
    assert(out._2 === 0L)
    assert(out._1 === out._3 && out._1 > 0L)
  }

  test("eventFunnel: stages require ORDER, not co-occurrence; " +
    "missing first stage drops the user") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // µs → ns-long ts. user 1: full ordered funnel; user 2: purchase
    // BEFORE its view → stage 1 despite all three types present;
    // user 3: no view → absent; user 4: view+click → stage 2.
    val ev = Seq(
      (1L, 10L, 1L, "view"), (2L, 20L, 1L, "click"),
      (3L, 30L, 1L, "purchase"),
      (4L, 5L, 2L, "purchase"), (5L, 10L, 2L, "view"),
      (6L, 8L, 2L, "click"),
      (7L, 10L, 3L, "click"), (8L, 20L, 3L, "purchase"),
      (9L, 10L, 4L, "view"), (10L, 15L, 4L, "click")
    ).map { case (id, us, u, t) => (id, us * 1000L, u, t) }
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.operators.AsOf.eventFunnel(ev)
      .select("user_id", "stage").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 3L, 2L -> 1L, 4L -> 2L))
  }

  test("cohortRetention: first-week cohorts, age-0 retention exactly " +
    "1.0, gaps leave missing cells") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val wk = 604800000000L // µs per week
    // u1: weeks 0,1,2; u2: week 0 only; u3: first seen week 1,
    // returns week 3 (age 2) — week-2 cell absent for cohort 1
    val ev = Seq(
      (1L, 100L, 1L), (2L, wk + 5L, 1L), (3L, 2 * wk + 9L, 1L),
      (4L, 200L, 2L),
      (5L, wk + 50L, 3L), (6L, 3 * wk + 1L, 3L)
    ).map { case (id, us, u) => (id, us * 1000L, u, "view") }
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.operators.AsOf.cohortRetention(ev)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out === Map(
      (0L, 0L) -> ((2L, 2L, 1.0)), (0L, 1L) -> ((1L, 2L, 0.5)),
      (0L, 2L) -> ((1L, 2L, 0.5)),
      (1L, 0L) -> ((1L, 1L, 1.0)), (1L, 2L) -> ((1L, 1L, 1.0))))
  }

  test("rfmSegments: distinct R/F/M profiles land on the diagonal " +
    "codes; exact cents; partition-independent") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val day = 86400000000L // µs
    // u1 best on all three axes … u5 worst: with n = 5 users each
    // quintile equals the rank, so codes are 111…555
    val ev = Seq(
      (1L, 10 * day, 1L, 10.0), (2L, 10 * day - 5L, 1L, 10.0),
      (3L, 10 * day - 9L, 1L, 10.0),
      (4L, 9 * day, 2L, 5.0), (5L, 9 * day - 5L, 2L, 5.0),
      (6L, 8 * day, 3L, 3.0),
      (7L, 7 * day, 4L, 2.0),
      (8L, 6 * day, 5L, 1.0)
    ).map { case (id, us, u, v) => (id, us * 1000L, u, v) }
      .toDF("event_id", "ts", "user_id", "value")
    val out = graft.operators.AsOf.rfmSegments(ev)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 0L, 3L, 3000L, 1L, 1L, 1L, 111L)))
    assert(out(2L) === ((2L, 1L, 2L, 1000L, 2L, 2L, 2L, 222L)))
    assert(out(3L) === ((3L, 2L, 1L, 300L, 3L, 3L, 3L, 333L)))
    assert(out(4L) === ((4L, 3L, 1L, 200L, 4L, 4L, 4L, 444L)))
    assert(out(5L) === ((5L, 4L, 1L, 100L, 5L, 5L, 5L, 555L)))
    assert(graft.operators.AsOf.rfmSegments(ev.repartition(7))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
      .toSet === out.values.toSet)
  }

  test("mergedPartialAgg: split-aggregate-merge equals the direct " +
    "aggregate bit-for-bit; avg-of-avgs would not") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val li = table("lineitem")
    val merged = graft.operators.Relational.mergedPartialAgg(li)
      .orderBy("l_returnflag", "l_linestatus")
      .as[(String, String, Double, Long, Double)].collect()
    val direct = li
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sq"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("sq").cast("double"), col("n"),
        col("sq").cast("double") / col("n"))
      .orderBy("l_returnflag", "l_linestatus")
      .as[(String, String, Double, Long, Double)].collect()
    assert(merged === direct)
    // the anti-pattern the gate exists to catch: mean of half-means
    // (unweighted) diverges from the true mean on uneven halves
    val halfMeans = Seq(0, 1).map(p =>
      li.filter(col("l_orderkey") % 2 === p)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(avg(col("l_quantity")).as("a")))
    val naive = halfMeans(0).unionByName(halfMeans(1))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(avg(col("a")).as("avg_naive"))
      .orderBy("l_returnflag", "l_linestatus")
      .as[(String, String, Double)].collect()
    assert(naive.map(_._3).toSeq !== direct.map(_._5).toSeq)
  }
}
