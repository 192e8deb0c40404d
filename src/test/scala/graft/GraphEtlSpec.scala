package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphEtl

class GraphEtlSpec extends SparkSpec {
  import spark.implicits._

  test("pageRankFixedPoint: hand-computed 3-vertex fixture, 3 iterations") {
    // 1→2, 2→1, 1→3; outdeg(1)=2, outdeg(2)=1; vertex 3 is dangling
    val edges = Seq(("1", "2"), ("2", "1"), ("1", "3"))
      .toDF("_from", "_to")
    val out = GraphEtl.pageRankFixedPoint(edges, iters = 3)
      .as[(String, Long)].collect().toMap
    // iter1: r(1)=150000+850000·(10⁶ div 1)·10⁻⁶=1000000;
    //        r(2)=r(3)=150000+850000·(10⁶ div 2) div 10⁶=575000
    // iter2: r(1)=150000+(850000·575000) div 10⁶=638750;
    //        r(2)=r(3)=150000+(850000·500000) div 10⁶=575000
    // iter3: r(1)=150000+488750=638750;
    //        r(2)=r(3)=150000+(850000·(638750 div 2)) div 10⁶=421468
    assert(out === Map("1" -> 638750L, "2" -> 421468L, "3" -> 421468L))
  }

  test("pageRankFixedPoint is deterministic across partitionings") {
    val e = GraphEtl.paymentEdges(table("orders"), table("lineitem"))
    val a = GraphEtl.pageRankFixedPoint(e, iters = 2)
      .as[(String, Long)].collect().toMap
    val b = GraphEtl.pageRankFixedPoint(e.repartition(17), iters = 2)
      .as[(String, Long)].collect().toMap
    assert(a === b)
  }

  test("triangleCounts: one triangle + pendant, and a K4") {
    // {1,2,3} closes; 4 hangs off 3. K4 on {5,6,7,8}: 4 triangles,
    // every vertex in exactly 3.
    val edges = (Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)) ++
      Seq(5L, 6L, 7L, 8L).combinations(2).map(p => (p(0), p(1))))
      .toDF("a", "b")
    val out = GraphEtl.triangleCounts(edges)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      5L -> 3L, 6L -> 3L, 7L -> 3L, 8L -> 3L))
  }

  test("triangleCounts is partitioning-independent") {
    val e = GraphEtl.coSupplierEdges(table("lineitem"), minSupport = 2)
    val a = GraphEtl.triangleCounts(e).as[(Long, Long)].collect().toMap
    val b = GraphEtl.triangleCounts(e.repartition(17))
      .as[(Long, Long)].collect().toMap
    assert(a === b && a.nonEmpty)
  }

  test("edgeJaccard: triangle edges share a neighbor, bridges score 0") {
    // triangle {1,2,3} with pendant edge (3,4)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val out = GraphEtl.edgeJaccard(edges)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // (1,2): common neighbor 3; |N(1)∪N(2)| = 2 + 2 − 1 = 3
    assert(out((1L, 2L)) === ((1L, 2L, 1L, 2L, 2L, 1.0 / 3.0)))
    // (1,3) and (2,3): deg(3) = 3
    assert(out((1L, 3L)) === ((1L, 3L, 1L, 2L, 3L, 0.25)))
    assert(out((2L, 3L)) === ((2L, 3L, 1L, 2L, 3L, 0.25)))
    // the bridge (3,4): no shared neighbor
    assert(out((3L, 4L)) === ((3L, 4L, 0L, 3L, 1L, 0.0)))
    assert(out.size === 4)
    val rep = GraphEtl.edgeJaccard(edges.repartition(7))
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(rep === out.values.toSet)
  }

  test("connectedComponents labels each component by its min vertex") {
    // two components: a 4-chain {1,2,3,4} and a pair {9,10}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 10L))
      .toDF("a", "b")
    val out = GraphEtl.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      9L -> 9L, 10L -> 9L))
  }

  test("coSupplierEdges: support threshold and hot-order cap bind") {
    val li = Seq(
      // order 1: suppliers 1,2,3 (pairs 12,13,23 once)
      (1L, 1L), (1L, 2L), (1L, 3L),
      // orders 2-3: suppliers 1,2 again (pair 12 reaches support 3)
      (2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L),
      // order 4 exceeds the per-order cap → contributes nothing
      (4L, 1L), (4L, 2L), (4L, 3L), (4L, 4L))
      .toDF("l_orderkey", "l_suppkey")
    val out = GraphEtl.coSupplierEdges(li, minSupport = 3, maxPerOrder = 3)
      .as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L)))
  }

  test("pageRankFixedPoint deep run (exercises the lineage guard)") {
    val edges = Seq(("1", "2"), ("2", "1"), ("1", "3"))
      .toDF("_from", "_to")
    // 7 iterations crosses the every-5th checkpoint; values must agree
    // with the checkpoint-free recurrence computed directly
    def step(r: Map[String, Long]): Map[String, Long] = Map(
      "1" -> (150000L + 850000L * (r("2") / 1) / 1000000L),
      "2" -> (150000L + 850000L * (r("1") / 2) / 1000000L),
      "3" -> (150000L + 850000L * (r("1") / 2) / 1000000L))
    val expected = (1 to 7).foldLeft(
      Map("1" -> 1000000L, "2" -> 1000000L, "3" -> 1000000L))(
      (r, _) => step(r))
    val out = GraphEtl.pageRankFixedPoint(edges, iters = 7)
      .as[(String, Long)].collect().toMap
    assert(out === expected)
  }
  test("bfsHops: exact hop distances from the mod-seed set, bounded") {
    // component A: path 0-1-2-3-4 (seed 0); component B: 10-11
    // (seed 10); component C: 5-6 (no seed -> absent)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (5L, 6L)).toDF("a", "b")
    val out = GraphEtl.bfsHops(edges, seedMod = 10L, maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L,
      10L -> 0L, 11L -> 1L))
    // 4 is four hops out: excluded by the bound, not mislabeled
    assert(!out.contains(4L) && !out.contains(5L))
    // frontier anti-join keeps the FIRST (minimum) hop count even
    // when a later path reaches the same vertex
    val diamond = Seq((0L, 1L), (1L, 2L), (0L, 2L)).toDF("a", "b")
    val d = GraphEtl.bfsHops(diamond, seedMod = 10L, maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(d === Map(0L -> 0L, 1L -> 1L, 2L -> 1L))
  }
  test("kcorePeel: triangle survives, tails and chains peel away") {
    // triangle 1-2-3 with a pendant 4; chain 5-6-7 dissolves entirely
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (5L, 6L), (6L, 7L)).toDF("a", "b")
    val out = GraphEtl.kcorePeel(edges, k = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // rounds beyond convergence are no-ops
    val more = GraphEtl.kcorePeel(edges, k = 2, rounds = 5)
      .as[(Long, Long)].collect().toMap
    assert(more === out)
  }

  test("personalizedPageRank: teleport mass only on seeds, " +
    "seed-unreachable vertices decay to zero") {
    val edges = Seq(
      ("accounts/10", "suppliers/1"),  // seed → supplier
      ("suppliers/2", "suppliers/3")   // component with no seed
    ).toDF("_from", "_to")
    val isSeed = element_at(split(col("v"), "/"), 1) === "accounts" &&
      element_at(split(col("v"), "/"), 2).cast("long") % 10 === 0
    val out = GraphEtl.personalizedPageRank(edges, isSeed)
      .as[(String, Long)].collect().toMap
    // seed: 150000 teleport, no inbound; supplier 1 after 3 rounds:
    // 0.85 · 150000 = 127500; the seedless component holds no mass
    assert(out === Map(
      "accounts/10" -> 150000L, "suppliers/1" -> 127500L,
      "suppliers/2" -> 0L, "suppliers/3" -> 0L))
  }

  test("degreeAssortativity: a star is perfectly disassortative, " +
    "a regular graph is undefined") {
    // K1,3: every edge joins the deg-3 hub to a deg-1 leaf → r = −1
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val out = GraphEtl.degreeAssortativity(star)
      .as[(Long, Option[Double])].collect()
    assert(out === Array((6L, Some(-1.0))))
    // triangle: zero degree variance → Pearson undefined → null,
    // never an ANSI divide-by-zero
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val reg = GraphEtl.degreeAssortativity(tri)
      .as[(Long, Option[Double])].collect()
    assert(reg === Array((6L, None)))
  }

  test("localClustering: triangle closes, pendant scores 0") {
    // triangle 1-2-3 plus pendant 4 off vertex 3
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("a", "b")
    val out = GraphEtl.localClustering(edges)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((2L, 1L, 1.0)))
    assert(out(2L) === ((2L, 1L, 1.0)))
    assert(out(3L) === ((3L, 1L, 2.0 / 6)))
    assert(out(4L) === ((1L, 0L, 0.0)))
  }

  test("hitsScores: hand-checked two-round fixed point; top hub and " +
    "authority pinned at SCALE; partition-independent") {
    // c1 → {s1, s2, s3}, c2 → {s1}: c1 is the hub, s1 the authority.
    // Round 1: ra = (2e6, 1e6, 1e6) → a1 = (1e6, 5e5, 5e5);
    //   rh = (2e6, 1e6) → h1 = (1e6, 5e5).
    // Round 2: ra = (1.5e6, 1e6, 1e6) → a2 = (1e6, 666666, 666666);
    //   rh = (2333332, 1e6) → h2 = (1e6, 428571) — div-truncated.
    val edges = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L))
      .toDF("c", "s")
    def run(df: org.apache.spark.sql.DataFrame) =
      GraphEtl.hitsScores(df)
        .as[(String, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    val out = run(edges)
    assert(out(("hub", 1L)) === 1000000L)
    assert(out(("hub", 2L)) === 428571L)
    assert(out(("auth", 10L)) === 1000000L)
    assert(out(("auth", 20L)) === 666666L)
    assert(out(("auth", 30L)) === 666666L)
    assert(run(edges.repartition(7)) === out)
  }

  test("labelPropagation: hand-checked sync rounds converge on the " +
    "triangle+tail; partition-independent") {
    // triangle {1,2,3} with tail 3—4:
    // r1: 1←{2,3} tie→2, 2←{1,3}→1, 3←{1,2,4}→1, 4←{3}→3
    // r2: 1←{1,1}→1, 2←{2,1} tie→1, 3←{2,1,3} tie→1, 4←{1}→1
    // r3: all neighbors labeled 1 → every vertex at 1
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("a", "b")
    def run(df: org.apache.spark.sql.DataFrame, rounds: Int) =
      GraphEtl.labelPropagation(df, rounds)
        .as[(Long, Long)].collect().toMap
    assert(run(edges, 1) === Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 3L))
    assert(run(edges, 3) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    assert(run(edges.repartition(5), 3) === run(edges, 3))
  }

  test("modularity: two triangles + bridge score 70/196; a single " +
    "community scores exactly 0") {
    // LPA(3) splits {1,2,3} / {4,5,6}: m=7, e_in=6, d_c = 7 and 7
    // → Q = (4·7·6 − 98) / (4·49) = 70/196
    val twoTri = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("a", "b")
    val r = GraphEtl.modularity(twoTri).head()
    assert(r.getAs[Long]("m") === 7L)
    assert(r.getAs[Long]("n_communities") === 2L)
    assert(r.getAs[Long]("n_within_edges") === 6L)
    assert(r.getAs[Double]("modularity") === 70.0 / 196)
    // triangle+tail converges to one community: Q = 0 by definition
    val one = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val r1 = GraphEtl.modularity(one).head()
    assert(r1.getAs[Long]("n_communities") === 1L)
    assert(r1.getAs[Double]("modularity") === 0.0)
    assert(GraphEtl.modularity(twoTri.repartition(5)).head() === r)
  }

  test("louvainMove: hand-checked strict-gain moves on two triangles " +
    "+ bridge improve modularity; partition-independent") {
    // LPA(1) seed: {1→2, 2→1, 3→1, 4→3, 5→4, 6→4} — 4 communities,
    // e_in = 2, Σd² = 2²+5²+3²+4² = 54 → Q_before = (56−54)/196.
    // Gains (2m·e − k·Σ'): node 1 → lab1 (18 > 0, moves); node 2 →
    // lab2 (10 > 8, moves); node 3 ties lab1/lab2 at 8, stays (strict
    // test); node 4 → lab4 (16 > 0, moves... to its neighbors' own
    // community, which node 4's seed label 3 never contained it);
    // nodes 5,6 best = stay (10 = 10). After: {1,3},{2},{4,5,6} —
    // e_in = 4, Σd² = 25+4+49 = 78 → Q_after = (112−78)/196.
    val twoTri = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("a", "b")
    val r = GraphEtl.louvainMove(twoTri, 1).head()
    assert(r.getAs[Long]("m") === 7L)
    assert(r.getAs[Long]("n_communities_before") === 4L)
    assert(r.getAs[Double]("modularity_before") === 2.0 / 196)
    assert(r.getAs[Long]("n_moves") === 3L)
    assert(r.getAs[Long]("n_communities_after") === 3L)
    assert(r.getAs[Double]("modularity_after") === 34.0 / 196)
    assert(GraphEtl.louvainMove(twoTri.repartition(5), 1).head() === r)
  }

  test("louvainTwoLevel: contraction weights and the phase-2 " +
    "closed-form merge, hand-checked on the bridged triangles; " +
    "partition-independent") {
    // Phase 1 = louvainMove's worked example: {1,3},{2},{4,5,6},
    // canonical labels A=1, B=2, C=4. Contraction: A-B w=2 (edges
    // 1-2, 2-3), A-C w=1 (edge 3-4); self-loops A=1, C=3. Weighted
    // degrees k_A = 3+2·1 = 5, k_B = 2, k_C = 1+2·3 = 7 (= member
    // degree sums). Phase-2 closed form (2m·w − k_a·k_b, m=7):
    // s(A→B) = 28−10 = 18 > 0, s(A→C) = 14−35 < 0 → A merges to B;
    // s(B→A) = 18 > 0 → B merges to A; s(C→A) < 0 → C stays. A and B
    // SWAP labels — the synchronous-round artifact, analogous to
    // g20's LPA oscillation: the partition structure is unchanged
    // ({1,3},{2},{4,5,6} relabeled), so Q_after = Q_mid exactly, and
    // the audit row records 2 phase-2 "moves" that net to a
    // relabeling. Deterministic, and reproduced identically by the
    // mirror. The same independence admits non-transitive CHAINS on
    // richer weight configurations (A→B while B→C: A's members end
    // labeled B after B's moved on, so the priced A∪B union never
    // forms) — n_moves_p2 is gross decisions, not realized merges;
    // modularity_after stays exact because it is recomputed on the
    // resulting flat partition. louvainLadder (g25, next test) is
    // the mutual-argmax variant where neither swaps nor chains can
    // occur — on THIS graph it realizes the A∪B merge the swap
    // squanders (Q rises 34/196 → 70/196 = +s/(2m²) = +18/98).
    val twoTri = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("a", "b")
    val r = GraphEtl.louvainTwoLevel(twoTri, 1).head()
    assert(r.getAs[Long]("m") === 7L)
    assert(r.getAs[Double]("modularity_before") === 2.0 / 196)
    assert(r.getAs[Long]("n_moves_p1") === 3L)
    assert(r.getAs[Long]("n_communities_mid") === 3L)
    assert(r.getAs[Double]("modularity_mid") === 34.0 / 196)
    assert(r.getAs[Long]("n_super_edges") === 2L)
    assert(r.getAs[Long]("n_moves_p2") === 2L)
    assert(r.getAs[Long]("n_communities_after") === 3L)
    assert(r.getAs[Double]("modularity_after") === 34.0 / 196)
    assert(GraphEtl.louvainTwoLevel(twoTri.repartition(5), 1).head() === r)
  }

  test("louvainLadder: hand-traced 2-level mutual-argmax matching on " +
    "the bridged triangles — the swap becomes a realized merge; " +
    "modularity non-decreasing; partition-independent") {
    // Phase 1 = louvainMove's worked example: {1,3},{2},{4,5,6} with
    // canonical labels A=1, B=2, C=4; Q_p1 = 34/196. Level-1 weighted
    // graph (as in the g24 test): A-B w=2, A-C w=1, k_A=5, k_B=2,
    // k_C=7, m=7. Positive-gain argmaxes: best(A)=B (s=18), best(B)=A
    // (s=18), C has none (s=−21). A–B is MUTUAL → the one matched
    // pair merges into min(1,2)=1 — where g24's independent rule
    // produced the label swap, the matching REALIZES the union:
    // {1,2,3},{4,5,6}, e_in=6, Σd²=7²+7²=98, Q_l1=(168−98)/196 =
    // 70/196 = Q_p1 + s/(2m²) = 34/196 + 18/98 — the closed-form
    // delta verified exactly. Level 2: w(1,4)=1 (the bridge), self 3
    // each, k=7 both → s = 14−49 < 0, no merge, Q holds at 70/196.
    val twoTri = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("a", "b")
    val r = GraphEtl.louvainLadder(twoTri, 2, 1).head()
    assert(r.getAs[Long]("m") === 7L)
    assert(r.getAs[Double]("modularity_before") === 2.0 / 196)
    assert(r.getAs[Long]("n_moves_p1") === 3L)
    assert(r.getAs[Long]("n_communities_p1") === 3L)
    assert(r.getAs[Double]("modularity_p1") === 34.0 / 196)
    assert(r.getAs[Long]("n_merges_l1") === 1L)
    assert(r.getAs[Long]("n_communities_l1") === 2L)
    assert(r.getAs[Double]("modularity_l1") === 70.0 / 196)
    assert(r.getAs[Long]("n_merges_l2") === 0L)
    assert(r.getAs[Long]("n_communities_l2") === 2L)
    assert(r.getAs[Double]("modularity_l2") === 70.0 / 196)
    assert(GraphEtl.louvainLadder(twoTri.repartition(5), 2, 1).head() === r)
  }

  test("louvainLadder: disjoint triangles — no super-edges, no " +
    "candidates, every level a no-op at the optimum") {
    val twoTri = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L)).toDF("a", "b")
    val r = GraphEtl.louvainLadder(twoTri, 2, 1).head()
    assert(r.getAs[Double]("modularity_p1") === 0.5)
    assert(r.getAs[Long]("n_merges_l1") === 0L)
    assert(r.getAs[Long]("n_merges_l2") === 0L)
    assert(r.getAs[Double]("modularity_l2") === 0.5)
  }

  test("louvainLadderMoves: hand-traced — the synchronous swap " +
    "oscillates across two weighted move rounds (netting identity, " +
    "counted honestly) and the matching then realizes the merge") {
    // Phase 1 as g24/g25: {1,3},{2},{4,5,6}, Q_p1 = 34/196. Level-1
    // contracted graph: A=1, B=2, C=4; A-B w=2, A-C w=1; k_A=5,
    // k_B=2, k_C=7; m=7. Weighted move round 1 from singletons is
    // g24's phase-2 closed form: s(A→B)=28−10=18>0 and s(B→A)=18>0 —
    // the SWAP (A takes B's label, B takes A's), C stays (−21). Round
    // 2 evaluates against the swapped labels and swaps BACK (the
    // synchronous oscillation, g20's LPA artifact): each round counts
    // 2 gross moves, the net fold is the identity, and
    // modularity_l1_mv = Q_p1 exactly. The mutual-argmax matching
    // then realizes the A∪B union the swaps squander: Q_l1 = 70/196.
    // Level 2: supernodes {1,4}, w=1, k=7 each → s=14−49<0: no moves
    // (0 gross — the closed form finds no positive gain), no merge.
    val twoTri = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("a", "b")
    val r = GraphEtl.louvainLadderMoves(twoTri, 2, 2, 1).head()
    assert(r.getAs[Long]("m") === 7L)
    assert(r.getAs[Double]("modularity_before") === 2.0 / 196)
    assert(r.getAs[Long]("n_moves_p1") === 3L)
    assert(r.getAs[Long]("n_communities_p1") === 3L)
    assert(r.getAs[Double]("modularity_p1") === 34.0 / 196)
    assert(r.getAs[Long]("n_moves_l1_r1") === 2L)
    assert(r.getAs[Long]("n_moves_l1_r2") === 2L)
    assert(r.getAs[Long]("n_communities_l1_mv") === 3L)
    assert(r.getAs[Double]("modularity_l1_mv") === 34.0 / 196)
    assert(r.getAs[Long]("n_merges_l1") === 1L)
    assert(r.getAs[Long]("n_communities_l1") === 2L)
    assert(r.getAs[Double]("modularity_l1") === 70.0 / 196)
    assert(r.getAs[Long]("n_moves_l2_r1") === 0L)
    assert(r.getAs[Long]("n_moves_l2_r2") === 0L)
    assert(r.getAs[Long]("n_communities_l2_mv") === 2L)
    assert(r.getAs[Double]("modularity_l2_mv") === 70.0 / 196)
    assert(r.getAs[Long]("n_merges_l2") === 0L)
    assert(r.getAs[Long]("n_communities_l2") === 2L)
    assert(r.getAs[Double]("modularity_l2") === 70.0 / 196)
    assert(GraphEtl.louvainLadderMoves(twoTri.repartition(5), 2, 2, 1)
      .head() === r)
  }

  test("louvainLadderMoves: modularity non-decreasing across EVERY " +
    "phase on the real co-supplier graph, and never below g25's " +
    "ladder at the same level count") {
    val edges = GraphEtl.coSupplierEdges(table("lineitem"))
    val r = GraphEtl.louvainLadderMoves(edges, 2, 2, 1).head()
    val phases = Seq("modularity_p1", "modularity_l1_mv", "modularity_l1",
      "modularity_l2_mv", "modularity_l2").map(c => c -> r.getAs[Double](c))
    phases.sliding(2).foreach { case Seq((na, a), (nb, b)) =>
      assert(b >= a, s"$nb decreased modularity: $na=$a -> $nb=$b")
    }
    val g25 = GraphEtl.louvainLadder(edges, 2, 1).head()
    assert(r.getAs[Double]("modularity_l2") >=
      g25.getAs[Double]("modularity_l2"),
      "the move rounds made the 2-level result WORSE than g25's " +
        "matching-only ladder")
  }

  test("louvainMovesFixpoint: hand-traced — the damper resolves the " +
    "swap the undamped rounds squander, then the recurrence stop " +
    "closes at round 3") {
    // Same fixture as the g26 hand-trace, where the UNDAMPED rounds
    // oscillate A<->B forever (2 gross moves per round, net identity).
    // Damped round 1 (descending): A may not take B's larger label,
    // so only B->A executes (s = 2·7·2 − 2·5 = 18 > 0); C stays
    // (14 − 7·5 < 0). One move realizes the A∪B union directly:
    // Q = 70/196, two communities. Round 2 (ascending): A's only
    // larger-label candidate C scores 14 − 5·7 < stay's 18; nothing
    // moves. Round 3 (descending): nothing moves, labels_3 =
    // labels_1 -> recurrence stop, three rows.
    val twoTri = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("a", "b")
    val rows = GraphEtl.louvainMovesFixpoint(twoTri, 10, 1)
      .orderBy("round")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(rows === Seq(
      (1L, 1L, 2L, 70.0 / 196),
      (2L, 0L, 2L, 70.0 / 196),
      (3L, 0L, 2L, 70.0 / 196)))
    // partitioning-independence of the whole loop (decisions, stop
    // rule, audit folds)
    assert(GraphEtl.louvainMovesFixpoint(twoTri.repartition(5), 10, 1)
      .orderBy("round")
      .as[(Long, Long, Long, Double)].collect().toSeq === rows)
  }

  test("louvainMovesFixpoint: on the real co-supplier graph the " +
    "rounds are contiguous, same-parity move counts never increase, " +
    "and the audit ends at a recurrence, not the cap") {
    val edges = GraphEtl.coSupplierEdges(table("lineitem"))
    val rows = GraphEtl.louvainMovesFixpoint(edges, 10, 1)
      .orderBy("round")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(rows.map(_._1) === (1L to rows.length))
    assert(rows.length < 10, "stopped only by the cap — no recurrence")
    // the damper's decay shape: within each direction the move count
    // is non-increasing (the cross-parity sequence may jitter — the
    // measured sf0.1 tail does — but a direction may never regress)
    Seq(0, 1).foreach { parity =>
      val par = rows.filter(r => r._1 % 2 == parity).map(_._2)
      par.sliding(2).foreach {
        case Seq(a, b) => assert(b <= a,
          s"same-parity move count rose $a -> $b in ${rows.map(_._2)}")
        case _ => ()
      }
    }
    // the loop's point: modularity ends at least where it started
    assert(rows.last._4 >= rows.head._4)
  }

  test("louvainFixpointLadder: hand-traced — level 1 replays the g27 " +
    "trace (damped swap, recurrence at round 3), the matching " +
    "declines the negative-gain cross-triangle merge, level 2 " +
    "fixpoints immediately") {
    // g27's fixture: two triangles joined by (3,4). Level-1 moves are
    // the g27 hand-trace verbatim (1 move then recurrence at round 3,
    // Q = 70/196, two communities). The match phase then scores the
    // only super-pair at s = 2·7·1 − 7·7 = −35 < 0 — no merge. Level
    // 2 (two supernodes): nothing can move in either direction
    // (best s = −35 < stay 0), so labels_2 = labels_0 and the
    // recurrence closes at round 2; its matching declines again.
    val twoTri = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("a", "b")
    val q = 70.0 / 196
    val rows = GraphEtl.louvainFixpointLadder(twoTri, 2, 10, 1)
      .as[(Long, String, Long, Long, Long, Double)].collect().toSeq
      .sortBy(r => (r._1, if (r._2 == "match") Long.MaxValue else r._3))
    assert(rows === Seq(
      (1L, "move", 1L, 1L, 2L, q),
      (1L, "move", 2L, 0L, 2L, q),
      (1L, "move", 3L, 0L, 2L, q),
      (1L, "match", 0L, 0L, 2L, q),
      (2L, "move", 1L, 0L, 2L, q),
      (2L, "move", 2L, 0L, 2L, q),
      (2L, "match", 0L, 0L, 2L, q)))
    // partitioning-independence of the whole compose
    assert(GraphEtl.louvainFixpointLadder(twoTri.repartition(5), 2, 10, 1)
      .as[(Long, String, Long, Long, Long, Double)].collect().toSeq
      .sortBy(r => (r._1, if (r._2 == "match") Long.MaxValue else r._3))
      === rows)
  }

  test("louvainFixpointLadder: on the real co-supplier graph every " +
    "level runs to a recurrence (not the cap), each match row is >= " +
    "its level's last move row (the constructive matching guarantee " +
    "on ORIGINAL edges), and modularity never decreases in execution " +
    "order") {
    val edges = GraphEtl.coSupplierEdges(table("lineitem"))
    val rows = GraphEtl.louvainFixpointLadder(edges, 2, 10, 1)
      .as[(Long, String, Long, Long, Long, Double)].collect().toSeq
      .sortBy(r => (r._1, if (r._2 == "match") Long.MaxValue else r._3))
    Seq(1L, 2L).foreach { l =>
      val lvl = rows.filter(_._1 == l)
      val moves = lvl.filter(_._2 == "move")
      assert(moves.nonEmpty && moves.map(_._3) === (1L to moves.length),
        s"level $l rounds not contiguous")
      assert(moves.length < 10, s"level $l stopped only by the cap")
      assert(lvl.last._2 === "match")
      // matching starts from the fold of the level's stop-round
      // labels — the level's last move row — and is additive-gain
      // disjoint pairs, so it may never score below it
      assert(lvl.last._6 >= moves.last._6 - 1e-12,
        s"level $l match row regressed below its move fixpoint")
    }
    // the full execution-order sequence is non-decreasing on this
    // graph (empirical, the g26 discipline — synchronous rounds do
    // not guarantee it, the damper + recurrence stop deliver it here)
    rows.map(_._6).sliding(2).foreach {
      case Seq(a, b) => assert(b >= a - 1e-12,
        s"modularity fell $a -> $b in ${rows.map(_._6)}")
      case _ => ()
    }
    // level 2 must start from level 1's matched partition: its first
    // fold can only refine modularity upward from the level-1 close
    assert(rows.filter(_._1 == 2L).head._6 >=
      rows.filter(_._1 == 1L).last._6 - 1e-12)
  }

  test("louvainLadder: modularity non-decreasing across BOTH levels " +
    "on the real co-supplier graph (the constructive guarantee, " +
    "checked on data the fixtures can't anticipate)") {
    val edges = GraphEtl.coSupplierEdges(table("lineitem"))
    val r = GraphEtl.louvainLadder(edges, 2, 1).head()
    val p1 = r.getAs[Double]("modularity_p1")
    val l1 = r.getAs[Double]("modularity_l1")
    val l2 = r.getAs[Double]("modularity_l2")
    assert(l1 >= p1, s"level 1 decreased modularity: $p1 -> $l1")
    assert(l2 >= l1, s"level 2 decreased modularity: $l1 -> $l2")
    assert(r.getAs[Long]("n_communities_l1") <=
      r.getAs[Long]("n_communities_p1"))
    assert(r.getAs[Long]("n_communities_l2") <=
      r.getAs[Long]("n_communities_l1"))
  }

  test("louvainTwoLevel: disjoint triangles — isolated supernodes " +
    "(no super-edges) keep their self-loop degrees and phase 2 is " +
    "a no-op at the optimum") {
    // LPA(1) splits each triangle {min-voted node} vs {the other
    // two}; phase 1 re-unites them (nodes 1 and 4 move, the others'
    // best gain ties their stay score and the strict test holds).
    // Contraction: two supernodes, ZERO between-edges, self-loops 3
    // each → k = 6 via the left-join degree path (the empty-symW
    // edge case). Phase 2 has no candidates → no moves. Q_mid =
    // Q_after = (4·6·6 − 2·36)/(4·36) = 0.5, the textbook value for
    // two equal disjoint cliques.
    val twoTri = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L)).toDF("a", "b")
    val r = GraphEtl.louvainTwoLevel(twoTri, 1).head()
    assert(r.getAs[Long]("m") === 6L)
    assert(r.getAs[Double]("modularity_before") === 8.0 / 144)
    assert(r.getAs[Long]("n_moves_p1") === 2L)
    assert(r.getAs[Long]("n_communities_mid") === 2L)
    assert(r.getAs[Double]("modularity_mid") === 0.5)
    assert(r.getAs[Long]("n_super_edges") === 0L)
    assert(r.getAs[Long]("n_moves_p2") === 0L)
    assert(r.getAs[Long]("n_communities_after") === 2L)
    assert(r.getAs[Double]("modularity_after") === 0.5)
  }

  test("louvainFixpointLadder: requireConvergence throws on cap " +
    "exhaustion (the d11 known-incomplete-iteration contract), " +
    "default mode folds the capped labeling") {
    // g27's fixture needs 3 rounds to recur (the hand-trace above);
    // maxRounds = 2 exhausts the cap first. The same code path fires
    // for a genuine period-3 orbit: `converged` stays false until
    // the cap, which is exactly what this pins.
    val twoTri = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("a", "b")
    val ex = intercept[IllegalStateException] {
      GraphEtl.louvainFixpointLadder(twoTri, 1, 2, 1,
        requireConvergence = true).collect()
    }
    assert(ex.getMessage.contains("cap") &&
      ex.getMessage.contains("requireConvergence"))
    // default mode: the capped level still emits its audit rows
    val rows = GraphEtl.louvainFixpointLadder(twoTri, 1, 2, 1)
      .filter(col("phase") === "move").collect()
    assert(rows.length === 2)
    // and an ample cap under strict mode converges fine
    assert(GraphEtl.louvainFixpointLadder(twoTri, 1, 10, 1,
      requireConvergence = true).collect().nonEmpty)
  }

  test("refineConnectivity: a badly-connected community (two cliques " +
    "whose bridge vertex is assigned across — the partition class " +
    "plain Louvain produces, Traag et al. 2019 Fig. 1) splits into " +
    "its components; connected communities come back label-identical") {
    // cliques {1,2,3} and {5,6,7}, chained through bridge vertex 4:
    // 3—4—5. The partition assigns BOTH cliques to community 1 but
    // the bridge to its own — so community 1's members are only
    // connected THROUGH a vertex outside it: internally disconnected.
    val edges = (Seq((1L, 2L), (1L, 3L), (2L, 3L), (5L, 6L), (5L, 7L),
      (6L, 7L)) ++ Seq((3L, 4L), (4L, 5L))).toDF("a", "b")
    val flat = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 1L), (6L, 1L),
      (7L, 1L), (4L, 4L)).toDF("v", "c")
    val refined = GraphEtl.refineConnectivity(edges, flat)
      .as[(Long, Long)].collect().toMap
    // split: {1,2,3} keeps min-member label 1, {5,6,7} gets label 5;
    // the bridge singleton is untouched
    assert(refined === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 4L -> 4L))
    // a CONNECTED community is a no-op: same graph, honest partition
    val flatOk = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 5L),
      (6L, 5L), (7L, 5L)).toDF("v", "c")
    assert(GraphEtl.refineConnectivity(edges, flatOk)
      .as[(Long, Long)].collect().toMap ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L,
        6L -> 5L, 7L -> 5L))
    // partitioning-independence (pointer jumping + min labels)
    assert(GraphEtl.refineConnectivity(edges.repartition(5),
      flat.repartition(3)).as[(Long, Long)].collect().toMap === refined)
  }

  test("refineParts: e_in(refined) = count(intra) — the r21 refine-" +
    "audit identity (an intra edge's endpoints always share a refined " +
    "label; a non-intra edge's never do)") {
    val edges = (Seq((1L, 2L), (1L, 3L), (2L, 3L), (5L, 6L), (5L, 7L),
      (6L, 7L)) ++ Seq((3L, 4L), (4L, 5L))).toDF("a", "b")
    // the badly-connected partition from the refineConnectivity test:
    // community 1 = both cliques, bridge 4 on its own
    val flat = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 1L), (6L, 1L),
      (7L, 1L), (4L, 4L)).toDF("v", "c")
    val (refined, intra) = GraphEtl.refineParts(edges, flat)
    // independent spelling of e_in(refined): edges whose endpoints get
    // equal REFINED labels (the modularityParts `within` count)
    val within = edges
      .join(refined.select(col("v").as("a"), col("c").as("ra")), "a")
      .join(refined.select(col("v").as("b"), col("c").as("rb")), "b")
      .filter(col("ra") === col("rb")).count()
    assert(intra.count() === within)
    assert(within === 6L) // the two cliques' edges; both bridge edges cross
  }

  test("louvainLeidenLadder: replays the g28 hand-trace with a " +
    "refine row per level — n_moves 0 (both communities connected, " +
    "Leiden's guarantee holding vacuously), partition unchanged") {
    val twoTri = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("a", "b")
    val q = 70.0 / 196
    def key(r: (Long, String, Long, Long, Long, Double)) =
      (r._1, r._2 match {
        case "move" => 0L; case "refine" => 1L; case _ => 2L
      }, r._3)
    val rows = GraphEtl.louvainLeidenLadder(twoTri, 2, 10, 1)
      .as[(Long, String, Long, Long, Long, Double)].collect().toSeq
      .sortBy(key)
    assert(rows === Seq(
      (1L, "move", 1L, 1L, 2L, q),
      (1L, "move", 2L, 0L, 2L, q),
      (1L, "move", 3L, 0L, 2L, q),
      (1L, "refine", 0L, 0L, 2L, q),
      (1L, "match", 0L, 0L, 2L, q),
      (2L, "move", 1L, 0L, 2L, q),
      (2L, "move", 2L, 0L, 2L, q),
      (2L, "refine", 0L, 0L, 2L, q),
      (2L, "match", 0L, 0L, 2L, q)))
    // partitioning-independence of the whole compose
    assert(GraphEtl.louvainLeidenLadder(twoTri.repartition(5), 2, 10, 1)
      .as[(Long, String, Long, Long, Long, Double)].collect().toSeq
      .sortBy(key) === rows)
  }

  test("louvainLeidenLadder: on the real co-supplier graph the g28 " +
    "invariants hold with the refine phase in the chain — splits " +
    "never lose modularity mass the match can't recover, and every " +
    "post-refine community is internally connected") {
    val edges = GraphEtl.coSupplierEdges(table("lineitem"))
    def key(r: (Long, String, Long, Long, Long, Double)) =
      (r._1, r._2 match {
        case "move" => 0L; case "refine" => 1L; case _ => 2L
      }, r._3)
    val rows = GraphEtl.louvainLeidenLadder(edges, 2, 10, 1)
      .as[(Long, String, Long, Long, Long, Double)].collect().toSeq
      .sortBy(key)
    Seq(1L, 2L).foreach { l =>
      val lvl = rows.filter(_._1 == l)
      val moves = lvl.filter(_._2 == "move")
      assert(moves.nonEmpty && moves.map(_._3) === (1L to moves.length))
      assert(moves.length < 10, s"level $l stopped only by the cap")
      val Seq(refineRow) = lvl.filter(_._2 == "refine")
      // splitting c into components removes only the (absent)
      // cross-component within-edges from e_in, so n_communities
      // grows by exactly n_moves and never shrinks
      assert(refineRow._4 >= 0L)
      assert(refineRow._5 === moves.last._5 + refineRow._4)
      assert(lvl.last._2 === "match")
    }
  }

  test("kTrussPeel: K4 survives the 4-truss at support 2; a pendant " +
    "triangle is peeled; the triangle strip cascades to empty") {
    def run(edges: org.apache.spark.sql.DataFrame, rounds: Int) =
      GraphEtl.kTrussPeel(edges, 4, rounds)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
        .toMap
    // K4 on {1,2,3,4}: each edge closes 2 triangles — all survive.
    // The pendant triangle {4,5,6} has support-1 edges — peeled in
    // round 1 and never resurrected.
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val g = (k4 ++ Seq((4L, 5L), (4L, 6L), (5L, 6L))).toDF("a", "b")
    val out = run(g, 2)
    assert(out === k4.map(e => e -> 2L).toMap)
    // triangle strip 1-2-3-4-5 ({1,2,3},{2,3,4},{3,4,5}): the shared
    // edges (2,3),(3,4) have support 2 in round 1, but peeling the
    // support-1 rim removes their triangles — round 2 empties the
    // graph, while rounds=1 still reports the two survivors. The
    // fixed-round contract is observable, like g15's.
    val strip = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (3L, 5L), (4L, 5L)).toDF("a", "b")
    assert(run(strip, 1) === Map((2L, 3L) -> 2L, (3L, 4L) -> 2L))
    assert(run(strip, 2) === Map.empty)
    // partition independence
    assert(run(g.repartition(5), 2) === out)
  }
}
