package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the two array kernels the engine
  * runs hottest (SURVEY.md §2.11-§2.12 similarity path).
  *
  * Why custom expressions: Spark's higher-order functions
  * (transform/zip_with/aggregate) are CodegenFallback — every element
  * steps through an interpreted lambda with boxing. These kernels are
  * tight primitive loops, so a codegen'd BinaryExpression keeps them
  * inside whole-stage codegen at ~10× the HOF throughput. This is the
  * preference order from the build brief: compose built-ins where
  * semantics allow; go native only where the built-in form is
  * genuinely inadequate — here, the inner loop of an O(n²·d) pairwise
  * scorer.
  */

/** Dot product over two array<double> columns.
  *
  * Null semantics mirror `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0,
  * (acc,x) -> acc+x)` EXACTLY (zip_with pads unequal lengths with
  * null; a null product nulls the running sum), so the optimizer rule
  * below may substitute one for the other without any observable
  * difference — including bit-identical float results, since both are
  * the same left-to-right accumulation.
  */
case class DotProductDbl(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductDbl =
    copy(left = newLeft, right = newRight)
}

/** SimHash over an array<long> of token hashes: bit b of the result
  * is the sign of Σ_tokens (±1 by bit b of the token hash). One
  * traversal with `bits` counters — the HOF formulation needs `bits`
  * separate interpreted folds over the array. Semantics identical to
  * the generated per-bit `aggregate(...)` chain for non-null element
  * arrays (elements are md5-derived, never null); a null ARRAY yields
  * null.
  */
case class SimHashBits(child: Expression, bits: Int)
  extends UnaryExpression {

  require(bits >= 1 && bits <= 64, s"bits must be in [1,64], got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got $t")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val cnt = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = xs.getLong(i)
      var b = 0
      while (b < bits) {
        cnt(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (cnt(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val b = ctx.freshName("b"); val h = ctx.freshName("h")
      val cnt = ctx.freshName("cnt"); val out = ctx.freshName("out")
      s"""
         |final int $n = $a.numElements();
         |final int[] $cnt = new int[$bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h = $a.getLong($i);
         |  for (int $b = 0; $b < $bits; $b++) {
         |    $cnt[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < $bits; $b++) {
         |  if ($cnt[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SimHashBits = copy(child = newChild)
}

/** Intersection cardinality of two SORTED array<long> — or, since r21,
  * array<int> — columns (e.g. sort_array(array_distinct(...))
  * token-hash sets): a two-pointer merge — O(n+m) with zero
  * allocation, vs array_intersect's per-call hash set. Elements are
  * assumed non-null (the dedup pipeline builds them from non-null
  * hashes); a null ARRAY yields null. Both sides must share one
  * element type; the int form exists so the narrowed (guide §2.3)
  * hashP sets — every value < 2³¹−1 by construction — compare without
  * a per-row widening copy back to long.
  */
case class SortedIntersectCountL(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>) or " +
          s"(array<int>, array<int>), got ($l, $r)")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect"

  private def intElems: Boolean = left.dataType match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0; var j = 0; var c = 0
    if (intElems) {
      while (i < n && j < m) {
        val u = x.getInt(i)
        val v = y.getInt(j)
        if (u == v) { c += 1; i += 1; j += 1 }
        else if (u < v) i += 1
        else j += 1
      }
    } else {
      while (i < n && j < m) {
        val u = x.getLong(i)
        val v = y.getLong(j)
        if (u == v) { c += 1; i += 1; j += 1 }
        else if (u < v) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val u = ctx.freshName("u"); val v = ctx.freshName("v")
      val (jt, get) = if (intElems) ("int", "getInt") else ("long", "getLong")
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n && $j < $m) {
         |  final $jt $u = $a.$get($i);
         |  final $jt $v = $b.$get($j);
         |  if ($u == $v) { $c++; $i++; $j++; }
         |  else if ($u < $v) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountL =
    copy(left = newLeft, right = newRight)
}

/** Product-quantization encoder: `v` (array<double>, dim d) against a
  * FLATTENED codebook `cb` (array<double>, nCodes × d — entry j is
  * cb[j·d .. (j+1)·d)) → the `m` per-subspace nearest-entry ids
  * (squared L2, subspace s spans dims [s·d/m, (s+1)·d/m)).
  *
  * Parity with the declarative form is exact: the distance is the same
  * left-to-right `(x−y)²` accumulation the HOF fold performs, and the
  * argmin keeps the FIRST (lowest-id) entry on a tie via strict `<` —
  * the `array_position(dists, array_min(dists))` tie rule. This is the
  * PQ hot loop (m·nCodes·subDim FMAs per corpus row at encode time),
  * which as nested HOFs runs interpreted with per-element boxing;
  * here it stays inside whole-stage codegen. Null/indivisible shapes
  * (d % m ≠ 0, codebook not a multiple of d) yield null.
  */
case class PqEncodeI(left: Expression, right: Expression, m: Int)
  extends BinaryExpression {

  require(m >= 1, s"m must be positive, got $m")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    val d = v.numElements()
    if (d == 0 || d % m != 0) return null
    val flat = cb.numElements()
    if (flat == 0 || flat % d != 0) return null
    val nCodes = flat / d
    val sub = d / m
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = Double.PositiveInfinity
      var bestJ = 0
      var j = 0
      while (j < nCodes) {
        var acc = 0.0
        var i = 0
        while (i < sub) {
          val diff = v.getDouble(s * sub + i) - cb.getDouble(j * d + s * sub + i)
          acc += diff * diff
          i += 1
        }
        if (acc < best) { best = acc; bestJ = j }
        j += 1
      }
      codes(s) = bestJ
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val d = ctx.freshName("d"); val flat = ctx.freshName("flat")
      val nCodes = ctx.freshName("nCodes"); val sub = ctx.freshName("sub")
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s"); val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best"); val bestJ = ctx.freshName("bestJ")
      val acc = ctx.freshName("acc"); val diff = ctx.freshName("diff")
      s"""
         |final int $d = $a.numElements();
         |final int $flat = $b.numElements();
         |if ($d == 0 || $d % $m != 0 || $flat == 0 || $flat % $d != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $nCodes = $flat / $d;
         |  final int $sub = $d / $m;
         |  final int[] $codes = new int[$m];
         |  for (int $s = 0; $s < $m; $s++) {
         |    double $best = Double.POSITIVE_INFINITY;
         |    int $bestJ = 0;
         |    for (int $j = 0; $j < $nCodes; $j++) {
         |      double $acc = 0.0;
         |      for (int $i = 0; $i < $sub; $i++) {
         |        final double $diff = $a.getDouble($s * $sub + $i)
         |          - $b.getDouble($j * $d + $s * $sub + $i);
         |        $acc += $diff * $diff;
         |      }
         |      if ($acc < $best) { $best = $acc; $bestJ = $j; }
         |    }
         |    $codes[$s] = $bestJ;
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeI =
    copy(left = newLeft, right = newRight)
}

/** Positions in [1, n] NOT covered by any interval [s, s+k-1] for the
  * starts `s` in a SORTED array<int> — the span-mask kernel of
  * exact-substring dedup (windowDupMask): a single merged-interval
  * walk, O(m + n) with one exact-sized output pass, replacing the
  * O(n × m) per-position `exists` scan of the HOF form (and keeping a
  * pathological fully-duplicated document linear instead of
  * quadratic). Starts are assumed ≥ 1 and sorted ascending (the
  * producer is sort_array(collect_list(...)) over posexplode offsets);
  * a null ARRAY or null n yields null; n ≤ 0 yields an empty array.
  */
case class KeptUncoveredPositionsI(left: Expression, right: Expression,
                                   k: Int)
  extends BinaryExpression {

  require(k >= 1, s"k must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, int), got ($l, $r)")
    }
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_kept_uncovered"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val st = a.asInstanceOf[ArrayData]
    val n = b.asInstanceOf[Int]
    val m = st.numElements()
    val out = new Array[Int](math.max(n, 0))
    var cnt = 0; var cur = 1; var i = 0
    while (i < m) {
      val s = st.getInt(i)
      val e = math.min(s - 1, n)
      var p = cur
      while (p <= e) { out(cnt) = p; cnt += 1; p += 1 }
      if (s + k > cur) cur = s + k
      i += 1
    }
    var p = cur
    while (p <= n) { out(cnt) = p; cnt += 1; p += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m"); val out = ctx.freshName("out")
      val cnt = ctx.freshName("cnt"); val cur = ctx.freshName("cur")
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val e = ctx.freshName("e"); val p = ctx.freshName("p")
      s"""
         |final int $m = $a.numElements();
         |final int[] $out = new int[java.lang.Math.max($b, 0)];
         |int $cnt = 0; int $cur = 1;
         |for (int $i = 0; $i < $m; $i++) {
         |  final int $s = $a.getInt($i);
         |  final int $e = java.lang.Math.min($s - 1, $b);
         |  for (int $p = $cur; $p <= $e; $p++) { $out[$cnt++] = $p; }
         |  if ($s + $k > $cur) $cur = $s + $k;
         |}
         |for (int $p = $cur; $p <= $b; $p++) { $out[$cnt++] = $p; }
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    java.util.Arrays.copyOf($out, $cnt));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KeptUncoveredPositionsI =
    copy(left = newLeft, right = newRight)
}

/** Longest run of equal adjacent values in a SORTED array<long> — the
  * modal frequency of the multiset (top-bigram count in the
  * repetition-signal operator) in one pass without materializing a
  * per-value count map. 0 for an empty array; elements are assumed
  * non-null (hash-derived); a null ARRAY yields null.
  */
case class MaxRunLengthL(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got $t")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_max_run"

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    var best = 0L; var run = 0L; var i = 0
    var prev = 0L
    while (i < n) {
      val v = xs.getLong(i)
      run = if (i > 0 && v == prev) run + 1 else 1L
      if (run > best) best = run
      prev = v
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val best = ctx.freshName("best"); val run = ctx.freshName("run")
      val prev = ctx.freshName("prev"); val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |long $best = 0L; long $run = 0L; long $prev = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $v = $a.getLong($i);
         |  $run = ($i > 0 && $v == $prev) ? $run + 1L : 1L;
         |  if ($run > $best) $best = $run;
         |  $prev = $v;
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MaxRunLengthL = copy(child = newChild)
}

/** Point estimate against a serialized count-min sketch:
  * `CmsEstimateL(sketch, key)` deserializes Spark's own
  * `org.apache.spark.util.sketch.CountMinSketch` wire format (the
  * binary the `count_min_sketch` aggregate emits) and returns
  * `estimateCount(key)` for a BIGINT key. Eval-only, deliberately no
  * codegen: the probe side is a handful of rows joined against a
  * 1-row broadcast sketch (q38's top-k certification pass), never a
  * corpus scan — deserialization cost is bounded by caching the last
  * sketch by reference (per-task instance, single-threaded eval).
  * Unlike HLL (q20b) and GK quantiles (q37), CMS counters merge by
  * plain addition, so the estimate is MERGE-ORDER DETERMINISTIC at
  * any parallelism given a fixed seed — and can only overestimate.
  */
case class CmsEstimateL(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedSketch:
    org.apache.spark.util.sketch.CountMinSketch = _

  override def nullSafeEval(sk: Any, key: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    if (!(bytes eq cachedBytes)) {
      cachedSketch =
        org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes)
      cachedBytes = bytes
    }
    cachedSketch.estimateCount(key.asInstanceOf[java.lang.Long])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimateL =
    copy(left = newLeft, right = newRight)
}

/** Content-defined chunks of a word array in ONE native pass: per-word
  * md5 hash (Canon.hashP convention — first 15 md5 hex chars mod
  * 2^31−1), rolling k-word polynomial (·31 combine, mod p once at the
  * end), a boundary AFTER word e (1-based) exactly when the window
  * ENDING at e hashes to 0 mod `divisor` and e is not the last word,
  * then the words sliced and space-joined per chunk. A doc shorter
  * than k words is one whole-doc chunk.
  *
  * Why native and not the transform/filter column algebra: the chunk
  * construction needs the SAME intermediate arrays (word hashes,
  * boundary positions) from INSIDE later lambdas, and `element_at(col,
  * i)` in a lambda body re-evaluates the referenced alias per element
  * once CollapseProject inlines it — higher-order functions evaluate
  * interpreted with no subexpression elimination, so the staged column
  * form degraded to O(words²) md5s per document (measured: a single
  * sf0.01 task pinned at 100% CPU for 15+ min). One expression holding
  * the whole pipeline makes the cost model structural: O(words) md5s
  * and O(words·k) multiplies per row, no cross-projection reference
  * for the optimizer to inline. Codegen emits a static call — the md5
  * loop dominates, and the expression stays inside the whole-stage
  * span instead of breaking it as CodegenFallback would.
  */
case class CdcChunksS(child: Expression, k: Int, divisor: Long)
  extends UnaryExpression {

  require(k >= 1, s"window k must be >= 1, got $k")
  require(divisor >= 1L, s"divisor must be >= 1, got $divisor")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got $t")
    }
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"

  override def nullSafeEval(a: Any): Any =
    CdcChunksS.compute(a.asInstanceOf[ArrayData], k, divisor)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CdcChunksS.compute(" +
        s"$a, $k, ${divisor}L);")

  override protected def withNewChildInternal(
      newChild: Expression): CdcChunksS = copy(child = newChild)
}

object CdcChunksS {
  private val P = 2147483647L // Canon.MersenneP
  private val Space =
    org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  /** Canon.hashP of one word: md5 hex prefix (60 bits) mod 2^31−1. */
  private def hashP(w: org.apache.spark.unsafe.types.UTF8String): Long =
    java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils
        .md5Hex(w.getBytes).substring(0, 15), 16) % P

  /** The full words→chunks pipeline (see the case class scaladoc).
    * Public + static-forwarded so generated code can call it.
    */
  def compute(words: ArrayData, k: Int, divisor: Long): ArrayData = {
    val n = words.numElements()
    val ws = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    val hw = new Array[Long](n)
    var i = 0
    while (i < n) {
      ws(i) = words.getUTF8String(i)
      hw(i) = hashP(ws(i))
      i += 1
    }
    // 1-based chunk end positions: qualifying window ends, then n
    val ends = new java.util.ArrayList[Integer]()
    var s = 0
    while (s + k <= n) {
      var poly = hw(s)
      var j = 1
      while (j < k) { poly = poly * 31L + hw(s + j); j += 1 }
      val e = s + k
      if (poly % P % divisor == 0L && e < n) ends.add(e)
      s += 1
    }
    ends.add(n)
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](
      ends.size())
    var prev = 0
    i = 0
    while (i < ends.size()) {
      val e = ends.get(i)
      out(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(
        Space, java.util.Arrays.copyOfRange(ws, prev, e): _*)
      prev = e
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.asInstanceOf[Array[Any]])
  }
}
