package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType}

import graft.functions.{CmsEstimateL, DotProductDbl,
  KeptUncoveredPositionsI, MaxRunLengthL, PqEncodeI, SimHashBits,
  SortedIntersectCountL}

/** Optimizer rule: recognize the declarative dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, x) -> acc + x)
  *
  * and substitute the codegen'd native kernel (DotProductDbl). The two
  * forms are observably identical — same null semantics, same
  * left-to-right IEEE accumulation — so this is a pure physical
  * improvement: call sites stay declarative (Canon.dot), and any
  * session loading GraftExtensions executes them natively. The
  * Spark-first shape the build brief asks for: declare the plan, let
  * a Rule pick the better realization.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isIdentityLambda(finish: Expression): Boolean =
    finish match {
      case LambdaFunction(v1: NamedLambdaVariable,
          Seq(v2: NamedLambdaVariable), _) => v1.exprId == v2.exprId
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(l, r, LambdaFunction(
            Multiply(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
            Seq(x2: NamedLambdaVariable, y2: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(
            Add(a1: NamedLambdaVariable, e1: NamedLambdaVariable, _),
            Seq(a2: NamedLambdaVariable, e2: NamedLambdaVariable), _),
          finish)
        if x1.exprId == x2.exprId && y1.exprId == y2.exprId &&
          a1.exprId == a2.exprId && e1.exprId == e2.exprId &&
          isIdentityLambda(finish) =>
        DotProductDbl(l, r)
    }
}

/** SQL-text surface for the native kernels (SURVEY §2.11): every
  * codegen'd Catalyst expression registered as a session function, so
  * `spark.sql("SELECT graft_dot(a, b) ...")` reaches the same kernel
  * the Column API does — the injectFunction half of the extension
  * contract. Kernels with a required-constant parameter (PQ subspace
  * count, interval width) take it as an integer LITERAL argument and
  * fail analysis otherwise — the parameter shapes the generated code,
  * so a per-row value is not expressible.
  */
object GraftFunctions {

  private def litInt(e: Expression, fn: String, arg: String): Int =
    e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an INT literal, got ${other.sql}")
    }

  private def arity(fn: String, args: Seq[Expression], n: Int*): Unit =
    if (!n.contains(args.length))
      throw new IllegalArgumentException(
        s"$fn expects ${n.mkString(" or ")} arguments, got ${args.length}")

  private def fd(name: String, usage: String)(
      builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      // 5-arg form: (className, db, name, usage, extended) — the
      // 3-arg form is (className, db, name) and would register the
      // usage text AS the function name, garbling DESCRIBE FUNCTION.
      new ExpressionInfo("graft.functions", null, name, usage, ""),
      builder)

  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    fd("graft_dot",
      "graft_dot(array<double>, array<double>) - left-fold dot product") {
      args => arity("graft_dot", args, 2)
        DotProductDbl(args(0), args(1))
    },
    fd("graft_simhash",
      "graft_simhash(array<bigint>[, bits]) - sign-bit sketch") { args =>
      arity("graft_simhash", args, 1, 2)
      SimHashBits(args(0),
        if (args.length == 2) litInt(args(1), "graft_simhash", "bits")
        else 64)
    },
    fd("graft_sorted_intersect",
      "graft_sorted_intersect(array<bigint>, array<bigint>) - " +
        "intersection size of two sorted distinct arrays") { args =>
      arity("graft_sorted_intersect", args, 2)
      SortedIntersectCountL(args(0), args(1))
    },
    fd("graft_max_run",
      "graft_max_run(array<bigint>) - modal frequency of a sorted array") {
      args => arity("graft_max_run", args, 1)
        MaxRunLengthL(args(0))
    },
    fd("graft_pq_encode",
      "graft_pq_encode(array<double>, array<double>, m) - PQ codes " +
        "against a flat codebook") { args =>
      arity("graft_pq_encode", args, 3)
      PqEncodeI(args(0), args(1), litInt(args(2), "graft_pq_encode", "m"))
    },
    fd("graft_kept_uncovered",
      "graft_kept_uncovered(array<int>, n, k) - positions of [1,n] " +
        "not covered by k-wide intervals at the given starts") { args =>
      arity("graft_kept_uncovered", args, 3)
      KeptUncoveredPositionsI(args(0), args(1),
        litInt(args(2), "graft_kept_uncovered", "k"))
    },
    fd("graft_cms_estimate",
      "graft_cms_estimate(binary, bigint) - point estimate of a key " +
        "against a count_min_sketch aggregate's binary") { args =>
      arity("graft_cms_estimate", args, 2)
      CmsEstimateL(args(0), args(1))
    })
}

/** Session extensions entry point (SparkSession.builder
  * .withExtensions(new GraftExtensions) — wired in Sessions.tuned).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteDotProduct)
    GraftFunctions.all.foreach(ext.injectFunction)
  }
}
