package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Pluggable materialization seam for the iterative / materialize-once
  * operators (dedup fixpoints, pagerank rounds, the d20 position table,
  * the TF-IDF docfreq base, ...).
  *
  * Every such site needs the same two effects: (1) force the upstream
  * plan to run exactly once, and (2) keep the *next* round's plan from
  * growing (lineage truncation), so a 20-round fixpoint compiles 20
  * one-round plans instead of one 20-round-deep plan. How those effects
  * are achieved is a deployment decision, not an operator decision:
  *
  *  - [[LocalCheckpoint]] (default): `Dataset.localCheckpoint()`.
  *    Fastest — blocks live on executors with NO replication and the
  *    lineage is gone, so on a real cluster one lost executor
  *    mid-iteration kills the job unrecoverably. Right for local[*]
  *    runs, tests, and the bench; wrong for a 1000-executor 100 TB job.
  *  - [[ReliableCheckpoint]]: `Dataset.checkpoint()` to the
  *    SparkContext checkpoint directory (HDFS/S3 in production).
  *    Survives any number of executor losses; costs one distributed
  *    write + read per site. The 100 TB recommendation for long
  *    fixpoints. Requires `sparkContext.setCheckpointDir` — fails fast
  *    with Spark's own error if unset.
  *  - [[PersistReplicated]]: `localCheckpoint(eager,
  *    MEMORY_AND_DISK_2)`. Same lineage truncation as the default, but
  *    blocks replicate to 2 executors — tolerates any single-executor
  *    loss without the checkpoint-dir round-trip (a DOUBLE loss of
  *    both replicas still kills the job; ReliableCheckpoint doesn't).
  *    The middle ground for medium-length jobs on stable clusters.
  *
  * A plain `persist(MEMORY_AND_DISK_2)` + eager count is deliberately
  * NOT offered: persist retains the Catalyst lineage, and the fixpoint
  * operators reference the previous round's plan several times per
  * round (labels feeds the propagate join, the union, and the
  * convergence join), so the logical plan TREE grows ~5× per round —
  * exponential. Measured here: the d11 pointer-jumping loop under
  * persist OOMs an 8 GiB driver at 60 edges, purely in plan analysis.
  * Lineage truncation is not an optimization at these sites; it is
  * load-bearing.
  *
  * All three are eager and produce identical rows — MaterializeSpec
  * swaps strategies and asserts identical operator results, and the
  * gate suite runs green under each.
  */
object Materialize {
  sealed trait Strategy
  case object LocalCheckpoint extends Strategy
  case object ReliableCheckpoint extends Strategy
  case object PersistReplicated extends Strategy

  /** Process-wide strategy. Defaulted to the local-mode-correct choice;
    * a cluster submit flips it once at startup (before any operator
    * call) rather than threading a parameter through every operator.
    */
  @volatile var strategy: Strategy = LocalCheckpoint

  def apply[T](ds: Dataset[T]): Dataset[T] = strategy match {
    case LocalCheckpoint    => ds.localCheckpoint()
    case ReliableCheckpoint => ds.checkpoint()
    case PersistReplicated  =>
      ds.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_2)
  }

  /** Run `body` under `s`, restoring the previous strategy after —
    * spec/test helper; production code sets [[strategy]] once at
    * startup, before any operator call, and never again.
    *
    * The strategy is process-global, so concurrent `withStrategy`
    * blocks with different strategies would bleed into each other's
    * jobs; the helper serializes itself on this object to keep the
    * read-set-restore atomic. (All three strategies produce identical
    * rows — MaterializeSpec — so even a bleed is a performance bleed,
    * never a correctness one; the lock removes it anyway.)
    */
  def withStrategy[A](s: Strategy)(body: => A): A = this.synchronized {
    val prev = strategy
    strategy = s
    try body finally strategy = prev
  }

  /** [[apply]] + STATS RESET, for iterative operators whose
    * self-compounding joins defeat Catalyst's size estimation: every
    * checkpoint inherits its child plan's `sizeInBytes`
    * (LogicalRDD.rewriteStatsAndConstraints), joins MULTIPLY child
    * sizes, and a round-r frame built from joins of round-(r−1)
    * materialized frames therefore carries a BigInt whose DIGIT COUNT
    * multiplies per generation — g26's two weighted move rounds per
    * ladder level ground million-digit ToomCook products inside the
    * stats rewrite of every subsequent checkpoint (measured: the spec
    * suite ran 28+ minutes inside BigInteger.multiply before this
    * seam existed; seconds after). The RDD[Row] round trip re-enters
    * the plan as a fresh leaf with default (unknown) stats, resetting
    * the compounding at the cost of (a) a per-row Row conversion —
    * the frames this guards are COMMUNITY-sized, never corpus-sized —
    * and (b) no auto-broadcast for the reset frame, irrelevant here
    * because every small side in these operators is broadcast
    * explicitly. DataFrame-only: the reset re-derives rows through
    * the schema, which is lossless for the integral/decimal columns
    * these frames carry.
    */
  def statsReset(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val cp = Materialize(df)
    cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }

  implicit class MatOps[T](private val ds: Dataset[T]) extends AnyVal {
    /** Eagerly materialize under the configured [[strategy]]. */
    def materialized: Dataset[T] = Materialize(ds)
  }
}
