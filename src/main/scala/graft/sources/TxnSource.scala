package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ingest boundary for the block/transaction stream (SURVEY.md §2.1
  * S1-S3): anything that can produce txn-envelope DataFrames for a
  * cursor range. Fixtures and a live JSON-RPC client are
  * interchangeable behind this seam (§7.1) — the engine only ever
  * sees DataFrames.
  */
trait TxnSource {
  /** Envelopes with block in (fromExclusive, toInclusive]; None when
    * the range is not yet available (chain tip not reached).
    */
  def fetchRange(spark: SparkSession, fromExclusive: Long,
                 toInclusive: Long): Option[DataFrame]
}

/** In-code fixture source (tests / NO-ORACLE queries). */
final class FixtureTxnSource extends TxnSource {
  def fetchRange(spark: SparkSession, fromExclusive: Long,
                 toInclusive: Long): Option[DataFrame] = {
    import org.apache.spark.sql.functions.col
    val df = HeliumFixtures.txnEnvelopes(spark)
      .filter(col("block") > fromExclusive &&
        col("block") <= toInclusive)
    Some(df)
  }
}

/** T4 (follower.py:58-69): bounded retry with sleep, then SKIP — the
  * reference retries a not-yet-indexed payload up to 50× with 10 s
  * sleeps and then advances the cursor anyway (a failed block is
  * skipped, not fatal; T1 note in SURVEY §2.10). Pure policy so specs
  * can inject a fake clock.
  */
object RetryPolicy {
  /** Runs `attempt` until it yields Some, up to `maxRetries` retries,
    * sleeping between tries. Returns (result, attemptsUsed); None
    * means exhausted → caller records the skip and advances.
    */
  def withRetries[A](maxRetries: Int, sleepMs: Long,
                     sleep: Long => Unit = Thread.sleep)(
      attempt: () => Option[A]): (Option[A], Int) = {
    var tries = 0
    var out: Option[A] = None
    while (out.isEmpty && tries <= maxRetries) {
      out = attempt()
      tries += 1
      if (out.isEmpty && tries <= maxRetries) sleep(sleepMs)
    }
    (out, tries)
  }
}
