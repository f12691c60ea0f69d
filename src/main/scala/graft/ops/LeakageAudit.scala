package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temporal-leakage audit — the north rule's "no feature reads rows with
  * ts > asOfTs" as a first-class, reusable check rather than a test-only
  * assertion.
  *
  * The as-of join emits `asof_src_ts` (the matched build row's timestamp)
  * precisely so this audit is a pure column predicate over the OUTPUT —
  * auditing 10^12 joined rows is one scan with a codegen'd filter + count,
  * no re-join against the build side needed. `audit` returns the violating
  * rows (empty = leak-free); `auditStats` reduces to one summary row for
  * dashboards/manifests.
  */
object LeakageAudit {

  /** Violation predicate: a feature sourced from the future. */
  def leaks(asOfTs: Column, srcTs: Column): Column =
    srcTs.isNotNull && srcTs > asOfTs

  /** Rows of `joined` whose `srcTsCol` post-dates `asOfTsCol` (must be
    * empty for a correct point-in-time join). */
  def audit(joined: DataFrame, asOfTsCol: String, srcTsCol: String): DataFrame =
    joined.where(leaks(col(asOfTsCol), col(srcTsCol)))

  /** One-row summary: total rows, matched rows, leaked rows, max lead
    * (how far into the future the worst leak reached; null when clean). */
  def auditStats(joined: DataFrame, asOfTsCol: String, srcTsCol: String): DataFrame = {
    val leak = leaks(col(asOfTsCol), col(srcTsCol))
    joined.agg(
      count(lit(1)).as("n_rows"),
      count(col(srcTsCol)).as("n_matched"),
      sum(when(leak, 1L).otherwise(0L)).as("n_leaked"),
      max(when(leak, col(srcTsCol) - col(asOfTsCol))).as("max_lead"))
  }
}
