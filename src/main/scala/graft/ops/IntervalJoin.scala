package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join — north-rule operator J3, promoted from the
  * q_interval_join query body to a reusable operator (round 4).
  *
  * Semantics: pair every left row with the right rows of the SAME key
  * whose timestamp lies in `[l.ts - before, l.ts + after)` (inclusive
  * lower, exclusive upper — the reference's look-back windows, e.g.
  * "clicks in the hour before each view").
  *
  * Scale design: a naive theta-join on the range predicate degenerates to
  * a per-key cross product (the hot-key job-killer at 10^12 rows).
  * Instead both sides are time-bucketed: the right side once
  * (`floor(ts/w)`), the left side exploded to exactly the buckets its
  * window can touch — `(before + after)/w + 1` of them, a CONSTANT
  * replication factor chosen by `bucketWidth` (default `before + after`,
  * i.e. ≤ 2 buckets per left row). The join is then a plain equi-join on
  * `(key, bucket)` + a residual range predicate: one hash exchange per
  * side, hot keys spread over their time buckets exactly like
  * [[AsOfJoin]]'s salt, and Catalyst/AQE remain free to pick the
  * broadcast/shuffle strategy.
  */
object IntervalJoin {
  private val B = "__ij_bucket"

  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      lTsCol: String,
      rTsCol: String,
      before: Long,
      after: Long,
      bucketWidth: Long = 0L): DataFrame = {
    require(before >= 0 && after >= 0 && before + after > 0, "window must be non-empty")
    require(lTsCol != rTsCol, "rename one ts column — both sides survive into the output")
    val clash = left.columns.toSet.intersect(right.columns.toSet) - keyCol
    require(clash.isEmpty, s"non-key columns collide across sides: $clash — rename one side")
    val w = if (bucketWidth > 0) bucketWidth else before + after
    val r = right.withColumn(B, floor(col(rTsCol) / w))
    val l = left.withColumn(
      B,
      explode(sequence(
        floor((col(lTsCol) - before) / w),
        floor((col(lTsCol) + after) / w))))
    l.join(r, Seq(keyCol, B))
      .where(col(rTsCol) >= col(lTsCol) - before && col(rTsCol) < col(lTsCol) + after)
      .drop(B)
  }
}
