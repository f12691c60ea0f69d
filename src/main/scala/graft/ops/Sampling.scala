package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling / dataset splitting.
  *
  * Training-data pipelines need SEED-STABLE splits: the same document must
  * land in the same train/val/test slice on every run, on every engine,
  * after any repartition — which rules out `rand()` (RNG state is
  * partition-dependent) and `TABLESAMPLE` (row-order-dependent). Hashing
  * the KEY is the standard answer (e.g. the "hash the URL into 10 000
  * buckets" split rule used by large corpus pipelines): pure column
  * algebra, no shuffle, reproducible bit-for-bit — and md5-based, so the
  * DuckDB oracle recomputes the exact assignment (q_hash_split).
  */
object Sampling {

  /** Stable bucket in [0, buckets) for a key: the first 8 hex chars of
    * md5(key) as an integer, mod buckets. 32 bits of hash for ≤ 10^6
    * buckets keeps modulo bias < 0.03%. */
  def hashBucket(key: Column, buckets: Int): Column =
    (conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % buckets)
      .cast("long")

  /** Keep ~rate of rows, deterministically by key. */
  def sampleByHash(df: DataFrame, keyCol: String, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1)
    df.where(hashBucket(col(keyCol), 10000) < math.round(rate * 10000))
  }

  /** Named split assignment from cumulative (name, fraction) weights, e.g.
    * Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1). Fractions are
    * quantized to 1/10000 on a stable bucket, so every row gets exactly
    * one split and the assignment survives any re-run or re-shard. */
  def assignSplit(key: Column, splits: Seq[(String, Double)]): Column = {
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "split fractions must sum to 1")
    val b = hashBucket(key, 10000)
    // quantize the CUMULATIVE sums, not each fraction: per-fraction
    // rounding can make the bounds total 9999/10001 (e.g. three 0.3333…
    // splits → 3×3333), leaving buckets assigned to no split. Cumulative
    // rounding is gap-free by construction and the last bound is exactly
    // 10000 because the fractions sum to 1.
    val bounds = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }
      .map(f => math.round(f * 10000))
    splits.zip(bounds.sliding(2).toSeq).foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), Seq(lo, hi))) =>
        when(b >= lo && b < hi, lit(name)).otherwise(acc)
    }
  }
}
