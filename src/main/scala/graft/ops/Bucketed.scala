package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) tables — the co-located-join primitive for
  * repeatedly-joined relations at 100 TB.
  *
  * A fact table joined on the same key every night pays a full shuffle of
  * both sides per run. Writing both sides `bucketBy(n, key)` once makes
  * every later equi-join on that key exchange-FREE: Spark recognizes the
  * matching `HashPartitioning(key, n)` output partitioning of the two
  * scans and plans a SortMergeJoin with zero ShuffleExchange operators —
  * the shuffle is paid once at write time, amortized over every join that
  * follows (BucketedSpec asserts the zero-exchange plan). `sortBy(key)`
  * additionally pre-sorts each bucket file so the merge join can skip its
  * per-task sort on Spark versions that exploit it.
  *
  * Spark constraint (public API): bucket metadata lives in the session
  * catalog, so bucketed data must be written with `saveAsTable` — a plain
  * `.parquet(path)` write silently drops the bucket spec. */
object Bucketed {

  /** Write `df` as a bucketed, per-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Equi-join two bucketed tables on their bucket key — exchange-free
    * when both were written with the same bucket count on `key`. */
  def bucketJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Number of shuffle-Exchange operators in a DataFrame's FINAL physical
    * plan — the thing bucketing is supposed to drive to zero. The query is
    * materialized first and the plan matched textually: under AQE the root
    * is an AdaptiveSparkPlanExec whose TreeNode children are empty (a
    * typed `collect` over it silently sees NO operators), while its
    * post-execution toString renders the finalized operators, query
    * stages included. "Exchange hashpartitioning" counts shuffles only —
    * BroadcastExchange prints differently and is not a shuffle. */
  def exchangeCount(df: DataFrame): Int = {
    // toRdd.count(), NOT Dataset.count(): count() builds a SEPARATE Dataset
    // (and QueryExecution) for the groupBy().count() plan, leaving THIS
    // DataFrame's adaptive plan un-finalized. Executing this Dataset's own
    // QueryExecution RDD finalizes the adaptive plan the toString below
    // renders — without materializing the result set on the driver the way
    // collect() would (only per-partition counts come back).
    df.queryExecution.toRdd.count()
    // AQE's render appends the pre-execution plan under "== Initial Plan
    // ==" — count only the FINAL section, or every exchange (including
    // ones AQE replaced with ReusedExchange) is double-counted. Count per
    // LINE, anchored past the tree-drawing prefix: a ReusedExchange node
    // renders as "ReusedExchange [...], Exchange hashpartitioning(...)" —
    // a reference to the reused shuffle, not a second data movement — and
    // a substring regex would count it (r7 review).
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    plan.linesIterator.count(l =>
      "^[\\s:+*-]*Exchange (?:hash|range)partitioning".r.findFirstIn(l).isDefined)
  }
}
