package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bucketed tables make repeated equi-joins exchange-free: the shuffle is
  * paid once at write time, not on every join. */
class BucketedSpec extends SparkSpec {

  private val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")

  test("joining two tables bucketed on the join key plans ZERO shuffle exchanges") {
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("value"))
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id"), col("value").as("click_value"))
    Bucketed.writeBucketed(purchases, "graft_b_purchases", "user_id", 8)
    Bucketed.writeBucketed(clicks, "graft_b_clicks", "user_id", 8)
    try {
      val joined = Bucketed.bucketJoin(spark, "graft_b_purchases", "graft_b_clicks", "user_id")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      // the unbucketed same join shuffles both sides; the bucketed one
      // must not shuffle AT ALL (join AND the groupBy on the same key
      // reuse the scan partitioning)
      assert(Bucketed.exchangeCount(joined) == 0,
        s"expected exchange-free plan, got:\n${joined.queryExecution.executedPlan}")
      val unbucketed = purchases.join(clicks, "user_id")
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      assert(Bucketed.exchangeCount(unbucketed) > 0, "control: plain join must shuffle")
      // same results either way
      assert(joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
        unbucketed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_b_purchases")
      spark.sql("DROP TABLE IF EXISTS graft_b_clicks")
    }
  }
}
