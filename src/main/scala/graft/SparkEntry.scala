package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.feats.VecOps
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry is one operator from SURVEY.md §2 run over the
  * driver testdata at `dir`; `oracleSql` holds the equivalent ANSI SQL the
  * driver runs in DuckDB on the same parquet. Column names are aliased
  * identically on both sides (the driver sorts columns by name and hashes
  * values). Floating aggregates are rounded on both sides so fp summation
  * order (Spark vs DuckDB) cannot flip the hash.
  */
object SparkEntry {

  private val HourUs = 3600L * 1000000L
  private val DayUs = 24L * HourUs
  private val SessionGapUs = 6L * HourUs // 6h inactivity ⇒ new session
  /** time-bucket width for the bucketed (salted) as-of join: 2 days of
    * micros ⇒ ~15 buckets over the 30-day testdata; at 10^12 rows the same
    * code spreads a hot entity over (span/width) tasks. */
  private val AsOfBucketUs = 2L * DayUs

  private def ev(s: SparkSession, dir: String): DataFrame =
    // ts is TIMESTAMP_NTZ in the parquet; session tz is pinned UTC, so the
    // cast makes unix_micros agree with DuckDB's epoch_us on the naive value.
    s.read.parquet(s"$dir/events.parquet")
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))

  /** Flagship: the full north-rule pipeline — synthetic image+caption table
    * → fused decode/feature UDF → caption LOCF → lag-delta → sessionize →
    * as-of join onto the probe grid — at tiny scale (FIXTURES.md §1).
    * Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.pipeline.FeaturePipeline.run(spark, entities = 8, framesPerEntity = 256, probesPerEntity = 8)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- J2: point-in-time / as-of join (flagship operator) ----
    "q_asof_join" -> ((s, dir) => {
      val e = ev(s, dir)
      val probes = e
        .filter(col("event_type") === "purchase")
        .select(
          col("user_id"),
          col("ts_us"),
          col("event_id"),
          round(col("value"), 4).as("purchase_value"))
      val build = e
        .filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"), col("value").as("click_value"))
      AsOfJoin
        .asOf(probes, build, "user_id", "ts_us", Seq("click_value"), AsOfBucketUs)
        .select(
          col("user_id"),
          col("ts_us"),
          col("event_id"),
          col("purchase_value"),
          col(AsOfJoin.SrcTs).as("click_ts_us"),
          round(col("click_value"), 4).as("click_value"))
    }),
    // same semantics, explicit repartitionByRange + secondary-sort merge path
    "q_asof_merge" -> ((s, dir) => {
      val e = ev(s, dir)
      val probes = e
        .filter(col("event_type") === "purchase")
        .select(
          col("user_id"),
          col("ts_us"),
          col("event_id"),
          round(col("value"), 4).as("purchase_value"))
      val build = e
        .filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"), col("value").as("click_value"))
      AsOfJoin
        .asOfMerge(probes, build, "user_id", "ts_us", Seq("click_value"), AsOfBucketUs)
        .select(
          col("user_id"),
          col("ts_us"),
          col("event_id"),
          col("purchase_value"),
          col(AsOfJoin.SrcTs).as("click_ts_us"),
          round(col("click_value"), 4).as("click_value"))
    }),
    // ---- W8: LOCF backfill ----
    "q_locf_backfill" -> ((s, dir) => {
      val e = ev(s, dir).withColumn(
        "sparse_value",
        when(col("event_type") === "purchase", col("value")))
      Backfill
        .locf(e, "user_id", "ts_us", Seq("sparse_value"), Seq("event_id"))
        .select(
          col("user_id"),
          col("event_id"),
          col("ts_us"),
          round(col("sparse_value_filled"), 4).as("locf_value"))
    }),
    // same semantics via the skew-proof bucketed LOCF
    "q_locf_bucketed" -> ((s, dir) => {
      val e = ev(s, dir).withColumn(
        "sparse_value",
        when(col("event_type") === "purchase", col("value")))
      Backfill
        .locfBucketed(e, "user_id", "ts_us", "sparse_value", AsOfBucketUs, Seq("event_id"))
        .select(
          col("user_id"),
          col("event_id"),
          col("ts_us"),
          round(col("sparse_value_filled"), 4).as("locf_value"))
    }),
    // ---- W6: lag/lead + delta ----
    "q_lag_lead" -> ((s, dir) => {
      LagLead
        .withLagLead(ev(s, dir), "user_id", "ts_us", "value", 1, Seq("event_id"))
        .select(
          col("user_id"),
          col("event_id"),
          col("ts_us"),
          round(col("value"), 4).as("v"),
          round(col("value_lag1"), 4).as("lag_v"),
          round(col("value_lead1"), 4).as("lead_v"),
          round(col("value_delta1"), 4).as("delta_v"))
    }),
    // ---- W9: gap sessionization ----
    "q_sessionize" -> ((s, dir) => {
      Sessionize
        .sessionize(ev(s, dir), "user_id", "ts_us", SessionGapUs, Seq("event_id"))
        .select(col("user_id"), col("event_id"), col("ts_us"), col("session_id"))
    }),
    "q_session_stats" -> ((s, dir) => {
      Sessionize
        .sessionStats(ev(s, dir), "user_id", "ts_us", SessionGapUs, "value", Seq("event_id"))
        .select(
          col("user_id"),
          col("session_id"),
          col("n_rows"),
          col("session_start"),
          col("session_end"),
          col("duration"),
          round(col("avg_value"), 4).as("avg_value"))
    }),
    // ---- W1/A2: tumbling window aggregate (1 day) ----
    "q_tumbling_window" -> ((s, dir) => {
      ev(s, dir)
        .groupBy(col("user_id"), floor(col("ts_us") / DayUs).as("win_id"))
        .agg(count(lit(1)).as("n"), round(avg(col("value")), 4).as("avg_v"))
    }),
    // ---- W3: trailing sliding mean (3 preceding + current rows) ----
    "q_sliding_window" -> ((s, dir) => {
      Windows
        .trailingMean(ev(s, dir), "user_id", "ts_us", "value", 3, "sliding_avg", Seq("event_id"))
        .select(
          col("user_id"),
          col("event_id"),
          col("ts_us"),
          round(col("sliding_avg"), 4).as("sliding_avg"))
    }),
    // ---- W5: uniform temporal subsample, k=4 per (user, day) ----
    "q_subsample" -> ((s, dir) => {
      val withWin = ev(s, dir).withColumn("win_id", floor(col("ts_us") / DayUs))
      Windows
        .uniformSubsample(withWin, "user_id", "win_id", "ts_us", 4, Seq("event_id"))
        .select(col("user_id"), col("win_id"), col("event_id"), col("ts_us"))
    }),
    // ---- J3: interval (range) join via time-bucketing — clicks in the
    //      hour before each view ----
    "q_interval_join" -> ((s, dir) => {
      val e = ev(s, dir)
      val views = e
        .filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val clicks = e
        .filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("c_ts"))
        .withColumn("bucket", floor(col("c_ts") / HourUs))
      // Each view probes exactly the two hour-buckets its 1h look-back can
      // touch — an equi-join on (user, bucket) + residual range predicate, so
      // the range join never degenerates to a per-user cross product.
      val matched = views
        .withColumn(
          "bucket",
          explode(sequence(floor(col("ts_us") / HourUs) - 1, floor(col("ts_us") / HourUs))))
        .join(clicks, Seq("user_id", "bucket"))
        .where(col("c_ts") >= col("ts_us") - HourUs && col("c_ts") < col("ts_us"))
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n"))
      views
        .select(col("event_id"))
        .join(matched, Seq("event_id"), "left_outer")
        .select(col("event_id"), coalesce(col("n"), lit(0L)).as("n_clicks"))
    }),
    // ---- J4: anti-join vs completed manifest (resume semantics) ----
    "q_anti_join" -> ((s, dir) => {
      val e = ev(s, dir)
      val completed = e
        .filter(col("event_type") === "error" && col("value") > 90)
        .select(col("user_id"))
        .distinct()
      e.join(completed, Seq("user_id"), "left_anti")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"))
    }),
    // ---- A1-A4: element-wise vector mean (vecAvg Aggregator) ----
    "q_vec_avg" -> ((s, dir) => {
      s.read
        .parquet(s"$dir/embeddings.parquet")
        .groupBy(col("label"))
        .agg(
          VecOps.vecAvg(col("embedding").cast("array<double>")).as("raw"),
          count(lit(1)).as("n"))
        .select(col("label"), VecOps.vecRound(col("raw"), 4).as("vec_avg"), col("n"))
    }),
    // ---- generic agg/join sanity (TPC-H-ish) ----
    "q1_agg" -> ((s, dir) => {
      s.read
        .parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("n"))
    }),
    "q_join_agg" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val o = s.read.parquet(s"$dir/orders.parquet")
      val c = s.read.parquet(s"$dir/customer.parquet")
      val n = s.read.parquet(s"$dir/nation.parquet")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n"))
    }),
    "q_topk" -> ((s, dir) => {
      s.read
        .parquet(s"$dir/orders.parquet")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
    }),
    // ---- flagship image pipeline (P6, A1, W6, W8, W9, J2 fused) — not
    //      SQL-expressible (image decode); parity is asserted in ParitySpec,
    //      driver records a rows-only check ----
    "q_image_pipeline" -> ((s, _) => {
      graft.pipeline.FeaturePipeline
        .run(s, entities = 8, framesPerEntity = 256, probesPerEntity = 8)
        .select(
          col("entity"),
          col("asOfTs"),
          col(AsOfJoin.SrcTs),
          col("f_caption"),
          col("f_session"),
          graft.feats.VecOps.vecRound(col("f_vec").cast("array<double>"), 4).as("f_vec"))
    }),
    // per-second tumbling mean features with BOTH tail semantics (A2 vs A3)
    "q_image_seconds_ceil" -> ((s, _) => {
      val ff = graft.pipeline.FeaturePipeline
        .frameFeatures(graft.synth.SynthImages.table(s, 8, 256))
      graft.pipeline.FeaturePipeline
        .secondFeatures(ff, Windows.CeilTail)
        .select(col("entity"), col("sec"), col("win_n"),
          graft.feats.VecOps.vecRound(col("sec_vec"), 4).as("sec_vec"))
    }),
    "q_image_seconds_floor" -> ((s, _) => {
      val ff = graft.pipeline.FeaturePipeline
        .frameFeatures(graft.synth.SynthImages.table(s, 8, 256))
      graft.pipeline.FeaturePipeline
        .secondFeatures(ff, Windows.FloorTail)
        .select(col("entity"), col("sec"), col("win_n"),
          graft.feats.VecOps.vecRound(col("sec_vec"), 4).as("sec_vec"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = {
    val asofSql =
      """SELECT p.user_id AS user_id, epoch_us(p.ts) AS ts_us, p.event_id AS event_id,
        |       round(p.value, 4) AS purchase_value,
        |       epoch_us(b.ts) AS click_ts_us, round(b.value, 4) AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS value FROM events
        |                WHERE event_type = 'click' GROUP BY user_id, ts) b
        |  ON p.user_id = b.user_id AND p.ts >= b.ts""".stripMargin
    val locfSql =
      """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  round(last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS locf_value
        |FROM events""".stripMargin
    Map(
      "q_asof_join" -> asofSql,
      "q_asof_merge" -> asofSql,
      "q_locf_backfill" -> locfSql,
      "q_locf_bucketed" -> locfSql,
      "q_lag_lead" ->
        """SELECT user_id, event_id, epoch_us(ts) AS ts_us, round(value, 4) AS v,
          |  round(lag(value) OVER w, 4) AS lag_v,
          |  round(lead(value) OVER w, 4) AS lead_v,
          |  round(value - lag(value) OVER w, 4) AS delta_v
          |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
      "q_sessionize" ->
        """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
          |  CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
          |FROM (
          |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
          |                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 21600000000 THEN 1
          |            ELSE 0 END AS is_new
          |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))""".stripMargin,
      "q_session_stats" ->
        """WITH sess AS (
          |  SELECT user_id, value, epoch_us(ts) AS ts_us,
          |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
          |  FROM (
          |    SELECT *, CASE WHEN lag(ts) OVER w IS NULL
          |                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 21600000000 THEN 1
          |              ELSE 0 END AS is_new
          |    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)))
          |SELECT user_id, session_id, count(*) AS n_rows,
          |  min(ts_us) AS session_start, max(ts_us) AS session_end,
          |  max(ts_us) - min(ts_us) AS duration,
          |  round(avg(value), 4) AS avg_value
          |FROM sess GROUP BY user_id, session_id""".stripMargin,
      "q_tumbling_window" ->
        """SELECT user_id, epoch_us(ts) // 86400000000 AS win_id,
          |  count(*) AS n, round(avg(value), 4) AS avg_v
          |FROM events GROUP BY 1, 2""".stripMargin,
      "q_sliding_window" ->
        """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
          |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS sliding_avg
          |FROM events""".stripMargin,
      "q_subsample" ->
        """WITH g AS (
          |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
          |    epoch_us(ts) // 86400000000 AS win_id,
          |    row_number() OVER (PARTITION BY user_id, epoch_us(ts) // 86400000000
          |                       ORDER BY ts, event_id) - 1 AS rn,
          |    count(*) OVER (PARTITION BY user_id, epoch_us(ts) // 86400000000) AS n
          |  FROM events)
          |SELECT user_id, win_id, event_id, ts_us FROM g
          |WHERE rn IN (CAST(round(0 * (n - 1) / 3.0) AS BIGINT),
          |             CAST(round(1 * (n - 1) / 3.0) AS BIGINT),
          |             CAST(round(2 * (n - 1) / 3.0) AS BIGINT),
          |             CAST(round(3 * (n - 1) / 3.0) AS BIGINT))""".stripMargin,
      "q_interval_join" ->
        """SELECT v.event_id AS event_id, count(c.ts) AS n_clicks
          |FROM (SELECT * FROM events WHERE event_type = 'view') v
          |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          |  ON v.user_id = c.user_id AND c.ts >= v.ts - INTERVAL 1 HOUR AND c.ts < v.ts
          |GROUP BY v.event_id""".stripMargin,
      "q_anti_join" ->
        """SELECT user_id, count(*) AS n FROM events e
          |WHERE NOT EXISTS (SELECT 1 FROM events x
          |                  WHERE x.user_id = e.user_id
          |                    AND x.event_type = 'error' AND x.value > 90)
          |GROUP BY user_id""".stripMargin,
      "q_vec_avg" ->
        """WITH e AS (
          |  SELECT label, unnest(embedding)::DOUBLE AS v,
          |         unnest(range(1, len(embedding) + 1)) AS pos
          |  FROM embeddings),
          |a AS (SELECT label, pos, avg(v) AS m FROM e GROUP BY label, pos),
          |c AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label)
          |SELECT a.label AS label, list(round(m, 4) ORDER BY pos) AS vec_avg, max(c.n) AS n
          |FROM a JOIN c USING (label) GROUP BY a.label""".stripMargin,
      "q1_agg" ->
        """SELECT l_returnflag, l_linestatus,
          |  round(sum(l_quantity), 2) AS sum_qty,
          |  round(sum(l_extendedprice), 2) AS sum_base,
          |  round(avg(l_discount), 6) AS avg_disc,
          |  count(*) AS n
          |FROM lineitem GROUP BY 1, 2""".stripMargin,
      "q_join_agg" ->
        """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
          |  count(*) AS n
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY n_name""".stripMargin,
      "q_topk" ->
        """SELECT o_orderkey, round(o_totalprice, 2) AS price
          |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin
    )
  }
}
