package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.codec.ImageCodec
import graft.feats.VecOps
import graft.ops.{AsOfJoin, Backfill, Sessionize, Windows}
import graft.synth.SynthImages

/** The flagship north-rule pipeline, end to end in ONE Spark plan
  * (SURVEY.md §7.2): synthetic image+caption table → filename-key parsing →
  * fused decode/resize/crop/normalize/feature UDF → caption rewrite + LOCF →
  * lag-1 feature delta → gap sessionization → per-second tumbling feature
  * mean → as-of join onto a probe grid.
  *
  * Layout decisions for 10^12 rows:
  *  - the fused codec UDF means raw pixels never leave the row pipeline —
  *    only the 54-float feature crosses any exchange;
  *  - all per-frame window features (LOCF, lag, session) share ONE window
  *    spec (entity, ts) so Catalyst plans a single exchange + sort;
  *  - the per-second aggregate is a partial-aggregating `vecAvg` groupBy on a
  *    prefix of the same key (entity, sec) — map-side combine before shuffle;
  *  - the probe as-of join is the time-bucketed AsOfJoin (hot-entity safe).
  */
object FeaturePipeline {

  val ResizeTo = 32 // 256→224 scaled to the 64px test fixture (SURVEY §5.3)
  val CropTo = 28
  val SessionGapFrames = 8L
  val AsOfBucketFrames = 64L

  /** Per-frame feature rows: entity, ts, vec, caption_filled, vec_delta,
    * session_id. */
  def frameFeatures(images: DataFrame): DataFrame = {
    val frames = SynthImages.withEntityTs(images)
    val withVec = frames
      .withColumn("vec", ImageCodec.imageFeaturesCol(col("bytes"), ResizeTo, CropTo))
      // P9 string rewrite: `imagebind_feature_extractor.py:62`
      .withColumn("caption_rw", regexp_replace(col("caption"), "#C C", "actor"))
      .drop("bytes")
    val w = Window.partitionBy(col("entity")).orderBy(col("ts"))
    val filled = Backfill.locf(withVec, "entity", "ts", Seq("caption_rw"))
      .withColumnRenamed("caption_rw_filled", "caption_filled")
      .withColumn(
        "vec_delta",
        VecOps.vecSub(
          col("vec").cast("array<double>"),
          coalesce(
            lag(col("vec"), 1).over(w).cast("array<double>"),
            col("vec").cast("array<double>"))))
    Sessionize.sessionize(filled, "entity", "ts", SessionGapFrames)
  }

  /** Per-second (30-frame) mean feature — A1/A2/A3 with explicit tail mode. */
  def secondFeatures(frameFeats: DataFrame, tail: Windows.TailMode): DataFrame =
    Windows
      .tumblingAgg(
        frameFeats.withColumn("dvec", col("vec").cast("array<double>")),
        "entity",
        "ts",
        SynthImages.Fps.toLong,
        tail,
        Seq(VecOps.vecAvg(col("dvec")).as("sec_vec")))
      .withColumnRenamed("win_id", "sec")

  /** As-of join of per-frame features onto the probe grid: for every
    * (entity, asOfTs) the latest frame at-or-before asOfTs with its filled
    * caption, feature, delta, and session id. */
  def probeFeatures(frameFeats: DataFrame, probes: DataFrame): DataFrame =
    AsOfJoin.asOf(
      probes,
      frameFeats.select(
        col("entity"),
        col("ts"),
        col("vec").as("f_vec"),
        col("caption_filled").as("f_caption"),
        col("session_id").as("f_session")),
      "entity",
      "ts",
      Seq("f_vec", "f_caption", "f_session"),
      AsOfBucketFrames) // probes carry asOfTs as the ts column

  /** Full flagship run at a given scale. */
  def run(spark: SparkSession, entities: Int, framesPerEntity: Int, probesPerEntity: Int): DataFrame = {
    val images = SynthImages.table(spark, entities, framesPerEntity)
    val ff = frameFeatures(images)
    val probes = SynthImages
      .probes(spark, entities, framesPerEntity, probesPerEntity)
      .withColumnRenamed("asOfTs", "ts")
    probeFeatures(ff, probes).withColumnRenamed("ts", "asOfTs")
  }
}
