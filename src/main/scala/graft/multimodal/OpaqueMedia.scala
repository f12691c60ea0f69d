package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (audio/video/depth) columns as opaque binary + typed metadata —
  * the engine's carrier for the reference's non-RGB modalities
  * (`audio_features/imagebind_audio_feature_extractor.py`,
  * `modalities/generate_depth_frames.py`). Images decode for real
  * (graft.codec.ImageCodec); audio/video decoding needs codec libraries that
  * do not exist in this JVM, so the decode kernel below is a clearly-marked
  * DETERMINISTIC STUB — everything around it (schema, micro-batched
  * mapPartitions execution, partitioning, feature shape) is the real,
  * tested plumbing a codec drop-in would inherit.
  */
object OpaqueMedia {

  /** Typed metadata for an opaque media blob. */
  final case class MediaMeta(
      media_id: String,
      kind: String, // "audio" | "video" | "depth"
      codec: String,
      durationMs: Long,
      sampleRate: Int,
      width: Int,
      height: Int)

  final case class MediaRow(meta: MediaMeta, bytes: Array[Byte])
  final case class MediaFeature(media_id: String, kind: String, vec: Array[Float])

  val FeatureDim = 32

  /** ======== STUB ========
    * Deterministic fake "decode + embed": folds the blob into FeatureDim
    * block sums. Replace with a real codec (e.g. ffmpeg JNI) — the function
    * signature (one blob in, one fixed-width vector out) is the contract the
    * rest of the plumbing is built and tested against. */
  def stubDecodeEmbed(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    if (bytes == null) return out
    var i = 0
    while (i < bytes.length) {
      out(i % FeatureDim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    val n = math.max(1, bytes.length / FeatureDim)
    out.map(_ / n)
  }

  /** Micro-batched feature extraction: `mapPartitions` + `grouped(batch)` is
    * the Scala analog of the reference's DataLoader batching
    * (`multimodal_segment_feature_extractor.py:74,94`, batch sizes 30..2096)
    * and of mapInPandas batch shaping — a real model would run one
    * inference per group, amortizing model-call overhead, with memory
    * bounded at batchSize blobs per task. */
  def mediaFeatures(media: Dataset[MediaRow], batchSize: Int): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one "model call" per batch (stubbed per-row here)
        batch.map(r => MediaFeature(r.meta.media_id, r.meta.kind, stubDecodeEmbed(r.bytes)))
      }
    }
  }

  /** Frame-sample plumbing for video blobs: k evenly spaced virtual frame
    * offsets from typed metadata only (no decode) — the metadata-driven half
    * of UniformTemporalSubsample, usable to prune blobs before decoding. */
  def frameSamplePlan(media: DataFrame, k: Int): DataFrame =
    media
      .where(col("meta.kind") === "video")
      .select(
        col("meta.media_id").as("media_id"),
        explode(
          transform(
            sequence(lit(0), lit(k - 1)),
            i => (i * (col("meta.durationMs") - 1) / (k - 1)).cast("long"))).as("frame_ms"))
}
