package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (audio/video/depth) columns as opaque binary + typed metadata —
  * the engine's carrier for the reference's non-RGB modalities
  * (`audio_features/imagebind_audio_feature_extractor.py`,
  * `modalities/generate_depth_frames.py`).
  *
  * Decode dispatch is on `meta.codec`: formats this JVM can really decode
  * route to real kernels — `pcm16_wav` → graft.codec.WavCodec (per-chunk
  * RMS energies), `png16_depth` → graft.codec.DepthCodec (block means);
  * images decode in graft.codec.ImageCodec. Only COMPRESSED a/v codecs
  * (h264/aac/…, absent from this JVM) fall through to the clearly-marked
  * deterministic stub — everything around it (schema, micro-batched
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

  /** Real decode+embed dispatch (stub ONLY for codecs this JVM lacks). */
  def decodeEmbed(meta: MediaMeta, bytes: Array[Byte]): Array[Float] = meta.codec match {
    case "pcm16_wav" =>
      val dec = graft.codec.WavCodec.decodePcm16(bytes)
      if (dec == null) new Array[Float](FeatureDim)
      else {
        // FeatureDim chunk RMS energies of the normalized wave; the last
        // chunk absorbs the remainder, so divide by the ACTUAL per-chunk
        // count, not the nominal chunk size
        val s = dec._2
        val out = new Array[Float](FeatureDim)
        if (s.nonEmpty) {
          val chunk = math.max(1, s.length / FeatureDim)
          val counts = new Array[Int](FeatureDim)
          var i = 0
          while (i < s.length) {
            val k = math.min(i / chunk, FeatureDim - 1)
            val x = s(i) / 32768.0 // torchaudio int16 normalization
            out(k) += (x * x).toFloat
            counts(k) += 1
            i += 1
          }
          var k = 0
          while (k < FeatureDim) {
            out(k) = math.sqrt(out(k) / math.max(1, counts(k))).toFloat
            k += 1
          }
        }
        out
      }
    case "png16_depth" =>
      val d = graft.codec.DepthCodec.decodePng16(bytes)
      if (d == null) new Array[Float](FeatureDim)
      else {
        // FeatureDim block means of the normalized depth (remainder block
        // divided by its actual count — see the wav branch)
        val out = new Array[Float](FeatureDim)
        val counts = new Array[Int](FeatureDim)
        val chunk = math.max(1, d.length / FeatureDim)
        var i = 0
        while (i < d.length) {
          val k = math.min(i / chunk, FeatureDim - 1)
          out(k) += d(i)
          counts(k) += 1
          i += 1
        }
        Array.tabulate(FeatureDim)(k => out(k) / math.max(1, counts(k)))
      }
    case _ => stubDecodeEmbed(bytes)
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
        // one "model call" per batch; decode dispatches on meta.codec
        batch.map(r => MediaFeature(r.meta.media_id, r.meta.kind, decodeEmbed(r.meta, r.bytes)))
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
