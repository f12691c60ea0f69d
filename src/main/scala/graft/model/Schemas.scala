package graft.model

/** Canonical engine data model (SURVEY.md §1.4, BASELINE.json input_hint).
  *
  * The reference (CaptainCook4D/feature_extractors) materializes these as
  * directory trees of jpg/npz/json files keyed by filename conventions
  * (`frame_utils.py:48`, `segment_features/segment_feature_extractor.py:82`);
  * here each is an explicit Spark schema over Parquet.
  */
object Schemas {
  /** One encoded image + caption pair — the 10^12-row input table.
    * `image_id = "<entity>/frame_%06d"` mirrors the reference's frame naming
    * (`frame_utils.py:48`); `caption` is sparse (nullable) like per-second
    * narrations (`text_features/generate_narration.py:113-119`); `phash`
    * carries the hot-cluster skew the salted as-of path must absorb. */
  final case class ImageRow(
      image_id: String,
      bytes: Array[Byte],
      w: Int,
      h: Int,
      fmt: String,
      caption: String, // nullable
      phash: Long)

  /** Decoded/derived per-frame feature vector keyed by (entity, ts) —
    * the engine's equivalent of one row of a reference .npz matrix
    * (`test_data.py:7`, `reshape((-1, 1024))`). */
  final case class FeatureRow(entity: String, ts: Long, vec: Array[Float])

  /** Per-second narration rows (`generate_narration.py:113-119`). */
  final case class CaptionRow(entity: String, sec: Int, lines: Seq[String])

  /** Checkpoint/lineage manifest entry (FIXTURES.md §4) — the engine's
    * upgrade of the reference's skip-if-exists resume
    * (`segment_feature_extractor.py:47-49`, `video_batch.py:8-10`). */
  final case class ManifestEntry(
      snapshotId: Long,
      partition: String,
      inputFiles: Seq[String],
      rowCount: Long,
      featureDigest: String,
      completedAt: Long)
}
