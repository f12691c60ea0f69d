package graft.multimodal

import graft.SparkSpec
import graft.multimodal.OpaqueMedia.{MediaMeta, MediaRow}

class OpaqueMediaSpec extends SparkSpec {
  import spark.implicits._

  private def blob(seed: Int, len: Int): Array[Byte] =
    Array.tabulate(len)(i => ((seed * 31 + i * 7) % 251).toByte)

  private val rows = Seq(
    MediaRow(MediaMeta("a1", "audio", "pcm", 2000L, 16000, 0, 0), blob(1, 4096)),
    MediaRow(MediaMeta("v1", "video", "raw", 5000L, 0, 64, 64), blob(2, 8192)),
    MediaRow(MediaMeta("v2", "video", "raw", 901L, 0, 64, 64), blob(3, 100)))

  test("batched media features: stable schema, deterministic vectors, batch-size independent") {
    val ds = spark.createDataset(rows)
    val f1 = OpaqueMedia.mediaFeatures(ds, batchSize = 2).collect().map(f => f.media_id -> f.vec.toSeq).toMap
    val f2 = OpaqueMedia.mediaFeatures(ds.repartition(3), batchSize = 30).collect()
      .map(f => f.media_id -> f.vec.toSeq).toMap
    assert(f1.keySet == Set("a1", "v1", "v2"))
    assert(f1.values.forall(_.length == OpaqueMedia.FeatureDim))
    assert(f1 == f2, "features must not depend on batching/partitioning")
  }

  test("decode dispatch: real WAV + depth kernels, stub only for unknown codecs") {
    // a constant-amplitude wave has equal RMS in every chunk
    val samples = Array.fill(640)(0.5f)
    val wavBytes = graft.codec.WavCodec.encodePcm16(samples, 16000)
    val wavVec = OpaqueMedia.decodeEmbed(
      MediaMeta("a", "audio", "pcm16_wav", 40L, 16000, 0, 0), wavBytes)
    assert(wavVec.length == OpaqueMedia.FeatureDim)
    val q = math.round(0.5 * 32767.0) / 32768.0 // quantized, torchaudio-normalized
    wavVec.foreach(v => assert(math.abs(v - q) < 1e-4, s"chunk RMS $v != $q"))

    // a constant depth map decodes to equal block means
    val depth = Array.fill(64)(1.0f)
    val pngBytes = graft.codec.DepthCodec.encodePng16(depth, 8, 8, 4.0f)
    val depthVec = OpaqueMedia.decodeEmbed(
      MediaMeta("d", "depth", "png16_depth", 0L, 0, 8, 8), pngBytes)
    val expect = math.round(0.25 * 65535.0) / 65535.0
    depthVec.foreach(v => assert(math.abs(v - expect) < 1e-4))

    // unknown codec falls back to the stub; malformed real-codec bytes -> zeros
    assert(
      OpaqueMedia.decodeEmbed(MediaMeta("x", "video", "h264", 0L, 0, 0, 0), blob(4, 64)).toSeq ==
        OpaqueMedia.stubDecodeEmbed(blob(4, 64)).toSeq)
    assert(
      OpaqueMedia.decodeEmbed(MediaMeta("b", "audio", "pcm16_wav", 0L, 0, 0, 0), blob(5, 10)).toSeq ==
        Seq.fill(OpaqueMedia.FeatureDim)(0.0f))
  }

  test("frameSamplePlan emits k evenly spaced frame offsets per video") {
    val df = spark.createDataset(rows).toDF()
    val plan = OpaqueMedia.frameSamplePlan(df, k = 4)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val v1 = plan.filter(_._1 == "v1").map(_._2).sorted
    assert(v1.toSeq == Seq(0L, 1666L, 3332L, 4999L))
    assert(!plan.exists(_._1 == "a1"), "audio blobs excluded")
  }
}
