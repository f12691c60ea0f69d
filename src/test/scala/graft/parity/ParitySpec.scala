package graft.parity

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.codec.ImageCodec
import graft.pipeline.FeaturePipeline
import graft.synth.SynthImages

/** BASELINE.json parity invariants: decoded-pixel allclose (PSNR ≥ 40 dB for
  * lossy fmt, exact for png after 8-bit quantization), feature vectors
  * allclose vs the straight-line reference math, exact caption equality,
  * zero temporal leakage. */
class ParitySpec extends SparkSpec {
  import spark.implicits._

  private val sampleFrames: Seq[(Int, Long)] =
    for (e <- 0 until 4; t <- Seq(0L, 7L, 63L, 150L) if SynthImages.framePresent(e, t, 256))
      yield (e, t)

  private def quantize(raw: Array[Float]): Array[Float] =
    raw.map(v => math.round(v * 255).toFloat / 255.0f)

  test("pixel parity: png exact, jpg PSNR >= 40 dB vs pre-encode ground truth") {
    var pngs = 0
    var jpgs = 0
    sampleFrames.foreach { case (e, t) =>
      val bytes = SynthImages.encode(e, t)
      val decoded = ImageCodec.decode(bytes)
      val truth = quantize(SynthImages.rawChw(e, t))
      if (SynthImages.fmtOf(e, t) == "png") {
        assert(decoded.sameElements(truth), s"png e$e/t$t not exact")
        pngs += 1
      } else {
        val p = RefSemantics.psnr(decoded, truth)
        assert(p >= 40.0, s"jpg e$e/t$t PSNR $p < 40dB")
        jpgs += 1
      }
    }
    assert(pngs > 0 && jpgs > 0, s"fixture must exercise both fmts (png=$pngs jpg=$jpgs)")
  }

  test("per-frame feature parity: engine UDF == straight-line reference math") {
    val df = sampleFrames
      .map { case (e, t) => (s"e$e/$t", SynthImages.encode(e, t)) }
      .toDF("id", "bytes")
      .withColumn("vec", ImageCodec.imageFeaturesCol(col("bytes"), 32, 28))
    val got = df.select($"id", $"vec").collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    sampleFrames.foreach { case (e, t) =>
      val want = RefSemantics.frameFeature(SynthImages.encode(e, t), 32, 28, ImageCodec.GridN)
      val g = got(s"e$e/$t")
      assert(g.length == want.length)
      g.zip(want).zipWithIndex.foreach { case ((a, b), i) =>
        assert(math.abs(a - b) <= 1e-5f, s"e$e/t$t dim $i: $a vs $b")
      }
    }
  }

  test("window-mean parity: engine per-second vecAvg == reference torch.mean") {
    val entities = 2
    val frames = 96
    val images = SynthImages.table(spark, entities, frames)
    val ff = FeaturePipeline.frameFeatures(images)
    val secs = FeaturePipeline
      .secondFeatures(ff, graft.ops.Windows.CeilTail)
      .select($"entity", $"sec", $"sec_vec")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getSeq[Double](2))
      .toMap
    // straight-line: group present frames by sec, mean of RefSemantics features
    val want = (for {
      e <- 0 until entities
      t <- 0L until frames.toLong
      if SynthImages.framePresent(e, t, frames)
    } yield (f"e$e%04d", t / SynthImages.Fps,
        RefSemantics.frameFeature(SynthImages.encode(e, t), 32, 28, ImageCodec.GridN)))
      .groupBy(r => (r._1, r._2))
      .map { case (k, rs) => k -> RefSemantics.windowMean(rs.map(_._3)) }
    assert(secs.keySet == want.keySet)
    want.foreach { case (k, w) =>
      secs(k).zip(w).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-4, s"$k: $a vs $b")
      }
    }
  }

  test("caption parity: LOCF'd rewritten captions exactly equal reference scan") {
    val entities = 3
    val frames = 128
    val ff = FeaturePipeline
      .frameFeatures(SynthImages.table(spark, entities, frames))
      .select($"entity", $"ts", $"caption_filled")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> Option(r.getString(2)))
      .toMap
    for (e <- 0 until entities) {
      var carried: Option[String] = None
      for (t <- 0L until frames.toLong if SynthImages.framePresent(e, t, frames)) {
        val cap = Option(SynthImages.captionAt(e, t)).map(_.replace("#C C", "actor"))
        if (cap.isDefined) carried = cap
        assert(ff((f"e$e%04d", t)) == carried, s"caption mismatch at e$e/t$t")
      }
    }
  }

  test("flagship probe join: zero temporal leakage + before-first probes null") {
    val out = FeaturePipeline.run(spark, entities = 4, framesPerEntity = 128, probesPerEntity = 6)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val leak = out.where(col(graft.ops.AsOfJoin.SrcTs) > col("asOfTs")).count()
    assert(leak == 0L, "temporal leakage detected")
    val beforeFirst = out.where(col("asOfTs") === -1L)
    assert(beforeFirst.count() == 4L)
    assert(beforeFirst.where(col("f_vec").isNotNull).count() == 0L, "before-first probe must not match")
  }
}
