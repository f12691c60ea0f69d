package graft.parity

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

/** Straight-line reimplementation of the reference extractor math — the
  * parity oracle (SURVEY.md §5.3). Deliberately written as plain nested
  * loops over one image at a time, independent of graft.codec (no shared
  * helpers beyond the JDK decoder), so the engine's fused UDF is checked
  * against a second implementation of the same spec:
  *
  *   decode → Resize(r) → CenterCrop(c) → ToTensor → Normalize(mean, std)
  *   (`frame_features/extract_features.py:92-98`) → per-window mean
  *   (`multimodal_segment_feature_extractor.py:74`).
  *
  * Resize spec: area-box resample (destination pixel = area-weighted mean of
  * covered source pixels) — the one documented resize both sides use
  * (SURVEY.md §7.5.2).
  */
object RefSemantics {

  /** HWC [0,1] decode (note: different memory order than the engine's CHW —
    * conversions are part of what parity checks). */
  def decodeHwc(bytes: Array[Byte]): Array[Array[Array[Float]]] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val h = img.getHeight
    val w = img.getWidth
    val out = Array.ofDim[Float](h, w, 3)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      out(y)(x)(0) = ((rgb >> 16) & 0xff) / 255.0f
      out(y)(x)(1) = ((rgb >> 8) & 0xff) / 255.0f
      out(y)(x)(2) = (rgb & 0xff) / 255.0f
    }
    out
  }

  def resize(src: Array[Array[Array[Float]]], outH: Int, outW: Int): Array[Array[Array[Float]]] = {
    val h = src.length
    val w = src(0).length
    val out = Array.ofDim[Float](outH, outW, 3)
    val sy = h.toDouble / outH
    val sx = w.toDouble / outW
    for (oy <- 0 until outH; ox <- 0 until outW; c <- 0 until 3) {
      val y0 = oy * sy; val y1 = (oy + 1) * sy
      val x0 = ox * sx; val x1 = (ox + 1) * sx
      var acc = 0.0
      var area = 0.0
      for (yy <- math.floor(y0).toInt until math.min(h, math.ceil(y1).toInt)) {
        val wy = math.min(y1, yy + 1.0) - math.max(y0, yy.toDouble)
        for (xx <- math.floor(x0).toInt until math.min(w, math.ceil(x1).toInt)) {
          val wx = math.min(x1, xx + 1.0) - math.max(x0, xx.toDouble)
          acc += src(yy)(xx)(c) * wy * wx
          area += wy * wx
        }
      }
      out(oy)(ox)(c) = (acc / area).toFloat
    }
    out
  }

  def centerCrop(src: Array[Array[Array[Float]]], crop: Int): Array[Array[Array[Float]]] = {
    val h = src.length
    val w = src(0).length
    val dy = (h - crop) / 2
    val dx = (w - crop) / 2
    Array.tabulate(crop, crop, 3)((y, x, c) => src(y + dy)(x + dx)(c))
  }

  def normalize(
      src: Array[Array[Array[Float]]],
      mean: Array[Float],
      std: Array[Float]): Array[Array[Array[Float]]] =
    src.map(_.map(px => Array.tabulate(3)(c => (px(c) - mean(c)) / std(c))))

  /** Same deterministic feature head as the engine (spec: per-channel 4×4
    * block means + per-channel mean/std), recomputed from HWC layout. */
  def featureHead(src: Array[Array[Array[Float]]], gridN: Int): Array[Float] = {
    val crop = src.length
    val out = new Array[Float](3 * gridN * gridN + 6)
    for (c <- 0 until 3) {
      for (gy <- 0 until gridN; gx <- 0 until gridN) {
        val y0 = gy * crop / gridN; val y1 = (gy + 1) * crop / gridN
        val x0 = gx * crop / gridN; val x1 = (gx + 1) * crop / gridN
        var acc = 0.0
        for (y <- y0 until y1; x <- x0 until x1) acc += src(y)(x)(c)
        out(c * gridN * gridN + gy * gridN + gx) = (acc / ((y1 - y0) * (x1 - x0))).toFloat
      }
      var sum = 0.0; var sumSq = 0.0
      for (y <- 0 until crop; x <- 0 until crop) {
        val v = src(y)(x)(c); sum += v; sumSq += v * v
      }
      val m = sum / (crop * crop)
      out(3 * gridN * gridN + c) = m.toFloat
      out(3 * gridN * gridN + 3 + c) = math.sqrt(math.max(0.0, sumSq / (crop * crop) - m * m)).toFloat
    }
    out
  }

  /** Full straight-line per-frame reference pipeline. */
  def frameFeature(bytes: Array[Byte], resizeTo: Int, cropTo: Int, gridN: Int): Array[Float] = {
    val n = normalize(
      centerCrop(resize(decodeHwc(bytes), resizeTo, resizeTo), cropTo),
      Array(0.485f, 0.456f, 0.406f),
      Array(0.229f, 0.224f, 0.225f))
    featureHead(n, gridN)
  }

  /** Window mean over per-frame features — `torch.mean(dim=0)`. */
  def windowMean(frames: Seq[Array[Float]]): Array[Float] = {
    val d = frames.head.length
    val out = new Array[Float](d)
    for (f <- frames; i <- 0 until d) out(i) += f(i)
    out.map(_ / frames.length)
  }

  def psnr(a: Array[Float], b: Array[Float]): Double = {
    require(a.length == b.length)
    val mse = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum / a.length
    if (mse == 0) Double.PositiveInfinity else 10 * math.log10(1.0 / mse)
  }
}
