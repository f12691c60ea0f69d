package graft.synth

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas.ImageRow

/** Deterministic synthetic image+caption table (FIXTURES.md §1) —
  * the in-sandbox stand-in for the 10^12-row Iceberg input
  * (BASELINE.json input_hint: image_id, bytes, w, h, fmt, caption, phash).
  *
  * Every field is a pure function of (seed, entity, ts) via splittable
  * mixing — NO runtime randomness — so any partition regenerates
  * independently and byte-identically: the property the resume/lineage tests
  * rely on, and the reason the generator itself scales (spark.range →
  * mapPartitions, zero shuffle, embarrassingly parallel).
  *
  * Shape mirrors the reference data model: `image_id = "e%04d/frame_%06d"`
  * (`frame_utils.py:48`), 30 fps seconds (`segment_feature_extractor.py:38`),
  * sparse captions ~1-in-5 frames ending in the literal "#C C" that
  * `text_features/imagebind_feature_extractor.py:62` rewrites, fmt split
  * png (exact parity) / jpg (PSNR≥40dB parity), deterministic frame-range
  * GAPS per entity (sessionization + as-of work), and Zipf-skewed phash
  * cluster ids (hot-key skew the salted as-of path must absorb).
  */
object SynthImages {

  ImageIO.setUseCache(false) // memory-cached encode streams (see ImageCodec)

  val Seed = 42L
  val Fps = 30
  val ImgW = 64
  val ImgH = 64
  val PhashClusters = 64
  val ZipfS = 1.2

  /** splittable deterministic 64-bit mix (xxhash-style avalanche). */
  def mix(a: Long, b: Long, c: Long = 0L): Long = {
    var x = Seed ^ (a * 0x9e3779b97f4a7c15L) ^ (b * 0xc2b2ae3d27d4eb4fL) ^ (c * 0x165667b19e3779f9L)
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x & Long.MaxValue
  }

  /** Zipf(s) inverse-CDF over [1, PhashClusters] — injected hot-key skew. */
  private lazy val zipfCdf: Array[Double] = {
    val w = (1 to PhashClusters).map(k => 1.0 / math.pow(k, ZipfS))
    val z = w.sum
    w.map(_ / z).scanLeft(0.0)(_ + _).tail.toArray
  }

  def zipfCluster(u: Double): Int = {
    val i = java.util.Arrays.binarySearch(zipfCdf, u)
    val idx = if (i >= 0) i else -i - 1
    math.min(idx, PhashClusters - 1) + 1
  }

  /** Frame present? Deterministic gaps: drop 16-frame ranges where the range
    * hash lands in 1/5 of the space, plus a per-entity tail truncation so
    * some entities end mid-window (ceil vs floor tail divergence). */
  def framePresent(entity: Int, ts: Long, framesPerEntity: Int): Boolean = {
    val tail = framesPerEntity - (entity % 7) * 3
    ts < tail && mix(entity.toLong, ts >>> 4, 7L) % 5 != 0
  }

  def captionAt(entity: Int, ts: Long): String = {
    if (mix(entity.toLong, ts, 13L) % 5 != 0) null
    else s"cap e$entity ${ts / Fps} #C C"
  }

  /** [0,1] pixel value — smooth per-entity gradient + 8×8-block hash pattern
    * with a per-frame phase so features are non-trivial and order-sensitive.
    * Smoothness keeps JPEG round-trip PSNR comfortably over 40 dB. */
  def pixel(entity: Int, ts: Long, c: Int, x: Int, y: Int): Float = {
    val gx = x.toFloat / (ImgW - 1)
    val gy = y.toFloat / (ImgH - 1)
    val base = c match {
      case 0 => 0.25f + 0.5f * gx
      case 1 => 0.25f + 0.5f * gy
      case _ => 0.25f + 0.25f * (gx + gy)
    }
    val block = mix(entity.toLong * 31 + c, ts, ((x >> 3).toLong << 16) | (y >> 3).toLong)
    val noise = ((block % 1000) / 1000.0f - 0.5f) * 0.08f
    val phase = ((mix(entity.toLong, ts, 3L) % 100) / 100.0f - 0.5f) * 0.1f
    math.min(1.0f, math.max(0.0f, base + noise + phase))
  }

  /** Render the raw CHW float image (the pre-encode ground truth the PSNR
    * parity test compares decoded pixels against). */
  def rawChw(entity: Int, ts: Long): Array[Float] = {
    val out = new Array[Float](3 * ImgH * ImgW)
    var c = 0
    while (c < 3) {
      var y = 0
      while (y < ImgH) {
        var x = 0
        while (x < ImgW) {
          out(c * ImgH * ImgW + y * ImgW + x) = pixel(entity, ts, c, x, y)
          x += 1
        }
        y += 1
      }
      c += 1
    }
    out
  }

  def fmtOf(entity: Int, ts: Long): String =
    if (mix(entity.toLong, ts, 29L) % 2 == 0) "png" else "jpg"

  /** Encode one frame; `writerCache` lets mapPartitions reuse the JPEG
    * writer across rows (writer construction is the expensive part). */
  def encode(entity: Int, ts: Long): Array[Byte] = {
    val img = new BufferedImage(ImgW, ImgH, BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < ImgH) {
      var x = 0
      while (x < ImgW) {
        val r = (pixel(entity, ts, 0, x, y) * 255).round.toInt
        val g = (pixel(entity, ts, 1, x, y) * 255).round.toInt
        val b = (pixel(entity, ts, 2, x, y) * 255).round.toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    if (fmtOf(entity, ts) == "png") {
      ImageIO.write(img, "png", bos)
    } else {
      val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
      val params = writer.getDefaultWriteParam
      params.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(0.92f)
      val ios = ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new IIOImage(img, null, null), params)
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  def rowOf(entity: Int, ts: Long): ImageRow = {
    val cluster = zipfCluster((mix(entity.toLong, ts, 41L) % 100000) / 100000.0)
    ImageRow(
      image_id = f"e$entity%04d/frame_$ts%06d",
      bytes = encode(entity, ts),
      w = ImgW,
      h = ImgH,
      fmt = fmtOf(entity, ts),
      caption = captionAt(entity, ts),
      phash = mix(cluster.toLong, 0L, 97L)) // one stable phash per cluster
  }

  /** The synthetic table as a DataFrame: `entities × framesPerEntity` grid
    * minus deterministic gaps. One narrow `spark.range` → `mapPartitions`
    * render — no shuffle, embarrassingly parallel, any partition
    * regenerable in isolation. */
  def table(spark: SparkSession, entities: Int, framesPerEntity: Int): DataFrame = {
    import spark.implicits._
    spark
      .range(0L, entities.toLong * framesPerEntity, 1L,
        math.min(spark.sparkContext.defaultParallelism * 2, entities * framesPerEntity))
      .mapPartitions { it =>
        it.flatMap { id =>
          val entity = (id / framesPerEntity).toInt
          val ts = id % framesPerEntity
          if (framePresent(entity, ts, framesPerEntity)) Iterator.single(rowOf(entity, ts))
          else Iterator.empty
        }
      }
      .toDF()
  }

  /** Metadata-only projection of [[table]]: the identical (entity, ts,
    * caption) grid WITHOUT the pixel encode — exported to parquet by
    * q_image_meta so the DuckDB oracle can hash-check the flagship's
    * SQL-expressible half (caption LOCF, sessionization, as-of probe join)
    * over byte-identical input. */
  def metaTable(spark: SparkSession, entities: Int, framesPerEntity: Int): DataFrame = {
    import spark.implicits._
    spark
      .range(0L, entities.toLong * framesPerEntity, 1L,
        math.min(spark.sparkContext.defaultParallelism * 2, entities * framesPerEntity))
      .mapPartitions { it =>
        it.flatMap { id =>
          val entity = (id / framesPerEntity).toInt
          val ts = id % framesPerEntity
          if (framePresent(entity, ts, framesPerEntity))
            Iterator.single((f"e$entity%04d", ts, captionAt(entity, ts)))
          else Iterator.empty
        }
      }
      .toDF("entity", "ts", "caption")
  }

  /** Derive (entity, ts) from image_id exactly like the reference parses
    * filenames (`frame_features/extract_features.py:51`,
    * `generate_frame_features.py:136`). */
  def withEntityTs(df: DataFrame): DataFrame =
    df.withColumn("entity", split(col("image_id"), "/").getItem(0))
      .withColumn("ts", regexp_extract(col("image_id"), "(\\d+)$", 1).cast("long"))

  /** As-of probe grid (FIXTURES.md §1): per entity, deterministic asOfTs
    * values hitting on-row, in-gap, and before-first positions. */
  def probes(spark: SparkSession, entities: Int, framesPerEntity: Int, perEntity: Int): DataFrame = {
    import spark.implicits._
    spark
      .range(0L, entities.toLong * perEntity)
      .map { id =>
        val entity = (id / perEntity).toInt
        val i = id % perEntity
        val asOfTs = i match {
          case 0 => -1L // before-first → null match expected
          case _ => mix(entity.toLong, i, 71L) % (framesPerEntity + 32L)
        }
        (f"e$entity%04d", asOfTs)
      }
      .toDF("entity", "asOfTs")
  }
}
