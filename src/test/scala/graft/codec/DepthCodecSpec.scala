package graft.codec

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** K5 depth sink: lossless 16-bit PNG round trip + entity-partitioned
  * parquet write/read. */
class DepthCodecSpec extends SparkSpec {
  import spark.implicits._

  private val W = 8
  private val H = 6
  private val MaxV = 4.0f

  private def depthMap(seed: Int): Array[Float] =
    Array.tabulate(W * H)(i => ((seed * 31 + i * 17) % 97).toFloat / 10.0f - 1.0f)

  test("encode/decode round-trips within one quantization step and is idempotent") {
    val d = depthMap(3)
    val bytes = DepthCodec.encodePng16(d, W, H, MaxV)
    assert(bytes != null && bytes.length > 8)
    val back = DepthCodec.decodePng16(bytes)
    assert(back.length == W * H)
    val expect = ImageCodec.clampScale(d, 0.0f, MaxV)
    back.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g - e) <= 0.5f / 65535.0f + 1e-9f, s"quantization error: $g vs $e")
    }
    // re-encoding the decoded frame is bit-identical (idempotent sink)
    val bytes2 = DepthCodec.encodePng16(back.map(_ * MaxV), W, H, MaxV)
    assert(java.util.Arrays.equals(bytes, bytes2))
  }

  test("writeDepth sinks entity-partitioned parquet that decodes back") {
    val out = java.nio.file.Files.createTempDirectory("graft_depth_sink").toString
    val rows = for { e <- 0 until 3; t <- 0 until 4 } yield (s"e$e", t.toLong, depthMap(e * 10 + t).toSeq)
    val df = rows.toDF("entity", "ts", "depth")
    val n = DepthCodec.writeDepth(df, "entity", "ts", "depth", W, H, MaxV, out)
    assert(n == 12L)
    // partition layout: one directory per entity
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("__part=e0", "__part=e1", "__part=e2"))
    val back = spark.read.parquet(out)
      .select($"entity", $"ts", DepthCodec.decodeUdf($"bytes").as("d"))
      .collect()
    assert(back.length == 12)
    back.foreach { r =>
      val d = r.getSeq[Float](2)
      assert(d.length == W * H && d.forall(v => v >= 0.0f && v <= 1.0f))
    }
  }

  test("null and ragged inputs are null-safe") {
    assert(DepthCodec.encodePng16(null, W, H, MaxV) == null)
    assert(DepthCodec.encodePng16(new Array[Float](3), W, H, MaxV) == null)
    assert(DepthCodec.decodePng16(null) == null)
    assert(DepthCodec.decodePng16(Array[Byte](1, 2, 3)) == null)
  }
}
