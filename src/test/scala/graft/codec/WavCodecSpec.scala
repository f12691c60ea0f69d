package graft.codec

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.audio.AudioOps

/** S7/K4 audio: PCM16 WAV round trip, malformed-input fault tolerance, and
  * reference clip semantics (floor tail). */
class WavCodecSpec extends SparkSpec {
  import spark.implicits._

  test("encode/decode round-trips int16-exact and preserves sample rate") {
    val k = Array.tabulate(1000)(i => (i * 131 % 32768) - 16384)
    val f = k.map(_.toFloat / 32767.0f)
    val bytes = WavCodec.encodePcm16(f, 16000)
    assert(bytes.length == 44 + 2000)
    val (sr, back) = WavCodec.decodePcm16(bytes)
    assert(sr == 16000)
    assert(back.map(_.toInt).toSeq == k.toSeq)
  }

  test("out-of-range samples clamp to full scale; malformed bytes decode to null") {
    val (_, s) = WavCodec.decodePcm16(WavCodec.encodePcm16(Array(2.0f, -3.0f, 0.0f), 8000))
    assert(s.toSeq == Seq[Short](32767, -32767, 0))
    assert(WavCodec.decodePcm16(null) == null)
    assert(WavCodec.decodePcm16(Array[Byte](1, 2, 3)) == null)
    assert(WavCodec.decodePcm16("RIFFxxxxJUNK".getBytes ++ new Array[Byte](40)) == null)
  }

  test("clips: floor-tail extraction matches the reference's num // clip_len") {
    val df = Seq(
      (1L, (0 until 10).toList), // 3 clips of 3, tail 1 dropped
      (2L, (0 until 2).toList), // under one clip -> no rows
      (3L, (0 until 6).toList) // exactly 2 clips
    ).toDF("id", "samples")
    val out = AudioOps.clips(df, "samples", 3)
      .select($"id", $"clip_idx", $"clip")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2)))
    assert(out.count(_._1 == 1L) == 3)
    assert(!out.exists(_._1 == 2L))
    assert(out.filter(_._1 == 3L).map(_._3).toSeq == Seq(Seq(0, 1, 2), Seq(3, 4, 5)))
    assert(out.forall(_._3.length == 3), "every clip full length (tail dropped)")
  }

  test("resampleLinear: identity, integer decimation, midpoint upsample, empty") {
    val s = List(0.0, 2.0, 4.0, 6.0, 8.0, 10.0)
    val df = Seq((1L, s), (2L, List.empty[Double])).toDF("id", "w")
    def out(orig: Int, target: Int): Map[Long, Seq[Double]] =
      df.select($"id", AudioOps.resampleLinear($"w", orig, target).as("r"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out(16, 16)(1L) == s, "same rate = identity")
    assert(out(2, 1)(1L) == Seq(0.0, 4.0, 8.0), "2:1 decimation picks every 2nd")
    val up = out(1, 2)(1L)
    assert(up.length == 12)
    assert(up.take(4) == Seq(0.0, 1.0, 2.0, 3.0), "odd samples are midpoints")
    assert(out(16, 16)(2L).isEmpty && out(1, 2)(2L).isEmpty, "empty stays empty")
  }

  test("clipStats are integer-exact") {
    val df = Seq((1L, Seq(1, -2, 3, 4))).toDF("id", "samples")
    val withClips = AudioOps.clips(df, "samples", 4)
    val (n, s, sq) = AudioOps.clipStats($"clip")
    val r = withClips.select(n, s, sq).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 6L, 30L)))
  }
}
