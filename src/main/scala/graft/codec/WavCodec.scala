package graft.codec

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** PCM16 mono WAV codec (S7 scan / K4 sink) — pure-JVM RIFF parsing, no
  * external codec library, so the audio modality is REAL end to end in this
  * environment (round 1 shipped an honest stub; compressed formats remain
  * out of scope and would slot in behind the same byte-column surface).
  *
  * Reference analog: the audio path extracts 16 kHz mono WAV per video
  * (`modalities/generate_audio_files.py:17-24` ffmpeg `-ar 16000 -ac 1`)
  * and loads it with torchaudio (`audio_features/
  * imagebind_audio_feature_extractor.py:36`). Here the wave is a float
  * column in [-1, 1]; encode quantizes to int16 in double math (exact —
  * 24-bit float mantissa × 15-bit scale fits a double) and decode returns
  * either raw int16 samples (integer-exact oracle surface) or /32768 floats
  * (torchaudio's convention).
  */
object WavCodec {

  private val HeaderBytes = 44

  /** Encode float samples in [-1, 1] to a PCM16 mono WAV byte array. */
  def encodePcm16(samples: Array[Float], sampleRate: Int): Array[Byte] = {
    if (samples == null) return null
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(HeaderBytes + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16) // PCM fmt chunk size
    buf.putShort(1) // audio format: PCM
    buf.putShort(1) // channels: mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2) // byte rate
    buf.putShort(2) // block align
    buf.putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataLen)
    var i = 0
    while (i < samples.length) {
      val clamped = math.min(1.0, math.max(-1.0, samples(i).toDouble))
      buf.putShort(math.round(clamped * 32767.0).toShort)
      i += 1
    }
    buf.array()
  }

  /** Parse a PCM16 mono WAV; returns (sampleRate, samples) or null on any
    * malformed/unsupported input (row-level fault tolerance). */
  def decodePcm16(bytes: Array[Byte]): (Int, Array[Short]) = {
    if (bytes == null || bytes.length < HeaderBytes) return null
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val riff = new Array[Byte](4); buf.get(riff)
    buf.getInt // chunk size
    val wave = new Array[Byte](4); buf.get(wave)
    if (new String(riff, "US-ASCII") != "RIFF" || new String(wave, "US-ASCII") != "WAVE")
      return null
    var sampleRate = 0
    // walk chunks: fmt must precede data (as we and ffmpeg write it).
    // Every branch rejects sz < 0 — a negative size would otherwise move
    // the cursor BACKWARDS (infinite loop) or blow up the data array,
    // violating the null-on-malformed contract.
    while (buf.remaining() >= 8) {
      val id = new Array[Byte](4); buf.get(id)
      val sz = buf.getInt
      if (sz < 0 || buf.remaining() < sz) return null
      new String(id, "US-ASCII") match {
        case "fmt " =>
          if (sz < 16) return null
          val fmt = buf.getShort
          val ch = buf.getShort
          sampleRate = buf.getInt
          buf.getInt; buf.getShort
          val bits = buf.getShort
          if (fmt != 1 || ch != 1 || bits != 16) return null
          buf.position(buf.position() + (sz - 16))
        case "data" =>
          if (sampleRate == 0) return null
          val n = sz / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = buf.getShort; i += 1 }
          return (sampleRate, out)
        case _ =>
          buf.position(buf.position() + sz)
      }
    }
    null
  }

  def encodeUdf(sampleRate: Int): UserDefinedFunction =
    udf((v: Seq[Float]) => if (v == null) null else encodePcm16(v.toArray, sampleRate))

  /** Raw int16 samples — the integer-exact oracle surface. */
  val decodeSamplesUdf: UserDefinedFunction =
    udf((b: Array[Byte]) => Option(decodePcm16(b)).map(_._2.map(_.toInt).toSeq))

  /** Float samples in [-1, 1) — torchaudio's int16 convention (/32768, the
    * reference loader `imagebind_audio_feature_extractor.py:36`); the
    * encoder's *32767 stays asymmetric on purpose so ±1.0 inputs clamp to
    * full scale without overflow, exactly like torchaudio.save. */
  val decodeUdf: UserDefinedFunction =
    udf((b: Array[Byte]) => Option(decodePcm16(b)).map(_._2.map(_ / 32768.0f).toSeq))

  val sampleRateUdf: UserDefinedFunction =
    udf((b: Array[Byte]) => Option(decodePcm16(b)).map(_._1))
}
