package graft.pipeline

import java.io.ByteArrayInputStream
import java.nio.{ByteBuffer, ByteOrder}

import javax.sound.sampled.{AudioFormat, AudioSystem}

/** Pure-JVM audio codec (`javax.sound.sampled` — the WAV reader ships
  * with the JDK, no external libraries, headless-safe). The audio analog
  * of [[ImageCodec]]: payloads that parse as 16-bit PCM WAV yield true
  * sample-derived features; anything else maps to None so callers fall
  * back to the deterministic byte-summary stub. MP3/OGG/AAC would need a
  * native decoder, which this environment cannot ship — WAV is the one
  * modality the JDK decodes at value level.
  *
  * Scale note: same contract as the image path — per-record CPU work with
  * zero shuffle, living inside `mapPartitions` so decoder setup is
  * per-partition and payload bytes are only materialized where a decode
  * stage actually reads them.
  */
object AudioCodec {

  /** Sample-level summary of a decoded PCM stream: stream parameters from
    * the decoder, mean absolute amplitude, and an 8-bucket absolute-
    * amplitude histogram (normalized, bucket = min(7, |s| / 4096)) in the
    * same shape as the stub's byte histogram.
    */
  final case class DecodedAudio(
      sampleRate: Float,
      channels: Int,
      nSamples: Int,
      ampMean: Double,
      ampHist: Array[Float])

  /** Minimal canonical RIFF/WAVE container around mono 16-bit signed
    * little-endian PCM — the fixture side of the round trip (the decode
    * side goes through the JDK's parser, so an encode/decode bug cannot
    * cancel itself out).
    */
  def encodePcm16Wav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
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
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Decode a WAV payload, or None when the bytes are not recognizable
    * 16-bit PCM (unsupported container, compressed encoding, garbage).
    */
  def decode(bytes: Array[Byte]): Option[DecodedAudio] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        if (f.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
          f.getSampleSizeInBits != 16) None
        else {
          val data = in.readAllBytes()
          val bigEndian = f.isBigEndian
          val n = data.length / 2
          val counts = new Array[Long](8)
          var sumAbs = 0L
          var i = 0
          while (i + 1 < data.length) {
            val s =
              if (bigEndian) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort
              else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort
            val a = math.abs(s.toInt) // abs(-32768) = 32768, bucket capped below
            sumAbs += a
            counts(math.min(7, a / 4096)) += 1
            i += 2
          }
          val d = math.max(1, n)
          Some(DecodedAudio(
            f.getSampleRate, f.getChannels, n,
            sumAbs.toDouble / d,
            counts.map(c => (c.toDouble / d).toFloat)))
        }
      } finally in.close()
    } catch { case _: Exception => None }
}
