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

  // ---- MP3 (MPEG-1 Layer III) container-level metadata ----------------
  //
  // Compressed audio cannot be decoded to samples in this environment
  // (no native codec), but the FRAME HEADERS are plain byte parsing —
  // the audio analog of [[VideoCodec.probe]]'s MP4 box walk. That gives
  // compressed audio a value-level oracle too: frame count, sample rate,
  // bitrate, and the derived duration are all exact integers.

  /** Container-level metadata of an MP3 stream: every frame header
    * walked, constant sample rate enforced, duration derived from the
    * Layer III constant of 1152 samples per frame.
    */
  final case class Mp3Meta(
      nFrames: Int,
      sampleRate: Int,
      bitrateKbps: Int, // highest seen (equals the CBR rate when !vbr)
      vbr: Boolean,
      nBytes: Int,
      durationMs: Long)

  /** MPEG-1 Layer III bitrate table, kbps, indexed by the header's 4-bit
    * bitrate index (0 = free-format and 15 = bad are both rejected).
    */
  val Mp3Bitrates: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 sampling-rate table, Hz, indexed by the 2-bit sample-rate
    * index (index 3 is reserved).
    */
  val Mp3SampleRates: Array[Int] = Array(44100, 48000, 32000)

  private val Mp3SamplesPerFrame = 1152

  /** Layer III frame length in bytes: 144 * bitrate / sampleRate (+1
    * when the padding bit is set), integer-floored — the formula every
    * frame walker uses.
    */
  def mp3FrameLength(bitrateKbps: Int, sampleRate: Int, padded: Boolean): Int =
    144 * bitrateKbps * 1000 / sampleRate + (if (padded) 1 else 0)

  /** Hand-rolled fixture encoder: an optional ID3v2 tag followed by the
    * given (bitrateIndex, sampleRateIndex, padded) frame sequence, each
    * frame a valid 4-byte MPEG-1 Layer III header plus zero payload. The
    * probe side walks these bytes through an independent parser, so an
    * encode bug cannot cancel itself out (q71's contract).
    */
  def encodeMp3(
      frames: Seq[(Int, Int, Boolean)], id3Size: Int = -1): Array[Byte] = {
    val tag =
      if (id3Size < 0) Array.emptyByteArray
      else {
        val t = new Array[Byte](10 + id3Size)
        t(0) = 'I'; t(1) = 'D'; t(2) = '3'
        t(3) = 3; t(4) = 0 // version 2.3.0
        t(5) = 0 // flags
        // syncsafe size: 7 bits per byte
        t(6) = ((id3Size >> 21) & 0x7f).toByte
        t(7) = ((id3Size >> 14) & 0x7f).toByte
        t(8) = ((id3Size >> 7) & 0x7f).toByte
        t(9) = (id3Size & 0x7f).toByte
        t
      }
    val body = frames.flatMap { case (b, r, padded) =>
      require(b >= 1 && b <= 14 && r >= 0 && r <= 2, "valid CBR header")
      val len = mp3FrameLength(Mp3Bitrates(b), Mp3SampleRates(r), padded)
      val f = new Array[Byte](len)
      f(0) = 0xff.toByte
      f(1) = 0xfb.toByte // sync 111 | version 11 (MPEG1) | layer 01 (III) | no CRC
      f(2) = ((b << 4) | (r << 2) | (if (padded) 2 else 0)).toByte
      f(3) = 0xc0.toByte // mono, no mode-ext, not copyright/original, no emphasis
      f
    }
    tag ++ body
  }

  /** Walk an MP3 stream's frame headers: skip one optional leading ID3v2
    * tag (syncsafe size), then require back-to-back valid MPEG-1
    * Layer III headers covering every remaining byte, a constant sample
    * rate, and at least one frame. Anything else — free-format/reserved
    * indexes, a mid-stream rate change, trailing garbage — returns None
    * and the caller falls back to the byte-summary stub.
    */
  def probeMp3(bytes: Array[Byte]): Option[Mp3Meta] = {
    var pos = 0
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
      bytes(2) == '3') {
      val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      pos = 10 + size
      if (pos > bytes.length) return None
    }
    var nFrames = 0
    var sampleRate = -1
    var maxKbps = 0
    var minKbps = Int.MaxValue
    while (pos + 4 <= bytes.length) {
      val b0 = bytes(pos) & 0xff
      val b1 = bytes(pos + 1) & 0xff
      val b2 = bytes(pos + 2) & 0xff
      if (b0 != 0xff || (b1 & 0xe0) != 0xe0) return None // lost sync
      if (((b1 >> 3) & 3) != 3 || ((b1 >> 1) & 3) != 1) return None // not MPEG1-III
      val bIdx = (b2 >> 4) & 15
      val rIdx = (b2 >> 2) & 3
      if (bIdx < 1 || bIdx > 14 || rIdx > 2) return None
      val sr = Mp3SampleRates(rIdx)
      if (sampleRate < 0) sampleRate = sr
      else if (sampleRate != sr) return None
      val kbps = Mp3Bitrates(bIdx)
      maxKbps = math.max(maxKbps, kbps)
      minKbps = math.min(minKbps, kbps)
      nFrames += 1
      pos += mp3FrameLength(kbps, sr, padded = (b2 & 2) != 0)
    }
    if (nFrames == 0 || pos != bytes.length) None
    else Some(Mp3Meta(
      nFrames, sampleRate, maxKbps, vbr = maxKbps != minKbps, bytes.length,
      nFrames.toLong * Mp3SamplesPerFrame * 1000L / sampleRate))
  }

  /** Raw 16-bit PCM samples of a WAV payload, or None when the bytes
    * are not recognizable 16-bit PCM — the sample-level entry point for
    * frame-windowed feature extraction ([[Multimodal.audioFrameEnergies]]).
    */
  def decodeSamples(bytes: Array[Byte]): Option[Array[Short]] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        if (f.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
          f.getSampleSizeInBits != 16) None
        else {
          val data = in.readAllBytes()
          val bigEndian = f.isBigEndian
          val out = new Array[Short](data.length / 2)
          var i = 0
          while (i + 1 < data.length) {
            out(i / 2) =
              if (bigEndian) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort
              else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort
            i += 2
          }
          Some(out)
        }
      } finally in.close()
    } catch { case _: Exception => None }

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
