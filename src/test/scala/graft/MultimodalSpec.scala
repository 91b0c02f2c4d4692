package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{ImageCodec, MediaRecord, Multimodal}

/** Value-level oracle for the REAL image decode path: images with known
  * pixel values are encoded to PNG/BMP bytes with the JDK writer, pushed
  * through the distributed batch-decode boundary, and the pixel-derived
  * features are checked against first-principles arithmetic — no stub in
  * the loop. Garbage payloads must fall back to the stub exactly.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def encode(img: BufferedImage, format: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, out), s"JDK lacks a $format writer")
    out.toByteArray
  }

  private def flat(w: Int, h: Int, rgb: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    img
  }

  test("decode recovers exact dimensions and luma of known pixels") {
    // all-white: luma = 0.299*255 + 0.587*255 + 0.114*255 = 255
    val white = ImageCodec.decode(encode(flat(8, 4, 0xffffff), "png")).get
    assert(white.width == 8 && white.height == 4)
    assert(math.abs(white.lumaMean - 255.0) < 1e-9)
    assert(white.lumaHist(7) == 1.0f && white.lumaHist.take(7).forall(_ == 0f))

    // all-black
    val black = ImageCodec.decode(encode(flat(3, 3, 0x000000), "png")).get
    assert(black.lumaMean == 0.0 && black.lumaHist(0) == 1.0f)

    // pure red: luma = 0.299*255 = 76.245 -> bucket 2
    val red = ImageCodec.decode(encode(flat(2, 2, 0xff0000), "png")).get
    assert(math.abs(red.lumaMean - 0.299 * 255) < 1e-9)
    assert(red.lumaHist(2) == 1.0f)

    // half white / half black rows: mean 127.5, split histogram
    val half = {
      val img = new BufferedImage(4, 2, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 4) {
        img.setRGB(x, 0, 0xffffff); img.setRGB(x, 1, 0x000000)
      }
      img
    }
    val d = ImageCodec.decode(encode(half, "png")).get
    assert(math.abs(d.lumaMean - 127.5) < 1e-9)
    assert(d.lumaHist(0) == 0.5f && d.lumaHist(7) == 0.5f)
  }

  test("decode handles BMP too, and rejects garbage") {
    val bmp = ImageCodec.decode(encode(flat(5, 7, 0xffffff), "bmp")).get
    assert(bmp.width == 5 && bmp.height == 7 && bmp.lumaMean == 255.0)
    assert(ImageCodec.decode("not an image".getBytes("UTF-8")).isEmpty)
    assert(ImageCodec.decode(Array.empty[Byte]).isEmpty)
  }

  test("WAV decode recovers exact samples of known PCM") {
    import graft.pipeline.AudioCodec
    // known amplitudes: 0 -> bucket 0, 4096 -> 1, -8192 -> 2, 32767 -> 7
    val samples = Array[Short](0, 4096, -8192, 32767)
    val d = AudioCodec.decode(AudioCodec.encodePcm16Wav(samples, 8000)).get
    assert(d.sampleRate == 8000f && d.channels == 1 && d.nSamples == 4)
    assert(d.ampMean == (0 + 4096 + 8192 + 32767) / 4.0)
    assert(d.ampHist(0) == 0.25f && d.ampHist(1) == 0.25f &&
      d.ampHist(2) == 0.25f && d.ampHist(7) == 0.25f)

    // Short.MinValue: abs = 32768, bucket capped at 7 (not out of range)
    val edge = AudioCodec.decode(
      AudioCodec.encodePcm16Wav(Array[Short](Short.MinValue), 44100)).get
    assert(edge.ampMean == 32768.0 && edge.ampHist(7) == 1.0f)

    // garbage and non-WAV payloads are None
    assert(AudioCodec.decode("not audio".getBytes("UTF-8")).isEmpty)
    assert(AudioCodec.decode(Array.empty[Byte]).isEmpty)
  }

  test("extractFeatures takes the real audio path for WAV payloads") {
    import spark.implicits._
    import graft.pipeline.AudioCodec
    val wav = AudioCodec.encodePcm16Wav(Array[Short](100, -200, 300), 8000)
    val media = Seq(
      MediaRecord(1L, "audio", 0, 0, 0, wav),
      MediaRecord(2L, "audio", 0, 0, 0, "plain text".getBytes("UTF-8")),
      MediaRecord(3L, "video", 0, 0, 3000, wav) // video: stub even for valid WAV
    ).toDS().toDF()
    val feats = Multimodal.extractFeatures(spark, media)
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).byte_mean == (100 + 200 + 300) / 3.0)
    assert(feats(1L).feature(0) == 1.0f, "all three samples in bucket 0")
    for (id <- Seq(2L, 3L)) {
      val rec = media.as[MediaRecord].filter(_.media_id == id).head()
      val stub = Multimodal.decodeStub(rec)
      assert(feats(id).byte_mean == stub.byte_mean &&
        feats(id).feature.sameElements(stub.feature),
        s"record $id diverged from stub")
    }
  }

  test("MP4 box walker parses hand-planted raw boxes (v0, largesize, size==0)") {
    import graft.pipeline.VideoCodec
    def be32(v: Long): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    // bytes laid out by hand, independent of the encoder, so an encoder
    // bug cannot cancel a walker bug
    val ftyp = be32(16) ++ cc("ftyp") ++ cc("abcd") ++ be32(0)
    val mvhdPayload = be32(0) ++ be32(0) ++ be32(0) ++ be32(700) ++ be32(4200)
    val mvhd = be32(8 + mvhdPayload.length) ++ cc("mvhd") ++ mvhdPayload
    val moov = be32(8 + mvhd.length) ++ cc("moov") ++ mvhd

    val m = VideoCodec.probe(ftyp ++ moov).get
    assert(m.majorBrand == "abcd" && m.timescale == 700 && m.durationUnits == 4200)
    assert(m.durationMs == 6000 && m.trackCount == 0 && m.videoCodec == "")

    // a 64-bit-size box in the way must be skipped via its largesize
    val big = be32(1) ++ cc("skip") ++ be64(16 + 5) ++ Array.fill[Byte](5)(9)
    assert(VideoCodec.probe(ftyp ++ big ++ moov).get.timescale == 700)

    // size == 0: box extends to end of file
    val moov0 = be32(0) ++ cc("moov") ++ mvhd
    assert(VideoCodec.probe(ftyp ++ moov0).get.durationUnits == 4200)

    // non-BMFF and truncated-mvhd payloads must not "parse"
    assert(VideoCodec.probe("just some document text".getBytes("UTF-8")).isEmpty)
    val shortMvhd = be32(8 + 12) ++ cc("mvhd") ++ be32(0) ++ be32(0) ++ be32(0)
    val moovShort = be32(8 + 20) ++ cc("moov") ++ shortMvhd
    assert(VideoCodec.probe(ftyp ++ moovShort).isEmpty)
  }

  test("MP4 encode→probe roundtrip: v0/v1 mvhd, track handlers, codec fourccs") {
    import graft.pipeline.VideoCodec
    val m0 = VideoCodec.probe(VideoCodec.encodeMp4(
      "isom", 0, 600, 3000, Seq(("vide", "avc1"), ("soun", "mp4a")))).get
    assert(m0 == VideoCodec.VideoMeta("isom", 600, 3000, 5000, 2, "avc1", 1))
    // version-1 mvhd carries 64-bit times at different offsets
    val m1 = VideoCodec.probe(VideoCodec.encodeMp4(
      "mp42", 1, 90000, 675000L, Seq(("vide", "hev1")))).get
    assert(m1 == VideoCodec.VideoMeta("mp42", 90000, 675000, 7500, 1, "hev1", 0))
  }

  test("extractFeatures reads the parsed mvhd duration for video n_frames") {
    import spark.implicits._
    import graft.pipeline.VideoCodec
    val mp4 = VideoCodec.encodeMp4("isom", 0, 1000, 12345, Seq(("vide", "avc1")))
    val media = Seq(
      MediaRecord(1L, "video", 0, 0, 99000, mp4),
      MediaRecord(2L, "video", 0, 0, 99000, "plain text".getBytes("UTF-8"))
    ).toDS().toDF()
    val feats = Multimodal.extractFeatures(spark, media)
      .collect().map(f => f.media_id -> f).toMap
    // real container metadata (12345 ms -> 12 frames), not the 99 s column
    assert(feats(1L).n_frames == 12)
    // pixel features remain the documented stub either way
    val rec1 = media.as[MediaRecord].filter(_.media_id == 1L).head()
    assert(feats(1L).byte_mean == Multimodal.decodeStub(rec1).byte_mean)
    // unparseable payload: stub end to end, including metadata n_frames
    val rec2 = media.as[MediaRecord].filter(_.media_id == 2L).head()
    val stub2 = Multimodal.decodeStub(rec2)
    assert(feats(2L).n_frames == stub2.n_frames && feats(2L).n_frames == 99)
  }

  test("AVI/DIB decode recovers exact header fields and pixel luma sums") {
    import graft.pipeline.VideoCodec
    val (w, h, n) = (8, 4, 3)
    // frame f, storage row y, col x: B=f+x, G=2*f+y, R=40*f (known values)
    val frames = (0 until n).map { f =>
      val px = new Array[Byte](3 * w * h)
      var i = 0
      for (y <- 0 until h; x <- 0 until w) {
        px(i) = (f + x).toByte; px(i + 1) = (2 * f + y).toByte
        px(i + 2) = (40 * f).toByte; i += 3
      }
      px
    }
    val bytes = VideoCodec.encodeAviDib(frames, w, h, usPerFrame = 40000)
    assert(bytes.length == 224 + n * (8 + 3 * w * h), "documented length formula")
    val d = VideoCodec.decodeAvi(bytes).get
    assert(d.width == w && d.height == h && d.usPerFrame == 40000 &&
      d.handler == "DIB " && d.nFrames == n)
    var expSum = 0L
    val expHist = new Array[Long](8)
    for (f <- 0 until n; y <- 0 until h; x <- 0 until w) {
      val luma = 299 * (40 * f) + 587 * (2 * f + y) + 114 * (f + x)
      expSum += luma; expHist(math.min(7, luma / 32000)) += 1
    }
    assert(d.lumaSum1000 == expSum, s"${d.lumaSum1000} vs $expSum")
    assert(d.lumaHist.sameElements(expHist))
    // garbage and truncated payloads refuse to decode
    assert(VideoCodec.decodeAvi("RIFFjunk".getBytes("US-ASCII")).isEmpty)
    assert(VideoCodec.decodeAvi(bytes.take(60)).isEmpty)
  }

  test("MJPEG AVI: self-contained JPEG chunks decode with lossy tolerance") {
    import graft.pipeline.VideoCodec
    val (w, h) = (16, 16)
    val jpegs = Seq(50, 200).map(v => encode(flat(w, h, v << 16 | v << 8 | v), "jpg"))
    val bytes = VideoCodec.encodeAviMjpeg(jpegs, w, h, usPerFrame = 33333)
    val d = VideoCodec.decodeAvi(bytes).get
    assert(d.nFrames == 2 && d.handler == "MJPG" && d.width == w && d.height == h)
    // flat gray v has luma1000 = 1000v; JPEG is lossy -> tolerance
    val meanLuma = d.lumaSum1000.toDouble / (2 * w * h)
    assert(math.abs(meanLuma - 125000.0) < 6000.0, meanLuma.toString)
  }

  test("MJPEG COLOR frames: solid colors decode to the exact fixed-point model") {
    import graft.pipeline.{ImageCodec, VideoCodec}
    // a solid color at quality 1.0 survives the YCbCr 4:2:0 trip as
    // invert(forward(rgb)) in libjpeg's fixed-point integer arithmetic —
    // deterministic, closed-form, SQL-replayable (the q144 oracle model).
    // Pin the model against the REAL JDK decoder across a color grid
    // covering primaries, grays, clamp-prone saturated mixes, and a
    // pseudo-random sweep.
    val grid =
      (for (r <- Seq(0, 17, 128, 255); g <- Seq(0, 64, 200, 255);
            b <- Seq(0, 99, 255)) yield (r, g, b)) ++
        (0 until 64).map(i => ((i * 53) % 256, (i * 101) % 256, (i * 197) % 256))
    for ((r, g, b) <- grid) {
      val jpeg = ImageCodec.encodeJpeg(ImageCodec.colorImage(16, 8, r, g, b), 1.0f)
      val bi = ImageCodec.readImage(jpeg).get
      val (er, eg, eb) = ImageCodec.jpegSolidColorRoundTrip(r, g, b)
      val rgb = bi.getRGB(8, 4)
      val got = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
      assert(got == ((er, eg, eb)),
        s"rgb=($r,$g,$b): decoder $got vs model ${(er, eg, eb)}")
      // uniform across the frame (subsampling of a constant plane is exact)
      assert(bi.getRGB(0, 0) == rgb && bi.getRGB(15, 7) == rgb)
    }
    // full container path: color MJPEG lumaSum matches the model
    val colors = Seq((255, 0, 0), (0, 255, 0), (0, 0, 255), (200, 100, 50))
    val (w, h) = (16, 8)
    val jpegs = colors.map { case (r, g, b) =>
      ImageCodec.encodeJpeg(ImageCodec.colorImage(w, h, r, g, b), 1.0f) }
    val d = VideoCodec.decodeAvi(
      VideoCodec.encodeAviMjpeg(jpegs, w, h, usPerFrame = 33000)).get
    val want = colors.map { case (r, g, b) =>
      val (er, eg, eb) = ImageCodec.jpegSolidColorRoundTrip(r, g, b)
      (299L * er + 587L * eg + 114L * eb) * w * h
    }.sum
    assert(d.lumaSum1000 == want, s"${d.lumaSum1000} vs $want")
  }

  test("MJPEG AVI with uniform gray frames decodes to EXACT integer luma") {
    import graft.pipeline.{ImageCodec, VideoCodec}
    // every gray level round-trips exactly through the JDK JPEG codec at
    // quality 1.0 (DC-only blocks, unit quant tables, no color
    // transform) — the invariant the q140 oracle stands on
    for (g <- 0 until 256) {
      val jpeg = ImageCodec.encodeJpeg(ImageCodec.grayImage(16, 8, g), 1.0f)
      val bi = ImageCodec.readImage(jpeg).get
      assert(bi.getColorModel.getNumComponents == 1, s"g=$g not grayscale")
      for (y <- 0 until 8; x <- 0 until 16)
        assert(bi.getRaster.getSample(x, y, 0) == g, s"g=$g at ($x,$y)")
    }
    // full path: MJPEG container decode, multiple frames + dims,
    // lumaSum/hist exactly as the formula predicts
    val (w, h) = (16, 24)
    val grays = Seq(0, 31, 32, 200, 255)
    val jpegs = grays.map(g =>
      ImageCodec.encodeJpeg(ImageCodec.grayImage(w, h, g), 1.0f))
    val d = VideoCodec.decodeAvi(
      VideoCodec.encodeAviMjpeg(jpegs, w, h, usPerFrame = 33000)).get
    assert(d.nFrames == grays.size && d.handler == "MJPG")
    assert(d.lumaSum1000 == grays.map(g => 1000L * g * w * h).sum)
    val expHist = new Array[Long](8)
    grays.foreach(g => expHist(math.min(7, 1000 * g / 32000)) += w.toLong * h)
    assert(d.lumaHist.sameElements(expHist),
      s"${d.lumaHist.toSeq} vs ${expHist.toSeq}")
  }

  test("MP3 encode→probe roundtrip: frame walk, ID3 skip, padding, VBR") {
    import graft.pipeline.AudioCodec
    // CBR, no tag: 5 frames at 128 kbps / 44100 Hz, alternating padding
    val frames = (0 until 5).map(i => (9, 0, i % 2 == 1))
    val cbr = AudioCodec.probeMp3(AudioCodec.encodeMp3(frames)).get
    assert(cbr.nFrames == 5 && cbr.sampleRate == 44100 &&
      cbr.bitrateKbps == 128 && !cbr.vbr)
    val baseLen = 144 * 128000 / 44100
    assert(cbr.nBytes == 5 * baseLen + 2) // two padded frames
    assert(cbr.durationMs == 5L * 1152 * 1000 / 44100)

    // leading ID3v2 tag is skipped (syncsafe size)
    val tagged = AudioCodec.probeMp3(
      AudioCodec.encodeMp3(frames, id3Size = 200)).get
    assert(tagged.nFrames == 5 && tagged.nBytes == cbr.nBytes + 210)

    // mixed bitrates read as VBR with the max reported
    val vbr = AudioCodec.probeMp3(AudioCodec.encodeMp3(
      Seq((5, 1, false), (14, 1, false)))).get
    assert(vbr.vbr && vbr.bitrateKbps == 320 && vbr.sampleRate == 48000)

    // rejects: garbage, trailing junk, mid-stream rate change
    assert(AudioCodec.probeMp3("not audio".getBytes("UTF-8")).isEmpty)
    assert(AudioCodec.probeMp3(
      AudioCodec.encodeMp3(frames) ++ Array[Byte](1, 2, 3)).isEmpty)
    assert(AudioCodec.probeMp3(AudioCodec.encodeMp3(
      Seq((9, 0, false), (9, 1, false)))).isEmpty)
  }

  test("extractFeatures reads the MP3 frame count for compressed audio") {
    import spark.implicits._
    import graft.pipeline.AudioCodec
    val mp3 = AudioCodec.encodeMp3((0 until 7).map(i => (3, 2, false)))
    val media = Seq(MediaRecord(9L, "audio", 0, 0, 0, mp3)).toDS().toDF()
    val f = Multimodal.extractFeatures(spark, media).collect().head
    // container-level n_frames is real; sample features stay the stub's
    val stub = Multimodal.decodeStub(
      media.as[MediaRecord].head()).copy(n_frames = 7)
    assert(f.n_frames == 7 && f.byte_mean == stub.byte_mean &&
      f.feature.sameElements(stub.feature))
  }

  test("extractFeatures takes the real path for images, stub otherwise") {
    import spark.implicits._
    val png = encode(flat(4, 4, 0xffffff), "png")
    val textBytes = "just some document text".getBytes("UTF-8")
    val media = Seq(
      MediaRecord(1L, "image", 4, 4, 0, png),
      MediaRecord(2L, "image", 4, 4, 0, textBytes), // corrupt image
      MediaRecord(3L, "audio", 0, 0, 5000, png) // non-image: stub even for valid bytes
    ).toDS().toDF()
    val feats = Multimodal.extractFeatures(spark, media)
      .collect().map(f => f.media_id -> f).toMap

    // real decode: luma features, not byte histogram
    val real = feats(1L)
    assert(real.byte_mean == 255.0 && real.n_bytes == png.length)
    assert(real.feature(7) == 1.0f)

    // corrupt payload and non-image records match the stub bit-for-bit
    for (id <- Seq(2L, 3L)) {
      val rec = media.as[MediaRecord].filter(_.media_id == id).head()
      val stub = Multimodal.decodeStub(rec)
      val got = feats(id)
      assert(got.byte_mean == stub.byte_mean && got.n_frames == stub.n_frames
        && got.feature.sameElements(stub.feature), s"record $id diverged from stub")
    }
  }
}
