package graft.pipeline

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

/** Pure-JVM image codec (`javax.imageio` — PNG/BMP/GIF/JPEG readers ship
  * with the JDK, no external libraries). This is the real decoder that
  * slots in behind the batch boundary [[Multimodal.extractFeatures]]
  * documents: payloads that parse as an encoded image yield true
  * pixel-derived features; anything else falls back to the deterministic
  * byte-summary stub so non-image corpora (and the synthetic text-byte
  * fixtures) are unaffected.
  *
  * Scale note: decoding is per-record CPU work with zero shuffle — it
  * lives inside `mapPartitions` so the codec plumbing (here: nothing; a
  * JNI decoder would hold per-thread native contexts) initializes once
  * per partition, and the binary column is only materialized for
  * partitions a decode stage actually reads.
  */
object ImageCodec {

  /** True pixel-level summary of a decoded image: dimensions from the
    * decoder, mean luma, and an 8-bucket luma histogram (normalized) in
    * the same shape as the stub's byte histogram so downstream feature
    * consumers are agnostic to which path produced the vector.
    */
  final case class DecodedImage(
      width: Int,
      height: Int,
      lumaMean: Double,
      lumaHist: Array[Float])

  /** Raw decode to a BufferedImage, or None on unrecognizable bytes —
    * shared by the feature summary below and [[VideoCodec.decodeAvi]]'s
    * per-frame DIB decode.
    */
  def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    Option(
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null })

  /** Encode a BufferedImage as JPEG at an explicit quality. At quality
    * 1.0 the writer's quantization tables are all ones, so an image
    * whose 8×8 blocks are each uniform (e.g. a solid grayscale frame)
    * round-trips EXACTLY: only DC coefficients are non-zero and they
    * quantize losslessly. That exactness (verified in MultimodalSpec) is
    * what lets compressed-video fixtures carry integer oracles (q140).
    */
  def encodeJpeg(
      bi: java.awt.image.BufferedImage, quality: Float): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val w = ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val out = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      w.setOutput(out)
      w.write(null, new javax.imageio.IIOImage(bi, null, null), p)
    } finally { w.dispose(); out.close() }
    bos.toByteArray
  }

  /** Solid single-channel grayscale image (no color transform on the
    * JPEG path — the exact-round-trip fixture shape).
    */
  def grayImage(w: Int, h: Int, gray: Int): java.awt.image.BufferedImage = {
    require(gray >= 0 && gray <= 255, s"gray out of range: $gray")
    val bi = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = bi.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { r.setSample(x, y, 0, gray); x += 1 }
      y += 1
    }
    bi
  }

  /** Solid RGB color image (TYPE_3BYTE_BGR — the shape the JPEG writer
    * sends through its YCbCr transform; the exact-color-round-trip
    * fixture for compressed video, see MultimodalSpec's fixed-point
    * model).
    */
  def colorImage(
      w: Int, h: Int, r: Int, g: Int, b: Int): java.awt.image.BufferedImage = {
    require(Seq(r, g, b).forall(c => c >= 0 && c <= 255), s"rgb: $r,$g,$b")
    val bi = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { bi.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    bi
  }

  /** The JPEG color round trip for a SOLID color at quality 1.0, as
    * exact integers: libjpeg's fixed-point RGB→YCbCr (jccolor.c) and
    * YCbCr→RGB (jdcolor.c) compose around a lossless middle (all-ones
    * quant tables, DC-only blocks, uniform chroma — 4:2:0 subsampling
    * of a constant plane is exact). Arithmetic >>16 on negatives =
    * floor division, hence `Math.floorDiv`. This is the oracle model
    * for color MJPEG (q144) and is pinned against the real JDK decoder
    * in MultimodalSpec.
    */
  def jpegSolidColorRoundTrip(r: Int, g: Int, b: Int): (Int, Int, Int) = {
    val yy = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
    val cb = Math.floorDiv(-11059 * r - 21709 * g + 32768 * b
      + 8388608 + 32767, 65536) - 128
    val cr = Math.floorDiv(32768 * r - 27439 * g - 5329 * b
      + 8388608 + 32767, 65536) - 128
    def clamp(v: Int) = math.max(0, math.min(255, v))
    (clamp(yy + Math.floorDiv(91881 * cr + 32768, 65536)),
      clamp(yy + Math.floorDiv(-22554 * cb - 46802 * cr + 32768, 65536)),
      clamp(yy + Math.floorDiv(116130 * cb + 32768, 65536)))
  }

  /** Nearest-neighbor resize to `w`x`h`: destination (x, y) SELECTS
    * source pixel (x·srcW/w, y·srcH/h) — exact integer arithmetic, no
    * interpolation kernel, so the resized pixels are bit-replayable
    * (AWT's scaling ops interpolate with platform-varying rounding;
    * this is the resize a deterministic training-data pipeline wants
    * for thumbnail/fingerprint stages). Returns packed 24-bit RGB,
    * row-major.
    */
  def resizeNearest(
      bi: java.awt.image.BufferedImage, w: Int, h: Int): Array[Int] = {
    val sw = bi.getWidth
    val sh = bi.getHeight
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val sy = y * sh / h
      var x = 0
      while (x < w) {
        out(y * w + x) = bi.getRGB(x * sw / w, sy) & 0xffffff
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode an encoded image payload, or None when the bytes are not a
    * recognizable image (ImageIO returns null / throws on garbage —
    * both map to None so callers can fall back).
    */
  def decode(bytes: Array[Byte]): Option[DecodedImage] = {
    readImage(bytes).map { bi =>
      val w = bi.getWidth
      val h = bi.getHeight
      val hist = new Array[Float](8)
      var sum = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = bi.getRGB(x, y)
          // ITU-R BT.601 luma from the sRGB channels
          val luma = 0.299 * ((rgb >> 16) & 0xff) +
            0.587 * ((rgb >> 8) & 0xff) +
            0.114 * (rgb & 0xff)
          sum += luma
          hist(math.min(7, (luma / 32.0).toInt)) += 1f
          x += 1
        }
        y += 1
      }
      val n = math.max(1, w * h)
      var i = 0
      while (i < 8) { hist(i) /= n; i += 1 }
      DecodedImage(w, h, sum / n, hist)
    }
  }
}
