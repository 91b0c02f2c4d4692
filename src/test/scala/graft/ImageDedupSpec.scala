package graft

import java.awt.image.BufferedImage

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.ImageDedup

/** dHash first-principles: closed-form hashes on constructed gradients,
  * the bounded effect of a single-pixel edit, and end-to-end pair
  * detection through encode → decode → hash → banding.
  */
class ImageDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def gray(w: Int, h: Int)(f: (Int, Int) => Int): BufferedImage = {
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x, y) & 0xff
      bi.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    bi
  }

  private def bmp(bi: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "bmp", bos)
    bos.toByteArray
  }

  test("closed forms: flat image hashes to 0, increasing gradient to all ones") {
    assert(ImageDedup.dhash64(gray(18, 16)((_, _) => 7)) === 0L)
    // strictly DECREASING left-to-right gradient: every left block sum
    // beats its right neighbor -> all 64 bits set
    assert(ImageDedup.dhash64(gray(18, 16)((x, _) => 200 - 10 * x)) === -1L)
    // strictly increasing -> no comparison wins -> 0
    assert(ImageDedup.dhash64(gray(18, 16)((x, _) => 10 * x)) === 0L)
  }

  test("single-pixel edit flips at most 2 bits; NN downsample handles other sizes") {
    val base = gray(18, 16)((x, y) => (x * 37 + y * 91) % 256)
    val edited = gray(18, 16)((x, y) =>
      if (x == 5 && y == 5) 255 else (x * 37 + y * 91) % 256)
    val d = java.lang.Long.bitCount(
      ImageDedup.dhash64(base) ^ ImageDedup.dhash64(edited))
    assert(d <= 2)
    // a 2x-scaled copy NN-downsamples onto the same grid -> hamming 0
    val scaled = gray(36, 32)((x, y) => ((x / 2) * 37 + (y / 2) * 91) % 256)
    assert(ImageDedup.dhash64(scaled) === ImageDedup.dhash64(base))
  }

  test("dhashPairs finds the planted near-dup, not the unrelated image") {
    import spark.implicits._
    def px(seed: Int)(x: Int, y: Int): Int =
      Integer.parseInt(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"$seed,$x,$y".getBytes("UTF-8"))
          .take(1).map(b => f"$b%02x").mkString, 16)
    val a = bmp(gray(18, 16)(px(1)))
    val aEdit = bmp(gray(18, 16)((x, y) =>
      if (x == 3 && y == 9) 255 else px(1)(x, y)))
    val other = bmp(gray(18, 16)(px(2)))
    val media = Seq((1L, a), (2L, aEdit), (3L, other))
      .toDF("media_id", "payload")
    val pairs = ImageDedup
      .dhashPairs(spark, media, "media_id", "payload", maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("undecodable payloads are dropped, not errors") {
    import spark.implicits._
    val media = Seq(
      (1L, bmp(gray(18, 16)((_, _) => 9))),
      (2L, "not an image".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val hashes = ImageDedup.dhashes(spark, media, "media_id", "payload")
    assert(hashes.collect().map(_.getLong(0)).toSeq === Seq(1L))
  }
}
