package graft.pipeline

import java.awt.image.BufferedImage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual near-duplicate IMAGE dedup — the multimodal twin of
  * [[Dedup.simhashPairs]]. Text near-dup catches re-crawled documents;
  * at 100 TB a multimodal corpus needs the same for images, where
  * re-encodes and single-pixel edits defeat exact (byte-hash) dedup.
  *
  * The fingerprint is dHash (difference hash): nearest-neighbor
  * downsample to an 18x16 grayscale grid, 2x2 block-pool to a 9x8 grid
  * of block sums, and bit (y*8 + x) is set iff sum(x, y) > sum(x+1, y)
  * — 64 gradient-sign bits. A small pixel edit perturbs one block sum
  * and flips at most two bits (the block's left and right comparisons),
  * so near-identical images land within a small hamming distance while
  * unrelated images differ on ~32 bits.
  *
  * Scale shape: the decode + hash is one row-local `mapPartitions` pass
  * (codec state per partition, zero shuffle); candidate generation
  * reuses [[Dedup.hammingPairs]] — pigeonhole banding, equi-join on
  * (band, value), hot-bucket cap — so nothing is ever all-pairs.
  */
object ImageDedup {

  /** Integer BT.601 luma (parts-per-1000 weights sum to exactly 1000, so
    * gray pixels with r=g=b=v map to exactly v — what makes the fixture
    * oracle exact-integer).
    */
  private def luma(rgb: Int): Int =
    (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
      114 * (rgb & 0xff)) / 1000

  /** 64-bit dHash of a decoded image. Images are nearest-neighbor
    * sampled onto the fixed 18x16 grid (an 18x16 input maps through
    * unchanged), block-pooled 2x2, and the 8 horizontal sum comparisons
    * per pooled row make one bit each across 8 rows.
    */
  def dhash64(bi: BufferedImage): Long = {
    val w = bi.getWidth
    val h = bi.getHeight
    // block sums over the 18x16 NN-sampled grid -> 9x8
    val sums = Array.ofDim[Long](8, 9)
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 18) {
        val sx = if (w == 18) x else (x * w) / 18
        val sy = if (h == 16) y else (y * h) / 16
        sums(y / 2)(x / 2) += luma(bi.getRGB(sx, sy))
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        if (sums(by)(bx) > sums(by)(bx + 1))
          hash |= (1L << (by * 8 + bx))
        bx += 1
      }
      by += 1
    }
    hash
  }

  /** (id, dhash) per decodable image payload; undecodable payloads are
    * dropped (they belong to exact/byte-level dedup, not perceptual).
    */
  def dhashes(spark: SparkSession, media: DataFrame,
      idCol: String, payloadCol: String): DataFrame = {
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          ImageCodec.readImage(bytes).map(bi => (id, dhash64(bi)))
        }
      }
      .toDF(idCol, "dhash")
  }

  /** Near-duplicate image pairs within `maxHamming` dHash bit flips —
    * [[Dedup.hammingPairs]] banding over the perceptual fingerprint.
    */
  def dhashPairs(spark: SparkSession, media: DataFrame,
      idCol: String, payloadCol: String,
      maxHamming: Int = 4, maxBucketDocs: Long = 1000): DataFrame =
    // pinned: hammingPairs consumes the fingerprint frame three times
    // (banding + two re-attach joins), and this one's upstream is a
    // full image decode — uncached it ran 3x (same contract as
    // simhashPairs' pin on its simhash frame)
    Dedup.hammingPairs(
      graft.util.CacheSlots.rotateOne("imagededup.dhashes",
        dhashes(spark, media, idCol, payloadCol)),
      idCol, "dhash", bits = 64, maxHamming = maxHamming,
      maxBucketDocs = maxBucketDocs)
}
