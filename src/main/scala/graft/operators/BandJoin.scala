package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join: all (left, right) pairs sharing `keys` with
  * `0 <= rightTs - leftTs <= maxGap` (both bounds inclusive).
  *
  * Catalyst plans a plain `keys && range` predicate as an equi-join on
  * the keys with the range as a post-join filter — correct, but a hot key
  * (one user, one device) fans out to |L|x|R| intermediate rows. Bucketing
  * both sides by `floor(epochSeconds / maxGap)` tightens the equi-join key
  * to (keys, bucket): a right row can only land in the left row's bucket
  * or the one after it, so the left side fans out exactly 2x and every
  * candidate pair is generated exactly once (the two candidate buckets are
  * distinct) — no dedup pass, no cross product, shuffle keyed fine enough
  * to spread hot keys across the cluster. This is the standard interval-
  * join shape (Flink's interval join stages the same way).
  */
object BandJoin {

  def bandJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      maxGapSeconds: Long,
      leftPrefix: String = "l_",
      rightPrefix: String = "r_"): DataFrame = {
    require(keys.nonEmpty, "bandJoin needs at least one key column")
    require(maxGapSeconds > 0, "maxGapSeconds must be positive")
    // microsecond integer arithmetic throughout — truncating to seconds
    // would silently widen the band for sub-second timestamps
    val gapUs = maxGapSeconds * 1000000L
    val lBucket = floor(unix_micros(col(leftTs)) / gapUs).cast("long")
    val rBucket = floor(unix_micros(col(rightTs)) / gapUs).cast("long")

    val l = left.select(
      keys.map(col) ++
        left.columns.filterNot(keys.contains)
          .map(c => col(c).as(s"$leftPrefix$c")) :+
        explode(array(lBucket, lBucket + 1)).as("__bucket"): _*)
    val r = right.select(
      keys.map(col) ++
        right.columns.filterNot(keys.contains)
          .map(c => col(c).as(s"$rightPrefix$c")) :+
        rBucket.as("__bucket"): _*)

    val lTs = col(s"$leftPrefix$leftTs")
    val rTs = col(s"$rightPrefix$rightTs")
    l.join(r, keys :+ "__bucket")
      .filter(rTs >= lTs && unix_micros(rTs) - unix_micros(lTs) <= gapUs)
      .drop("__bucket")
  }
}
