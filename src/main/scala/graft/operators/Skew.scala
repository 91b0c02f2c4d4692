package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hash-partitioned equi-joins. AQE's skew-join
  * handles sort-merge skew at runtime; this is the explicit salting form
  * for when the skewed side must hash-join a mid-sized dimension that is
  * too big to broadcast and a handful of hot keys would otherwise pin
  * single reducers.
  *
  * Shape: scatter the skewed side across `saltBuckets` sub-keys with a
  * row-local salt (its value never affects results — any bucket works),
  * replicate the dimension once per bucket, and join on
  * `(keys..., salt)`. Each hot key's rows now spread over `saltBuckets`
  * reducers at the cost of a `saltBuckets`x blow-up of the dimension —
  * the standard trade at 100 TB, where the dimension replication is
  * megabytes and the hot-key reducer would be hours.
  */
object Skew {

  /** `joinType` supports "inner" and "left" (left-outer preserves the
    * skewed side: each skewed row carries exactly one salt and the
    * replicated dim carries every salt, so match/no-match is unchanged).
    */
  def saltedJoin(
      skewed: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      saltBuckets: Int = 8,
      joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left, got $joinType")
    val salted = skewed.withColumn(
      "__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
    val replicated = dim.withColumn(
      "__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
