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
    *
    * The salt is a DETERMINISTIC hash of the whole row, never
    * `monotonically_increasing_id`/`rand`: a nondeterministic expression
    * feeding a shuffle key is the SPARK-23207 hazard — a fetch-failure
    * recomputation re-salts rows differently, and reducers that already
    * consumed the old map output duplicate or drop them. Content hashing
    * spreads a hot key exactly when spreading helps (its rows differ in
    * the non-key columns — a hub's edge list varies in the other
    * endpoint); byte-identical duplicate rows share a salt, but such
    * rows collapse under the same reducer key regardless of salting.
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
    val salted = skewed.withColumn("__salt", saltColumn(skewed, saltBuckets))
    val replicated = dim.withColumn(
      "__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** The salt assignment itself — a pure function of the row's content
    * (whole-row xxhash64 mod buckets). Exposed package-private so
    * SkewSpec can pin the SPARK-23207 invariant directly: same row ⇒
    * same salt on EVERY evaluation, because a fetch-failure
    * recomputation is just another evaluation.
    */
  private[graft] def saltColumn(df: DataFrame, saltBuckets: Int)
      : org.apache.spark.sql.Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(saltBuckets.toLong))
      .cast("int")

  /** Derive the salt spread from the data instead of guessing: ONE
    * map-side-combinable Misra–Gries pass over the skewed side's key
    * (constant memory, no shuffle of the input) estimates the heaviest
    * key's frequency share, and the bucket count is that share over the
    * even-reducer target `1/numShufflePartitions`:
    *
    *   - a 99%-mass hub on a 32-reducer shuffle derives ~32 buckets —
    *     its rows spread across every reducer;
    *   - a uniform key set derives 1 — [[adaptiveSaltedJoin]] degrades
    *     to a plain join and the dimension is never replicated.
    *
    * The MG counter is a lower bound with error ≤ n/probeK, so the share
    * is taken at its UPPER confidence edge (count + n/probeK) — when in
    * doubt, spread more; over-spreading costs one small dim replication,
    * under-spreading costs a pinned reducer.
    */
  def adaptiveSaltBuckets(
      skewed: DataFrame,
      keys: Seq[String],
      maxBuckets: Int = 64,
      probeK: Int = 64): Int = {
    val key = concat_ws("\u0000", keys.map(col): _*)
    // function registries are per-session: register in the frame's OWN
    // session (a fresh newSession() has not seen the default registration)
    graft.functions.VectorFunctions.register(skewed.sparkSession)
    val row = skewed
      .agg(graft.functions.VectorFunctions.misraGries(key, probeK).as("mg"),
        count(lit(1)).as("n"))
      .head()
    val n = row.getLong(1)
    if (n == 0L) return 1
    val mg = row.getMap[String, Long](0)
    val maxLower = if (mg.isEmpty) 0L else mg.valuesIterator.max
    val share = (maxLower + n / probeK).toDouble / n
    val p = skewed.sparkSession.sessionState.conf.numShufflePartitions
    math.max(1, math.min(maxBuckets, math.ceil(share * p).toInt))
  }

  /** [[saltedJoin]] at the [[adaptiveSaltBuckets]]-derived spread; a
    * derived count of 1 (no dominant key) is a plain un-replicated join.
    */
  def adaptiveSaltedJoin(
      skewed: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      joinType: String = "inner",
      maxBuckets: Int = 64): DataFrame = {
    val b = adaptiveSaltBuckets(skewed, keys, maxBuckets)
    if (b <= 1) skewed.join(dim, keys, joinType)
    else saltedJoin(skewed, dim, keys, b, joinType)
  }
}
