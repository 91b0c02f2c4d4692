package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Exact heavy hitters at corpus scale — the two-pass scheme every
  * skew-aware pipeline step leans on (hot-key detection for salting,
  * domain dominance checks, boilerplate-source discovery):
  *
  *   1. Candidate pass: one map-side-combinable [[graft.functions.MisraGriesAgg]]
  *      scan — constant memory, no shuffle of the input, with the
  *      guarantee that every item of true frequency > N/k is among the
  *      at-most-k candidates.
  *   2. Confirm pass: exact counts of the candidates only (the `isin`
  *      filter pushes into the scan), keeping those strictly above N/k.
  *
  * Output is therefore EXACT and partition-invariant — the summary's
  * merge-tree nondeterminism affects only sub-threshold candidates,
  * which the confirm pass discards — while never shuffling more than
  * k groups. A plain groupBy-count would shuffle every distinct key;
  * at 100 TB with billions of keys that is the difference between a
  * metadata-sized and a corpus-sized exchange.
  */
object HeavyHitters {

  /** Items of `key` with exact frequency strictly greater than
    * `N / k` (N = non-null rows), with their exact counts, ordered by
    * count desc then item.
    */
  def exact(df: DataFrame, key: Column, k: Int): DataFrame = {
    val row = df
      .agg(VectorFunctions.misraGries(key, k).as("mg"), count(key).as("n"))
      .head()
    val candidates = row.getMap[String, Long](0).keys.toSeq.sorted
    val n = row.getLong(1)
    if (candidates.isEmpty || n == 0L)
      return df.sparkSession.emptyDataFrame
        .select(lit("").as("item"), lit(0L).as("n_exact")).limit(0)
    df.filter(key.isin(candidates: _*))
      .groupBy(key.cast("string").as("item"))
      .agg(count(lit(1)).as("n_exact"))
      .filter(col("n_exact") * k > n)
      .orderBy(col("n_exact").desc, col("item"))
  }
}
