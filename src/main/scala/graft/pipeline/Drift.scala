package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift measurement between two populations — the check a
  * training-data pipeline runs between crawl snapshots (did the language
  * mix shift? did a feature's distribution move?) and the monitoring
  * primitive behind "retrain when PSI > 0.2" policies.
  *
  * Population Stability Index over deterministic bins:
  * `PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i)`, with Laplace-smoothed
  * shares `p_i = (n_i + 0.5) / (N + 0.5·B)` so empty bins stay finite
  * and the arithmetic is replayable exactly (no data-dependent epsilon).
  *
  * Scale shape: one combinable groupBy per side over the bin expression
  * (the shuffle carries B bins, not rows), a full-outer join of two
  * B-row frames, and two scalar totals. Adding features adds bin
  * columns, never extra passes over the data.
  */
object Drift {

  /** Per-bin PSI terms between `a` and `b` under `binExpr` (evaluated
    * against each side's rows). Output: (feature, bin, n_a, n_b,
    * psi_term) — the PSI is the sum of `psi_term`; per-bin terms are
    * returned so drift can be ATTRIBUTED, not just detected.
    */
  def psiTerms(a: DataFrame, b: DataFrame, binExpr: Column,
      feature: String): DataFrame = {
    val ca = a.groupBy(binExpr.as("bin")).agg(count(lit(1)).as("n_a"))
    val cb = b.groupBy(binExpr.as("bin")).agg(count(lit(1)).as("n_b"))
    val joined = ca.join(cb, Seq("bin"), "full_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
    val t = joined.agg(sum("n_a"), sum("n_b"), count(lit(1))).head()
    val (na, nb, bins) = (t.getLong(0), t.getLong(1), t.getLong(2))
    val p = (col("n_a") + 0.5) / (na + 0.5 * bins)
    val q = (col("n_b") + 0.5) / (nb + 0.5 * bins)
    joined.select(
      lit(feature).as("feature"), col("bin").cast("string").as("bin"),
      col("n_a"), col("n_b"),
      round((p - q) * log(p / q), 6).as("psi_term"))
  }

  /** Fixed-width numeric binning clamped to [0, bins-1] — identical
    * arithmetic on both engines (floor of an IEEE double product).
    */
  def numericBin(v: Column, lo: Double, hi: Double, bins: Int): Column =
    least(lit(bins - 1), greatest(lit(0),
      floor((v - lo) / (hi - lo) * bins).cast("long")))
}
