package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental view maintenance over the store's change feed — the
  * consumer [[StoreLog.changes]] exists for: a downstream aggregate
  * (per-database backup counts, per-domain token totals) kept current by
  * folding in each version span's row-level changes instead of
  * rescanning the table.
  *
  * Classic signed-delta IVM for SUM-able aggregates: `insert` and
  * `update_post` rows contribute +metric, `delete` and `update_pre`
  * rows −metric — an update's net effect is exactly (post − pre), and a
  * rewritten-but-identical survivor contributes nothing because the
  * change feed never emits it. COUNT is SUM of 1. Scale shape: one
  * combinable aggregation over the span's changes (O(changes), which
  * for a trickle append is O(batch)), then one equi-join against the
  * running view (keyed, broadcastable when the view is key-small) —
  * the table itself is never rescanned.
  */
object IncrementalAgg {

  /** Fold one span of changes into `prev`. `prev` must carry `keys` plus
    * one LONG column per metric name; `metrics` maps each metric column
    * to its per-row contribution expression over a change row.
    *
    * Group lifecycle: signed-delta folding cannot tell "group deleted"
    * from "group sums to zero" on its own — [[direct]] OMITS a group
    * whose rows were all deleted, while a plain fold would keep it with
    * zeroed metrics. Pass `countMetric` naming a `lit(1L)`-style
    * row-count metric and `applyDelta` drops groups whose live row count
    * reaches 0, restoring exact convergence with `direct`. Without one,
    * callers must filter zero-count groups themselves before comparing.
    */
  def applyDelta(prev: DataFrame, changes: DataFrame, keys: Seq[String],
      metrics: Seq[(String, Column)],
      countMetric: Option[String] = None): DataFrame = {
    countMetric.foreach { n =>
      require(metrics.exists(_._1 == n),
        s"countMetric '$n' must be one of the maintained metrics")
    }
    val sign = when(col("_change_type").isin("insert", "update_post"), 1L)
      .otherwise(lit(-1L))
    val delta = changes
      .groupBy(keys.map(col): _*)
      .agg(
        sum(sign * metrics.head._2).as(metrics.head._1),
        metrics.tail.map { case (n, m) => sum(sign * m).as(n) }: _*)
    val p = prev.alias("p")
    val d = delta.alias("d")
    val joinCond = keys.map(k => col(s"p.$k") <=> col(s"d.$k"))
      .reduce(_ && _)
    val folded = p.join(d, joinCond, "full_outer")
      .select(
        keys.map(k => coalesce(col(s"p.$k"), col(s"d.$k")).as(k)) ++
          metrics.map { case (n, _) =>
            (coalesce(col(s"p.$n"), lit(0L)) +
              coalesce(col(s"d.$n"), lit(0L))).as(n)
          }: _*)
    countMetric.fold(folded)(n => folded.filter(col(n) > 0L))
  }

  /** The non-incremental twin: the same aggregate computed directly —
    * the correctness reference `applyDelta` chains must converge to.
    */
  def direct(table: DataFrame, keys: Seq[String],
      metrics: Seq[(String, Column)]): DataFrame =
    table.groupBy(keys.map(col): _*)
      .agg(
        sum(metrics.head._2).as(metrics.head._1),
        metrics.tail.map { case (n, m) => sum(m).as(n) }: _*)
}
