package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract validation (the Deequ/Great-Expectations shape): declare
  * per-table checks, get back one row per check with the measured metric,
  * violation count, and verdict — the gate a 100 TB ingest runs before
  * publishing a snapshot, and the same machinery training-data pipelines
  * use to enforce schema contracts on crawl drops.
  *
  * Scale shape: every row-local check (not-null, range, custom predicate)
  * folds into ONE combinable aggregation over ONE scan of the table —
  * adding a check adds a column to the agg, not a pass over the data.
  * Uniqueness adds one exact distinct (a shuffle of the key columns
  * only); a foreign-key check adds one left-anti join against the
  * referenced table's key projection (broadcast when driver-small, and
  * only the key columns of either side are ever read).
  */
object Validation {

  sealed trait Check { def name: String }
  /** `col` must never be null. */
  final case class NotNull(col: String) extends Check {
    def name = s"not_null($col)"
  }
  /** `cols` must be row-unique (NULLs compare equal, matching the
    * dedup-key semantics used across the store).
    */
  final case class Unique(cols: Seq[String]) extends Check {
    def name = s"unique(${cols.mkString(",")})"
  }
  /** `col` must lie in [lo, hi] when non-null. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check {
    def name = s"in_range($col,$lo,$hi)"
  }
  /** Row-local predicate that must hold (null predicate = violation). */
  final case class Satisfies(name: String, predicate: Column) extends Check
  /** Every non-null `cols` tuple must exist in `refCols` of `ref`. */
  final case class ForeignKey(cols: Seq[String], ref: DataFrame,
      refCols: Seq[String]) extends Check {
    def name = s"foreign_key(${cols.mkString(",")})"
  }

  /** Run `checks` against `df`: one row per check —
    * (check, n_rows, n_violations, passed) — in input order.
    */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // keyed by POSITION in `checks`, not by rendered name — two checks
    // that happen to render the same label (duplicated NotNull, two
    // Satisfies given one label) must still count independently
    val rowLocal: Seq[(Int, Column)] = checks.zipWithIndex.collect {
      case (NotNull(col0), i) => i -> col(col0).isNull
      case (InRange(col0, lo, hi), i) =>
        i -> (col(col0).isNotNull && !col(col0).between(lo, hi))
      case (Satisfies(_, p), i) => i -> !coalesce(p, lit(false))
    }
    val aggCols = count(lit(1)).as("__n") +: rowLocal.zipWithIndex.map {
      case ((_, viol), slot) =>
        sum(when(viol, 1L).otherwise(0L)).as(s"__v$slot")
    }
    val head = df.agg(aggCols.head, aggCols.tail: _*).head()
    val n = head.getLong(0)
    val rowLocalCounts: Map[Int, Long] = rowLocal.zipWithIndex.map {
      case ((checkIdx, _), slot) => checkIdx -> head.getLong(slot + 1)
    }.toMap
    val results = checks.zipWithIndex.map {
      case (c @ (_: NotNull | _: InRange | _: Satisfies), i) =>
        (c.name, n, rowLocalCounts(i))
      case (c @ Unique(cols0), _) =>
        // distinct over the key columns only; violations = extra copies
        val distinct = df.select(cols0.map(col): _*).distinct().count()
        (c.name, n, n - distinct)
      case (c @ ForeignKey(cols0, ref, refCols), _) =>
        // qualified aliases: an FK column usually has the SAME name as
        // the referenced column, and bare col(a) === col(b) would then
        // resolve ambiguously across the two join children (analysis
        // error — or, under legacy self-join resolution, a trivially
        // true condition that reports zero orphans forever)
        val orphans = df
          .filter(cols0.map(col(_).isNotNull).reduce(_ && _))
          .select(cols0.map(col): _*).alias("l")
          .join(ref.select(refCols.map(col): _*).distinct().alias("r"),
            cols0.zip(refCols).map { case (a, b) =>
              col(s"l.$a") === col(s"r.$b") }.reduce(_ && _),
            "left_anti")
          .count()
        (c.name, n, orphans)
    }
    results.map { case (name, rows, viol) => (name, rows, viol, viol == 0L) }
      .toDF("check", "n_rows", "n_violations", "passed")
  }
}
