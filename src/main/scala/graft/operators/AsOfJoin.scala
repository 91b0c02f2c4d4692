package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: for each left row, the single right row with the
  * greatest `rightTs <= leftTs` in the same key group (inclusive match),
  * or nulls when no right row precedes it.
  *
  * Spark has no native ASOF JOIN (DuckDB/Pandas do). The naive spelling —
  * `left.join(right, keys && rTs <= lTs)` then keep the max — fans out to
  * |L|x|R| rows per key before the rank prunes them, which is quadratic in
  * backfill-sized groups. This operator instead unions the two sides into
  * one event-ordered stream and carries the most recent right row forward
  * with `last(_, ignoreNulls)` over a per-key window: ONE shuffle on the
  * key, a per-partition sort, zero join nodes, linear in |L|+|R| — the
  * shape that survives 100 TB (locked in PlanSpec).
  *
  * The carried right columns travel as one struct, so a null payload
  * VALUE never falls back to an older row — whole rows match or nothing
  * does. Ties: right rows sort before left rows at equal timestamps (an
  * equal-time right row IS matched), and equal right timestamps resolve
  * to the greatest `tieBreak` column value — a total order, so results
  * are deterministic on any cluster.
  */
object AsOfJoin {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      tieBreak: String,
      prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    require(rightPayload.contains(tieBreak), "tieBreak must be carried")
    val leftCols = left.columns.toSeq
    val carried = (rightTs +: rightPayload).distinct
    val packed = struct(carried.map(col): _*)
    val packedType = right.select(packed).schema.head.dataType
    // a NULL right timestamp can never satisfy rightTs <= leftTs — drop
    // such rows up front; left in, they would sort NULLS FIRST and be
    // carried forward as phantom matches
    val rightValid = right.filter(col(rightTs).isNotNull)

    // Common layout: keys ++ __ts ++ __side ++ left payload ++ __r struct.
    val l = left.select(
      (keys.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__side") :+
        lit(null).cast(packedType).as("__r")) ++
        leftCols.filterNot(c => keys.contains(c) || c == leftTs).map(col): _*)
    val r = rightValid.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+
        packed.as("__r")) ++
        leftCols.filterNot(c => keys.contains(c) || c == leftTs)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // Right rows first at equal __ts (inclusive as-of); `last(ignoreNulls)`
    // over the ascending order picks the right row with the greatest
    // (rightTs, tieBreak) at or before each left row.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc,
        col("__r").getField(tieBreak).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((keys.map(col) :+ col("__ts").as(leftTs)) ++
        leftCols.filterNot(c => keys.contains(c) || c == leftTs).map(col) ++
        carried.map(c => col("__r").getField(c).as(s"$prefix$c")): _*)
  }
}
