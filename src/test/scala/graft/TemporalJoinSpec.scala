package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, BandJoin}

/** Unit + equivalence coverage for the temporal join operators. The
  * equivalence half replays each operator against the naive
  * inequality-join spelling over a deterministic pseudo-random fixture —
  * same semantics, different plan shape.
  */
class TemporalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val clicks = Seq(
    // (user, ts, id)
    (1L, ts("2024-01-01 10:00:00"), 100L),
    (1L, ts("2024-01-01 10:30:00"), 101L),
    (1L, ts("2024-01-01 10:30:00"), 102L), // tie on ts: greater id wins
    (2L, ts("2024-01-01 09:00:00"), 103L),
    (3L, ts("2024-01-01 12:00:00"), 104L)  // after every purchase of u3
  ).toDF("user_id", "ts", "event_id")

  private val purchases = Seq(
    (1L, ts("2024-01-01 10:30:00"), 200L), // equal ts: inclusive match
    (1L, ts("2024-01-01 11:00:00"), 201L),
    (2L, ts("2024-01-01 09:59:59"), 202L),
    (3L, ts("2024-01-01 11:00:00"), 203L), // no prior click -> nulls
    (4L, ts("2024-01-01 11:00:00"), 204L)  // user with no clicks at all
  ).toDF("user_id", "ts", "event_id")

  test("asofJoin matches latest prior right row, ties to greatest id") {
    val out = AsOfJoin.asofJoin(purchases, clicks, Seq("user_id"),
        "ts", "ts", Seq("event_id"), tieBreak = "event_id")
      .select("event_id", "asof_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(out(200L).contains(102L)) // inclusive + tie-break to id 102
    assert(out(201L).contains(102L))
    assert(out(202L).contains(103L))
    assert(out(203L).isEmpty)        // click exists but only later
    assert(out(204L).isEmpty)        // no right rows for the key
  }

  test("asofJoin preserves left row count and carries left payload") {
    val left = purchases.withColumn("value", col("event_id") * 2)
    val out = AsOfJoin.asofJoin(left, clicks, Seq("user_id"),
      "ts", "ts", Seq("event_id"), tieBreak = "event_id")
    assert(out.count() === purchases.count())
    assert(out.filter(col("value") =!= col("event_id") * 2).count() === 0)
  }

  test("bandJoin equals the naive inequality join, bounds inclusive") {
    // deterministic fixture: hash-scattered timestamps, several per user
    val ev = spark.range(400).select(
      (col("id") % 7).as("user_id"),
      timestamp_micros(lit(1700000000000000L) +
        (col("id") * 1234567L + col("id") % 13 * 1000003L)).as("ts"),
      col("id").as("event_id"))
    val l = ev.filter(col("id") % 2 === 0).drop("id")
    val r = ev.filter(col("id") % 2 === 1).drop("id")
    val gap = 600L

    val banded = BandJoin.bandJoin(l, r, Seq("user_id"), "ts", "ts", gap)
      .select("user_id", "l_event_id", "r_event_id")
    val naive = l.as("a").join(r.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.ts") >= col("a.ts") &&
          unix_micros(col("b.ts")) - unix_micros(col("a.ts")) <= gap * 1000000L)
      .select(col("a.user_id"), col("a.event_id").as("l_event_id"),
        col("b.event_id").as("r_event_id"))
    assert(banded.count() > 0)
    assert(banded.exceptAll(naive).isEmpty && naive.exceptAll(banded).isEmpty)
  }

  test("asofJoin equals the naive join + rank spelling") {
    val ev = spark.range(300).select(
      (col("id") % 5).as("user_id"),
      timestamp_micros(lit(1700000000000000L) +
        (col("id") * 999983L % 50000000L)).as("ts"),
      col("id").as("event_id"))
    val l = ev.filter(col("id") % 3 === 0).drop("id")
    val r = ev.filter(col("id") % 3 =!= 0).drop("id")

    val fast = AsOfJoin.asofJoin(l, r, Seq("user_id"),
        "ts", "ts", Seq("event_id"), tieBreak = "event_id")
      .select(col("event_id"), col("asof_event_id"))
    val w = Window.partitionBy(col("a.event_id"))
      .orderBy(col("b.ts").desc_nulls_last, col("b.event_id").desc_nulls_last)
    val naive = l.as("a")
      .join(r.as("b"),
        col("a.user_id") === col("b.user_id") && col("b.ts") <= col("a.ts"),
        "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("a.event_id"), col("b.event_id").as("asof_event_id"))
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }
}
