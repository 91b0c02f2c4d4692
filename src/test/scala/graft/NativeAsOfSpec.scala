package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin
import graft.plans.{AsOfJoinExec, NativeAsOf}

/** The native as-of operator (logical node + strategy + physical merge)
  * must agree row-for-row with the window-composition operator, plan as
  * itself (not fall back), and carry the sort-merge shuffle shape.
  */
class NativeAsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def events(kind: String) =
    Tables.events(spark, TestSpark.sf)
      .filter(col("event_type") === kind && col("user_id").isNotNull)
      .select("user_id", "ts", "event_id")

  test("native as-of equals the window composition on the events fixture") {
    val left = events("purchase")
    val right = events("click")
      .withColumnRenamed("ts", "r_ts")
      .withColumnRenamed("event_id", "r_event_id")
      .withColumnRenamed("user_id", "r_user_id")
    val native = NativeAsOf.join(left, right,
        leftKey = "user_id", rightKey = "r_user_id",
        leftTs = "ts", rightTs = "r_ts", tieBreak = "r_event_id")
      .select(col("event_id"), col("r_event_id").as("click_id"))
    val window = AsOfJoin.asofJoin(left, events("click"),
        keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        rightPayload = Seq("event_id"), tieBreak = "event_id")
      .select(col("event_id"), col("asof_event_id").as("click_id"))
    assert(native.count() == left.count(), "left join: every left row kept")
    assert(native.exceptAll(window).isEmpty && window.exceptAll(native).isEmpty)
  }

  test("native as-of on adversarial data: ties, nulls, empty key groups") {
    val left = Seq(
      (1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L), (3L, 7L, 103L),
      (4L, 1L, 104L) // key with no right rows at all
    ).toDF("k", "t", "lid")
    val right = Seq(
      (1L, 10L, 200L), (1L, 10L, 201L), // tie on time: greatest tieBreak wins
      (1L, 15L, 202L), (2L, 9L, 203L),  // 15 > left's 20? no: matches 20
      (3L, 7L, 204L)                    // equal time: inclusive
    ).toDF("k2", "t2", "rid")
    val got = NativeAsOf.join(left, right, "k", "k2", "t", "t2", "rid")
      .select(col("lid"), col("rid")).as[(Long, Option[Long])]
      .collect().toMap
    assert(got(100L).contains(201L), s"time-tie must take max tieBreak: $got")
    assert(got(101L).contains(202L))
    assert(got(102L).isEmpty, "right row after left time must not match")
    assert(got(103L).contains(204L), "equal time is inclusive")
    assert(got(104L).isEmpty)
  }

  test("mismatched key/time types fail at analysis, not in executors") {
    val left = Seq((1L, 10L, 100L)).toDF("k", "t", "lid")
    val rightStrKey = Seq(("1", 5L, 200L)).toDF("k2", "t2", "rid")
    val e1 = intercept[IllegalArgumentException] {
      NativeAsOf.join(left, rightStrKey, "k", "k2", "t", "t2", "rid")
    }
    assert(e1.getMessage.contains("key types must match"), e1.getMessage)
    val rightStrTime = Seq((1L, "5", 200L)).toDF("k2", "t2", "rid")
    val e2 = intercept[IllegalArgumentException] {
      NativeAsOf.join(left, rightStrTime, "k", "k2", "t", "t2", "rid")
    }
    assert(e2.getMessage.contains("time types must match"), e2.getMessage)
  }

  test("plans as AsOfJoinExec with at most one shuffle per side") {
    val left = events("purchase")
    val right = events("click")
      .withColumnRenamed("ts", "r_ts")
      .withColumnRenamed("event_id", "r_event_id")
      .withColumnRenamed("user_id", "r_user_id")
    val df = NativeAsOf.join(left, right,
      "user_id", "r_user_id", "ts", "r_ts", "r_event_id")
    df.count() // force planning through AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin "), plan.take(800)) // exec renders sans suffix
    val shuffles = "Exchange".r.findAllIn(plan).length
    assert(shuffles <= 2, s"expected <=2 exchanges, plan:\n${plan.take(1200)}")
  }
}
