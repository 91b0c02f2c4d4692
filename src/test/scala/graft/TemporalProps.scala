package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.{AsOfJoin, BandJoin}

/** Property-based equivalence for the temporal joins: on ANY event set,
  * the scale-shaped operators must agree with the naive inequality-join
  * spellings — including adversarial cases the fixed fixtures miss
  * (duplicate timestamps, empty sides, bucket-boundary gaps).
  */
class TemporalProps extends Properties("temporal") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6) // each case runs several Spark jobs

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** (user, epochMicros, id) — few users and coarse timestamps so
    * duplicate (user, ts) collisions actually occur.
    */
  private val genEvents: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(0, 120)
    rows <- Gen.listOfN(n, for {
      u <- Gen.choose(0L, 4L)
      t <- Gen.choose(0L, 50L)
    } yield (u, 1700000000000000L + t * 600000000L)) // 10-min grid
  } yield rows.zipWithIndex.map { case ((u, t), i) => (u, t, i.toLong) }

  private def df(rows: List[(Long, Long, Long)]) =
    rows.toDF("user_id", "us", "event_id")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_id"))

  property("asofJoin == naive join+rank on any split of any event set") =
    Prop.forAll(genEvents) { rows =>
      val (lRows, rRows) = rows.partition(_._3 % 2 == 0)
      if (lRows.isEmpty || rRows.isEmpty) Prop.passed
      else {
        val l = df(lRows)
        val r = df(rRows)
        val fast = AsOfJoin.asofJoin(l, r, Seq("user_id"),
            "ts", "ts", Seq("event_id"), tieBreak = "event_id")
          .select(col("event_id"), col("asof_event_id"))
        val w = Window.partitionBy(col("a.event_id"))
          .orderBy(col("b.ts").desc_nulls_last,
            col("b.event_id").desc_nulls_last)
        val naive = l.as("a")
          .join(r.as("b"),
            col("a.user_id") === col("b.user_id") &&
              col("b.ts") <= col("a.ts"), "left")
          .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("a.event_id"), col("b.event_id").as("asof_event_id"))
        Prop(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
      }
    }

  property("bandJoin == naive inequality join for any gap, bounds inclusive") =
    Prop.forAll(genEvents, Gen.oneOf(600L, 1800L, 3600L)) { (rows, gap) =>
      val (lRows, rRows) = rows.partition(_._3 % 2 == 0)
      if (lRows.isEmpty || rRows.isEmpty) Prop.passed
      else {
        val l = df(lRows)
        val r = df(rRows)
        val fast = BandJoin.bandJoin(l, r, Seq("user_id"), "ts", "ts", gap)
          .select("user_id", "l_event_id", "r_event_id")
        val naive = l.as("a").join(r.as("b"),
            col("a.user_id") === col("b.user_id") &&
              col("b.ts") >= col("a.ts") &&
              unix_micros(col("b.ts")) - unix_micros(col("a.ts")) <=
                gap * 1000000L)
          .select(col("a.user_id"), col("a.event_id").as("l_event_id"),
            col("b.event_id").as("r_event_id"))
        Prop(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
      }
    }
}
