package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsOfJoin, BandJoin}

/** Oracle-checked temporal-join queries over the events stream:
  * purchase→click attribution as an AS-OF join (each purchase matched to
  * the user's most recent prior click) and click→purchase conversion
  * pairs as a banded range join (all purchases within an hour of a
  * click). Spark has neither operator natively — [[AsOfJoin]] is the
  * union+window linear form, [[BandJoin]] the bucketed-equi-join form;
  * the DuckDB oracles spell the same semantics with a rank-pruned
  * inequality join.
  */
object TemporalQueries {

  private def typed(
      spark: SparkSession, dir: String, eventType: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_type") === eventType)
      .select("user_id", "ts", "event_id")

  // ---- q53: as-of join (purchase -> latest prior click) ----------------

  def q53AsOfAttribution(spark: SparkSession, dir: String): DataFrame =
    AsOfJoin.asofJoin(
        left = typed(spark, dir, "purchase"),
        right = typed(spark, dir, "click"),
        keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        rightPayload = Seq("event_id"), tieBreak = "event_id")
      .select(
        col("event_id").as("purchase_id"),
        col("user_id"),
        unix_micros(col("ts")).as("purchase_us"),
        col("asof_event_id").as("click_id"),
        unix_micros(col("asof_ts")).as("click_us"))
      .orderBy("purchase_id")

  val q53Oracle: String =
    """WITH c AS (SELECT user_id, ts, event_id FROM events
      |           WHERE event_type = 'click'),
      |p AS (SELECT user_id, ts, event_id FROM events
      |      WHERE event_type = 'purchase'),
      |j AS (
      |  SELECT p.event_id AS purchase_id, p.user_id,
      |         epoch_us(p.ts) AS purchase_us,
      |         c.event_id AS click_id, epoch_us(c.ts) AS click_us,
      |         row_number() OVER (
      |           PARTITION BY p.event_id
      |           ORDER BY c.ts DESC NULLS LAST,
      |                    c.event_id DESC NULLS LAST) AS rn
      |  FROM p LEFT JOIN c
      |    ON c.user_id = p.user_id AND c.ts <= p.ts
      |)
      |SELECT purchase_id, user_id, purchase_us, click_id, click_us
      |FROM j WHERE rn = 1 ORDER BY purchase_id""".stripMargin

  // ---- q54: banded range join (click -> purchases within 1h) -----------

  def q54BandConversion(spark: SparkSession, dir: String): DataFrame =
    BandJoin.bandJoin(
        left = typed(spark, dir, "click"),
        right = typed(spark, dir, "purchase"),
        keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
        maxGapSeconds = 3600)
      .groupBy(hour(col("l_ts")).cast("bigint").as("click_hour"))
      .agg(
        count(lit(1)).as("n_pairs"),
        countDistinct("user_id").as("n_users"),
        round(avg(
          (unix_micros(col("r_ts")) - unix_micros(col("l_ts"))) / 1000000.0
        ), 2).as("avg_gap_s"))
      .orderBy("click_hour")

  val q54Oracle: String =
    """WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
      |SELECT hour(c.ts) AS click_hour,
      |       count(*) AS n_pairs,
      |       count(DISTINCT c.user_id) AS n_users,
      |       round(avg((epoch_us(p.ts) - epoch_us(c.ts)) / 1000000.0), 2)
      |         AS avg_gap_s
      |FROM c JOIN p
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      | AND epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
      |GROUP BY click_hour ORDER BY click_hour""".stripMargin

  // ---- q134: as-of via the NATIVE physical operator --------------------

  /** q53's attribution through the whole-operator engine extension
    * ([[graft.plans.NativeAsOf]]: custom LogicalPlan + Strategy +
    * SparkPlan, one O(|L|+|R|) sorted-merge per partition with O(1)
    * state). Same oracle semantics as q53; null-user purchases flow
    * through the left join unmatched, exercising the null-key path of
    * the merge. A divergence between the native operator and SQL's
    * rank-pruned inequality join is a physical-operator bug by
    * definition.
    */
  def q134NativeAsOf(spark: SparkSession, dir: String): DataFrame = {
    val left = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id")
    val right = Tables.events(spark, dir)
      .filter(col("event_type") === "click" && col("user_id").isNotNull)
      .select(col("user_id").as("r_user_id"), col("ts").as("r_ts"),
        col("event_id").as("r_event_id"))
    graft.plans.NativeAsOf.join(left, right,
        leftKey = "user_id", rightKey = "r_user_id",
        leftTs = "ts", rightTs = "r_ts", tieBreak = "r_event_id")
      .select(
        col("event_id").as("purchase_id"),
        col("user_id"),
        unix_micros(col("ts")).as("purchase_us"),
        col("r_event_id").as("click_id"),
        unix_micros(col("r_ts")).as("click_us"))
      .orderBy("purchase_id")
  }

  val q134Oracle: String =
    """WITH c AS (SELECT user_id, ts, event_id FROM events
      |           WHERE event_type = 'click' AND user_id IS NOT NULL),
      |p AS (SELECT user_id, ts, event_id FROM events
      |      WHERE event_type = 'purchase'),
      |j AS (
      |  SELECT p.event_id AS purchase_id, p.user_id,
      |         epoch_us(p.ts) AS purchase_us,
      |         c.event_id AS click_id, epoch_us(c.ts) AS click_us,
      |         row_number() OVER (
      |           PARTITION BY p.event_id
      |           ORDER BY c.ts DESC NULLS LAST,
      |                    c.event_id DESC NULLS LAST) AS rn
      |  FROM p LEFT JOIN c
      |    ON c.user_id = p.user_id AND c.ts <= p.ts
      |)
      |SELECT purchase_id, user_id, purchase_us, click_id, click_us
      |FROM j WHERE rn = 1 ORDER BY purchase_id""".stripMargin

  def entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q134_native_asof" -> (q134NativeAsOf _),
    "q53_asof_attribution" -> (q53AsOfAttribution _),
    "q54_band_conversion" -> (q54BandConversion _)
  )

  def oracles: Map[String, String] = Map(
    "q134_native_asof" -> q134Oracle,
    "q53_asof_attribution" -> q53Oracle,
    "q54_band_conversion" -> q54Oracle
  )
}
