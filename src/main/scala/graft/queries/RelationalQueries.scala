package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Core relational operator queries over the TPC-H-ish test tables.
  *
  * Each entry exercises operator families from SURVEY.md §2 (projection,
  * filter, aggregation, join, window, sort/limit, set-op) and ships with a
  * DuckDB oracle in [[graft.SparkEntry.oracleSql]]. All final outputs use
  * lowercase aliases and a deterministic ORDER BY so Spark and the oracle
  * hash identically.
  *
  * Scale notes: aggregations are partial-agg friendly (plain hash
  * aggregates over codegen'd expressions); dimension joins broadcast the
  * small side explicitly.
  */
object RelationalQueries {

  /** A-family aggregate sweep (SURVEY §2.4): grouped sums/avgs/counts with
    * arithmetic projections (P2). TPC-H Q1 shape — map-side partial
    * aggregation keeps the shuffle at |groups| ≈ 6 rows.
    */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity), 2) AS sum_qty,
      | round(sum(l_extendedprice), 2) AS sum_base_price,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      | round(avg(l_quantity), 4) AS avg_qty,
      | round(avg(l_discount), 4) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** J-family (SURVEY §2.3): multi-way equi-joins with small dimensions
    * broadcast (region/nation/customer are tiny next to orders at any SF)
    * plus equality filters pushed to the scans (P4).
    */
  def q02MarketRevenue(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val nation = Tables.nation(spark, dir)
    val region = Tables.region(spark, dir)
    orders
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .filter(col("o_orderstatus") =!= "P")
      .groupBy(col("r_name").as("region_name"), col("c_mktsegment").as("mktsegment"))
      .agg(
        round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("region_name"), col("mktsegment"))
  }

  val q02Oracle: String =
    """SELECT r_name AS region_name, c_mktsegment AS mktsegment,
      | round(sum(o_totalprice), 2) AS revenue,
      | count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderstatus <> 'P'
      |GROUP BY r_name, c_mktsegment
      |ORDER BY region_name, mktsegment""".stripMargin

  /** W-family windows (SURVEY §2.5 W1/W3) on a business relation: top-2
    * orders per customer by price via dense_rank, then a semi-join-shaped
    * filter. Window partitions by customer → shuffles once on o_custkey.
    */
  def q03TopOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders
      .withColumn("rk", dense_rank().over(w).cast("bigint"))
      .filter(col("rk") <= 2)
      .filter(col("o_custkey") % 100 === 0)
      .select(
        col("o_custkey").as("custkey"),
        col("o_orderkey").as("orderkey"),
        round(col("o_totalprice"), 2).as("totalprice"),
        col("rk"))
      .orderBy(col("custkey"), col("rk"), col("orderkey"))
  }

  val q03Oracle: String =
    """SELECT o_custkey AS custkey, o_orderkey AS orderkey,
      | round(o_totalprice, 2) AS totalprice, rk
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    dense_rank() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) t
      |WHERE rk <= 2 AND custkey % 100 = 0
      |ORDER BY custkey, rk, orderkey""".stripMargin

  /** Semi-join (EXISTS) shape — TPC-H Q4-like: orders with at least one
    * late lineitem. Catalyst plans the EXISTS as a left-semi hash join.
    */
  def q04LateOrders(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    orders
      .join(li.select(col("l_orderkey"), col("l_shipdate")),
        orders("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > orders("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("priority")
  }

  val q04Oracle: String =
    """SELECT o_orderpriority AS priority, count(*) AS n_orders
      |FROM orders o
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem l
      |  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
      |GROUP BY priority
      |ORDER BY priority""".stripMargin

  /** ROLLUP hierarchy totals (absent from the reference's surface; part
    * of the engine's general relational coverage).
    */
  def q05RollupRevenue(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    orders
      .rollup(col("o_orderstatus").as("status"),
        col("o_orderpriority").as("priority"))
      .agg(round(sum("o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("status").asc_nulls_first, col("priority").asc_nulls_first)
  }

  val q05Oracle: String =
    """SELECT o_orderstatus AS status, o_orderpriority AS priority,
      |       round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
      |FROM orders
      |GROUP BY ROLLUP (status, priority)
      |ORDER BY status ASC NULLS FIRST, priority ASC NULLS FIRST""".stripMargin

  /** EXCEPT set-op (absent from the reference; general engine surface):
    * customers holding orders but none in the top price decile.
    */
  def q06ExceptCustomers(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val all = orders.select(col("o_custkey").as("custkey"))
    val big = orders.filter(col("o_totalprice") > 400000)
      .select(col("o_custkey").as("custkey"))
    all.except(big).orderBy("custkey")
  }

  val q06Oracle: String =
    """SELECT o_custkey AS custkey FROM orders
      |EXCEPT
      |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
      |ORDER BY custkey""".stripMargin

  // ---- q118: data-contract validation ---------------------------------

  /** Planted contract violations over `orders` — every kind the
    * validator must count exactly, one CASE per violation class so the
    * classes stay independent and replayable. Shared SQL text (q42/q113
    * pattern).
    */
  val dirtyOrdersSql: String =
    """dirty_orders AS (
      |  SELECT
      |    CASE WHEN o_orderkey % 101 = 0 THEN 7 ELSE o_orderkey END
      |      AS o_orderkey,
      |    CASE WHEN o_orderkey % 89 = 0 THEN NULL
      |         WHEN o_orderkey % 79 = 0 THEN o_custkey + 9000000
      |         ELSE o_custkey END AS o_custkey,
      |    CASE WHEN o_orderkey % 83 = 0 THEN -o_totalprice
      |         ELSE o_totalprice END AS o_totalprice,
      |    o_orderstatus
      |  FROM orders
      |)""".stripMargin

  /** Declarative data-contract validation ([[graft.pipeline.Validation]],
    * the Deequ shape): five checks — key uniqueness, FK integrity to
    * `customer`, not-null, range, and a domain predicate — each returning
    * its exact violation count over the planted-dirty orders. All
    * row-local checks fold into ONE aggregation pass; the FK check is
    * one anti-join against the distinct customer keys.
    */
  def q118ContractValidation(spark: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.Validation._
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    val dirty = spark.sql(s"WITH $dirtyOrdersSql SELECT * FROM dirty_orders")
    validate(dirty, Seq(
      NotNull("o_custkey"),
      Unique(Seq("o_orderkey")),
      InRange("o_totalprice", 0.0, 1e9),
      ForeignKey(Seq("o_custkey"), Tables.customer(spark, dir),
        Seq("c_custkey")),
      Satisfies("status_domain",
        col("o_orderstatus").isin("O", "F", "P"))
    )).orderBy("check")
  }

  val q118Oracle: String =
    s"""WITH $dirtyOrdersSql,
       |checks AS (
       |  SELECT 'not_null(o_custkey)' AS chk,
       |         (SELECT count(*) FROM dirty_orders WHERE o_custkey IS NULL)
       |           AS v
       |  UNION ALL
       |  SELECT 'unique(o_orderkey)',
       |         (SELECT count(*) FROM dirty_orders) -
       |         (SELECT count(DISTINCT o_orderkey) FROM dirty_orders)
       |  UNION ALL
       |  SELECT 'in_range(o_totalprice,0.0,1.0E9)',
       |         (SELECT count(*) FROM dirty_orders
       |          WHERE o_totalprice IS NOT NULL
       |            AND (o_totalprice < 0 OR o_totalprice > 1000000000))
       |  UNION ALL
       |  SELECT 'foreign_key(o_custkey)',
       |         (SELECT count(*) FROM dirty_orders d
       |          LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
       |            ON d.o_custkey = c.c_custkey
       |          WHERE d.o_custkey IS NOT NULL AND c.c_custkey IS NULL)
       |  UNION ALL
       |  SELECT 'status_domain',
       |         (SELECT count(*) FROM dirty_orders
       |          WHERE NOT coalesce(o_orderstatus IN ('O', 'F', 'P'), false))
       |)
       |SELECT chk AS "check",
       |       (SELECT CAST(count(*) AS BIGINT) FROM dirty_orders) AS n_rows,
       |       CAST(v AS BIGINT) AS n_violations,
       |       v = 0 AS passed
       |FROM checks ORDER BY chk""".stripMargin

  /** CUBE grouping sets — the 2^n aggregate lattice (q05 covers ROLLUP's
    * hierarchy; CUBE completes the grouping-set family): revenue over
    * every subset of (returnflag, linestatus), grouping flags labeling
    * the lattice level. One Expand + one aggregation; no extra scans.
    */
  def q139CubeRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"),
        count(lit(1)).as("n_rows"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("g_flag"), col("g_status"), col("n_rows"), col("revenue"))
      .orderBy("g_flag", "g_status", "returnflag", "linestatus")

  val q139Oracle: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |       coalesce(l_linestatus, 'ALL') AS linestatus,
      |       CASE WHEN GROUPING(l_returnflag) = 1 THEN 1 ELSE 0 END AS g_flag,
      |       CASE WHEN GROUPING(l_linestatus) = 1 THEN 1 ELSE 0 END AS g_status,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY g_flag, g_status, returnflag, linestatus""".stripMargin

  def entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q139_cube_revenue" -> (q139CubeRevenue _),
    "q118_contract_validation" -> (q118ContractValidation _),
    "q06_except_customers" -> (q06ExceptCustomers _),
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_market_revenue" -> (q02MarketRevenue _),
    "q03_top_orders_per_customer" -> (q03TopOrdersPerCustomer _),
    "q04_late_orders_semijoin" -> (q04LateOrders _),
    "q05_rollup_revenue" -> (q05RollupRevenue _)
  )

  def oracles: Map[String, String] = Map(
    "q118_contract_validation" -> q118Oracle,
    "q139_cube_revenue" -> q139Oracle,
    "q06_except_customers" -> q06Oracle,
    "q01_pricing_summary" -> q01Oracle,
    "q02_market_revenue" -> q02Oracle,
    "q03_top_orders_per_customer" -> q03Oracle,
    "q04_late_orders_semijoin" -> q04Oracle,
    "q05_rollup_revenue" -> q05Oracle
  )
}
