package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** General relational operator catalog over the TPC-H-ish test tables.
  *
  * Every query here has a DuckDB oracle twin in [[graft.SparkEntry.oracleSql]];
  * column names/aliases MUST match between the two (the driver sorts columns
  * by name before hashing).
  *
  * Numeric-determinism policy (oracle hash-matching):
  *   - Per-row double arithmetic (x*y, 1-d, comparisons) is IEEE-754
  *     deterministic across engines — safe to use freely.
  *   - Order-dependent double aggregation (sum/avg over a shuffled set) is
  *     NOT reproducible bit-for-bit. All such sums first cast each row to a
  *     Decimal (exact, order-independent integer arithmetic), sum, then cast
  *     back to double. avg = decimal-sum / count in double.
  *   - Window running aggregates are computed in frame order by both engines,
  *     but we still go through decimal for safety.
  *
  * Scale notes are inline per query: what the plan does at 100 TB /
  * 1000 executors, which side broadcasts, where the shuffles are.
  */
object Relational {

  /** See [[Num.moneySum]] — exact, order-independent money sum (values sit
    * within 1e-13 of their .01 grid point, so the per-row decimal cast is
    * deterministic; the decimal sum is exact).
    */
  private def moneySum(c: Column): Column = Num.moneySum(c)

  /** Money columns sit exactly on the .01 grid (verified on the test data),
    * so casting each FACTOR to decimal is exact, and the whole product +
    * sum happens in integer decimal arithmetic — bit-identical across
    * engines. (Casting the double *product* instead hits engine-dependent
    * rounding at the .00005 boundary — measured: DuckDB and Spark disagreed
    * on q01 sum_charge by 3e-4.)
    */
  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  private def frac2(c: Column): Column = c.cast(DecimalType(4, 2))
  private val decOne: Column = lit(1.0).cast(DecimalType(4, 2))

  /** price * (1 - discount), exactly, as a decimal. */
  private def discPrice: Column = dec2(col("l_extendedprice")) * (decOne - frac2(col("l_discount")))

  // --------------------------------------------------------------------------
  // q01 — TPC-H Q1 shape: scan + filter + hash aggregate.
  // Scale: map-side partial agg (HashAggregateExec two-phase) means the
  // shuffle carries only |groups| × partitions rows; filter + column pruning
  // push into the parquet scan. Perfectly scalable.
  def q01Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") < lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        sum(discPrice * (decOne + frac2(col("l_tax")))).cast("double").as("sum_charge"),
        Num.pround(moneySum(col("l_quantity")) / count(lit(1)), 6).as("avg_qty"),
        Num.pround(moneySum(col("l_extendedprice")) / count(lit(1)), 6).as("avg_price"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  FLOOR((CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) * 1e6 + 0.5) / 1e6 AS avg_qty,
      |  FLOOR((CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) * 1e6 + 0.5) / 1e6 AS avg_price,
      |  COUNT(*) AS cnt
      |FROM lineitem
      |WHERE l_shipdate < TIMESTAMP '1998-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // --------------------------------------------------------------------------
  // q02 — projection + predicate pushdown. Both the comparison filters and the
  // 4-column ReadSchema reach the parquet scan (verified via .explain).
  def q02Filter(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity") > 30.0 && col("l_discount").between(0.02, 0.06))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_quantity > 30.0 AND l_discount BETWEEN 0.02 AND 0.06
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // --------------------------------------------------------------------------
  // q03 — 3-way join: orders ⋈ customer ⋈ nation, revenue per nation.
  // Scale: nation (25 rows) and customer (1.5M at SF100) are the small sides;
  // nation is always broadcast. customer at 100 TB SF would be ~GBs — too big
  // to broadcast, so orders⋈customer is a shuffle (sort-merge/shuffled-hash)
  // on custkey and AQE picks the strategy; we only force broadcast(nation).
  def q03Join(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("total_rev"))
      .orderBy(col("n_name"))
  }

  val q03Sql: String =
    """SELECT n_name, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_rev
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // --------------------------------------------------------------------------
  // q04 — left outer join preserving customers with zero orders.
  // Scale: pre-aggregate orders per custkey BEFORE the join (cuts the joined
  // row count from |orders| to |custkeys|), then join on the grouping key —
  // the shuffle for the agg is reused for the join (same partitioning).
  def q04LeftJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val perCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("total_spent"))
    c.join(perCust, c("c_custkey") === perCust("o_custkey"), "left")
      .select(
        col("c_custkey"), col("c_name"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("total_spent"), lit(0.0)).as("total_spent"))
      .orderBy(col("c_custkey"))
  }

  val q04Sql: String =
    """SELECT c_custkey, c_name,
      |  COALESCE(n_orders, 0) AS n_orders,
      |  COALESCE(total_spent, 0.0) AS total_spent
      |FROM customer LEFT JOIN (
      |  SELECT o_custkey, COUNT(*) AS n_orders,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
      |  FROM orders GROUP BY o_custkey
      |) ON c_custkey = o_custkey
      |ORDER BY c_custkey""".stripMargin

  // --------------------------------------------------------------------------
  // q05 — left-semi join (EXISTS). Catalyst plans a semi-join that short-
  // circuits on first match; only customer columns flow downstream.
  def q05SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select(col("o_custkey"))
    c.filter(col("c_acctbal") > 1000.0)
      .join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  val q05Sql: String =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer c
      |WHERE c_acctbal > 1000.0
      |  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // --------------------------------------------------------------------------
  // q06 — left-anti join (NOT EXISTS): the reference's latent idempotency
  // check (SURVEY §2.1 R21) done right.
  def q06AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val q06Sql: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // --------------------------------------------------------------------------
  // q07 — top-k per group via ranking window. Scale: single shuffle on the
  // partition key; Spark's WindowExec sorts within partitions. For very hot
  // keys, AQE skew handling applies; rank ties broken by orderkey so the
  // result is deterministic.
  def q07TopkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val q07Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders
      |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  // --------------------------------------------------------------------------
  // q08 — analytic window (lag): days since the customer's previous order.
  def q08WindowLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
      .select(
        col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), col("prev_date")).as("days_since_prev"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q08Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(DATE_DIFF('day',
      |    CAST(LAG(o_orderdate, 1) OVER (PARTITION BY o_custkey
      |         ORDER BY o_orderdate ASC, o_orderkey ASC) AS DATE),
      |    CAST(o_orderdate AS DATE)) AS INT) AS days_since_prev
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  // --------------------------------------------------------------------------
  // q09 — running aggregate frame (rows unbounded preceding → current).
  // Ordered by event_id within user (arrival order) — both engines compute
  // running sums in frame order; decimal keeps it exact anyway.
  def q09RunningSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("running_value",
        sum(col("value").cast(DecimalType(18, 2))).over(w).cast("double"))
      .select(col("user_id"), col("event_id"), col("running_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val q09Sql: String =
    """SELECT user_id, event_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
      |    PARTITION BY user_id ORDER BY event_id ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
      |FROM events ORDER BY user_id, event_id""".stripMargin

  // --------------------------------------------------------------------------
  // q10 — global top-k: Catalyst plans TakeOrderedAndProject (per-partition
  // top-k then merge of k×partitions rows on the driver — no full sort).
  def q10GlobalTopk(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  val q10Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin

  // --------------------------------------------------------------------------
  // q11 — distinct (hash aggregate on the pair).
  def q11Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q11Sql: String =
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // --------------------------------------------------------------------------
  // q12 — set ops: INTERSECT (rich customers who ordered) and EXCEPT (rich
  // customers who never ordered), tagged and unioned.
  def q12SetOps(spark: SparkSession, dir: String): DataFrame = {
    val rich = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 5000.0).select(col("c_custkey"))
    val buyers = Tables.orders(spark, dir)
      .select(col("o_custkey").as("c_custkey"))
    val both = rich.intersect(buyers).withColumn("tag", lit("both"))
    val only = rich.except(buyers).withColumn("tag", lit("rich_only"))
    both.unionByName(only).orderBy(col("tag"), col("c_custkey"))
  }

  val q12Sql: String =
    """SELECT c_custkey, 'both' AS tag FROM (
      |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
      |  INTERSECT SELECT o_custkey FROM orders)
      |UNION ALL
      |SELECT c_custkey, 'rich_only' AS tag FROM (
      |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
      |  EXCEPT SELECT o_custkey FROM orders)
      |ORDER BY tag, c_custkey""".stripMargin

  // --------------------------------------------------------------------------
  // q13 — ROLLUP over the region→nation hierarchy. NULL group markers are
  // coalesced to 'ALL' so both engines emit identical keys.
  def q13Rollup(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), moneySum(col("c_acctbal")).as("sum_bal"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_cust"), col("sum_bal"))
      .orderBy(col("region"), col("nation"))
  }

  val q13Sql: String =
    """SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
      |  COUNT(*) AS n_cust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY region, nation""".stripMargin

  // --------------------------------------------------------------------------
  // q14 — CUBE over two independent dimensions.
  def q14Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("sum_price"))
      .orderBy(col("status"), col("priority"))

  val q14Sql: String =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  // --------------------------------------------------------------------------
  // q15 — exact COUNT(DISTINCT) (expands to a two-phase distinct aggregate).
  def q15CountDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("nd_supp"),
        countDistinct(col("l_partkey")).as("nd_part"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  val q15Sql: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS nd_supp,
      |  COUNT(DISTINCT l_partkey) AS nd_part, COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // --------------------------------------------------------------------------
  // q16 — date functions: extract year/month, truncate, day arithmetic.
  def q16Dates(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"))
      .agg(
        count(lit(1)).as("n"),
        moneySum(col("o_totalprice")).as("sum_price"),
        // max over the DATE, formatted AFTER the aggregate: a string max
        // buffer silently demotes this raw-orders aggregate to
        // SortAggregate (the PlanLint SortAggregate rule); yyyy-MM-dd
        // formatting is order-preserving, so max-then-format is
        // value-identical to format-then-max
        max(date_trunc("month", col("o_orderdate"))).as("ms"))
      .select(col("yr"), col("mo"), col("n"), col("sum_price"),
        date_format(col("ms"), "yyyy-MM-dd").cast("string").as("month_start"))
      .orderBy(col("yr"), col("mo"))

  val q16Sql: String =
    """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
      |  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  MAX(STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d')) AS month_start
      |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin

  // --------------------------------------------------------------------------
  // q17 — JSON extraction from the events.props string column.
  def q17Json(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("k_bucket", col("k") % 10)
      .groupBy(col("k_bucket"))
      .agg(
        count(lit(1)).as("n"),
        moneySum(col("value")).as("sum_value"))
      .orderBy(col("k_bucket"))

  val q17Sql: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin

  // --------------------------------------------------------------------------
  // q18 — conditional aggregation (CASE WHEN inside agg).
  def q18CaseAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_linestatus"))
      .agg(
        moneySum(when(col("l_returnflag") === "R", col("l_extendedprice")).otherwise(lit(0.0))).as("returned_price"),
        moneySum(when(col("l_returnflag") =!= "R", col("l_extendedprice")).otherwise(lit(0.0))).as("kept_price"),
        sum(when(col("l_discount") > 0.05, 1L).otherwise(0L)).as("n_high_disc"))
      .orderBy(col("l_linestatus"))

  val q18Sql: String =
    """SELECT l_linestatus,
      |  CAST(SUM(CAST(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE) AS returned_price,
      |  CAST(SUM(CAST(CASE WHEN l_returnflag <> 'R' THEN l_extendedprice ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE) AS kept_price,
      |  CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_disc
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  // --------------------------------------------------------------------------
  // q19 — string functions: upper, substring, length, replace, concat.
  def q19Strings(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_uc"),
        substring(col("p_name"), 1, 8).as("name_pfx"),
        length(col("p_name")).as("name_len"),
        regexp_replace(col("p_type"), " ", "_").as("type_id"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy(col("p_partkey"))

  val q19Sql: String =
    """SELECT p_partkey, UPPER(p_brand) AS brand_uc,
      |  SUBSTR(p_name, 1, 8) AS name_pfx,
      |  CAST(LENGTH(p_name) AS INT) AS name_len,
      |  REPLACE(p_type, ' ', '_') AS type_id,
      |  CONCAT_WS('|', p_brand, p_type) AS brand_type
      |FROM part ORDER BY p_partkey""".stripMargin

  // --------------------------------------------------------------------------
  // q20 — range (theta) join against a tiny derived band table.
  // Scale: the band table is O(10) rows → broadcast nested-loop join, which
  // is the right physical plan; the big side streams through unshuffled.
  def q20RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      ("low", 0.0, 50000.0),
      ("mid", 50000.0, 150000.0),
      ("high", 150000.0, 1e18)).toDF("band", "lo", "hi")
    Tables.orders(spark, dir)
      .join(broadcast(bands), col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("band"))
  }

  val q20Sql: String =
    """SELECT band, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders JOIN (VALUES
      |  ('low', 0.0, 50000.0),
      |  ('mid', 50000.0, 150000.0),
      |  ('high', 150000.0, 1e18)) AS b(band, lo, hi)
      |ON o_totalprice >= lo AND o_totalprice < hi
      |GROUP BY band ORDER BY band""".stripMargin

  // --------------------------------------------------------------------------
  // q21 — as-of join: for each event, the user's most recent order at ts.
  // Spark-native formulation: union the two timelines, then
  // last(order_key ignoring nulls) over (user, time) — ONE shuffle on
  // user_id, no per-row correlated lookup. This is the scalable shape: at
  // 100 TB both sides shuffle once on the join key and the window is a
  // single in-partition sort, vs. a quadratic theta-join.
  // Tie rules: orders sort before events at the same instant (<=), and the
  // highest o_orderkey wins among same-timestamp orders.
  def q21AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir).select(
      col("o_custkey").as("uid"),
      col("o_orderdate").as("t"),
      col("o_orderkey").as("ord"),
      lit(1).as("is_order"),
      lit(null).cast("long").as("event_id"))
    val events = Tables.events(spark, dir).select(
      col("user_id").as("uid"),
      col("ts").as("t"),
      lit(null).cast("long").as("ord"),
      lit(0).as("is_order"),
      col("event_id"))
    val w = Window.partitionBy(col("uid"))
      .orderBy(col("t").asc, col("is_order").desc, col("ord").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.unionByName(events)
      .withColumn("asof_order", last(col("ord"), ignoreNulls = true).over(w))
      .filter(col("is_order") === 0)
      .select(col("event_id"), col("uid").as("user_id"), col("asof_order"))
      .orderBy(col("event_id"))
  }

  val q21Sql: String =
    """SELECT e.event_id, e.user_id,
      |  (SELECT o.o_orderkey FROM orders o
      |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
      |   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) AS asof_order
      |FROM events e ORDER BY e.event_id""".stripMargin

  // --------------------------------------------------------------------------
  // q22 — multi-way star join with filters on both dimensions (TPC-H Q3/Q5
  // flavor): lineitem ⋈ orders ⋈ customer, revenue by order priority.
  // Scale: filters push into both dimension scans; lineitem⋈orders shuffles
  // on orderkey; customer joins pre-filtered (often broadcastable post-AQE).
  def q22StarJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") =!= "F")
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(discPrice).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))
  }

  val q22Sql: String =
    """SELECT o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE o_orderstatus <> 'F' AND c_mktsegment = 'BUILDING'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // --------------------------------------------------------------------------
  // q56 — RANGE window frame: per customer, the rolling 30-day order total
  // (value-based frame over event time, vs q09's row-based frame). Ordered
  // on epoch seconds so the frame bound is a plain numeric range; RANGE
  // includes peers identically in both engines.
  def q56RangeWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").cast("timestamp").cast("long")) // NTZ→TZ is identity in the UTC session
      .rangeBetween(-30L * 86400, 0)
    Tables.orders(spark, dir)
      .withColumn("rolling_30d",
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("rolling_30d"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  // Oracle orders on the same floor-to-second epoch key Spark's cast
  // produces, so sub-second boundary rows can never diverge.
  val q56Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY CAST(FLOOR(epoch(o_orderdate)) AS BIGINT)
      |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS rolling_30d
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  // --------------------------------------------------------------------------
  // q54 — supplier-side star join (completes table coverage): revenue per
  // supplier nation. supplier (10 rows at sf0.001) and nation broadcast;
  // lineitem streams through one shuffle for the final agg.
  def q54SupplierRev(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    li.join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(discPrice).cast("double").as("revenue"),
        countDistinct(col("s_suppkey")).as("n_suppliers"))
      .orderBy(col("n_name"))
  }

  val q54Sql: String =
    """SELECT n_name, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  COUNT(DISTINCT s_suppkey) AS n_suppliers
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // --------------------------------------------------------------------------
  // q55 — approx_percentile sketch (KLL-style). The sketch's internals are
  // engine-specific, so the oracle-checked output carries the EXACT median
  // (Spark percentile ≡ DuckDB quantile_cont, linear interpolation; values
  // sit on a .005 grid so ROUND(,4) absorbs last-ulp formula differences)
  // plus a 2%-accuracy flag the oracle pins to TRUE — the driver compare
  // thereby asserts the sketch's error bound, not just row counts.
  private[ops] def q55Raw(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx_median"),
        expr("percentile(l_extendedprice, 0.5)").as("exact_median"))

  def q55ApproxPercentile(spark: SparkSession, dir: String): DataFrame =
    q55Raw(spark, dir)
      .select(col("l_returnflag"),
        Num.pround(col("exact_median"), 4).as("exact_median"),
        (abs(col("approx_median") - col("exact_median")) <=
          col("exact_median") * 0.02).as("approx_within_2pct"))
      .orderBy(col("l_returnflag"))

  val q55Sql: String =
    """SELECT l_returnflag,
      |  FLOOR((quantile_cont(l_extendedprice, 0.5)) * 1e4 + 0.5) / 1e4 AS exact_median,
      |  TRUE AS approx_within_2pct
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Registry: name → (builder, oracle SQL or None). */
  // --------------------------------------------------------------------------
  // q148 — MULTISET set operations (INTERSECT ALL / EXCEPT ALL): unlike
  // q12's set semantics, these keep duplicate multiplicities — intersect
  // keeps min(countA, countB) copies per value, except subtracts counts.
  // The priority multisets of finished vs open orders make the
  // distinction observable (every priority value occurs thousands of
  // times; plain INTERSECT would collapse each to one row).
  // Scale: Catalyst plans both as a single aggregate-style shuffle on the
  // value (count-based rewrite), not a pairwise join.
  def q148SetOpsAll(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val a = o.filter(col("o_orderstatus") === "F").select(col("o_orderpriority").as("p"))
    val b = o.filter(col("o_orderstatus") === "O").select(col("o_orderpriority").as("p"))
    val inter = a.intersectAll(b).groupBy(col("p"))
      .agg(count(lit(1)).as("n")).withColumn("tag", lit("intersect_all"))
    val diff = a.exceptAll(b).groupBy(col("p"))
      .agg(count(lit(1)).as("n")).withColumn("tag", lit("except_all"))
    inter.unionByName(diff).select(col("tag"), col("p"), col("n"))
      .orderBy(col("tag"), col("p"))
  }

  val q148Sql: String =
    """SELECT 'intersect_all' AS tag, p, COUNT(*) AS n FROM (
      |  SELECT o_orderpriority AS p FROM orders WHERE o_orderstatus = 'F'
      |  INTERSECT ALL
      |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O') GROUP BY p
      |UNION ALL
      |SELECT 'except_all', p, COUNT(*) FROM (
      |  SELECT o_orderpriority AS p FROM orders WHERE o_orderstatus = 'F'
      |  EXCEPT ALL
      |  SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O') GROUP BY p
      |ORDER BY tag, p""".stripMargin

  // --------------------------------------------------------------------------
  // q150 — bucketed co-located join as a CATALOG operator: both sides are
  // written bucketed+sorted on the join key (8 buckets, external tables
  // under a FIXED per-dir staging slot), then joined — the layout that
  // makes the join ZERO-EXCHANGE (neither side shuffles; ScaleSpec asserts
  // the plan has no Exchange under the SortMergeJoin, and the q150 spec
  // re-asserts it on this exact query). At 100 TB this is THE
  // recurring-join shape: pay the shuffle once at write time, never again
  // per query — and the staging registry makes the bench honor exactly
  // that: the layout is written once per (session, dir), later calls join
  // the existing bucketed tables. Fixed paths + overwrite mode mean
  // re-staging reclaims the slot instead of orphaning temp dirs; the
  // session-scoped in-memory catalog drops the table entries with the
  // session. The oracle is the plain join over the raw parquet — result
  // identity under the bucketed layout is the hash check.
  def q150BucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val key = Staging.keyFor("q150", dir)
    val liTab = s"graft_q150_li_$key"
    val ordTab = s"graft_q150_ord_$key"
    if (!spark.catalog.tableExists(liTab) || !spark.catalog.tableExists(ordTab)) {
      val base = Staging.pathFor("q150", dir)
      Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_quantity"))
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .format("parquet").mode("overwrite")
        .option("path", s"$base/li").saveAsTable(liTab)
      Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderpriority"))
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .format("parquet").mode("overwrite")
        .option("path", s"$base/ord").saveAsTable(ordTab)
    }
    spark.table(liTab)
      .join(spark.table(ordTab), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"), moneySum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("o_orderpriority"))
  }

  val q150Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q01_agg", q01Agg _, Some(q01Sql)),
    ("q02_filter_project", q02Filter _, Some(q02Sql)),
    ("q03_join_agg", q03Join _, Some(q03Sql)),
    ("q04_left_join", q04LeftJoin _, Some(q04Sql)),
    ("q05_semi_join", q05SemiJoin _, Some(q05Sql)),
    ("q06_anti_join", q06AntiJoin _, Some(q06Sql)),
    ("q07_topk_per_group", q07TopkPerGroup _, Some(q07Sql)),
    ("q08_window_lag", q08WindowLag _, Some(q08Sql)),
    ("q09_running_sum", q09RunningSum _, Some(q09Sql)),
    ("q10_global_topk", q10GlobalTopk _, Some(q10Sql)),
    ("q11_distinct", q11Distinct _, Some(q11Sql)),
    ("q12_set_ops", q12SetOps _, Some(q12Sql)),
    ("q148_set_ops_all", q148SetOpsAll _, Some(q148Sql)),
    ("q150_bucketed_join", q150BucketedJoin _, Some(q150Sql)),
    ("q13_rollup", q13Rollup _, Some(q13Sql)),
    ("q14_cube", q14Cube _, Some(q14Sql)),
    ("q15_count_distinct", q15CountDistinct _, Some(q15Sql)),
    ("q16_dates", q16Dates _, Some(q16Sql)),
    ("q17_json", q17Json _, Some(q17Sql)),
    ("q18_case_agg", q18CaseAgg _, Some(q18Sql)),
    ("q19_strings", q19Strings _, Some(q19Sql)),
    ("q20_range_join", q20RangeJoin _, Some(q20Sql)),
    ("q21_asof_join", q21AsofJoin _, Some(q21Sql)),
    ("q22_star_join", q22StarJoin _, Some(q22Sql)),
    ("q54_supplier_rev", q54SupplierRev _, Some(q54Sql)),
    ("q56_range_window", q56RangeWindow _, Some(q56Sql)),
    ("q55_approx_percentile", q55ApproxPercentile _, Some(q55Sql)))
}
