package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Third wave of relational surface: calendar-spine gap fill, batch
  * MERGE/upsert (copy-on-write), arg-max/arg-min aggregates, and
  * schema-evolution unions.
  *
  * No reference counterpart (the reference is an ingest ETL — see
  * reference/src/main), but each is table-stakes engine surface a user
  * migrating a reporting workload expects (SURVEY §2.2 categories:
  * aggregation, joins, set ops, sinks/idempotency).
  */
object RelationalMore {

  // --------------------------------------------------------------------------
  // q53 — calendar-spine gap fill: generate the full day range between the
  // first and last order date, left-join daily aggregates, zero-fill gaps.
  // Scale: the spine is sequence()+explode from a 1-row aggregate — a few
  // thousand rows regardless of fact size — so Spark broadcasts it; the
  // fact side aggregates map-side first, one shuffle on day.
  def q53DateSpine(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .select(date_trunc("day", col("o_orderdate")).as("day"), col("o_totalprice"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_orders"), Num.moneySum(col("o_totalprice")).as("sum_price"))
    val spine = daily
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
    spine.join(daily, Seq("day"), "left")
      .select(
        col("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("sum_price"), lit(0.0)).as("sum_price"))
      .orderBy(col("day"))
  }

  val q53Sql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', o_orderdate) AS day, COUNT(*) AS n_orders,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |  FROM orders GROUP BY 1),
      |spine AS (
      |  SELECT UNNEST(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS day
      |  FROM daily)
      |SELECT s.day, COALESCE(d.n_orders, 0) AS n_orders,
      |       COALESCE(d.sum_price, 0.0) AS sum_price
      |FROM spine s LEFT JOIN daily d USING (day)
      |ORDER BY day""".stripMargin

  // --------------------------------------------------------------------------
  // q67 — batch MERGE / upsert, copy-on-write formulation: rows of the
  // target not touched by the change-set survive via ONE anti-join on the
  // key; the change-set (updates carry new values, inserts carry new keys)
  // is unioned in. This is the same idempotency shape as
  // `Sinks.appendNewReportsOnly` generalized to updates.
  // Scale: anti-join shuffles on the merge key only (or broadcasts when the
  // change-set is small — the common CDC case); on a partitioned table you
  // rewrite only partitions the change-set touches (partition pruning on
  // the join key's partition column).
  /** Generic upsert: `changes` wins on key collision, everything else kept. */
  def mergeByKey(target: DataFrame, changes: DataFrame, key: String): DataFrame =
    target.join(changes.select(key).distinct(), Seq(key), "left_anti")
      .unionByName(changes)

  def q67MergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val target = Tables.orders(spark, dir)
      .select(col("o_orderkey"), lit("K").as("op"), col("o_totalprice"))
    val priceDec = col("o_totalprice").cast(DecimalType(18, 2))
    // Deterministic synthetic CDC feed: 10% updates (+10% price, exact
    // decimal arithmetic — SURVEY §8.4), 10% inserts under fresh keys.
    val updates = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 10 === 0)
      .select(
        col("o_orderkey"),
        lit("U").as("op"),
        // round(), not a downscale cast: DuckDB truncates DECIMAL(18,4)→(18,2)
        // casts (193955.8390 → .83); round() half-ups in both engines.
        round(priceDec * lit(new java.math.BigDecimal("1.10")), 2)
          .cast("double").as("o_totalprice"))
    val inserts = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 10 === 3)
      .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
        lit("I").as("op"), col("o_totalprice"))
    mergeByKey(target, updates.unionByName(inserts), "o_orderkey")
      .orderBy(col("o_orderkey"))
  }

  val q67Sql: String =
    """WITH chg AS (
      |  SELECT o_orderkey, 'U' AS op,
      |         CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * 1.10, 2) AS DOUBLE) AS o_totalprice
      |  FROM orders WHERE o_orderkey % 10 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, 'I', o_totalprice
      |  FROM orders WHERE o_orderkey % 10 = 3)
      |SELECT t.o_orderkey, 'K' AS op, t.o_totalprice
      |FROM orders t
      |WHERE NOT EXISTS (SELECT 1 FROM chg c WHERE c.o_orderkey = t.o_orderkey)
      |UNION ALL
      |SELECT o_orderkey, op, o_totalprice FROM chg
      |ORDER BY o_orderkey""".stripMargin

  // --------------------------------------------------------------------------
  // q68 — arg-max / arg-min: per customer, the priority of their most and
  // least expensive order. Ties broken deterministically by packing
  // (price-cents, orderkey) into one BIGINT ordering key — price cents via
  // exact decimal (max ~5e7) shifted above the key range, so cross-engine
  // comparison is integer, not double.
  // Scale: max_by/min_by are single-pass hash aggregates (map-side partial)
  // — no window sort, no self-join, one shuffle on the group key.
  def q68ArgMax(spark: SparkSession, dir: String): DataFrame = {
    val ord = (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long") *
      10000000000L + col("o_orderkey")
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(
        max_by(col("o_orderpriority"), ord).as("top_priority"),
        min_by(col("o_orderpriority"), ord).as("bottom_priority"),
        max(col("o_totalprice")).as("max_price"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_custkey"))
  }

  val q68Sql: String =
    """SELECT o_custkey,
      |  ARG_MAX(o_orderpriority, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 10000000000 + o_orderkey) AS top_priority,
      |  ARG_MIN(o_orderpriority, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 10000000000 + o_orderkey) AS bottom_priority,
      |  MAX(o_totalprice) AS max_price,
      |  COUNT(*) AS n_orders
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // --------------------------------------------------------------------------
  // q69 — schema-evolution union: two batches with different column order
  // and a column added over time, merged by NAME (missing → NULL). The
  // shape every long-lived training-data pipeline hits when a new metadata
  // column appears mid-corpus.
  def q69UnionByName(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val legacy = c.filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .withColumn("batch", lit("legacy"))
    val v2 = c.filter(col("c_custkey") % 3 =!= 0)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"), col("c_name"))
      .withColumn("batch", lit("v2"))
    legacy.unionByName(v2, allowMissingColumns = true)
      .orderBy(col("c_custkey"))
  }

  val q69Sql: String =
    """SELECT * FROM (
      |  SELECT c_custkey, c_name, c_acctbal, 'legacy' AS batch
      |  FROM customer WHERE c_custkey % 3 = 0
      |  UNION ALL BY NAME
      |  SELECT c_custkey, c_mktsegment, c_acctbal, c_name, 'v2' AS batch
      |  FROM customer WHERE c_custkey % 3 <> 0)
      |ORDER BY c_custkey""".stripMargin

  // --------------------------------------------------------------------------
  // q76 — statistical aggregates: correlation, stddev, covariance, simple
  // linear regression per group. Single-pass co-moment aggregation
  // (map-side partials, one shuffle). Cross-engine note: co-moment
  // accumulation IS order-dependent in the last few ulps, so every output
  // is rounded at a grain (4dp for normalized/slope values, 2dp for the
  // price-scaled ones) orders of magnitude above the accumulation noise.
  def q76Stats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        Num.pround(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        Num.pround(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        Num.pround(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_qp"),
        Num.pround(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
        Num.pround(regr_intercept(col("l_extendedprice"), col("l_quantity")), 2).as("intercept"))
      .orderBy(col("l_returnflag"))

  val q76Sql: String =
    """SELECT l_returnflag,
      |  FLOOR((corr(l_quantity, l_extendedprice)) * 1e4 + 0.5) / 1e4 AS corr_qty_price,
      |  FLOOR((stddev_samp(l_quantity)) * 1e4 + 0.5) / 1e4 AS sd_qty,
      |  FLOOR((covar_samp(l_quantity, l_extendedprice)) * 1e2 + 0.5) / 1e2 AS cov_qp,
      |  FLOOR((regr_slope(l_extendedprice, l_quantity)) * 1e4 + 0.5) / 1e4 AS slope,
      |  FLOOR((regr_intercept(l_extendedprice, l_quantity)) * 1e2 + 0.5) / 1e2 AS intercept
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // --------------------------------------------------------------------------
  // q78 — fixed-width histogram: bucket assignment is a row-local floor
  // (codegen'd, no lookup table), then one hash aggregate — the two-pass
  // "min/max then bucket" pattern collapses to one pass when bounds are
  // known. Same floor arithmetic on both engines (width_bucket semantics
  // differ between engines; floor() doesn't).
  def q78Histogram(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        least(floor(col("o_totalprice") / 60000.0), lit(9.0)).cast("int").as("bucket"),
        col("o_totalprice"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .withColumn("bucket_lo", col("bucket").cast("double") * 60000.0)
      .orderBy(col("bucket"))

  val q78Sql: String =
    """SELECT bucket, COUNT(*) AS n, MIN(o_totalprice) AS min_price,
      |       MAX(o_totalprice) AS max_price,
      |       CAST(bucket AS DOUBLE) * 60000.0 AS bucket_lo
      |FROM (SELECT CAST(LEAST(FLOOR(o_totalprice / 60000.0), 9) AS INT) AS bucket,
      |             o_totalprice
      |      FROM orders)
      |GROUP BY bucket ORDER BY bucket""".stripMargin

  // --------------------------------------------------------------------------
  // q91 — z-score outlier scoring: per-group mean/stddev computed once
  // (tiny — one row per group), broadcast-joined back onto the rows, each
  // row scored (x - mean)/sd. The join-back-on-broadcast shape is the
  // 100 TB formulation: stats are a map-side lookup, no window over the
  // fact table, no second shuffle. Scores rounded at 4dp, orders of
  // magnitude above co-moment accumulation noise (SURVEY §8.4).
  def q91Zscore(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val stats = orders.groupBy(col("o_orderpriority"))
      .agg(avg(col("o_totalprice")).as("mu"), stddev_samp(col("o_totalprice")).as("sd"))
    orders.filter(col("o_orderkey") % 97 === 0) // keep the verified output small
      .join(broadcast(stats), Seq("o_orderpriority"))
      .select(
        col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        Num.pround((col("o_totalprice") - col("mu")) / col("sd"), 4).as("z"))
      .select(col("*"), (abs(col("z")) > 3.0).as("is_outlier"))
      .orderBy(col("o_orderkey"))
  }

  val q91Sql: String =
    """WITH stats AS (
      |  SELECT o_orderpriority, AVG(o_totalprice) AS mu,
      |         stddev_samp(o_totalprice) AS sd
      |  FROM orders GROUP BY o_orderpriority)
      |SELECT o_orderkey, o_orderpriority, o_totalprice,
      |       FLOOR(((o_totalprice - mu) / sd) * 1e4 + 0.5) / 1e4 AS z,
      |       ABS(FLOOR(((o_totalprice - mu) / sd) * 1e4 + 0.5) / 1e4) > 3.0 AS is_outlier
      |FROM orders JOIN stats USING (o_orderpriority)
      |WHERE o_orderkey % 97 = 0
      |ORDER BY o_orderkey""".stripMargin

  // --------------------------------------------------------------------------
  // q92 — null imputation (mean fill): values are deterministically masked
  // (every 9th customer — the corpus has no natural nulls), then imputed
  // with the per-segment mean of the surviving values. The mean is exact
  // decimal sum / count (double division of exact operands — identical in
  // both engines), rounded to the money grain. Same broadcast join-back
  // shape as q91.
  def q92Impute(spark: SparkSession, dir: String): DataFrame = {
    val masked = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        when(col("c_custkey") % 9 === 0, lit(null))
          .otherwise(col("c_acctbal")).as("bal"))
    val means = masked.filter(col("bal").isNotNull)
      .groupBy(col("c_mktsegment"))
      .agg(Num.pround(
        Num.moneySum(col("bal")) / count(col("bal")), 2).as("seg_mean"))
    masked.join(broadcast(means), Seq("c_mktsegment"))
      .select(
        col("c_custkey"), col("c_mktsegment"),
        coalesce(col("bal"), col("seg_mean")).as("bal_filled"),
        col("bal").isNull.as("was_imputed"))
      .orderBy(col("c_custkey"))
  }

  val q92Sql: String =
    """WITH masked AS (
      |  SELECT c_custkey, c_mktsegment,
      |         CASE WHEN c_custkey % 9 = 0 THEN NULL ELSE c_acctbal END AS bal
      |  FROM customer),
      |means AS (
      |  SELECT c_mktsegment,
      |         FLOOR((CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(bal)) * 1e2 + 0.5) / 1e2 AS seg_mean
      |  FROM masked WHERE bal IS NOT NULL GROUP BY c_mktsegment)
      |SELECT c_custkey, c_mktsegment,
      |       COALESCE(bal, seg_mean) AS bal_filled,
      |       bal IS NULL AS was_imputed
      |FROM masked JOIN means USING (c_mktsegment)
      |ORDER BY c_custkey""".stripMargin

  // --------------------------------------------------------------------------
  // q93 — SCD2 (slowly-changing-dimension type 2) build: compress each
  // customer's order-priority observation stream into validity intervals
  // [valid_from, valid_to), current row open-ended. Classic gaps-and-
  // islands: a change flag (lag compare) → running island id → one group
  // per island → lead() for the closing edge.
  // Scale: everything partitions by the entity key — two window passes and
  // one aggregate over the SAME hashpartitioning(custkey), so Spark plans
  // a single shuffle and reuses the partitioning; no self-join.
  def q93Scd2(spark: SparkSession, dir: String): DataFrame = {
    val byKey = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val islands = Tables.orders(spark, dir)
      .filter(col("o_custkey") % 50 === 0) // keep the verified output small
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("o_orderpriority"))
      .withColumn("chg",
        when(lag(col("o_orderpriority"), 1).over(byKey) === col("o_orderpriority"), 0)
          .otherwise(1))
      .withColumn("island", sum(col("chg")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val versions = islands
      .groupBy(col("o_custkey"), col("island"))
      .agg(first(col("o_orderpriority")).as("priority"), // constant within the island
        min(col("o_orderdate")).as("valid_from"),
        count(lit(1)).as("n_obs"))
    versions
      .withColumn("valid_to",
        lead(col("valid_from"), 1).over(
          Window.partitionBy(col("o_custkey")).orderBy(col("island"))))
      .select(col("o_custkey"), col("island").as("version"), col("priority"),
        col("valid_from"), col("valid_to"), col("n_obs"))
      .orderBy(col("o_custkey"), col("version"))
  }

  val q93Sql: String =
    """WITH obs AS (
      |  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
      |    CASE WHEN LAG(o_orderpriority) OVER w = o_orderpriority THEN 0 ELSE 1 END AS chg
      |  FROM orders WHERE o_custkey % 50 = 0
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      |isl AS (
      |  SELECT *, SUM(chg) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |                           ROWS UNBOUNDED PRECEDING) AS island
      |  FROM obs),
      |versions AS (
      |  SELECT o_custkey, island, MIN(o_orderpriority) AS priority,
      |         MIN(o_orderdate) AS valid_from, COUNT(*) AS n_obs
      |  FROM isl GROUP BY o_custkey, island)
      |SELECT o_custkey, CAST(island AS BIGINT) AS version, priority, valid_from,
      |       LEAD(valid_from) OVER (PARTITION BY o_custkey ORDER BY island) AS valid_to,
      |       n_obs
      |FROM versions
      |ORDER BY o_custkey, version""".stripMargin

  // --------------------------------------------------------------------------
  // q94 — LOCF forward fill (last-observation-carried-forward): sensor-gap
  // repair for time series. Values are deterministically masked (every 5th
  // event), then each gap takes the most recent non-null value in its
  // user's timeline via last(ignoreNulls) over a running frame; leading
  // gaps (nothing to carry) stay null. The carried value is a bit-exact
  // passthrough — no arithmetic, so no rounding policy needed.
  // Scale: one shuffle on user_id, one window sort; same shape at any SF.
  def q94ForwardFill(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_id") % 5 === 0, lit(null)).otherwise(col("value")).as("v"))
      .select(col("event_id"), col("user_id"),
        col("v").isNull.as("was_gap"),
        last(col("v"), ignoreNulls = true).over(w).as("v_filled"))
      .orderBy(col("event_id"))
  }

  val q94Sql: String =
    """SELECT event_id, user_id, (v IS NULL) AS was_gap,
      |  LAST_VALUE(v IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS v_filled
      |FROM (SELECT event_id, user_id, ts,
      |             CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
      |      FROM events)
      |ORDER BY event_id""".stripMargin

  // --------------------------------------------------------------------------
  // q96 — the custom AS-OF JOIN operator (graft.plans.AsOf: LogicalPlan +
  // SparkStrategy + merge SparkPlan — SURVEY §2 option (c)). Same
  // semantics and oracle as q21's window formulation; the physical plan is
  // one shuffle+sort per side then a forward-only streaming merge with
  // O(1) state — no unioned timeline, no window frame buffer.
  def q96AsofCustom(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir).select("event_id", "user_id", "ts")
    val orders = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    graft.plans.AsOf.join(
      events, orders,
      leftKey = "user_id", leftTime = "ts",
      rightKey = "o_custkey", rightTime = "o_orderdate",
      values = Seq("o_orderkey"), tieBreak = Seq("o_orderkey"))
      .select(col("event_id"), col("user_id"), col("o_orderkey").as("asof_order"))
      .orderBy(col("event_id"))
  }

  // --------------------------------------------------------------------------
  // q101 — ordered string aggregation (STRING_AGG / LISTAGG): nations per
  // region as one comma-joined, alphabetically-ordered string. Spark has
  // no ordered string_agg; sort_array(collect_list(...)) + array_join is
  // the deterministic formulation (collect_list order is
  // partition-arrival, never rely on it).
  // Scale: collect_list is bounded by group cardinality — fine for
  // dimension-sized groups, an anti-pattern for fact-sized ones.
  def q101StringAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir)
      .groupBy(col("n_regionkey"))
      .agg(
        array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"),
        count(lit(1)).as("n_nations"))
      .orderBy(col("n_regionkey"))

  val q101Sql: String =
    """SELECT n_regionkey,
      |       string_agg(n_name, ',' ORDER BY n_name) AS nations,
      |       COUNT(*) AS n_nations
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  // --------------------------------------------------------------------------
  // q102 — deterministic mode (most frequent value): the most common order
  // priority per clerk-prefix cohort. Built-in mode() breaks ties
  // arbitrarily in both engines, so the portable formulation is
  // count-then-rank with a total order (count desc, value asc) — same
  // two-aggregate shape both engines execute deterministically.
  def q102Mode(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.orders(spark, dir)
      .groupBy((col("o_custkey") % 97).as("cohort"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("cohort"))
      .orderBy(col("cnt").desc, col("o_orderpriority").asc)
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cohort"), col("o_orderpriority").as("mode_priority"), col("cnt"))
      .orderBy(col("cohort"))
  }

  val q102Sql: String =
    """WITH counts AS (
      |  SELECT o_custkey % 97 AS cohort, o_orderpriority, COUNT(*) AS cnt
      |  FROM orders GROUP BY 1, 2)
      |SELECT cohort, o_orderpriority AS mode_priority, cnt FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY cohort
      |            ORDER BY cnt DESC, o_orderpriority ASC) AS rn
      |  FROM counts)
      |WHERE rn = 1 ORDER BY cohort""".stripMargin

  // --------------------------------------------------------------------------
  // q117 — weighted median (weight-aware percentile — not a Spark or ANSI
  // builtin): per return flag, the lowest price at which the cumulative
  // quantity reaches half the group's total — i.e. the median of the
  // price distribution where each row counts l_quantity times. Quantities
  // are integral-valued doubles → cast to long so every cumulative sum is
  // exact and order-independent; price goes through the DECIMAL(18,2)
  // money policy. Deterministic under price ties: whichever tied row
  // crosses the threshold, the crossing PRICE is the same.
  //
  // Scale shape: one shuffle + sort per group (the unavoidable cost of an
  // exact order statistic); for mega-groups the q112 two-phase refinement
  // (value-bucket weight histogram → cutoff bucket → bounded in-bucket
  // pass) bounds the sorted set the same way.
  def q117WeightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.lineitem(spark, dir).select(
      col("l_returnflag").as("flag"),
      col("l_extendedprice").cast("decimal(18,2)").as("price"),
      col("l_quantity").cast("long").as("qty"))
    val w = Window.partitionBy(col("flag")).orderBy(col("price"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.withColumn("cum", sum(col("qty")).over(w))
      .withColumn("tot", sum(col("qty")).over(Window.partitionBy(col("flag"))))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy(col("flag"))
      .agg(min(col("price")).cast("double").as("wmedian"))
      .orderBy(col("flag"))
  }

  val q117Sql: String =
    """WITH t AS (
      |  SELECT l_returnflag AS flag,
      |         CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
      |         CAST(l_quantity AS BIGINT) AS qty
      |  FROM lineitem),
      |c AS (
      |  SELECT flag, price,
      |    SUM(qty) OVER (PARTITION BY flag ORDER BY price
      |                   ROWS UNBOUNDED PRECEDING) AS cum,
      |    SUM(qty) OVER (PARTITION BY flag) AS tot
      |  FROM t)
      |SELECT flag, CAST(MIN(price) AS DOUBLE) AS wmedian
      |FROM c WHERE cum * 2 >= tot GROUP BY flag ORDER BY flag""".stripMargin

  // --------------------------------------------------------------------------
  // q118 — two-sample Kolmogorov–Smirnov test: D = max |ECDF₁ − ECDF₂|
  // between the order-price distributions of two customer segments — the
  // standard distribution-drift check between cohorts/batches. Computed
  // INTEGER-EXACTLY: D's numerator is max |c1·n2 − c2·n1| over pooled
  // distinct values (all longs — no double ECDFs to accumulate), with one
  // double division at the end; the argmax value tie-breaks to the lowest
  // price.
  //
  // Scale shape: the global running counts use the bucketed prefix-sum
  // trick (per-bucket totals → running offsets over the ~bucket-count
  // histogram → in-bucket cumsum partitioned by bucket), so no
  // single-partition corpus-wide window exists in the plan — the same
  // two-phase decomposition as q112.
  def q118KsTest(spark: SparkSession, dir: String): DataFrame = {
    val seg = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment").as("seg"))
      .filter(col("seg").isin("AUTOMOBILE", "BUILDING"))
    val t = Tables.orders(spark, dir)
      .join(seg, col("o_custkey") === col("c_custkey"))
      .select(col("o_totalprice").as("v"),
        when(col("seg") === "AUTOMOBILE", 1L).otherwise(0L).as("is1"))
    val byV = t.groupBy(col("v"))
      .agg(sum(col("is1")).as("c1"), sum(lit(1L) - col("is1")).as("c2"))
      .withColumn("bucket", floor(col("v") / 50000).cast("long"))
    val offsets = byV.groupBy(col("bucket"))
      .agg(sum(col("c1")).as("b1"), sum(col("c2")).as("b2"))
      .select(col("bucket"),
        coalesce(sum(col("b1")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("off1"),
        coalesce(sum(col("b2")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("off2"))
    val tot = byV.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    val wb = Window.partitionBy(col("bucket")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byV.join(broadcast(offsets), Seq("bucket"))
      .withColumn("cum1", col("off1") + sum(col("c1")).over(wb))
      .withColumn("cum2", col("off2") + sum(col("c2")).over(wb))
      .crossJoin(broadcast(tot))
      .withColumn("num", abs(col("cum1") * col("n2") - col("cum2") * col("n1")))
      .groupBy(col("n1"), col("n2"))
      .agg(max(struct(col("num"), (-col("v")).as("nv"))).as("best"))
      .select(col("n1"), col("n2"),
        Num.pround(col("best.num").cast("double") / (col("n1") * col("n2")), 6).as("ks_d"),
        (-col("best.nv")).as("at_value"))
  }

  val q118Sql: String =
    """WITH seg AS (
      |  SELECT c_custkey, c_mktsegment AS seg FROM customer
      |  WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')),
      |t AS (
      |  SELECT o_totalprice AS v,
      |         CASE WHEN seg = 'AUTOMOBILE' THEN 1 ELSE 0 END AS is1
      |  FROM orders JOIN seg ON o_custkey = c_custkey),
      |byv AS (
      |  SELECT v, SUM(is1) AS c1, SUM(1 - is1) AS c2 FROM t GROUP BY v),
      |cum AS (
      |  SELECT v,
      |    SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum1,
      |    SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum2
      |  FROM byv),
      |tot AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM byv),
      |scored AS (
      |  SELECT n1, n2, v, ABS(cum1 * n2 - cum2 * n1) AS num,
      |    ROW_NUMBER() OVER (ORDER BY ABS(cum1 * n2 - cum2 * n1) DESC, v ASC) AS rn
      |  FROM cum, tot)
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |       FLOOR((CAST(num AS DOUBLE) / (n1 * n2)) * 1e6 + 0.5) / 1e6 AS ks_d, v AS at_value
      |FROM scored WHERE rn = 1""".stripMargin
  // --------------------------------------------------------------------------
  // q119 — categorical association (chi², MI, Cramér's V between lang and
  // source): the metadata-correlation screen a corpus pipeline runs to
  // catch confounded provenance (e.g. one crawl source dominating one
  // language) before training-mix decisions.
  //
  // Numeric determinism: every cell count and marginal is an exact long;
  // the cell-statistic SUMS are folded in a DETERMINISTIC order (cells
  // sorted by (lang, source), aggregate() over the sorted array — DuckDB
  // folds its ORDER BY list identically) so the doubles are bit-equal
  // cross-engine before the final rounding, instead of relying on a
  // partition-order-dependent SUM.
  //
  // Scale shape: one hash aggregate to the |langs|×|sources| contingency
  // table, everything after is arithmetic on that tiny table (window
  // marginals + a collect to one row) — corpus-size-independent.
  def q119Association(spark: SparkSession, dir: String): DataFrame =
    association(Tables.documents(spark, dir))

  /** docs(lang, source) → 1-row (chi2, mi, cramers_v). The contingency
    * grid is DENSIFIED (marginals cross-joined, absent cells n = 0):
    * structural zeros contribute their full e_ij to chi² — dropping them
    * understates the statistic (caught by the bijective-fixture spec);
    * their MI term is 0 by the n·ln(n) → 0 limit. */
  def association(docs: DataFrame): DataFrame = {
    val cells = docs
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n"))
    val li = cells.groupBy(col("lang")).agg(sum(col("n")).as("ni"))
    val sj = cells.groupBy(col("source")).agg(sum(col("n")).as("nj"))
    val dense = li.crossJoin(sj)
      .join(cells, Seq("lang", "source"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .crossJoin(broadcast(cells.agg(sum(col("n")).as("nn"))))
    dense
      .groupBy(lit(1).as("g"))
      .agg(
        sort_array(collect_list(struct(
          col("lang"), col("source"), col("n"), col("ni"), col("nj"), col("nn")))).as("cs"),
        countDistinct(col("lang")).as("r"),
        countDistinct(col("source")).as("c"),
        max(col("nn")).as("nn"))
      .withColumn("chi2", expr(
        """aggregate(cs, 0.0d, (a, x) ->
          |  a + pow(x.n - cast(x.ni as double) * x.nj / x.nn, 2)
          |      / (cast(x.ni as double) * x.nj / x.nn))""".stripMargin))
      .withColumn("mi", expr(
        """aggregate(cs, 0.0d, (a, x) ->
          |  a + (CASE WHEN x.n > 0
          |       THEN (cast(x.n as double) / x.nn)
          |            * ln(cast(x.n as double) * x.nn / (cast(x.ni as double) * x.nj))
          |       ELSE 0.0d END))""".stripMargin))
      .select(
        Num.pround(col("chi2"), 4).as("chi2"),
        Num.pround(col("mi"), 6).as("mi"),
        Num.pround(sqrt(col("chi2") / (col("nn") * (least(col("r"), col("c")) - 1))), 6)
          .as("cramers_v"))
  }

  /** DuckDB folds list(... ORDER BY lang, source) in the same order as the
    * Spark sort_array fold — bit-identical accumulation. */
  val q119Sql: String =
    """WITH cells AS (
      |  SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY lang, source),
      |li AS (SELECT lang, SUM(n) AS ni FROM cells GROUP BY lang),
      |sj AS (SELECT source, SUM(n) AS nj FROM cells GROUP BY source),
      |tot AS (SELECT SUM(n) AS nn FROM cells),
      |m AS (
      |  SELECT l.lang, s.source, COALESCE(c.n, 0) AS n, l.ni, s.nj, t.nn
      |  FROM li l CROSS JOIN sj s
      |  LEFT JOIN cells c ON c.lang = l.lang AND c.source = s.source
      |  CROSS JOIN tot t),
      |agg AS (
      |  SELECT
      |    list_reduce(
      |      list_prepend(0.0, list(
      |        POW(n - CAST(ni AS DOUBLE) * nj / nn, 2) / (CAST(ni AS DOUBLE) * nj / nn)
      |        ORDER BY lang, source)),
      |      (a, b) -> a + b) AS chi2,
      |    list_reduce(
      |      list_prepend(0.0, list(
      |        CASE WHEN n > 0
      |          THEN (CAST(n AS DOUBLE) / nn)
      |               * LN(CAST(n AS DOUBLE) * nn / (CAST(ni AS DOUBLE) * nj))
      |          ELSE 0.0 END
      |        ORDER BY lang, source)),
      |      (a, b) -> a + b) AS mi,
      |    COUNT(DISTINCT lang) AS r, COUNT(DISTINCT source) AS c, MAX(nn) AS nn
      |  FROM m)
      |SELECT FLOOR((chi2) * 1e4 + 0.5) / 1e4 AS chi2, FLOOR((mi) * 1e6 + 0.5) / 1e6 AS mi,
      |       FLOOR((SQRT(chi2 / (nn * (LEAST(r, c) - 1)))) * 1e6 + 0.5) / 1e6 AS cramers_v
      |FROM agg""".stripMargin

  // --------------------------------------------------------------------------
  // q125 — winsorization (percentile clipping): clamp each group's values
  // into its [P5, P95] band and report the clipped-tail counts plus the
  // winsorized total — the outlier-robust normalization a feature/reward
  // pipeline applies before aggregation (complements q91's z-score
  // flagging: winsorizing REPLACES tails instead of dropping them).
  //
  // Numeric determinism: the percentile interpolation formula (p·(n−1)
  // 0-based) is identical in Spark `percentile` and DuckDB
  // `quantile_cont` (q28 parity), the mid-band sum is an exact
  // DECIMAL(18,2) accumulation, and the winsorized total combines them in
  // one fixed-order double expression — identical doubles both engines.
  //
  // Scale shape: pass 1 is a per-group percentile aggregate (3 groups →
  // tiny result, BROADCAST back); pass 2 is one row-local clip + hash
  // aggregate. No window over the fact table, no global sort.
  // Exact-percentile memory contract: Spark's `percentile` buffers a
  // value→count map per partial aggregate, so memory is O(distinct
  // values), NOT O(rows). It is safe here because l_extendedprice is a
  // cents-quantized price (TPC-H prices are exact 2-decimal values on a
  // bounded range), so the domain is ≤ ~10⁷ distinct at ANY row count.
  // An exact percentile over an unbounded-domain double (a raw measure,
  // a ratio) is a real 100 TB cliff — pre-quantize (round(v, 2)) or use
  // approx_percentile there instead.
  def q125Winsorize(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_extendedprice"))
    val pcts = li.groupBy(col("l_returnflag")).agg(
      expr("percentile(l_extendedprice, 0.05d)").as("p05"),
      expr("percentile(l_extendedprice, 0.95d)").as("p95"))
    li.join(broadcast(pcts), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(when(col("l_extendedprice") < col("p05"), 1)).as("n_lo"),
        count(when(col("l_extendedprice") > col("p95"), 1)).as("n_hi"),
        Num.moneySum(when(col("l_extendedprice").between(col("p05"), col("p95")),
          col("l_extendedprice"))).as("sum_mid"),
        first(col("p05")).as("p05"), first(col("p95")).as("p95"))
      .select(col("l_returnflag"),
        Num.pround(col("p05"), 4).as("p05"), Num.pround(col("p95"), 4).as("p95"),
        col("n_lo"), col("n_hi"),
        Num.pround(col("sum_mid") + col("n_lo") * col("p05") + col("n_hi") * col("p95"), 4)
          .as("winsorized_total"))
      .orderBy(col("l_returnflag"))
  }

  val q125Sql: String =
    """WITH p AS (
      |  SELECT l_returnflag,
      |    quantile_cont(l_extendedprice, 0.05) AS p05,
      |    quantile_cont(l_extendedprice, 0.95) AS p95
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l.l_returnflag,
      |  FLOOR((p05) * 1e4 + 0.5) / 1e4 AS p05, FLOOR((p95) * 1e4 + 0.5) / 1e4 AS p95,
      |  COUNT(CASE WHEN l_extendedprice < p05 THEN 1 END) AS n_lo,
      |  COUNT(CASE WHEN l_extendedprice > p95 THEN 1 END) AS n_hi,
      |  FLOOR((CAST(SUM(CASE WHEN l_extendedprice BETWEEN p05 AND p95
      |                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE)
      |        + COUNT(CASE WHEN l_extendedprice < p05 THEN 1 END) * p05
      |        + COUNT(CASE WHEN l_extendedprice > p95 THEN 1 END) * p95) * 1e4 + 0.5) / 1e4
      |    AS winsorized_total
      |FROM lineitem l JOIN p USING (l_returnflag)
      |GROUP BY l.l_returnflag, p05, p95 ORDER BY l.l_returnflag""".stripMargin

  // --------------------------------------------------------------------------
  // q128 — BINNED range join: the scale path for interval joins. q20's
  // point-in-interval join is a BroadcastNestedLoopJoin — correct when the
  // interval side is tiny, O(n·m) the moment it is not. Binning turns it
  // into an EQUI-join: discretize the range dimension into fixed-width
  // bins, replicate each interval to the (few) bins it overlaps, map each
  // point to its bin, hash-join on the bin key, then apply the exact
  // range predicate inside the join. Identical result, and the only
  // fan-out is interval_span/bin_width replicas per interval — the
  // standard trick (Spark's own range-join hints on Databricks, Trino's
  // spatial partitioning) expressed with stock operators.
  //
  // The 60 overlapping price bands are generated in-plan (deterministic);
  // bin width 1000 bounds replication at ⌈1500/1000⌉+1 = 3 bins/interval.
  //
  // Scale shape: one row-local bin assignment per side, one shuffle
  // equi-join on bin, one hash aggregate on the band id. No nested loop
  // anywhere (PlanSpec pins it — the deliberate contrast to q20).
  def q128BinnedRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val binW = 1000
    val bands = spark.range(0, 60).select(
      col("id").as("band_id"),
      (col("id") * 1000).cast("double").as("lo"),
      (col("id") * 1000 + 1500).cast("double").as("hi"))
    val bandBins = bands.withColumn("bin",
      explode(sequence(floor(col("lo") / binW), floor(col("hi") / binW))))
    val pts = Tables.lineitem(spark, dir)
      .select(col("l_extendedprice").as("price"))
      .withColumn("bin", floor(col("price") / binW))
    pts.join(bandBins, Seq("bin"))
      .filter(col("price") >= col("lo") && col("price") < col("hi"))
      .groupBy(col("band_id"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"), Num.moneySum(col("price")).as("sum_price"))
      .orderBy(col("band_id"))
  }

  val q128Sql: String =
    """WITH bands AS (
      |  SELECT i AS band_id, i * 1000.0 AS lo, i * 1000.0 + 1500 AS hi
      |  FROM (SELECT unnest(range(60)) AS i))
      |SELECT band_id, lo, hi, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM bands JOIN lineitem
      |  ON l_extendedprice >= lo AND l_extendedprice < hi
      |GROUP BY band_id, lo, hi ORDER BY band_id""".stripMargin

  // --------------------------------------------------------------------------
  // q130 — equi-depth histogram (NTILE semantics WITHOUT a global sort):
  // the 9 interior decile edges come from one interpolated-percentile
  // aggregate (cross-engine exact, q28 parity), broadcast back, and each
  // row's bucket is the codegen'd count of edges ≤ value — so the whole
  // corpus never sorts, while NTILE(10) would drag every row through one
  // ordered partition. Equi-depth summaries are the drift-detection /
  // optimizer-statistics shape (equal mass per bucket, adaptive bounds),
  // complementing q78's fixed-width histogram.
  //
  // Boundary semantics: a value equal to an edge lands in the UPPER
  // bucket (strict `v >= edge` count), identical in both engines.
  def q130EquiDepthHist(spark: SparkSession, dir: String): DataFrame = {
    val k = 10
    val li = Tables.lineitem(spark, dir).select(col("l_extendedprice").as("v"))
    // exact percentile buffers O(distinct values) per partial aggregate —
    // bounded here because l_extendedprice lives on the cents grid
    // (≤ ~10⁷ distinct at any scale); see the q125 contract note. Never
    // point this at an unbounded-domain double without pre-quantizing.
    val edges = li.agg(expr(
      s"percentile(v, array(${(1 until k).map(i => s"${i.toDouble / k}d").mkString(", ")}))")
      .as("es"))
    val bucket = (0 until k - 1)
      .map(i => (col("v") >= col("es").getItem(i)).cast("int"))
      .reduce(_ + _)
    li.crossJoin(broadcast(edges))
      .select(col("v"), bucket.as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        Num.pround(min(col("v")), 2).as("lo"), Num.pround(max(col("v")), 2).as("hi"))
      .orderBy(col("bucket"))
  }

  val q130Sql: String = {
    val ps = (1 until 10).map(i => (i.toDouble / 10).toString).mkString(", ")
    val bucket = (1 to 9).map(i => s"CAST(v >= es[$i] AS INT)").mkString(" + ")
    s"""WITH e AS (
       |  SELECT quantile_cont(l_extendedprice, [$ps]) AS es FROM lineitem),
       |b AS (
       |  SELECT l_extendedprice AS v, $bucket AS bucket
       |  FROM lineitem, e)
       |SELECT bucket, COUNT(*) AS n,
       |  FLOOR((MIN(v)) * 1e2 + 0.5) / 1e2 AS lo, FLOOR((MAX(v)) * 1e2 + 0.5) / 1e2 AS hi
       |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q135 — snapshot reconciliation ("data diff"): given two versions of a
  // keyed table, emit every added / removed / changed row with before and
  // after values — the migration-validation / CDC-audit operator. Version
  // B is a deterministic mutation of orders (q67's CDC conventions: exact
  // decimal price arithmetic so the changed values are bit-equal
  // cross-engine): keys ≡7 (mod 10) deleted, keys ≡0 updated (+5% price),
  // keys ≡3 re-inserted under fresh keys.
  //
  // Shape: ONE full-outer equi-join on the key; presence tests and the
  // column-level compare are row-local; unchanged rows are dropped
  // in-join-output so only the (typically tiny) diff survives the plan.
  // At 100 TB each side shuffles once on the key — and not at all if the
  // snapshots are bucketed on it (ScaleSpec's zero-Exchange property).
  def q135TableDiff(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("o_orderkey", "o_orderstatus", "o_totalprice")
    val a = Tables.orders(spark, dir).select(cols.map(col): _*)
    val priceDec = col("o_totalprice").cast(DecimalType(18, 2))
    // Re-inserted keys are offset by the CURRENT max key (broadcast 1-row
    // scalar), not a constant — a hardcoded offset collides with real keys
    // once max(o_orderkey) outgrows it and the synthetic 'added' rows would
    // fan out the full-outer join at larger sweep scales.
    val maxKey = a.agg(max(col("o_orderkey")).as("__maxk"))
    val b = a.filter(col("o_orderkey") % 10 =!= 7)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 10 === 0,
          round(priceDec * lit(new java.math.BigDecimal("1.05")), 2).cast("double"))
          .otherwise(col("o_totalprice")))
      .unionByName(a.filter(col("o_orderkey") % 10 === 3)
        .crossJoin(broadcast(maxKey))
        .withColumn("o_orderkey", col("o_orderkey") + col("__maxk"))
        .drop("__maxk"))
    a.as("a").join(b.as("b"), Seq("o_orderkey"), "full_outer")
      .withColumn("change_type",
        when(col("a.o_orderstatus").isNull, lit("added"))
          .when(col("b.o_orderstatus").isNull, lit("removed"))
          .when(col("a.o_totalprice") =!= col("b.o_totalprice") ||
            col("a.o_orderstatus") =!= col("b.o_orderstatus"), lit("changed"))
          .otherwise(lit("same")))
      .filter(col("change_type") =!= "same")
      .select(col("o_orderkey"), col("change_type"),
        col("a.o_totalprice").as("old_price"), col("b.o_totalprice").as("new_price"))
      .orderBy(col("o_orderkey"))
  }

  // --------------------------------------------------------------------------
  // q196 — CDC changelog APPLY: reduce an out-of-order stream of keyed
  // I/U/D change records onto a snapshot — the operator behind
  // Delta/Iceberg/Hudi MERGE and every Debezium-style replication sink.
  // q67 covers last-write upsert; this adds the two hard CDC semantics:
  // DELETES, and out-of-ORDER arrival (a sequence number decides, not file
  // order — an update with seq 2 must survive a delete with seq 1, and a
  // later delete must erase earlier updates).
  //
  // Shape: snapshot enters the log as seq-0 'K' rows; ONE hash groupBy on
  // the key takes max_by(packed row, seq) — the winner-per-key reduction
  // is a commutative/associative argmax (seqs unique per key), so
  // map-side partials apply and ANY arrival order gives the same answer;
  // 'D' winners drop row-locally after the agg. One shuffle total at any
  // scale; no join, no window.
  //
  // Synthetic feed (deterministic, q67's exact-decimal conventions):
  //   seq 1 'D' keys ≡0 (mod 14)   — later resurrected by the seq-2 'U'
  //   seq 2 'U' keys ≡0 (mod 7)    — +20% price, exact decimal round
  //   seq 3 'D' keys ≡3 (mod 5)    — final delete (beats the 'U' when both)
  //   seq 1 'I' keys ≡6 (mod 10)   — fresh keys offset by broadcast max+…
  //   seq 2 'U' keys ≡6 (mod 20)   — update-after-insert, +30%
  def q196CdcApply(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_totalprice"))
    val priceDec = col("o_totalprice").cast(DecimalType(18, 2))
    val nullPrice = lit(null).cast("double")
    val maxKey = o.agg(max(col("o_orderkey")).as("__maxk"))
    // fresh-key selectors run on the ORIGINAL key (the oracle's WHERE does
    // too); only then is the broadcast max offset applied
    def fresh(sel: Column): DataFrame = o.filter(sel).crossJoin(broadcast(maxKey))
      .withColumn("o_orderkey", col("o_orderkey") + col("__maxk")).drop("__maxk")
    val log = o.select(col("o_orderkey"), lit(0L).as("seq"), lit("K").as("op"),
        col("o_totalprice"))
      .unionByName(o.filter(col("o_orderkey") % 14 === 0)
        .select(col("o_orderkey"), lit(1L).as("seq"), lit("D").as("op"), nullPrice.as("o_totalprice")))
      .unionByName(o.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), lit(2L).as("seq"), lit("U").as("op"),
          round(priceDec * lit(new java.math.BigDecimal("1.20")), 2)
            .cast("double").as("o_totalprice")))
      .unionByName(o.filter(col("o_orderkey") % 5 === 3)
        .select(col("o_orderkey"), lit(3L).as("seq"), lit("D").as("op"), nullPrice.as("o_totalprice")))
      .unionByName(fresh(col("o_orderkey") % 10 === 6)
        .select(col("o_orderkey"), lit(1L).as("seq"), lit("I").as("op"), col("o_totalprice")))
      .unionByName(fresh(col("o_orderkey") % 20 === 6)
        .select(col("o_orderkey"), lit(2L).as("seq"), lit("U").as("op"),
          round(priceDec * lit(new java.math.BigDecimal("1.30")), 2)
            .cast("double").as("o_totalprice")))
    log.groupBy(col("o_orderkey"))
      .agg(max_by(struct(col("op"), col("o_totalprice")), col("seq")).as("w"))
      .select(col("o_orderkey"), col("w.op").as("op"),
        col("w.o_totalprice").as("o_totalprice"))
      .filter(col("op") =!= "D")
      .orderBy(col("o_orderkey"))
  }

  val q196Sql: String =
    """WITH mk AS (SELECT MAX(o_orderkey) AS maxk FROM orders),
      |log AS (
      |  SELECT o_orderkey, 0 AS seq, 'K' AS op, o_totalprice FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, 1, 'D', NULL FROM orders WHERE o_orderkey % 14 = 0
      |  UNION ALL
      |  SELECT o_orderkey, 2, 'U',
      |    CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * 1.20, 2) AS DOUBLE)
      |  FROM orders WHERE o_orderkey % 7 = 0
      |  UNION ALL
      |  SELECT o_orderkey, 3, 'D', NULL FROM orders WHERE o_orderkey % 5 = 3
      |  UNION ALL
      |  SELECT o_orderkey + maxk, 1, 'I', o_totalprice
      |  FROM orders, mk WHERE o_orderkey % 10 = 6
      |  UNION ALL
      |  SELECT o_orderkey + maxk, 2, 'U',
      |    CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * 1.30, 2) AS DOUBLE)
      |  FROM orders, mk WHERE o_orderkey % 20 = 6),
      |w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
      |      FROM log)
      |SELECT o_orderkey, op, o_totalprice FROM w
      |WHERE rn = 1 AND op <> 'D' ORDER BY o_orderkey""".stripMargin

  val q135Sql: String =
    """WITH b AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CASE WHEN o_orderkey % 10 = 0
      |         THEN CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * 1.05, 2) AS DOUBLE)
      |         ELSE o_totalprice END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 10 <> 7
      |  UNION ALL
      |  SELECT o_orderkey + (SELECT MAX(o_orderkey) FROM orders),
      |    o_orderstatus, o_totalprice
      |  FROM orders WHERE o_orderkey % 10 = 3),
      |d AS (
      |  SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
      |    CASE WHEN a.o_orderkey IS NULL THEN 'added'
      |         WHEN b.o_orderkey IS NULL THEN 'removed'
      |         WHEN a.o_totalprice <> b.o_totalprice
      |              OR a.o_orderstatus <> b.o_orderstatus THEN 'changed'
      |         ELSE 'same' END AS change_type,
      |    a.o_totalprice AS old_price, b.o_totalprice AS new_price
      |  FROM orders a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
      |SELECT o_orderkey, change_type, old_price, new_price
      |FROM d WHERE change_type <> 'same' ORDER BY o_orderkey""".stripMargin

  // --------------------------------------------------------------------------
  // q136 — robust outlier detection via the median absolute deviation:
  // modified z-score 0.6745·(x − median)/MAD with the conventional 3.5
  // cutoff (Iglewicz–Hoaglin). The robust complement to q91's mean/stddev
  // z-score — a 10×-corrupted value inflates the stddev and hides itself,
  // but barely moves the median/MAD.
  //
  // INTEGER-EXACT throughout: `value` sits on the cent grid, so the whole
  // statistic lives in half-cent units — p = 2·cents − 2·median(cents)
  // (the 0.5-quantile interpolation is a midpoint, so 2× it is an exact
  // long), dev2 = |p|, mad4 = 2·median(dev2). The cutoff becomes the pure
  // integer predicate 1349·|p| > 3500·mad4 (both sides of |z| > 3.5
  // scaled by 1000·mad4/…), and the reported score is integer basis
  // points sign(p)·(13490·|p| div mad4) — no double is ever compared or
  // rounded, so no cross-engine rounding boundary exists (a round(z, 4)
  // version of this query flaked exactly there at sf0.1: 3.8522 vs
  // 3.8523 on one grid-valued row).
  //
  // Three row-local passes over the table (median → MAD → scoring; the
  // deviation quantile cannot start before the median lands); both
  // group-stat tables are |groups|-row aggregates that BROADCAST back —
  // the base table never sorts globally and never joins shuffled.
  def q136MadOutliers(spark: SparkSession, dir: String): DataFrame = {
    val cents = (col("value").cast(DecimalType(12, 2)) * 100).cast("long")
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"), cents.as("x_c"))
    // exact medians here buffer O(distinct cents values) — x_c is the
    // value column pre-quantized to the cents grid (the q125 contract
    // note), and abs(p) below is a difference of cents values, same grid
    val med = ev.groupBy(col("event_type"))
      .agg((expr("percentile(x_c, 0.5d)") * 2).cast("long").as("med2"))
    val withDev = ev.join(broadcast(med), Seq("event_type"))
      .withColumn("p", col("x_c") * 2 - col("med2"))
    val mad = withDev.groupBy(col("event_type"))
      .agg((expr("percentile(abs(p), 0.5d)") * 2).cast("long").as("mad4"))
    withDev.join(broadcast(mad), Seq("event_type"))
      .filter(col("mad4") > 0 && abs(col("p")) * 1349L > col("mad4") * 3500L)
      .withColumn("mod_z_bp",
        signum(col("p")).cast("long") * expr("(13490 * abs(p)) div mad4"))
      .select(col("event_id"), col("event_type"), col("value"), col("mod_z_bp"))
      .orderBy(col("event_id"))
  }

  val q136Sql: String =
    """WITH e AS (
      |  SELECT event_id, event_type, value,
      |         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS x_c
      |  FROM events),
      |med AS (
      |  SELECT event_type, CAST(2 * quantile_cont(x_c, 0.5) AS BIGINT) AS med2
      |  FROM e GROUP BY event_type),
      |d AS (
      |  SELECT e.event_id, e.event_type, e.value, 2 * x_c - med2 AS p
      |  FROM e JOIN med ON e.event_type = med.event_type),
      |mad AS (
      |  SELECT event_type, CAST(2 * quantile_cont(ABS(p), 0.5) AS BIGINT) AS mad4
      |  FROM d GROUP BY event_type)
      |SELECT event_id, d.event_type, value,
      |  CAST(SIGN(p) AS BIGINT) * ((13490 * ABS(p)) // mad4) AS mod_z_bp
      |FROM d JOIN mad ON d.event_type = mad.event_type
      |WHERE mad4 > 0 AND 1349 * ABS(p) > 3500 * mad4
      |ORDER BY event_id""".stripMargin

  // --------------------------------------------------------------------------
  // q142 — Z-ORDER layout key: interleave the bits of (customer, order-day)
  // into one space-filling-curve key and report the per-curve-bucket
  // bounding boxes. This is the data-layout operator behind multi-column
  // data skipping at 100 TB: sorting/partitioning the table by z instead
  // of a single column makes EVERY bucket a small rectangle in BOTH
  // dimensions, so min/max file stats prune scans for predicates on
  // either column (a single-column sort gives perfect pruning on one
  // dimension and none on the other). The curve math is pure integer bit
  // arithmetic — bit-identical cross-engine by construction — and the
  // whole operator is one row-local projection + one hash aggregate.
  // Domain cap: 16 bits per dimension (customer < 2^14, day < 2^12 at
  // every SF here); wider domains scale the interleave width.
  private def zInterleave(mk: (String, Int, Int) => String): String =
    (0 until 16).map(b =>
      s"${mk("x", b, 2 * b)} + ${mk("y", b, 2 * b + 1)}").mkString(" + ")

  // Both dimensions are first NORMALIZED to the full 16-bit range by a
  // data-derived integer max-scale ((v·65535) div max) — without this, a
  // narrow dimension contributes only low interleave bits, the curve's top
  // bits are all the wide dimension's, and per-bucket rectangles collapse
  // to single-column slices (observed at sf0.001: custkey spans 8 bits vs
  // the day index's 12). With both dims full-width, the fixed power-of-two
  // bucket divisor (top 6 z-bits) yields ≤64 ALIGNED dyadic rectangles,
  // each spanning ≤1/8 of every dimension — SF-invariant by construction.
  def q142ZOrder(spark: SparkSession, dir: String): DataFrame = {
    val b = Tables.orders(spark, dir)
      .select(
        col("o_custkey").cast("long").as("x"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01")).cast("long").as("y"))
    val bounds = b.agg(
      greatest(max(col("x")), lit(1L)).as("mx"),
      greatest(max(col("y")), lit(1L)).as("my"))
    b.crossJoin(broadcast(bounds))
      .withColumn("xs", expr("(x * 65535) div mx"))
      .withColumn("ys", expr("(y * 65535) div my"))
      .withColumn("bucket", expr(
        s"(${zInterleave((c, bb, k) => s"shiftleft(shiftright(${c}s, $bb) & 1, $k)")}) div 67108864"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
      .orderBy(col("bucket"))
  }

  val q142Sql: String = {
    val z = zInterleave((c, b, k) => s"((($c >> $b) & 1) << $k)")
    val zs = z.replace("(x ", "(xs ").replace("(y ", "(ys ")
    s"""WITH b AS (
       |  SELECT CAST(o_custkey AS BIGINT) AS x,
       |    CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS y
       |  FROM orders),
       |bd AS (SELECT GREATEST(MAX(x), 1) AS mx, GREATEST(MAX(y), 1) AS my FROM b),
       |zt AS (
       |  SELECT x, y, ($zs) AS z FROM (
       |    SELECT x, y, (x * 65535) // mx AS xs, (y * 65535) // my AS ys
       |    FROM b, bd))
       |SELECT z // 67108864 AS bucket, COUNT(*) AS n,
       |  MIN(x) AS min_x, MAX(x) AS max_x, MIN(y) AS min_y, MAX(y) AS max_y
       |FROM zt GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q143 — incremental materialized-view maintenance: a stored per-customer
  // order aggregate (95% of the table, already aggregated) is brought up to
  // date by aggregating ONLY the delta batch and merging partials — the
  // mergeable-aggregate law (count/sum are commutative monoids) that makes
  // warehouse MVs delta-proportional instead of recompute-proportional.
  // The ORACLE is the full recompute over the whole table: the hash match
  // IS the maintenance-correctness statement merge(old, Δ) ≡ recompute.
  //
  // Scale: the expensive path aggregates only the delta (map-side
  // partials); the merge shuffles |groups| partial rows, not data. Money
  // sums stay exact DECIMAL through both aggregation levels (SURVEY §8.4);
  // the derived average divides after the final cast, identically ordered
  // in both engines.
  /** Partial (count, exact-decimal sum) per key over (key, value) rows. */
  private[ops] def mvPartial(df: DataFrame, key: String, value: String): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("n"), sum(col(value).cast(DecimalType(18, 2))).as("s"))

  /** Merge any number of partial tables into the final MV row shape. */
  private[ops] def mvMerge(key: String, partials: DataFrame*): DataFrame =
    partials.reduce(_.unionByName(_))
      .groupBy(col(key))
      .agg(sum(col("n")).as("n_orders"), sum(col("s")).as("sdec"))
      .select(col(key), col("n_orders"),
        col("sdec").cast("double").as("sum_price"),
        Num.pround(col("sdec").cast("double") / col("n_orders"), 6).as("avg_price"))

  def q143IncrementalMv(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val stored = mvPartial(o.filter(col("o_orderkey") % 20 =!= 0), "o_custkey", "o_totalprice")
    val delta = mvPartial(o.filter(col("o_orderkey") % 20 === 0), "o_custkey", "o_totalprice")
    mvMerge("o_custkey", stored, delta).orderBy(col("o_custkey"))
  }

  val q143Sql: String =
    """SELECT o_custkey, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  FLOOR((CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) * 1e6 + 0.5) / 1e6
      |    AS avg_price
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // --------------------------------------------------------------------------
  // q189 — incremental VARIANCE maintenance: extend q143's mergeable-
  // aggregate law to second moments. The stored stats table carries
  // (n, Σcents, Σcents²) per priority; a delta batch (orders on/after the
  // 1999-01-01 cutoff) is aggregated alone and MERGED — component-wise
  // addition, never a rescan of history — then mean/variance are derived
  // from the merged moments. The oracle recomputes directly over the
  // whole table with the same closed form: hash match ⇔
  // merge(old, Δ) ≡ recompute, for moments where naive float accumulation
  // would drift (cents² sums overflow long at sf≳0.3, so they ride
  // DECIMAL(38,0) — exact at any scale).
  //
  // Scale: each side is a map-side-partial aggregate; the merge shuffles
  // |groups| rows. The only doubles are the final mean/var expressions,
  // token-identical in both engines.
  private def momentPartial(df: DataFrame): DataFrame = {
    val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
      .cast(DecimalType(38, 0))
    df.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(cents).as("s"),
        sum(cents * cents).as("q"))
  }

  def q189IncrementalStats(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val cutoff = "1999-01-01"
    val stored = momentPartial(o.filter(col("o_orderdate") < cutoff))
    val delta = momentPartial(o.filter(col("o_orderdate") >= cutoff))
    stored.unionByName(delta)
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"), sum(col("q")).as("q"))
      .select(col("o_orderpriority"), col("n"),
        Num.pround(col("s").cast("double") / (col("n") * 100), 4).as("mean_price"),
        Num.pround((col("q").cast("double") - col("s").cast("double") * col("s").cast("double")
          / col("n")) / ((col("n") - 1) * 10000), 4).as("var_price"))
      .orderBy(col("o_orderpriority"))
  }

  val q189Sql: String =
    """WITH m AS (
      |  SELECT o_orderpriority, COUNT(*) AS n,
      |    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0))) AS s,
      |    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0))
      |      * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0))) AS q
      |  FROM orders GROUP BY o_orderpriority)
      |SELECT o_orderpriority, n,
      |  FLOOR((CAST(s AS DOUBLE) / (n * 100)) * 1e4 + 0.5) / 1e4 AS mean_price,
      |  FLOOR(((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
      |        / ((n - 1) * 10000)) * 1e4 + 0.5) / 1e4 AS var_price
      |FROM m ORDER BY o_orderpriority""".stripMargin

  // --------------------------------------------------------------------------
  // q151 — Benford's-law first-digit audit: the classic forensic
  // data-quality screen — compare the observed leading-digit distribution
  // of order totals against log10(1 + 1/d). Organic multiplicative data
  // follows it; fabricated or truncated feeds don't. Digit extraction is
  // EXACT (floor → bigint → first character of the decimal string — no
  // double log in the digit path); proportions are exact-int ratios;
  // the expectation is a fixed constant expression. One hash aggregate
  // to a 9-row grid.
  def q151Benford(spark: SparkSession, dir: String): DataFrame = {
    val digit = expr("cast(substr(cast(cast(floor(o_totalprice) as bigint) as string), 1, 1) as int)")
    val byDigit = Tables.orders(spark, dir)
      .filter(col("o_totalprice") >= 1.0)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    byDigit
      .crossJoin(broadcast(byDigit.agg(sum(col("n")).as("tot"))))
      .select(col("digit"), col("n"),
        Num.pround(col("n").cast("double") / col("tot"), 6).as("p_obs"),
        Num.pround(log(10.0, lit(1.0) + lit(1.0) / col("digit")), 6).as("p_benford"))
      .orderBy(col("digit"))
  }

  val q151Sql: String =
    """WITH d AS (
      |  SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
      |  FROM orders WHERE o_totalprice >= 1.0),
      |c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
      |t AS (SELECT SUM(n) AS tot FROM c)
      |SELECT digit, n,
      |  FLOOR((CAST(n AS DOUBLE) / tot) * 1e6 + 0.5) / 1e6 AS p_obs,
      |  FLOOR((LOG10(1.0 + 1.0 / digit)) * 1e6 + 0.5) / 1e6 AS p_benford
      |FROM c CROSS JOIN t ORDER BY digit""".stripMargin

  // --------------------------------------------------------------------------
  // q156 — right-to-be-forgotten purge propagation: given a deletion
  // request list (keys ≡ 0 mod 97 here), report the purge impact across
  // EVERY table carrying the key — the GDPR/CCPA erasure audit that
  // precedes the actual rewrite (which is q67's copy-on-write anti-join
  // per table). Each table is ONE pass: broadcast the request list, left
  // join a presence marker, count rows and marked rows together — no
  // second scan, no count(*) subqueries.
  private def purgeStats(df: DataFrame, key: Column, name: String,
                         forget: DataFrame): DataFrame =
    df.select(key.as("k"))
      .join(broadcast(forget.withColumn("m", lit(1))), Seq("k"), "left")
      .agg(count(lit(1)).as("n_before"), count(col("m")).as("n_purged"))
      .select(lit(name).as("table_name"), col("n_before"), col("n_purged"),
        (col("n_before") - col("n_purged")).as("n_after"))

  def q156ForgetUser(spark: SparkSession, dir: String): DataFrame = {
    val forget = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 97 === 0).select(col("c_custkey").as("k"))
    purgeStats(Tables.customer(spark, dir), col("c_custkey"), "customer", forget)
      .unionByName(purgeStats(Tables.orders(spark, dir), col("o_custkey"), "orders", forget))
      .unionByName(purgeStats(Tables.events(spark, dir), col("user_id"), "events", forget))
      .orderBy(col("table_name"))
  }

  val q156Sql: String =
    """WITH f AS (SELECT c_custkey AS k FROM customer WHERE c_custkey % 97 = 0),
      |c AS (
      |  SELECT 'customer' AS table_name, COUNT(*) AS n_before,
      |    CAST(COUNT(*) FILTER (c_custkey IN (SELECT k FROM f)) AS BIGINT) AS n_purged
      |  FROM customer),
      |o AS (
      |  SELECT 'orders', COUNT(*),
      |    CAST(COUNT(*) FILTER (o_custkey IN (SELECT k FROM f)) AS BIGINT)
      |  FROM orders),
      |e AS (
      |  SELECT 'events', COUNT(*),
      |    CAST(COUNT(*) FILTER (user_id IN (SELECT k FROM f)) AS BIGINT)
      |  FROM events)
      |SELECT table_name, n_before, n_purged, n_before - n_purged AS n_after
      |FROM (SELECT * FROM c UNION ALL SELECT * FROM o UNION ALL SELECT * FROM e)
      |ORDER BY table_name""".stripMargin

  // --------------------------------------------------------------------------
  // q158 — RFM customer segmentation: recency (days since last order),
  // frequency (order count), monetary (exact cents) scored into quintiles
  // and mapped to named segments — the standard CRM/marketing analytics
  // report. Quintile scores use q130's EQUI-DEPTH EDGE pattern: the four
  // 20/40/60/80-percentile edges per metric come from ONE broadcast
  // aggregate and each row's score is 1 + (count of edges ≤ metric),
  // row-local — no global NTILE sort of the customer table. All three
  // metrics are exact integers (days / counts / cents), so edge
  // comparisons are deterministic cross-engine (percentile interpolation
  // parity per q28).
  def q158RfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).as("sdec"))
    val rfm = perCust
      .crossJoin(broadcast(perCust.agg(max(col("last_order")).as("now"))))
      .select(col("o_custkey"),
        datediff(col("now"), col("last_order")).cast("long").as("recency"),
        col("frequency"),
        (col("sdec") * 100).cast("long").as("monetary_cents"))
    // exact-percentile domains (q125 contract note): recency = whole days
    // (calendar-bounded), frequency = small per-customer counts,
    // monetary_cents = cents grid — all bounded-distinct by construction
    val edges = rfm.agg(
      expr("percentile(recency, array(0.2d, 0.4d, 0.6d, 0.8d))").as("re"),
      expr("percentile(frequency, array(0.2d, 0.4d, 0.6d, 0.8d))").as("fe"),
      expr("percentile(monetary_cents, array(0.2d, 0.4d, 0.6d, 0.8d))").as("me"))
    def score(metric: Column, es: String): Column =
      (0 until 4).map(i => (metric >= col(es).getItem(i)).cast("int")).reduce(_ + _) + 1
    rfm.crossJoin(broadcast(edges))
      .select(col("o_custkey"),
        // LOW recency is good: invert the bucket (5 = most recent)
        (lit(6) - score(col("recency"), "re")).as("r_score"),
        score(col("frequency"), "fe").as("f_score"),
        score(col("monetary_cents"), "me").as("m_score"))
      .withColumn("segment",
        when(col("r_score") >= 4 && col("f_score") >= 4, lit("champion"))
          .when(col("r_score") <= 2 && col("f_score") >= 4, lit("at_risk_loyal"))
          .when(col("r_score") >= 4 && col("f_score") <= 2, lit("recent_light"))
          .otherwise(lit("regular")))
      .orderBy(col("o_custkey"))
  }

  val q158Sql: String =
    """WITH rfm AS (
      |  SELECT o_custkey,
      |    CAST(DATE_DIFF('day', MAX(o_orderdate),
      |         (SELECT MAX(o_orderdate) FROM orders)) AS BIGINT) AS recency,
      |    COUNT(*) AS frequency,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS monetary_cents
      |  FROM orders GROUP BY o_custkey),
      |e AS (
      |  SELECT quantile_cont(recency, [0.2, 0.4, 0.6, 0.8]) AS re,
      |    quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS fe,
      |    quantile_cont(monetary_cents, [0.2, 0.4, 0.6, 0.8]) AS me
      |  FROM rfm),
      |scored AS (
      |  SELECT o_custkey,
      |    6 - (1 + CAST(recency >= re[1] AS INT) + CAST(recency >= re[2] AS INT)
      |           + CAST(recency >= re[3] AS INT) + CAST(recency >= re[4] AS INT)) AS r_score,
      |    1 + CAST(frequency >= fe[1] AS INT) + CAST(frequency >= fe[2] AS INT)
      |      + CAST(frequency >= fe[3] AS INT) + CAST(frequency >= fe[4] AS INT) AS f_score,
      |    1 + CAST(monetary_cents >= me[1] AS INT) + CAST(monetary_cents >= me[2] AS INT)
      |      + CAST(monetary_cents >= me[3] AS INT) + CAST(monetary_cents >= me[4] AS INT) AS m_score
      |  FROM rfm CROSS JOIN e)
      |SELECT o_custkey, r_score, f_score, m_score,
      |  CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
      |       WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk_loyal'
      |       WHEN r_score >= 4 AND f_score <= 2 THEN 'recent_light'
      |       ELSE 'regular' END AS segment
      |FROM scored ORDER BY o_custkey""".stripMargin

  // --------------------------------------------------------------------------
  // q163 — referential-integrity audit: for each declared FK relation,
  // count child rows, orphans (child key with no parent), parents, and
  // childless parents — the constraint screen a lakehouse runs since
  // nothing enforces FKs at write time. Each side is ONE marker left
  // join + conditional count (q156's pattern, no count(*) subqueries);
  // the join shuffles on the key exactly once per direction.
  private def fkAudit(child: DataFrame, ckey: Column, parent: DataFrame,
                      pkey: Column, name: String): DataFrame = {
    val p = parent.select(pkey.as("k")).distinct()
    val c = child.select(ckey.as("k"))
    val orphans = c.join(p.withColumn("m", lit(1)), Seq("k"), "left")
      .agg(count(lit(1)).as("n_child"), count_if(col("m").isNull).as("n_orphan"))
    val childless = p.join(c.distinct().withColumn("m", lit(1)), Seq("k"), "left")
      .agg(count(lit(1)).as("n_parents"), count_if(col("m").isNull).as("n_childless"))
    orphans.crossJoin(childless)
      .select(lit(name).as("relation"), col("n_child"), col("n_orphan"),
        col("n_parents"), col("n_childless"))
  }

  def q163FkAudit(spark: SparkSession, dir: String): DataFrame =
    fkAudit(Tables.orders(spark, dir), col("o_custkey"),
        Tables.customer(spark, dir), col("c_custkey"), "orders->customer")
      .unionByName(fkAudit(Tables.lineitem(spark, dir), col("l_orderkey"),
        Tables.orders(spark, dir), col("o_orderkey"), "lineitem->orders"))
      .orderBy(col("relation"))

  val q163Sql: String =
    """WITH oc AS (
      |  SELECT 'orders->customer' AS relation,
      |    (SELECT COUNT(*) FROM orders) AS n_child,
      |    (SELECT COUNT(*) FROM orders
      |     WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS n_orphan,
      |    (SELECT COUNT(DISTINCT c_custkey) FROM customer) AS n_parents,
      |    (SELECT COUNT(*) FROM (SELECT DISTINCT c_custkey FROM customer)
      |     WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)) AS n_childless),
      |lo AS (
      |  SELECT 'lineitem->orders',
      |    (SELECT COUNT(*) FROM lineitem),
      |    (SELECT COUNT(*) FROM lineitem
      |     WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
      |    (SELECT COUNT(DISTINCT o_orderkey) FROM orders),
      |    (SELECT COUNT(*) FROM (SELECT DISTINCT o_orderkey FROM orders)
      |     WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)))
      |SELECT * FROM oc UNION ALL SELECT * FROM lo ORDER BY relation""".stripMargin

  // --------------------------------------------------------------------------
  // q164 — SKYLINE / Pareto frontier: customers not strictly dominated on
  // (order frequency, lifetime spend) — the multi-criteria "best tradeoff"
  // operator (no SQL primitive exists). The 2-D skyline test only ever
  // consults PER-FREQUENCY MAXIMA: p is dominated iff max{ m : f' > f }
  // exceeds p.m strictly (ties survive — strict domination, exactly the
  // NOT EXISTS oracle; a point whose spend EQUALS the max over higher
  // frequencies is NOT dominated, hence the >= below). So the plan is
  // three bounded passes instead of one global window over all customers:
  //   1. collapse rfm to the (f, max m) grid — one shuffle, and the grid
  //      is bounded by |distinct order counts| (~dozens), not customers;
  //   2. prefix-max over STRICTLY-higher frequencies on that grid — the
  //      only single-partition window, over the bounded grid only;
  //   3. broadcast the grid back onto rfm and filter row-locally.
  // At 100 TB the per-customer table never funnels through one task.
  // Metrics are exact integers, so no cross-engine rounding boundary.
  def q164Skyline(spark: SparkSession, dir: String): DataFrame = {
    val rfm = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("f"),
        (sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100).cast("long").as("m"))
    skyline(rfm, col("f"), col("m"), Seq(col("o_custkey")))
      .orderBy(col("o_custkey"))
  }

  /** 2-D skyline under STRICT domination (kept iff no row has both dims
    * strictly greater). `points` must have one row per entity; the window
    * runs over the bounded distinct-`f` grid, never over `points` itself.
    */
  def skyline(points: DataFrame, f: Column, m: Column, keep: Seq[Column]): DataFrame = {
    val grid = points.groupBy(f.as("__f")).agg(max(m).as("__fm"))
    val stronger = Window.orderBy(col("__f").desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val frontier = grid
      .withColumn("__mx", max(col("__fm")).over(stronger))
      .select(col("__f"), col("__mx"))
    points.join(broadcast(frontier), f === col("__f"))
      .filter(col("__mx").isNull || m >= col("__mx"))
      .select(keep ++ Seq(f, m): _*)
  }

  val q164Sql: String =
    """WITH rfm AS (
      |  SELECT o_custkey, COUNT(*) AS f,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS m
      |  FROM orders GROUP BY o_custkey)
      |SELECT o_custkey, f, m FROM rfm p
      |WHERE NOT EXISTS (SELECT 1 FROM rfm q WHERE q.f > p.f AND q.m > p.m)
      |ORDER BY o_custkey""".stripMargin

  // --------------------------------------------------------------------------
  // q214 — COST-BASED-OPTIMIZER STATS ROUND-TRIP: register the parquet
  // tables in the session catalog, `ANALYZE TABLE … COMPUTE STATISTICS FOR
  // COLUMNS`, and return the optimizer-visible statistics (row count, null
  // count, min/max) read back out of the catalog. This is the maintenance
  // operation a warehouse runs after every load so Catalyst's CBO can
  // reorder joins and broadcast filtered dimensions (CboSpec pins the plan
  // effect: with stats + spark.sql.cbo.enabled a selective dim filter
  // flips a sort-merge join to broadcast).
  //
  // Only EXACT stats are emitted (row/null counts, min/max) — ANALYZE's
  // distinct counts are HyperLogLog++ approximations and would not be
  // oracle-stable. The DROP/CREATE pair makes the entry idempotent, and
  // the tables are external (LOCATION-backed), so dropping them never
  // touches the read-only parquet. Scale: ANALYZE is one distributed
  // aggregate scan per table; the catalog read-back is metadata-only.
  def q214CboStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val specs = Seq(("nation", "n_nationkey"), ("customer", "c_acctbal"),
      ("part", "p_retailprice"))
    specs.map { case (t, c) =>
      val tbl = s"graft_cbo_$t"
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(s"CREATE TABLE $tbl USING parquet LOCATION '$dir/$t.parquet'")
      spark.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS FOR COLUMNS $c")
      val st = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(tbl))
        .stats.getOrElse(sys.error(s"ANALYZE left no stats on $tbl"))
      val cs = st.colStats(c)
      // min/max stats are absent on a 0-row table — surface SQL NULLs
      // (matching the oracle's MIN/MAX over empty), never None.get
      (t, c, st.rowCount.get.toLong, cs.nullCount.get.toLong,
        cs.min.map(_.toString.toDouble), cs.max.map(_.toString.toDouble))
    }.toDF("tbl", "col", "row_cnt", "null_cnt", "min_v", "max_v")
      .orderBy(col("tbl"))
  }

  val q214Sql: String =
    """SELECT 'nation' AS tbl, 'n_nationkey' AS col, COUNT(*) AS row_cnt,
      |  COUNT(*) - COUNT(n_nationkey) AS null_cnt,
      |  CAST(MIN(n_nationkey) AS DOUBLE) AS min_v,
      |  CAST(MAX(n_nationkey) AS DOUBLE) AS max_v FROM nation
      |UNION ALL
      |SELECT 'customer', 'c_acctbal', COUNT(*), COUNT(*) - COUNT(c_acctbal),
      |  CAST(MIN(c_acctbal) AS DOUBLE), CAST(MAX(c_acctbal) AS DOUBLE)
      |FROM customer
      |UNION ALL
      |SELECT 'part', 'p_retailprice', COUNT(*), COUNT(*) - COUNT(p_retailprice),
      |  CAST(MIN(p_retailprice) AS DOUBLE), CAST(MAX(p_retailprice) AS DOUBLE)
      |FROM part
      |ORDER BY tbl""".stripMargin

  // --------------------------------------------------------------------------
  // q219 — SCHEMA-EVOLUTION READ (mergeSchema): two generations of the
  // same landing table — v1 written WITHOUT the priority column, v2
  // written WITH it — read back as ONE dataset via parquet schema merging,
  // the production reality of any long-lived drop zone (columns get added;
  // history doesn't get rewritten). Old files surface the new column as
  // NULL; the aggregate groups on it with a sentinel for the pre-evolution
  // rows. The oracle reconstructs the same split from the source table.
  //
  // Scale: mergeSchema pays one footer read per file at planning (fine —
  // a real deployment pins the merged schema in a catalog after one
  // inference pass); the scan itself stays columnar with pushdown. The
  // staged generations are written once per (process, dir) (Staging).
  def q219SchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val slot = Staging.ensure("q219_evo", dir) { path =>
      val o = Tables.orders(spark, dir)
      o.filter(pmod(col("o_orderkey"), lit(2)) === 0) // generation 1: no priority
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .write.mode("overwrite").parquet(path)
      o.filter(pmod(col("o_orderkey"), lit(2)) === 1) // generation 2: adds it
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderpriority"))
        .write.mode("append").parquet(path)
    }
    spark.read.option("mergeSchema", "true").parquet(slot)
      .groupBy(coalesce(col("o_orderpriority"), lit("pre-evolution")).as("prio"))
      .agg(count(lit(1)).as("n"), Num.moneySum(col("o_totalprice")).as("total"))
      .orderBy(col("prio"))
  }

  val q219Sql: String =
    """SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority
      |            ELSE 'pre-evolution' END AS prio,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY 1 ORDER BY prio""".stripMargin

  // --------------------------------------------------------------------------
  // q234 — GROUP-WISE OLS REGRESSION from sufficient statistics: per
  // return flag, fit extendedprice ~ quantity in ONE distributed pass —
  // slope, intercept, and R² all derive from the five exact moment sums
  // (n, Σx, Σy, Σxy, Σx², Σy²). This is the "sufficient-statistics ML"
  // pattern: at 100 TB the model fits from one map-side-combinable
  // aggregate, never a per-group data collect (contrast q204, which fits
  // on a bounded top-K grid).
  //
  // Exactness: x/y are exact cent longs; every Σ rides DECIMAL(38,0)
  // (order-free integer sums); slope's numerator/denominator are exact
  // decimal products with ONE double division; R²'s squared terms exceed
  // decimal-38 range, so a/b/c are cast to double AFTER the exact
  // first-order differences — identical IEEE expressions both engines.
  def q234GroupwiseOls(spark: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val base = Tables.lineitem(spark, dir).select(
      col("l_returnflag"),
      expr("cast(cast(l_quantity as decimal(18,2)) * 100 as decimal(18,0))").as("x"),
      expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as decimal(18,0))").as("y"))
    base.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).cast(d38).as("sx"), sum(col("y")).cast(d38).as("sy"),
        sum(col("x") * col("y")).cast(d38).as("sxy"),
        sum(col("x") * col("x")).cast(d38).as("sxx"),
        sum(col("y") * col("y")).cast(d38).as("syy"))
      .withColumn("a", (col("sxy") * col("n") - col("sx") * col("sy")).cast("double"))
      .withColumn("b", (col("sxx") * col("n") - col("sx") * col("sx")).cast("double"))
      .withColumn("c", (col("syy") * col("n") - col("sy") * col("sy")).cast("double"))
      .select(col("l_returnflag"), col("n"),
        Num.pround(col("a") / col("b"), 6).as("slope"),
        Num.pround((col("sy").cast("double") - col("a") / col("b") * col("sx").cast("double"))
          / col("n") / 100.0, 2).as("intercept"),
        Num.pround(col("a") * col("a") / (col("b") * col("c")), 6).as("r2"))
      .orderBy(col("l_returnflag"))
  }

  val q234Sql: String =
    """WITH b AS (
      |  SELECT l_returnflag,
      |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS HUGEINT) AS x,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS HUGEINT) AS y
      |  FROM lineitem),
      |m AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
      |    SUM(x * x) AS sxx, SUM(y * y) AS syy
      |  FROM b GROUP BY 1),
      |d AS (
      |  SELECT l_returnflag, n,
      |    CAST(sxy * n - sx * sy AS DOUBLE) AS a,
      |    CAST(sxx * n - sx * sx AS DOUBLE) AS bb,
      |    CAST(syy * n - sy * sy AS DOUBLE) AS c,
      |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
      |  FROM m)
      |SELECT l_returnflag, n,
      |  FLOOR((a / bb) * 1e6 + 0.5) / 1e6 AS slope,
      |  FLOOR(((syd - a / bb * sxd) / n / 100.0) * 1e2 + 0.5) / 1e2 AS intercept,
      |  FLOOR((a * a / (bb * c)) * 1e6 + 0.5) / 1e6 AS r2
      |FROM d ORDER BY l_returnflag""".stripMargin

  // --------------------------------------------------------------------------
  // q236 — GINI COEFFICIENT + LORENZ SUMMARY per nation over customer
  // account balances: inequality audit via the rank formulation
  //   G = (2·Σ k·x₍ₖ₎ − (n+1)·Σx) / (n·Σx),  x ascending —
  // the one-pass-after-rank identity (no pairwise |xᵢ−xⱼ| join, which is
  // O(n²) and the naive formulation). Also emits the Lorenz-curve bottom-
  // half share (fraction of total balance held by the poorer half).
  //
  // Scale: rank window is PARTITIONED by nation (never global); both
  // aggregates are map-side-combinable sums; one shuffle on nation.
  // Exactness: balances ride exact cent DECIMAL(38,0); Σk·x is exact
  // (rank ties carry identical x, so the sum is tie-order invariant);
  // ONE double division at output.
  def q236Gini(spark: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val c = Tables.customer(spark, dir).select(
      col("c_nationkey"),
      expr("cast(cast(c_acctbal as decimal(18,2)) * 100 as decimal(18,0))").as("cents"))
    val w = Window.partitionBy(col("c_nationkey")).orderBy(col("cents"), col("c_nationkey"))
    val ranked = c.withColumn("k", row_number().over(w).cast(d38))
      .withColumn("half", (col("k") * 2 <= count(lit(1)).over(
        Window.partitionBy(col("c_nationkey")))).cast("int"))
    val agg = ranked.groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("cents")).cast(d38).as("sx"),
        sum(col("k") * col("cents")).cast(d38).as("skx"),
        sum(when(col("half") === 1, col("cents")).otherwise(lit(0))).cast(d38).as("bot"))
    agg.join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("n"),
        Num.pround((col("skx") * 2 - col("sx") * (col("n") + 1)).cast("double") /
          (col("sx") * col("n")).cast("double"), 6).as("gini"),
        Num.pround(col("bot").cast("double") / col("sx").cast("double"), 6).as("bottom_half_share"))
      .orderBy(col("n_name"))
  }

  val q236Sql: String =
    """WITH c AS (
      |  SELECT c_nationkey,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS HUGEINT) AS cents
      |  FROM customer),
      |r AS (
      |  SELECT c_nationkey, cents,
      |    ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY cents) AS k,
      |    COUNT(*) OVER (PARTITION BY c_nationkey) AS nn
      |  FROM c),
      |a AS (
      |  SELECT c_nationkey, COUNT(*) AS n,
      |    SUM(cents) AS sx, SUM(k * cents) AS skx,
      |    SUM(CASE WHEN k * 2 <= nn THEN cents ELSE 0 END) AS bot
      |  FROM r GROUP BY 1)
      |SELECT n_name, n,
      |  FLOOR((CAST(skx * 2 - sx * (n + 1) AS DOUBLE) / CAST(sx * n AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS gini,
      |  FLOOR((CAST(bot AS DOUBLE) / CAST(sx AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS bottom_half_share
      |FROM a JOIN nation ON c_nationkey = n_nationkey
      |ORDER BY n_name""".stripMargin

  // --------------------------------------------------------------------------
  // q240 — K-FOLD CROSS-VALIDATED REGRESSION from sufficient statistics:
  // q234's one-pass OLS extended to model EVALUATION without a second
  // data pass. Rows get a deterministic fold (portable md5 mod 5); ONE
  // aggregate produces per-(group, fold) moment sums; the fold-f training
  // stats are the group TOTALS minus fold f's own (exact decimal
  // subtraction — the leave-one-out trick), and the held-out SSE expands
  // algebraically over the fold's sufficient statistics:
  //   SSE_f = Σ(y−a−bx)² = syy − 2a·sy − 2b·sxy + n·a² + 2ab·sx + b²·sxx.
  // So train AND test metrics for all 5 folds come from one shuffle of
  // 15 tiny rows — no per-fold data replication, no second scan. At
  // 100 TB this is the only way k-fold CV is affordable.
  //
  // Exactness: moment sums ride DECIMAL(38,0) cents; coefficients and the
  // SSE expansion are double with the identical operation order in both
  // engines (mirrored literally in the oracle), rounded at output.
  def q240CvOls(spark: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val base = Tables.lineitem(spark, dir).select(
      col("l_returnflag").as("flag"),
      expr("cast(conv(substring(md5(concat('cv:', l_orderkey, ':', l_linenumber)), 1, 8), 16, 10) as bigint) % 5")
        .as("fold"),
      expr("cast(cast(l_quantity as decimal(18,2)) * 100 as decimal(18,0))").as("x"),
      expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as decimal(18,0))").as("y"))
    val perFold = base.groupBy(col("flag"), col("fold"))
      .agg(count(lit(1)).cast(d38).as("n"),
        sum(col("x")).cast(d38).as("sx"), sum(col("y")).cast(d38).as("sy"),
        sum(col("x") * col("y")).cast(d38).as("sxy"),
        sum(col("x") * col("x")).cast(d38).as("sxx"),
        sum(col("y") * col("y")).cast(d38).as("syy"))
    val totals = perFold.groupBy(col("flag"))
      .agg(sum(col("n")).cast(d38).as("tn"), sum(col("sx")).cast(d38).as("tsx"),
        sum(col("sy")).cast(d38).as("tsy"), sum(col("sxy")).cast(d38).as("tsxy"),
        sum(col("sxx")).cast(d38).as("tsxx"), sum(col("syy")).cast(d38).as("tsyy"))
    perFold.join(broadcast(totals), Seq("flag"))
      // exact decimal train stats (totals minus the held-out fold)
      .withColumn("rn", (col("tn") - col("n")).cast(d38))
      .withColumn("rsx", (col("tsx") - col("sx")).cast(d38))
      .withColumn("rsy", (col("tsy") - col("sy")).cast(d38))
      .withColumn("rsxy", (col("tsxy") - col("sxy")).cast(d38))
      .withColumn("rsxx", (col("tsxx") - col("sxx")).cast(d38))
      .withColumn("num", (col("rsxy") * col("rn") - col("rsx") * col("rsy")).cast("double"))
      .withColumn("den", (col("rsxx") * col("rn") - col("rsx") * col("rsx")).cast("double"))
      .withColumn("b", col("num") / col("den"))
      .withColumn("a",
        (col("rsy").cast("double") - col("b") * col("rsx").cast("double"))
          / col("rn").cast("double"))
      .withColumn("sse",
        col("syy").cast("double")
          - lit(2.0) * col("a") * col("sy").cast("double")
          - lit(2.0) * col("b") * col("sxy").cast("double")
          + col("n").cast("double") * col("a") * col("a")
          + lit(2.0) * col("a") * col("b") * col("sx").cast("double")
          + col("b") * col("b") * col("sxx").cast("double"))
      .select(col("flag"), col("fold"),
        (col("rn").cast("long")).as("n_train"), (col("n").cast("long")).as("n_test"),
        Num.pround(col("b"), 6).as("slope"),
        Num.pround(col("a") / 100.0, 2).as("intercept"),
        Num.pround(sqrt(col("sse") / col("n").cast("double")) / 100.0, 4).as("rmse"))
      .orderBy(col("flag"), col("fold"))
  }

  val q240Sql: String =
    """WITH b AS (
      |  SELECT l_returnflag AS flag,
      |    ('0x' || substr(md5('cv:' || l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR), 1, 8))::BIGINT % 5 AS fold,
      |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS HUGEINT) AS x,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS HUGEINT) AS y
      |  FROM lineitem),
      |pf AS (
      |  SELECT flag, fold, COUNT(*) AS n,
      |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
      |    SUM(x * x) AS sxx, SUM(y * y) AS syy
      |  FROM b GROUP BY 1, 2),
      |t AS (
      |  SELECT flag, SUM(n) AS tn, SUM(sx) AS tsx, SUM(sy) AS tsy,
      |    SUM(sxy) AS tsxy, SUM(sxx) AS tsxx, SUM(syy) AS tsyy
      |  FROM pf GROUP BY 1),
      |d AS (
      |  SELECT pf.flag, fold, n, sx, sy, sxy, sxx, syy,
      |    tn - n AS rn, tsx - sx AS rsx, tsy - sy AS rsy,
      |    tsxy - sxy AS rsxy, tsxx - sxx AS rsxx
      |  FROM pf JOIN t ON pf.flag = t.flag),
      |c AS (
      |  SELECT flag, fold, n, rn,
      |    CAST(rsxy * rn - rsx * rsy AS DOUBLE) / CAST(rsxx * rn - rsx * rsx AS DOUBLE) AS bb,
      |    sx, sy, sxy, sxx, syy, rsx, rsy
      |  FROM d),
      |e AS (
      |  SELECT flag, fold, n, rn, bb,
      |    (CAST(rsy AS DOUBLE) - bb * CAST(rsx AS DOUBLE)) / CAST(rn AS DOUBLE) AS a,
      |    sx, sy, sxy, sxx, syy
      |  FROM c)
      |SELECT flag, CAST(fold AS BIGINT) AS fold,
      |  CAST(rn AS BIGINT) AS n_train, CAST(n AS BIGINT) AS n_test,
      |  FLOOR((bb) * 1e6 + 0.5) / 1e6 AS slope,
      |  FLOOR((a / 100.0) * 1e2 + 0.5) / 1e2 AS intercept,
      |  FLOOR((SQRT((CAST(syy AS DOUBLE)
      |    - 2.0 * a * CAST(sy AS DOUBLE)
      |    - 2.0 * bb * CAST(sxy AS DOUBLE)
      |    + CAST(n AS DOUBLE) * a * a
      |    + 2.0 * a * bb * CAST(sx AS DOUBLE)
      |    + bb * bb * CAST(sxx AS DOUBLE)) / CAST(n AS DOUBLE)) / 100.0) * 1e4 + 0.5) / 1e4 AS rmse
      |FROM e ORDER BY flag, fold""".stripMargin

  // --------------------------------------------------------------------------
  // q243 — MERKLE-BUCKET REPLICA DIFF (anti-entropy repair): find the
  // row-level divergence between two replicas of a table WITHOUT a full
  // row-by-row compare. Each replica collapses to per-bucket digests
  // (bucket = key mod 256; digest = order-free exact sum of row hashes +
  // row count) in one map-side-combinable pass; only buckets whose
  // digests DISAGREE are opened for the row-level full-outer diff. With
  // sparse drift this prunes almost all data — and the bucket count is a
  // dial (65 536 at 100 TB makes the opened fraction ∝ drift rate). This
  // is Cassandra/Dynamo anti-entropy, and the scale path q135's direct
  // full-table diff cannot take.
  //
  // Replica B is staged in-plan from orders with deterministic drift
  // (md5-keyed: drop ~1%, mutate ~1%, insert ~1% new keys), so the
  // expected diff is portable and the oracle rebuilds both replicas
  // identically.
  def q243MerkleDiff(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.orders(spark, dir).select(
      col("o_orderkey").as("key"),
      concat_ws("|", col("o_orderstatus"), col("o_orderpriority"),
        expr("cast(cast(o_totalprice as decimal(18,2)) as string)")).as("payload"))
      .withColumn("u",
        expr("cast(conv(substring(md5(concat('mut:', key)), 1, 8), 16, 10) as bigint)"))
    val b = a.filter(col("u") % 101 =!= 0)
      .select(col("key"),
        when(col("u") % 97 === 0, concat(col("payload"), lit("*")))
          .otherwise(col("payload")).as("payload"))
      .unionAll(a.filter(col("u") % 103 === 0)
        .select((col("key") + 1000000000L).as("key"),
          concat(lit("new:"), col("key").cast("string")).as("payload")))
    def digests(t: DataFrame): DataFrame = t
      .withColumn("bucket", pmod(col("key"), lit(256)).cast("int"))
      .withColumn("h",
        expr("cast(conv(substring(md5(concat(key, '#', payload)), 1, 13), 16, 10) as bigint)"))
      .groupBy(col("bucket"))
      .agg(sum(col("h").cast(DecimalType(38, 0))).as("dig"), count(lit(1)).as("cnt"))
    val dirty = digests(a.select(col("key"), col("payload"))).as("da")
      .join(digests(b).as("db"), Seq("bucket"), "full_outer")
      .filter(col("da.dig").isNull || col("db.dig").isNull ||
        col("da.dig") =!= col("db.dig") || col("da.cnt") =!= col("db.cnt"))
      .select(col("bucket"))
    val inDirty = broadcast(dirty)
    val aOpen = a.withColumn("bucket", pmod(col("key"), lit(256)).cast("int"))
      .join(inDirty, Seq("bucket"), "left_semi").select(col("bucket"), col("key"), col("payload"))
    val bOpen = b.withColumn("bucket", pmod(col("key"), lit(256)).cast("int"))
      .join(inDirty, Seq("bucket"), "left_semi").select(col("key"), col("payload"))
    aOpen.as("x").join(bOpen.as("y"), Seq("key"), "full_outer")
      .withColumn("change",
        when(col("x.payload").isNull, "added")
          .when(col("y.payload").isNull, "removed")
          .when(col("x.payload") =!= col("y.payload"), "changed"))
      .filter(col("change").isNotNull)
      .select(pmod(col("key"), lit(256)).cast("int").as("bucket"), col("key"), col("change"))
      .orderBy(col("change"), col("key"))
  }

  val q243Sql: String =
    """WITH a AS (
      |  SELECT o_orderkey AS key,
      |    o_orderstatus || '|' || o_orderpriority || '|'
      |      || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS payload,
      |    ('0x' || substr(md5('mut:' || o_orderkey::VARCHAR), 1, 8))::BIGINT AS u
      |  FROM orders),
      |b AS (
      |  SELECT key, CASE WHEN u % 97 = 0 THEN payload || '*' ELSE payload END AS payload
      |  FROM a WHERE u % 101 <> 0
      |  UNION ALL
      |  SELECT key + 1000000000, 'new:' || key::VARCHAR FROM a WHERE u % 103 = 0),
      |da AS (
      |  SELECT key % 256 AS bucket,
      |    SUM(('0x' || substr(md5(key::VARCHAR || '#' || payload), 1, 13))::BIGINT) AS dig,
      |    COUNT(*) AS cnt
      |  FROM a GROUP BY 1),
      |db AS (
      |  SELECT key % 256 AS bucket,
      |    SUM(('0x' || substr(md5(key::VARCHAR || '#' || payload), 1, 13))::BIGINT) AS dig,
      |    COUNT(*) AS cnt
      |  FROM b GROUP BY 1),
      |dirty AS (
      |  SELECT COALESCE(da.bucket, db.bucket) AS bucket
      |  FROM da FULL OUTER JOIN db ON da.bucket = db.bucket
      |  WHERE da.dig IS NULL OR db.dig IS NULL
      |    OR da.dig <> db.dig OR da.cnt <> db.cnt),
      |ao AS (SELECT key, payload FROM a WHERE key % 256 IN (SELECT bucket FROM dirty)),
      |bo AS (SELECT key, payload FROM b WHERE key % 256 IN (SELECT bucket FROM dirty))
      |SELECT CAST(COALESCE(ao.key, bo.key) % 256 AS INT) AS bucket,
      |  COALESCE(ao.key, bo.key) AS key,
      |  CASE WHEN ao.payload IS NULL THEN 'added'
      |       WHEN bo.payload IS NULL THEN 'removed'
      |       WHEN ao.payload <> bo.payload THEN 'changed' END AS change
      |FROM ao FULL OUTER JOIN bo ON ao.key = bo.key
      |WHERE (ao.payload IS NULL OR bo.payload IS NULL OR ao.payload <> bo.payload)
      |ORDER BY change, key""".stripMargin

  // --------------------------------------------------------------------------
  // q253 — TRANSITIVE CASCADE DELETE with post-state integrity audit:
  // q156 purges rows that carry the forgotten key directly; real
  // referential graphs need the TRANSITIVE hop — lineitem rows reference
  // the user only THROUGH orders (no custkey column), so the cascade is
  // forget → orders (semi-join on custkey) → lineitem (semi-join on the
  // purged orderkeys). The result reports, per table, before/purged/after
  // counts AND the post-delete orphan count (children whose parent was
  // removed) — which must be ZERO; emitting the invariant makes the
  // compliance job self-auditing instead of trusted.
  //
  // Scale: every step is a semi/anti equi-join on the FK chain — no
  // broadcast assumptions about the forget set (it is keyed and shuffles
  // with the fact tables), which matters when a regulator hands over
  // millions of subjects.
  def q253CascadeDelete(spark: SparkSession, dir: String): DataFrame = {
    val forget = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 97 === 0).select(col("c_custkey").as("k"))
    val cust = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val custAfter = cust.join(forget, cust("c_custkey") === forget("k"), "left_anti")
    val ordPurged = orders.join(forget, orders("o_custkey") === forget("k"), "left_semi")
      .select(col("o_orderkey"))
    val ordAfter = orders.join(forget, orders("o_custkey") === forget("k"), "left_anti")
    val liAfter = li.join(ordPurged, li("l_orderkey") === ordPurged("o_orderkey"), "left_anti")
    def stats(name: String, before: DataFrame, after: DataFrame,
        orphans: DataFrame): DataFrame = {
      val b = before.agg(count(lit(1)).as("n_before"))
      val a = after.agg(count(lit(1)).as("n_after"))
      val o = orphans.agg(count(lit(1)).as("n_orphans_after"))
      b.crossJoin(a).crossJoin(o)
        .select(lit(name).as("table_name"), col("n_before"),
          (col("n_before") - col("n_after")).as("n_purged"),
          col("n_after"), col("n_orphans_after"))
    }
    val orphanOrders = ordAfter.join(custAfter.select(col("c_custkey")),
      ordAfter("o_custkey") === col("c_custkey"), "left_anti")
    val orphanLi = liAfter.join(ordAfter.select(col("o_orderkey").as("ok")),
      liAfter("l_orderkey") === col("ok"), "left_anti")
    stats("customer", cust, custAfter, custAfter.limit(0))
      .unionByName(stats("orders", orders, ordAfter, orphanOrders))
      .unionByName(stats("lineitem", li, liAfter, orphanLi))
      .orderBy(col("table_name"))
  }

  val q253Sql: String =
    """WITH f AS (SELECT c_custkey AS k FROM customer WHERE c_custkey % 97 = 0),
      |op AS (SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT k FROM f)),
      |ca AS (SELECT * FROM customer WHERE c_custkey NOT IN (SELECT k FROM f)),
      |oa AS (SELECT * FROM orders WHERE o_custkey NOT IN (SELECT k FROM f)),
      |la AS (SELECT * FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM op))
      |SELECT 'customer' AS table_name,
      |  (SELECT COUNT(*) FROM customer) AS n_before,
      |  (SELECT COUNT(*) FROM customer) - (SELECT COUNT(*) FROM ca) AS n_purged,
      |  (SELECT COUNT(*) FROM ca) AS n_after,
      |  0::BIGINT AS n_orphans_after
      |UNION ALL
      |SELECT 'lineitem',
      |  (SELECT COUNT(*) FROM lineitem),
      |  (SELECT COUNT(*) FROM lineitem) - (SELECT COUNT(*) FROM la),
      |  (SELECT COUNT(*) FROM la),
      |  (SELECT COUNT(*) FROM la WHERE l_orderkey NOT IN (SELECT o_orderkey FROM oa))
      |UNION ALL
      |SELECT 'orders',
      |  (SELECT COUNT(*) FROM orders),
      |  (SELECT COUNT(*) FROM orders) - (SELECT COUNT(*) FROM oa),
      |  (SELECT COUNT(*) FROM oa),
      |  (SELECT COUNT(*) FROM oa WHERE o_custkey NOT IN (SELECT c_custkey FROM ca))
      |ORDER BY table_name""".stripMargin

  // --------------------------------------------------------------------------
  // q258 — LEARNING CURVE in ONE PASS via nested hash prefixes: model
  // quality (OLS R², q234's statistic) at 10%, 20%, …, 100% of the data,
  // where each fraction is a SUPERSET of the previous (hash-bucket
  // prefix — the property that makes learning curves comparable). The
  // trick: sufficient statistics per hash-decile bucket, then cumulative
  // sums over the 10-row bucket grid give every fraction's EXACT moments
  // — ten model fits from one scan, no per-fraction sampling jobs.
  def q258LearningCurve(spark: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val base = Tables.lineitem(spark, dir).select(
      expr("cast(conv(substring(md5(concat('lc:', l_orderkey, ':', l_linenumber)), 1, 8), 16, 10) as bigint) % 10")
        .as("bucket"),
      expr("cast(cast(l_quantity as decimal(18,2)) * 100 as decimal(18,0))").as("x"),
      expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as decimal(18,0))").as("y"))
    val perBucket = base.groupBy(col("bucket"))
      .agg(count(lit(1)).cast(d38).as("n"),
        sum(col("x")).cast(d38).as("sx"), sum(col("y")).cast(d38).as("sy"),
        sum(col("x") * col("y")).cast(d38).as("sxy"),
        sum(col("x") * col("x")).cast(d38).as("sxx"),
        sum(col("y") * col("y")).cast(d38).as("syy"))
    val wCum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket
      .withColumn("cn", sum(col("n")).over(wCum).cast(d38))
      .withColumn("csx", sum(col("sx")).over(wCum).cast(d38))
      .withColumn("csy", sum(col("sy")).over(wCum).cast(d38))
      .withColumn("csxy", sum(col("sxy")).over(wCum).cast(d38))
      .withColumn("csxx", sum(col("sxx")).over(wCum).cast(d38))
      .withColumn("csyy", sum(col("syy")).over(wCum).cast(d38))
      .withColumn("a", (col("csxy") * col("cn") - col("csx") * col("csy")).cast("double"))
      .withColumn("b", (col("csxx") * col("cn") - col("csx") * col("csx")).cast("double"))
      .withColumn("c", (col("csyy") * col("cn") - col("csy") * col("csy")).cast("double"))
      .select(((col("bucket") + 1) * 10).cast("int").as("pct"),
        col("cn").cast("long").as("n"),
        Num.pround(col("a") / col("b"), 6).as("slope"),
        Num.pround(col("a") * col("a") / (col("b") * col("c")), 6).as("r2"))
      .orderBy(col("pct"))
  }

  val q258Sql: String =
    """WITH b AS (
      |  SELECT ('0x' || substr(md5('lc:' || l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR), 1, 8))::BIGINT % 10 AS bucket,
      |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS HUGEINT) AS x,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS HUGEINT) AS y
      |  FROM lineitem),
      |pb AS (
      |  SELECT bucket, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
      |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      |  FROM b GROUP BY 1),
      |cm AS (
      |  SELECT bucket,
      |    SUM(n) OVER w AS cn, SUM(sx) OVER w AS csx, SUM(sy) OVER w AS csy,
      |    SUM(sxy) OVER w AS csxy, SUM(sxx) OVER w AS csxx, SUM(syy) OVER w AS csyy
      |  FROM pb WINDOW w AS (ORDER BY bucket ROWS UNBOUNDED PRECEDING)),
      |d AS (
      |  SELECT bucket, cn,
      |    CAST(csxy * cn - csx * csy AS DOUBLE) AS a,
      |    CAST(csxx * cn - csx * csx AS DOUBLE) AS bb,
      |    CAST(csyy * cn - csy * csy AS DOUBLE) AS c
      |  FROM cm)
      |SELECT CAST((bucket + 1) * 10 AS INT) AS pct, CAST(cn AS BIGINT) AS n,
      |  FLOOR((a / bb) * 1e6 + 0.5) / 1e6 AS slope,
      |  FLOOR((a * a / (bb * c)) * 1e6 + 0.5) / 1e6 AS r2
      |FROM d ORDER BY pct""".stripMargin

  // --------------------------------------------------------------------------
  // q266 — V-OPTIMAL HISTOGRAM via dynamic programming on the bounded
  // value grid: the minimum-SSE 4-bucket histogram of l_quantity — the
  // construction query optimizers use for selectivity estimation, where
  // equi-width (q78) and equi-depth (q130) are heuristics. The corpus
  // collapses to per-value counts with prefix sums (W, S = Σv·n,
  // Q = Σv²·n — SSE(a..b) = Q − S²/W falls out of differences); the DP
  //   dp_k(v) = min_{s<v} dp_{k-1}(s) + SSE(s+1..v)
  // runs k−1 = 3 bounded rounds of 50×50 index-grid joins, and the
  // optimal boundaries come back by 3 argmin-backtrack joins. Rows never
  // enter the DP — at 100 TB the histogram build is one aggregate plus
  // constant-size planning.
  //
  // Determinism (§8.4 portability policy): the DP objective is EXACT
  // fixed-point BIGINT — sse_e4 = 10⁴·Q − (10⁴·S²) div W, a pure integer
  // floor-division identical in every engine — so the argmin and its
  // index tie-break (min-struct / row_number(cost, s)) can never flip on
  // a 1-ulp double difference (the round-7 driver flipped a split index
  // exactly that way). Magnitudes: at sf0.1, 10⁴·S² ≈ 2.3e18 < 2⁶³; a
  // 100 TB build would lift the same arithmetic to DECIMAL(38,0).
  def q266VOptimalHist(spark: SparkSession, dir: String): DataFrame = {
    val nBins = 4
    val grid = Tables.lineitem(spark, dir)
      .select(col("l_quantity").cast("int").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("n"))
      .withColumn("i", row_number().over(Window.orderBy(col("v"))))
    val wCum = Window.orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = grid
      .withColumn("cw", sum(col("n")).over(wCum))
      .withColumn("cs", sum(col("v") * col("n")).over(wCum))
      .withColumn("cq", sum(col("v").cast("long") * col("v") * col("n")).over(wCum))
      .select(col("i"), col("v"), col("n"), col("cw"), col("cs"), col("cq"))
    // sse_e4 of index range (a..b] from prefix rows a (exclusive) and b,
    // as an exact fixed-point long (named columns so `div` parses)
    val sseE4 = expr("10000L * (bq - aq) - (10000L * (bs - as_) * (bs - as_)) div (bw - aw)")
    val zero = pre.select(lit(0).as("i"), lit(0L).as("cw"), lit(0L).as("cs"),
      lit(0L).as("cq")).limit(1).unionByName(
      pre.select(col("i"), col("cw"), col("cs"), col("cq")))
    val ends = pre.select(col("i").as("e"), col("cw").as("bw"),
      col("cs").as("bs"), col("cq").as("bq"))
    // dp1(v) = sse(0..v]
    val dp = ends.join(zero.filter(col("i") === 0), ends("e") > col("i"))
      .withColumnsRenamed(Map("cw" -> "aw", "cs" -> "as_", "cq" -> "aq"))
      .select(col("e").as("v"), sseE4.as("cost"), lit(0).as("arg"))
    val dpByLevel = scala.collection.mutable.Map(1 -> dp)
    (2 to nBins).foreach { k =>
      val prev = dpByLevel(k - 1)
        .select(col("v").as("s"), col("cost").as("pcost"))
        .join(zero.select(col("i").as("s"), col("cw").as("aw"),
          col("cs").as("as_"), col("cq").as("aq")), Seq("s"))
      val cand = ends.join(prev, col("e") > col("s"))
        .withColumn("cost", col("pcost") + sseE4)
      val next = cand
        .groupBy(col("e").as("v"))
        .agg(min(struct(col("cost"), col("s"))).as("m"))
        .select(col("v"), col("m.cost").as("cost"), col("m.s").as("arg"))
      dpByLevel(k) = next
    }
    val top = pre.agg(max(col("i")).as("vmax"))
    // backtrack boundaries: s3 = arg(dp4, vmax); s2 = arg(dp3, s3); s1 = arg(dp2, s2)
    val s3 = dpByLevel(4).join(broadcast(top), col("v") === col("vmax"))
      .select(col("arg").as("s3"))
    val s2 = dpByLevel(3).join(broadcast(s3), col("v") === col("s3"))
      .select(col("arg").as("s2"), col("s3"))
    val s1 = dpByLevel(2).join(broadcast(s2), col("v") === col("s2"))
      .select(col("arg").as("s1"), col("s2"), col("s3"))
    val bounds = s1.crossJoin(broadcast(top))
      .select(explode(array(
        struct(lit(1).as("bin"), (col("s1") * 0).as("lo_i"), col("s1").as("hi_i")),
        struct(lit(2).as("bin"), col("s1").as("lo_i"), col("s2").as("hi_i")),
        struct(lit(3).as("bin"), col("s2").as("lo_i"), col("s3").as("hi_i")),
        struct(lit(4).as("bin"), col("s3").as("lo_i"), col("vmax").as("hi_i"))))
        .as("b"))
      .select(col("b.bin").as("bin"), col("b.lo_i").as("lo_i"), col("b.hi_i").as("hi_i"))
    bounds
      .join(zero.select(col("i").as("lo_i"), col("cw").as("aw"),
        col("cs").as("as_"), col("cq").as("aq")), Seq("lo_i"))
      .join(pre.select(col("i").as("hi_i"), col("v").as("hi_v"), col("cw").as("bw"),
        col("cs").as("bs"), col("cq").as("bq")), Seq("hi_i"))
      .join(pre.select(col("i").as("lo_idx"), col("v").as("lo_v")),
        col("lo_i") === col("lo_idx"), "left")
      .select(col("bin"),
        coalesce(col("lo_v") + 1, lit(1)).as("lo"), col("hi_v").as("hi"),
        (col("bw") - col("aw")).as("n"),
        sseE4.as("sse_e4"))
      .orderBy(col("bin"))
  }

  val q266Sql: String =
    """WITH g AS (
      |  SELECT CAST(l_quantity AS INT) AS v, COUNT(*) AS n FROM lineitem GROUP BY 1),
      |p0 AS (
      |  SELECT v, n, ROW_NUMBER() OVER (ORDER BY v) AS i FROM g),
      |pre AS (
      |  SELECT i, v, n,
      |    SUM(n) OVER w AS cw, SUM(v * n) OVER w AS cs,
      |    SUM(CAST(v AS BIGINT) * v * n) OVER w AS cq
      |  FROM p0 WINDOW w AS (ORDER BY i ROWS UNBOUNDED PRECEDING)),
      |z AS (
      |  SELECT 0 AS i, 0::BIGINT AS cw, 0::BIGINT AS cs, 0::BIGINT AS cq
      |  UNION ALL SELECT i, cw, cs, cq FROM pre),
      |dp1 AS (
      |  SELECT e.i AS v,
      |    10000 * e.cq - (10000 * e.cs * e.cs) // e.cw AS cost,
      |    0 AS arg
      |  FROM pre e),
      |dp2 AS (
      |  SELECT v, cost, arg FROM (
      |    SELECT e.i AS v,
      |      d.cost + (10000 * (e.cq - s.cq)
      |        - (10000 * (e.cs - s.cs) * (e.cs - s.cs)) // (e.cw - s.cw)) AS cost,
      |      s.i AS arg,
      |      ROW_NUMBER() OVER (PARTITION BY e.i ORDER BY
      |        d.cost + (10000 * (e.cq - s.cq)
      |          - (10000 * (e.cs - s.cs) * (e.cs - s.cs)) // (e.cw - s.cw)), s.i) AS rk
      |    FROM pre e JOIN dp1 d ON d.v < e.i JOIN z s ON s.i = d.v)
      |  WHERE rk = 1),
      |dp3 AS (
      |  SELECT v, cost, arg FROM (
      |    SELECT e.i AS v,
      |      d.cost + (10000 * (e.cq - s.cq)
      |        - (10000 * (e.cs - s.cs) * (e.cs - s.cs)) // (e.cw - s.cw)) AS cost,
      |      s.i AS arg,
      |      ROW_NUMBER() OVER (PARTITION BY e.i ORDER BY
      |        d.cost + (10000 * (e.cq - s.cq)
      |          - (10000 * (e.cs - s.cs) * (e.cs - s.cs)) // (e.cw - s.cw)), s.i) AS rk
      |    FROM pre e JOIN dp2 d ON d.v < e.i JOIN z s ON s.i = d.v)
      |  WHERE rk = 1),
      |dp4 AS (
      |  SELECT v, cost, arg FROM (
      |    SELECT e.i AS v,
      |      d.cost + (10000 * (e.cq - s.cq)
      |        - (10000 * (e.cs - s.cs) * (e.cs - s.cs)) // (e.cw - s.cw)) AS cost,
      |      s.i AS arg,
      |      ROW_NUMBER() OVER (PARTITION BY e.i ORDER BY
      |        d.cost + (10000 * (e.cq - s.cq)
      |          - (10000 * (e.cs - s.cs) * (e.cs - s.cs)) // (e.cw - s.cw)), s.i) AS rk
      |    FROM pre e JOIN dp3 d ON d.v < e.i JOIN z s ON s.i = d.v)
      |  WHERE rk = 1),
      |vm AS (SELECT MAX(i) AS vmax FROM pre),
      |b3 AS (SELECT arg AS s3 FROM dp4, vm WHERE v = vmax),
      |b2 AS (SELECT dp3.arg AS s2, s3 FROM dp3, b3 WHERE dp3.v = s3),
      |b1 AS (SELECT dp2.arg AS s1, s2, s3 FROM dp2, b2 WHERE dp2.v = s2),
      |bounds AS (
      |  SELECT 1 AS bin, 0 AS lo_i, s1 AS hi_i FROM b1, vm
      |  UNION ALL SELECT 2, s1, s2 FROM b1, vm
      |  UNION ALL SELECT 3, s2, s3 FROM b1, vm
      |  UNION ALL SELECT 4, s3, vmax FROM b1, vm)
      |SELECT bin,
      |  COALESCE(lp.v + 1, 1) AS lo, hp.v AS hi,
      |  CAST(hp.cw - a.cw AS BIGINT) AS n,
      |  CAST(10000 * (hp.cq - a.cq)
      |    - (10000 * (hp.cs - a.cs) * (hp.cs - a.cs)) // (hp.cw - a.cw)
      |    AS BIGINT) AS sse_e4
      |FROM bounds
      |JOIN z a ON a.i = bounds.lo_i
      |JOIN pre hp ON hp.i = bounds.hi_i
      |LEFT JOIN pre lp ON lp.i = bounds.lo_i
      |ORDER BY bin""".stripMargin

  // --------------------------------------------------------------------------
  // q274 — HIVE-STYLE PARTITION PRUNING end-to-end: stage orders
  // partitioned BY PRIORITY on disk (directory-keyed layout —
  // `partitionBy` at write time), then read ONE priority back. The
  // filter resolves against the directory keys, so 4/5 of the files are
  // never opened — the layout decision that turns a 100 TB scan into a
  // 20 TB one before a single row is read. Round7bOpsSpec pins the plan
  // evidence (PartitionFilters on the scan node + a pruned file count);
  // the oracle checks the VALUES the pruned read produced.
  def q274PartitionPruning(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.orders(spark, dir)
    val slot = Staging.ensure("q274_part", dir) { path =>
      src.write.mode("overwrite")
        .partitionBy("o_orderpriority").parquet(path)
    }
    // the source schema rides along: a 0-row source stages ZERO partition
    // directories, and a schema-less read of that empty layout cannot
    // infer parquet schema — with the explicit schema it is an empty scan
    prunedRead(spark, slot, Some(src.schema))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), Num.moneySum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  /** The pruned scan itself (spec asserts its plan's PartitionFilters). */
  private[ops] def prunedRead(spark: SparkSession, slot: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read
    schema.foreach(r.schema)
    r.parquet(slot).filter(col("o_orderpriority") === "1-URGENT")
  }

  val q274Sql: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders WHERE o_orderpriority = '1-URGENT'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // q276 — LAYOUT EFFECTIVENESS A/B: does the q142 Z-order layout
  // actually beat time-clustering for THIS workload? Every row gets its
  // block id under BOTH layouts (z-block = top 10 interleave bits;
  // natural block = order week), and a bounded probe workload (5 point
  // customer lookups + 5 week scans) counts how many blocks each layout
  // would open per query — the data-skipping readout that justifies (or
  // kills) a re-layout job before anyone runs it. Z-order should win the
  // point lookups and lose the pure time scans: the tradeoff, measured.
  //
  // All integer arithmetic (the q142 normalize + interleave, div-based
  // blocks, data-derived probe values); counts are exact.
  def q276LayoutEffectiveness(spark: SparkSession, dir: String): DataFrame = {
    val b = Tables.orders(spark, dir)
      .select(col("o_custkey").cast("long").as("x"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01")).cast("long").as("y"))
    val bounds = b.agg(
      greatest(max(col("x")), lit(1L)).as("mx"),
      greatest(max(col("y")), lit(1L)).as("my"))
    val rows = b.crossJoin(broadcast(bounds))
      .withColumn("xs", expr("(x * 65535) div mx"))
      .withColumn("ys", expr("(y * 65535) div my"))
      .withColumn("zblk", expr(
        s"(${zInterleave((c, bb, k) => s"shiftleft(shiftright(${c}s, $bb) & 1, $k)")}) div 4194304"))
      .withColumn("natblk", expr("y div 7"))
    val idx = explode(sequence(lit(1), lit(5)))
    val pointProbes = spark.range(1).select(idx.as("i"))
      .crossJoin(broadcast(bounds))
      .select(col("i"), expr("(mx * i) div 6").as("px"))
    val weekProbes = spark.range(1).select(idx.as("i"))
      .crossJoin(broadcast(bounds))
      .select(col("i"), expr("((my div 7) * i) div 6").as("pw"))
    val point = rows.join(broadcast(pointProbes), col("x") === col("px"))
      .groupBy(col("i")).agg(count(lit(1)).as("n_rows"),
        countDistinct(col("zblk")).as("blocks_zorder"),
        countDistinct(col("natblk")).as("blocks_natural"))
      .select(lit("point_customer").as("probe"), col("i"), col("n_rows"),
        col("blocks_zorder"), col("blocks_natural"))
    val week = rows.join(broadcast(weekProbes), expr("y div 7") === col("pw"))
      .groupBy(col("i")).agg(count(lit(1)).as("n_rows"),
        countDistinct(col("zblk")).as("blocks_zorder"),
        countDistinct(col("natblk")).as("blocks_natural"))
      .select(lit("week_range").as("probe"), col("i"), col("n_rows"),
        col("blocks_zorder"), col("blocks_natural"))
    point.unionByName(week).orderBy(col("probe"), col("i"))
  }

  val q276Sql: String = {
    val z = zInterleave((c, bb, k) => s"((($c >> $bb) & 1) << $k)")
    val zs = z.replace("(x ", "(xs ").replace("(y ", "(ys ")
    s"""WITH b AS (
       |  SELECT CAST(o_custkey AS BIGINT) AS x,
       |    CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS y
       |  FROM orders),
       |bd AS (SELECT GREATEST(MAX(x), 1) AS mx, GREATEST(MAX(y), 1) AS my FROM b),
       |r AS (
       |  SELECT x, y, ($zs) // 4194304 AS zblk, y // 7 AS natblk FROM (
       |    SELECT x, y, (x * 65535) // mx AS xs, (y * 65535) // my AS ys
       |    FROM b, bd)),
       |pp AS (SELECT i, (mx * i) // 6 AS px FROM bd,
       |  (SELECT unnest(range(1, 6)) AS i) g),
       |wp AS (SELECT i, ((my // 7) * i) // 6 AS pw FROM bd,
       |  (SELECT unnest(range(1, 6)) AS i) g),
       |point AS (
       |  SELECT 'point_customer' AS probe, i, COUNT(*) AS n_rows,
       |    CAST(COUNT(DISTINCT zblk) AS BIGINT) AS blocks_zorder,
       |    CAST(COUNT(DISTINCT natblk) AS BIGINT) AS blocks_natural
       |  FROM r JOIN pp ON x = px GROUP BY 2),
       |week AS (
       |  SELECT 'week_range' AS probe, i, COUNT(*) AS n_rows,
       |    CAST(COUNT(DISTINCT zblk) AS BIGINT) AS blocks_zorder,
       |    CAST(COUNT(DISTINCT natblk) AS BIGINT) AS blocks_natural
       |  FROM r JOIN wp ON y // 7 = pw GROUP BY 2)
       |SELECT probe, CAST(i AS INT) AS i, n_rows, blocks_zorder, blocks_natural
       |FROM (SELECT * FROM point UNION ALL SELECT * FROM week)
       |ORDER BY probe, i""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q277 — JOIN CARDINALITY ESTIMATION AUDIT: how good would a System-R
  // style histogram estimate of |orders ⋈ lineitem| be on this data?
  // Both sides bucket on the join key (256 range buckets); the classic
  // per-bucket estimate n_A·n_B / max(V_A, V_B) (containment-of-values
  // assumption) is compared against the TRUE per-bucket join count, and
  // the summary q-error = max(est/true, true/est) is the number a CBO
  // engineer tracks. Everything is exact integers until the per-bucket
  // division; totals fold in pinned bucket order.
  //
  // Output: the 8 worst-estimated buckets (by |log-ish| q-error, rank
  // deterministic) + a TOTAL row — small, auditable, hash-stable.
  def q277JoinEstimate(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_orderkey").as("k"))
    val l = Tables.lineitem(spark, dir).select(col("l_orderkey").as("k"))
    val mx = o.agg(greatest(max(col("k")), lit(1L)).as("mx"))
    def bucketed(t: DataFrame): DataFrame = t.crossJoin(broadcast(mx))
      .withColumn("b", expr("k div (mx div 256 + 1)"))
    val sa = bucketed(o).groupBy(col("b"))
      .agg(count(lit(1)).as("na"), countDistinct(col("k")).as("va"))
    val sb = bucketed(l).groupBy(col("b"))
      .agg(count(lit(1)).as("nb"), countDistinct(col("k")).as("vb"))
    val truth = bucketed(o.join(l, Seq("k")).select(col("k")))
      .groupBy(col("b")).agg(count(lit(1)).as("true_rows"))
    val per = sa.join(sb, Seq("b"), "full_outer")
      .join(truth, Seq("b"), "full_outer")
      .select(col("b"),
        coalesce(col("na"), lit(0L)).as("na"), coalesce(col("nb"), lit(0L)).as("nb"),
        coalesce(col("va"), lit(0L)).as("va"), coalesce(col("vb"), lit(0L)).as("vb"),
        coalesce(col("true_rows"), lit(0L)).as("true_rows"))
      .withColumn("est",
        when(greatest(col("va"), col("vb")) > 0,
          (col("na") * col("nb")).cast("double") /
            greatest(col("va"), col("vb")).cast("double")).otherwise(lit(0.0)))
      .withColumn("qerr",
        when(col("true_rows") > 0 && col("est") > 0.0,
          greatest(col("est") / col("true_rows"), col("true_rows") / col("est")))
          .otherwise(lit(0.0)))
    val worst = per
      .withColumn("rk", row_number().over(
        Window.orderBy(col("qerr").desc, col("b"))))
      .filter(col("rk") <= 8)
      .select(concat(lit("bucket_"), col("b")).as("scope"),
        col("true_rows"), Num.pround(col("est"), 2).as("est_rows"),
        Num.pround(col("qerr"), 4).as("q_error"))
    val tot = per.agg(sum(col("true_rows")).as("true_rows"),
      expr("aggregate(sort_array(collect_list(struct(b, est))), cast(0 as double), (a, x) -> a + x.est)")
        .as("est_sum"))
      .select(lit("TOTAL").as("scope"), col("true_rows"),
        Num.pround(col("est_sum"), 2).as("est_rows"),
        Num.pround(greatest(col("est_sum") / col("true_rows"),
          col("true_rows") / col("est_sum")), 4).as("q_error"))
    worst.unionByName(tot).orderBy(col("scope"))
  }

  val q277Sql: String =
    """WITH mx AS (SELECT GREATEST(MAX(o_orderkey), 1) AS mx FROM orders),
      |oa AS (
      |  SELECT o_orderkey // (mx // 256 + 1) AS b, COUNT(*) AS na,
      |    COUNT(DISTINCT o_orderkey) AS va
      |  FROM orders, mx GROUP BY 1),
      |lb AS (
      |  SELECT l_orderkey // (mx // 256 + 1) AS b, COUNT(*) AS nb,
      |    COUNT(DISTINCT l_orderkey) AS vb
      |  FROM lineitem, mx GROUP BY 1),
      |tr AS (
      |  SELECT o_orderkey // (mx // 256 + 1) AS b, COUNT(*) AS true_rows
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey, mx GROUP BY 1),
      |per AS (
      |  SELECT COALESCE(oa.b, lb.b, tr.b) AS b,
      |    COALESCE(na, 0) AS na, COALESCE(nb, 0) AS nb,
      |    COALESCE(va, 0) AS va, COALESCE(vb, 0) AS vb,
      |    COALESCE(true_rows, 0) AS true_rows
      |  FROM oa FULL OUTER JOIN lb ON oa.b = lb.b
      |  FULL OUTER JOIN tr ON COALESCE(oa.b, lb.b) = tr.b),
      |est AS (
      |  SELECT b, true_rows,
      |    CASE WHEN GREATEST(va, vb) > 0
      |      THEN CAST(na * nb AS DOUBLE) / CAST(GREATEST(va, vb) AS DOUBLE)
      |      ELSE 0.0 END AS est
      |  FROM per),
      |q AS (
      |  SELECT b, true_rows, est,
      |    CASE WHEN true_rows > 0 AND est > 0.0
      |      THEN GREATEST(est / true_rows, true_rows / est) ELSE 0.0 END AS qerr
      |  FROM est),
      |worst AS (
      |  SELECT 'bucket_' || b::VARCHAR AS scope, true_rows,
      |    FLOOR((est) * 1e2 + 0.5) / 1e2 AS est_rows, FLOOR((qerr) * 1e4 + 0.5) / 1e4 AS q_error
      |  FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY qerr DESC, b) AS rk FROM q)
      |  WHERE rk <= 8),
      |tot AS (
      |  SELECT 'TOTAL' AS scope, CAST(SUM(true_rows) AS BIGINT) AS true_rows,
      |    FLOOR((list_reduce(list(est ORDER BY b), (x, y) -> x + y)) * 1e2 + 0.5) / 1e2 AS est_rows,
      |    FLOOR((GREATEST(
      |      list_reduce(list(est ORDER BY b), (x, y) -> x + y) / SUM(true_rows),
      |      SUM(true_rows) / list_reduce(list(est ORDER BY b), (x, y) -> x + y)))
      |      * 1e4 + 0.5) / 1e4 AS q_error
      |  FROM q)
      |SELECT * FROM worst UNION ALL SELECT * FROM tot ORDER BY scope""".stripMargin

  // --------------------------------------------------------------------------
  // q275 — PARTIAL TOP-K PER GROUP: q07's window rank shuffles EVERY row
  // to its group's partition; at 100 TB the winning plan prunes first —
  // each input partition keeps only its own top-3 per customer (bounded
  // in-task heap, the combiner step Spark's window operator lacks), so
  // the shuffle carries ≤ 3·partitions rows per key instead of all of
  // them, and the final exact rank runs over candidates only. Pruning is
  // lossless by a dominance argument (any global top-3 row is top-3 in
  // its own partition), which the shared q07 oracle verifies by hash.
  def q275PartialTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // null-KEY contract: this entry shares q07's oracle, and SQL window
    // semantics give a NULL key its own partition — so null-key rows
    // must SURVIVE the primitive-Long typed boundary. Sentinel-encode
    // null as Long.MinValue across the combiner (custkeys are positive)
    // and decode after; the group stays intact and ranks like any other.
    val pruned = Tables.orders(spark, dir)
      .select(coalesce(col("o_custkey"), lit(Long.MinValue)).as("o_custkey"),
        col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Long, Double)]
      .mapPartitions { it =>
        // dequeues the WORST row under (price desc, key asc) ranking
        val worstFirst: Ordering[(Double, Long)] =
          Ordering.by { case (p, k) => (-p, k) }
        val m = scala.collection.mutable.Map
          .empty[Long, scala.collection.mutable.PriorityQueue[(Double, Long)]]
        it.foreach { case (c, o, p) =>
          val q = m.getOrElseUpdate(c,
            scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst))
          q.enqueue((p, o))
          if (q.size > 3) q.dequeue()
        }
        m.iterator.flatMap { case (c, q) =>
          q.iterator.map { case (p, o) => (c, o, p) }
        }
      }.toDF("o_custkey", "o_orderkey", "o_totalprice")
      .withColumn("o_custkey", when(col("o_custkey") === Long.MinValue, lit(null))
        .otherwise(col("o_custkey")))
    pruned
      .withColumn("rn", row_number().over(Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  // ═════════════════ formerly Round8Ops (consolidated round 10) ═════════════════

  // --------------------------------------------------------------------------
  // q281 — SCD TYPE-2 DIMENSION HISTORY from a change log: collapse each
  // user's event stream to value-CHANGE rows, then version them with
  // [effective_from, effective_to) validity ranges and an is_current
  // flag — the slowly-changing-dimension build every warehouse runs on
  // top of CDC feeds (q200 captures the deltas; this materializes the
  // queryable history).
  //
  // Scale: two windows partitioned by user_id (one shuffle, reused by
  // both via the same partitioning) — no global ordering anywhere.
  // Determinism: money rides as exact cents; ordering is the (ts,
  // event_id) total order; validity bounds are integer epoch-micros.
  def q281Scd2History(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("cast(floor(value * 100 + 0.5d) as bigint)").as("cents"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val changes = ev
      .withColumn("prev", lag(col("cents"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("cents"))
    val wv = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    changes
      .withColumn("version", row_number().over(wv))
      .withColumn("eff_from_us", expr("unix_micros(ts)"))
      .withColumn("eff_to_us", lead(expr("unix_micros(ts)"), 1).over(wv))
      .select(col("user_id"), col("version"), col("cents"),
        col("eff_from_us"), col("eff_to_us"),
        col("eff_to_us").isNull.as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  val q281Sql: String =
    """WITH e AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events),
      |c AS (
      |  SELECT *, LAG(cents) OVER w AS prev FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |f AS (SELECT user_id, ts, event_id, cents FROM c
      |      WHERE prev IS NULL OR prev != cents),
      |v AS (
      |  SELECT user_id, cents,
      |    CAST(ROW_NUMBER() OVER w AS INT) AS version,
      |    epoch_us(ts) AS eff_from_us,
      |    LEAD(epoch_us(ts)) OVER w AS eff_to_us
      |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, version, cents, eff_from_us, eff_to_us,
      |  eff_to_us IS NULL AS is_current
      |FROM v ORDER BY user_id, version""".stripMargin


  // ═════════════════ formerly Round8cOps (consolidated round 10) ═════════════════

  // --------------------------------------------------------------------------
  // q296 — AS-OF DIMENSION ENRICHMENT: join each purchase event to the
  // SCD2 version (q281's history) that was CURRENT at event time —
  // effective_from ≤ ts < effective_to — the "fact joined to the
  // dimension as it looked then" semantics every warehouse needs the
  // moment a dimension changes (joining today's attributes to last
  // year's facts misattributes everything). Reports events per (user,
  // version) with the version's exact cents value.
  //
  // Scale: equi-join on user_id with the validity range as a residual
  // predicate — one co-partitioned shuffle; at most one version matches
  // per event by construction (validity ranges partition time).
  def q296AsofEnrich(spark: SparkSession, dir: String): DataFrame = {
    val hist = q281ScdHistoryFor(spark, dir)
    val facts = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_micros(ts)").as("us"))
    facts.join(hist, Seq("user_id"))
      .filter(col("us") >= col("eff_from_us") &&
        (col("eff_to_us").isNull || col("us") < col("eff_to_us")))
      .groupBy(col("user_id"), col("version"), col("cents"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("user_id"), col("version"))
  }

  /** q281's SCD2 history, rebuilt here for the enrichment join. */
  private def q281ScdHistoryFor(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("cast(floor(value * 100 + 0.5d) as bigint)").as("cents"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val changes = ev
      .withColumn("prev", lag(col("cents"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("cents"))
    changes
      .withColumn("version", row_number().over(w))
      .withColumn("eff_from_us", expr("unix_micros(ts)"))
      .withColumn("eff_to_us", lead(expr("unix_micros(ts)"), 1).over(w))
      .select(col("user_id"), col("version"), col("cents"),
        col("eff_from_us"), col("eff_to_us"))
  }

  val q296Sql: String =
    """WITH e AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events),
      |c AS (
      |  SELECT *, LAG(cents) OVER w AS prev FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |f AS (SELECT user_id, ts, event_id, cents FROM c
      |      WHERE prev IS NULL OR prev != cents),
      |v AS (
      |  SELECT user_id, cents,
      |    CAST(ROW_NUMBER() OVER w AS INT) AS version,
      |    epoch_us(ts) AS eff_from_us,
      |    LEAD(epoch_us(ts)) OVER w AS eff_to_us
      |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |fact AS (
      |  SELECT user_id, epoch_us(ts) AS us FROM events
      |  WHERE event_type = 'purchase')
      |SELECT fact.user_id, version, cents, COUNT(*) AS n_events
      |FROM fact JOIN v ON v.user_id = fact.user_id
      |  AND us >= eff_from_us AND (eff_to_us IS NULL OR us < eff_to_us)
      |GROUP BY 1, 2, 3 ORDER BY fact.user_id, version""".stripMargin

  // --------------------------------------------------------------------------
  // q297 — HIERARCHICAL SHARE-OF-PARENT: revenue by nation with each
  // nation's exact ppm share of its region and each region's share of
  // the total — the drill-down readout every BI rollup renders next to
  // the raw numbers (q14's ROLLUP gives the totals; this gives the
  // RATIOS, integer-exact).
  //
  // Scale: fact aggregate to |nations| rows, two broadcast dimension
  // joins, shares on the bounded grid. Determinism: revenue rides as
  // exact cents; shares are BIGINT ppm floor-divisions.
  def q297ShareOfParent(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(expr("cast(sum(cast(o_totalprice as decimal(18,2))) * 100 as bigint)")
        .as("cents"))
    val dim = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .join(Tables.region(spark, dir)
        .select(col("r_regionkey"), col("r_name")),
        col("n_regionkey") === col("r_regionkey"))
    val wReg = Window.partitionBy(col("r_name"))
    val total = rev.agg(sum(col("cents")).as("total_cents"))
    rev.join(broadcast(dim), col("nationkey") === col("n_nationkey"))
      .withColumn("region_cents", sum(col("cents")).over(wReg))
      .crossJoin(broadcast(total))
      .select(col("r_name").as("region"), col("n_name").as("nation"),
        col("cents"),
        expr("(1000000L * cents) div region_cents").as("share_of_region_ppm"),
        expr("(1000000L * region_cents) div total_cents").as("region_share_ppm"))
      .orderBy(col("region"), col("nation"))
  }

  val q297Sql: String =
    """WITH rev AS (
      |  SELECT c_nationkey AS nationkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1),
      |j AS (
      |  SELECT r_name AS region, n_name AS nation, cents
      |  FROM rev
      |  JOIN nation ON n_nationkey = nationkey
      |  JOIN region ON r_regionkey = n_regionkey),
      |w AS (
      |  SELECT region, nation, cents,
      |    SUM(cents) OVER (PARTITION BY region) AS region_cents,
      |    SUM(cents) OVER () AS total_cents
      |  FROM j)
      |SELECT region, nation, cents,
      |  CAST((1000000 * cents) // region_cents AS BIGINT) AS share_of_region_ppm,
      |  CAST((1000000 * region_cents) // total_cents AS BIGINT) AS region_share_ppm
      |FROM w ORDER BY region, nation""".stripMargin

  // --------------------------------------------------------------------------
  // q298 — EXACT PERCENTILE BANDS PER GROUP (nearest-rank P50/P90/P99):
  // the SLA-style latency table, computed as exact order statistics —
  // q28 pins the INTERPOLATED percentile parity, q130 builds equi-depth
  // buckets; this reports the ceil(p·n)-th smallest exact value per
  // group, the definition SLO dashboards quote.
  //
  // Scale: the corpus collapses to the (group, cent-value) grid in one
  // aggregate; the cumulative scan is a window over the bounded VALUE
  // domain partitioned by group — never a corpus-sized task.
  // Determinism: everything is integer counts and exact cents; the
  // nearest-rank pick is min value with cum ≥ ceil(p·n) via exact
  // integer comparison (100·cum ≥ p·n avoids any float rank).
  def q298PercentileBands(spark: SparkSession, dir: String): DataFrame = {
    val grid = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("cast(floor(value * 100 + 0.5d) as bigint)").as("c"))
      .groupBy(col("event_type"), col("c")).agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("event_type"))))
    def pick(p: Int) = min(when(col("cum") * 100 >= col("n") * p, col("c")))
    cum.groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        pick(50).as("p50_cents"), pick(90).as("p90_cents"), pick(99).as("p99_cents"))
      .orderBy(col("event_type"))
  }

  val q298Sql: String =
    """WITH g AS (
      |  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c,
      |    COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, c, cnt,
      |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY c
      |      ROWS UNBOUNDED PRECEDING) AS cum,
      |    SUM(cnt) OVER (PARTITION BY event_type) AS n
      |  FROM g)
      |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
      |  CAST(MIN(CASE WHEN cum * 100 >= n * 50 THEN c END) AS BIGINT) AS p50_cents,
      |  CAST(MIN(CASE WHEN cum * 100 >= n * 90 THEN c END) AS BIGINT) AS p90_cents,
      |  CAST(MIN(CASE WHEN cum * 100 >= n * 99 THEN c END) AS BIGINT) AS p99_cents
      |FROM m GROUP BY event_type ORDER BY event_type""".stripMargin


  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q234_groupwise_ols", q234GroupwiseOls _, Some(q234Sql)),
    ("q236_gini", q236Gini _, Some(q236Sql)),
    ("q240_cv_ols", q240CvOls _, Some(q240Sql)),
    ("q243_merkle_diff", q243MerkleDiff _, Some(q243Sql)),
    ("q253_cascade_delete", q253CascadeDelete _, Some(q253Sql)),
    ("q258_learning_curve", q258LearningCurve _, Some(q258Sql)),
    ("q266_voptimal_hist", q266VOptimalHist _, Some(q266Sql)),
    ("q274_partition_pruning", q274PartitionPruning _, Some(q274Sql)),
    // same oracle as q07: the partial path must reproduce the exact
    // window-rank result (per-partition pruning has no false negatives)
    ("q275_partial_topk", q275PartialTopk _, Some(Relational.q07Sql)),
    ("q276_layout_effectiveness", q276LayoutEffectiveness _, Some(q276Sql)),
    ("q277_join_estimate", q277JoinEstimate _, Some(q277Sql)),
    ("q214_cbo_stats", q214CboStats _, Some(q214Sql)),
    ("q219_schema_evolution", q219SchemaEvolution _, Some(q219Sql)),
    ("q53_date_spine", q53DateSpine _, Some(q53Sql)),
    ("q142_zorder_layout", q142ZOrder _, Some(q142Sql)),
    ("q143_incremental_mv", q143IncrementalMv _, Some(q143Sql)),
    ("q189_incremental_stats", q189IncrementalStats _, Some(q189Sql)),
    ("q135_table_diff", q135TableDiff _, Some(q135Sql)),
    ("q196_cdc_apply", q196CdcApply _, Some(q196Sql)),
    ("q151_benford", q151Benford _, Some(q151Sql)),
    ("q156_forget_user", q156ForgetUser _, Some(q156Sql)),
    ("q158_rfm_segments", q158RfmSegments _, Some(q158Sql)),
    ("q163_fk_audit", q163FkAudit _, Some(q163Sql)),
    ("q164_skyline", q164Skyline _, Some(q164Sql)),
    ("q136_mad_outliers", q136MadOutliers _, Some(q136Sql)),
    ("q125_winsorize", q125Winsorize _, Some(q125Sql)),
    ("q128_binned_range_join", q128BinnedRangeJoin _, Some(q128Sql)),
    ("q130_equidepth_hist", q130EquiDepthHist _, Some(q130Sql)),
    ("q117_weighted_median", q117WeightedMedian _, Some(q117Sql)),
    ("q118_ks_test", q118KsTest _, Some(q118Sql)),
    ("q119_association", q119Association _, Some(q119Sql)),
    ("q76_stats", q76Stats _, Some(q76Sql)),
    ("q78_histogram", q78Histogram _, Some(q78Sql)),
    ("q67_merge_upsert", q67MergeUpsert _, Some(q67Sql)),
    ("q68_argmax", q68ArgMax _, Some(q68Sql)),
    ("q69_union_by_name", q69UnionByName _, Some(q69Sql)),
    ("q91_zscore_outliers", q91Zscore _, Some(q91Sql)),
    ("q92_impute", q92Impute _, Some(q92Sql)),
    ("q93_scd2", q93Scd2 _, Some(q93Sql)),
    ("q94_forward_fill", q94ForwardFill _, Some(q94Sql)),
    ("q96_asof_custom", q96AsofCustom _, Some(Relational.q21Sql)),
    ("q101_string_agg", q101StringAgg _, Some(q101Sql)),
    ("q102_mode", q102Mode _, Some(q102Sql)),
    // formerly Round8Ops / Round8cOps
    ("q281_scd2_history", q281Scd2History _, Some(q281Sql)),
    ("q296_asof_enrich", q296AsofEnrich _, Some(q296Sql)),
    ("q297_share_of_parent", q297ShareOfParent _, Some(q297Sql)),
    ("q298_percentile_bands", q298PercentileBands _, Some(q298Sql)))
}
