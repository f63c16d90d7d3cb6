package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 forty-ninth operator batch: LTV cohort triangle and growth
  * accounting — the two CRM staples every revenue review opens with,
  * on the §8.4 exact-integer discipline.
  */
object Round8awOps {

  // --------------------------------------------------------------------------
  // q403 — LTV COHORT TRIANGLE: customers cohort by first-order month
  // (integer month index — (year−1990)·12 + month, no date library
  // semantics to diverge), and each cohort's CUMULATIVE revenue per
  // customer unrolls by age — the triangle whose flattening curves
  // justify (or kill) acquisition spend. Cumulative sums run per
  // cohort over the ≤~25-row age axis; observed-age sparsity is kept
  // (a cohort silent at age a simply has no row — the cum picks up at
  // the next purchase). q131 tracks activity retention; this tracks
  // the MONEY.
  //
  // Scale: one per-(customer, month) aggregate, a broadcast cohort
  // dimension, cum windows partitioned by cohort over the month grid.
  def ltvTriangle(orders: DataFrame): DataFrame = {
    val om = orders.select(col("o_custkey").cast("long").as("ck"),
      expr("(year(to_date(o_orderdate)) - 1990) * 12 + month(to_date(o_orderdate))")
        .cast("long").as("m"),
      expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").as("cents"))
    val perCm = om.groupBy(col("ck"), col("m"))
      .agg(sum(col("cents")).as("rev")).localCheckpoint()
    val cohort = perCm.groupBy(col("ck")).agg(min(col("m")).as("cm"))
    val sized = cohort.groupBy(col("cm")).agg(count(lit(1)).as("cohort_n"))
    val aged = perCm.join(cohort, Seq("ck"))
      .select(col("cm"), (col("m") - col("cm")).as("age"), col("rev"))
      .groupBy(col("cm"), col("age"))
      .agg(sum(col("rev")).as("rev"), count(lit(1)).as("active_customers"))
    aged
      .withColumn("cum_rev", sum(col("rev")).over(
        Window.partitionBy(col("cm")).orderBy(col("age"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .join(broadcast(sized), Seq("cm"))
      .select(col("cm").as("cohort_month"), col("age"),
        col("active_customers"), col("cohort_n"),
        col("cum_rev").as("cum_rev_cents"),
        expr("cum_rev div cohort_n").as("cum_rev_per_cust_cents"))
      .orderBy(col("cohort_month"), col("age"))
  }

  def q403LtvTriangle(spark: SparkSession, dir: String): DataFrame =
    ltvTriangle(Tables.orders(spark, dir))

  val q403Sql: String =
    """WITH om AS (
      |  SELECT CAST(o_custkey AS BIGINT) AS ck,
      |    (year(CAST(o_orderdate AS DATE)) - 1990) * 12
      |      + month(CAST(o_orderdate AS DATE)) AS m,
      |    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders),
      |percm AS (SELECT ck, m, SUM(cents) AS rev FROM om GROUP BY 1, 2),
      |cohort AS (SELECT ck, MIN(m) AS cm FROM percm GROUP BY 1),
      |sized AS (SELECT cm, COUNT(*) AS cohort_n FROM cohort GROUP BY 1),
      |aged AS (
      |  SELECT cm, m - cm AS age, SUM(rev) AS rev,
      |    COUNT(*) AS active_customers
      |  FROM percm JOIN cohort USING (ck) GROUP BY 1, 2),
      |cum AS (
      |  SELECT cm, age, active_customers,
      |    SUM(rev) OVER (PARTITION BY cm ORDER BY age
      |      ROWS UNBOUNDED PRECEDING) AS cum_rev
      |  FROM aged)
      |SELECT CAST(cm AS BIGINT) AS cohort_month, CAST(age AS BIGINT) AS age,
      |  active_customers, CAST(cohort_n AS BIGINT) AS cohort_n,
      |  CAST(cum_rev AS BIGINT) AS cum_rev_cents,
      |  CAST(cum_rev // cohort_n AS BIGINT) AS cum_rev_per_cust_cents
      |FROM cum JOIN sized USING (cm)
      |ORDER BY cohort_month, age""".stripMargin

  // --------------------------------------------------------------------------
  // q404 — GROWTH ACCOUNTING: each month's active customers decompose
  // EXACTLY into new (first month), retained (also active last month)
  // and resurrected (active before, silent last month); churned is
  // last month's actives who went silent. The additivity
  // new + retained + resurrected = active holds by construction —
  // the invariant every hand-built growth deck eventually violates.
  //
  // Scale: one distinct (customer, month) aggregate, one self-join on
  // (customer, month−1), one first-month join, a month-grid lag.
  def growthAccounting(orders: DataFrame): DataFrame = {
    val am = orders.select(col("o_custkey").cast("long").as("ck"),
        expr("(year(to_date(o_orderdate)) - 1990) * 12 + month(to_date(o_orderdate))")
          .cast("long").as("m"))
      .distinct().localCheckpoint()
    val first = am.groupBy(col("ck")).agg(min(col("m")).as("fm"))
    val flagged = am
      .join(am.select(col("ck"), (col("m") + 1L).as("m"))
        .withColumn("was_prev", lit(1L)), Seq("ck", "m"), "left")
      .join(first, Seq("ck"))
      .select(col("m"),
        when(col("fm") === col("m"), 1L).otherwise(0L).as("is_new"),
        coalesce(col("was_prev"), lit(0L)).as("was_prev"))
    val monthly = flagged.groupBy(col("m"))
      .agg(count(lit(1)).as("active"),
        sum(col("is_new")).as("new_custs"),
        sum(when(col("is_new") === 0L, col("was_prev")).otherwise(0L))
          .as("retained"),
        sum(when(col("is_new") === 0L && col("was_prev") === 0L, 1L)
          .otherwise(0L)).as("resurrected"))
    monthly
      .withColumn("prev_active",
        coalesce(lag(col("active"), 1).over(Window.orderBy(col("m"))),
          lit(0L)))
      .select(col("m").as("month"), col("active"), col("new_custs"),
        col("retained"), col("resurrected"),
        (col("prev_active") - col("retained")).as("churned"))
      .orderBy(col("month"))
  }

  def q404GrowthAccounting(spark: SparkSession, dir: String): DataFrame =
    growthAccounting(Tables.orders(spark, dir))

  val q404Sql: String =
    """WITH am AS (
      |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS ck,
      |    (year(CAST(o_orderdate AS DATE)) - 1990) * 12
      |      + month(CAST(o_orderdate AS DATE)) AS m
      |  FROM orders),
      |first_ AS (SELECT ck, MIN(m) AS fm FROM am GROUP BY 1),
      |flagged AS (
      |  SELECT a.m,
      |    CASE WHEN f.fm = a.m THEN 1 ELSE 0 END AS is_new,
      |    CASE WHEN p.ck IS NULL THEN 0 ELSE 1 END AS was_prev
      |  FROM am a
      |  LEFT JOIN am p ON a.ck = p.ck AND p.m = a.m - 1
      |  JOIN first_ f ON a.ck = f.ck),
      |monthly AS (
      |  SELECT m, COUNT(*) AS active, SUM(is_new) AS new_custs,
      |    SUM(CASE WHEN is_new = 0 THEN was_prev ELSE 0 END) AS retained,
      |    SUM(CASE WHEN is_new = 0 AND was_prev = 0 THEN 1 ELSE 0 END)
      |      AS resurrected
      |  FROM flagged GROUP BY 1)
      |SELECT CAST(m AS BIGINT) AS month, active,
      |  CAST(new_custs AS BIGINT) AS new_custs,
      |  CAST(retained AS BIGINT) AS retained,
      |  CAST(resurrected AS BIGINT) AS resurrected,
      |  CAST(COALESCE(LAG(active) OVER (ORDER BY m), 0) - retained AS BIGINT)
      |    AS churned
      |FROM monthly ORDER BY month""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q403_ltv_triangle", q403LtvTriangle _, Some(q403Sql)),
    ("q404_growth_accounting", q404GrowthAccounting _, Some(q404Sql)))
}
