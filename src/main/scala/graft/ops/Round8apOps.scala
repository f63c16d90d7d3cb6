package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-8 forty-second operator batch: SLA attainment with Wilson
  * bounds and a safety-stock planner — operational compliance and
  * inventory sizing on the §8.4 exact-integer discipline.
  */
object Round8apOps {

  // --------------------------------------------------------------------------
  // q389 — SLA ATTAINMENT + WILSON BOUNDS: per priority class, the
  // share of line items shipped within 60 days, as the exact integer
  // ratio AND the Wilson 95% score interval — the interval that stays
  // inside [0,1] and behaves at attainment ≈ 1 where the naive ±1.96σ
  // interval breaks. Counts are exact BIGINTs; the two bounds are ONE
  // fixed double dag (z = 1.959964) + pround(6) each. The compliance
  // readout q363 (does priority order latency) and q369 (by how much)
  // lead up to.
  //
  // Scale: one orderkey join, one 5-row aggregate.
  def slaAttainment(lineitem: DataFrame, orders: DataFrame, slaDays: Int)
  : DataFrame = {
    val rows = lineitem.select(col("l_orderkey").as("ok"), col("l_shipdate"))
      .join(orders.select(col("o_orderkey").as("ok"), col("o_orderdate"),
        col("o_orderpriority")), Seq("ok"))
      .select(col("o_orderpriority").as("priority"),
        (datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          <= slaDays).as("hit"))
    rows.groupBy(col("priority"))
      .agg(count(lit(1)).as("n"), count_if(col("hit")).as("hits"))
      .withColumn("attain_ppm", expr("(1000000L * hits) div n"))
      .withColumn("p_hat", col("hits").cast("double") / col("n"))
      .withColumn("z2", lit(1.959964 * 1.959964))
      .withColumn("center",
        (col("p_hat") + col("z2") / (lit(2.0) * col("n")))
          / (lit(1.0) + col("z2") / col("n")))
      .withColumn("half",
        (lit(1.959964) * sqrt(col("p_hat") * (lit(1.0) - col("p_hat"))
          / col("n") + col("z2") / (lit(4.0) * col("n") * col("n"))))
          / (lit(1.0) + col("z2") / col("n")))
      .select(col("priority"), col("n"), col("hits"), col("attain_ppm"),
        Num.pround(col("center") - col("half"), 6).as("wilson_lo6"),
        Num.pround(col("center") + col("half"), 6).as("wilson_hi6"))
      .orderBy(col("priority"))
  }

  def q389SlaAttainment(spark: SparkSession, dir: String): DataFrame =
    slaAttainment(Tables.lineitem(spark, dir), Tables.orders(spark, dir),
      slaDays = 60)

  val q389Sql: String =
    """WITH rows_ AS (
      |  SELECT o_orderpriority AS priority,
      |    date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
      |      <= 60 AS hit
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |agg AS (
      |  SELECT priority, COUNT(*) AS n, COUNT(*) FILTER (hit) AS hits
      |  FROM rows_ GROUP BY 1),
      |d AS (
      |  SELECT priority, n, hits,
      |    CAST(hits AS DOUBLE) / n AS p_hat,
      |    1.959964 * 1.959964 AS z2
      |  FROM agg),
      |w AS (
      |  SELECT priority, n, hits, p_hat, z2,
      |    (p_hat + z2 / (2.0 * n)) / (1.0 + z2 / n) AS center,
      |    (1.959964 * sqrt(p_hat * (1.0 - p_hat) / n
      |      + z2 / (4.0 * n * n))) / (1.0 + z2 / n) AS half
      |  FROM d)
      |SELECT priority, n, CAST(hits AS BIGINT) AS hits,
      |  CAST((1000000 * hits) // n AS BIGINT) AS attain_ppm,
      |  FLOOR((center - half) * 1e6 + 0.5) / 1e6 AS wilson_lo6,
      |  FLOOR((center + half) * 1e6 + 0.5) / 1e6 AS wilson_hi6
      |FROM w ORDER BY priority""".stripMargin

  // --------------------------------------------------------------------------
  // q390 — SAFETY-STOCK PLANNER: per brand, daily demand mean and
  // variance from EXACT sufficient statistics over the zero-filled
  // calendar (days without demand count — omitting them understates σ
  // and is the classic planner bug), then safety stock = z·σ·√L and
  // reorder point = μ·L + SS for a 7-day lead time at 95% service —
  // the inventory readout every fulfillment pipeline sizes against.
  // Sufficient stats are exact BIGINTs (n·Σq² − S² form); only the
  // final σ/SS/ROP are a fixed dag + pround.
  //
  // Scale: one lineitem×orders join collapses to the (brand, day)
  // grid; zero-filling uses the global day COUNT (not a densified
  // cross) via the moment identity over n = calendar days.
  def safetyStock(lineitem: DataFrame, orders: DataFrame, part: DataFrame)
  : DataFrame = {
    val dated = lineitem.select(col("l_orderkey").as("ok"),
        col("l_partkey").as("pk"), col("l_quantity").cast("long").as("q"))
      .join(orders.select(col("o_orderkey").as("ok"),
        to_date(col("o_orderdate")).as("d")), Seq("ok"))
      .join(broadcast(part.select(col("p_partkey").as("pk"),
        col("p_brand").as("brand"))), Seq("pk"))
    val byDay = dated.groupBy(col("brand"), col("d"))
      .agg(sum(col("q")).as("dq"))
    val nDays = dated.agg(countDistinct(col("d")).as("nd"))
    byDay.groupBy(col("brand"))
      .agg(count(lit(1)).as("active_days"), sum(col("dq")).as("s"),
        sum(expr("cast(dq as decimal(38,0)) * dq")).as("q2"))
      .crossJoin(broadcast(nDays))
      .withColumn("mu", col("s").cast("double") / col("nd"))
      .withColumn("var_d", expr(
        """(cast(nd as double) * cast(q2 as double)
          | - cast(s as double) * cast(s as double))
          | / (cast(nd as double) * (cast(nd as double) - 1.0d))"""
        .stripMargin))
      .withColumn("ss", lit(1.644854) * sqrt(col("var_d")) * sqrt(lit(7.0)))
      .select(col("brand"), col("nd").as("n_days"), col("active_days"),
        col("s").as("total_units"),
        Num.pround(col("mu"), 4).as("mu_units4"),
        Num.pround(col("ss"), 2).as("safety_stock2"),
        Num.pround(col("mu") * lit(7.0) + col("ss"), 2).as("reorder_point2"))
      .orderBy(col("brand"))
  }

  def q390SafetyStock(spark: SparkSession, dir: String): DataFrame =
    safetyStock(Tables.lineitem(spark, dir), Tables.orders(spark, dir),
      Tables.part(spark, dir))

  val q390Sql: String =
    """WITH dated AS (
      |  SELECT p_brand AS brand, CAST(l_quantity AS BIGINT) AS q,
      |    CAST(o_orderdate AS DATE) AS d
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN part ON l_partkey = p_partkey),
      |byday AS (
      |  SELECT brand, d, SUM(q) AS dq FROM dated GROUP BY 1, 2),
      |nd AS (SELECT COUNT(DISTINCT d) AS nd FROM dated),
      |agg AS (
      |  SELECT brand, COUNT(*) AS active_days, SUM(dq) AS s,
      |    SUM(dq::HUGEINT * dq) AS q2
      |  FROM byday GROUP BY 1),
      |d2 AS (
      |  SELECT brand, nd, active_days, s,
      |    CAST(s AS DOUBLE) / nd AS mu,
      |    (CAST(nd AS DOUBLE) * CAST(q2 AS DOUBLE)
      |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
      |      / (CAST(nd AS DOUBLE) * (CAST(nd AS DOUBLE) - 1.0)) AS var_d
      |  FROM agg, nd),
      |d3 AS (
      |  SELECT *, 1.644854 * sqrt(var_d) * sqrt(7.0) AS ss FROM d2)
      |SELECT brand, CAST(nd AS BIGINT) AS n_days, active_days,
      |  CAST(s AS BIGINT) AS total_units,
      |  FLOOR((mu) * 1e4 + 0.5) / 1e4 AS mu_units4,
      |  FLOOR((ss) * 1e2 + 0.5) / 1e2 AS safety_stock2,
      |  FLOOR((mu * 7.0 + ss) * 1e2 + 0.5) / 1e2 AS reorder_point2
      |FROM d3 ORDER BY brand""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q389_sla_attainment", q389SlaAttainment _, Some(q389Sql)),
    ("q390_safety_stock", q390SafetyStock _, Some(q390Sql)))
}
