package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 forty-first operator batch: price/volume variance
  * decomposition and an open-order aging report — the FP&A revenue
  * bridge and the receivables staple on the §8.4 exact-integer
  * discipline.
  */
object Round8aoOps {

  // --------------------------------------------------------------------------
  // q387 — PRICE/VOLUME VARIANCE DECOMPOSITION: the revenue bridge
  // every finance review asks for — per brand, how much of the
  // first-half → second-half revenue change came from PRICE (unit
  // price moved), how much from VOLUME (units moved), with the
  // interaction left as an explicit reconciling residual:
  //   Δ = r₂ − r₁
  //   price = (u₁·r₂) div u₂ − r₁        (u₁·(p₂ − p₁), exact floor)
  //   volume = ((u₂ − u₁)·r₁) div u₁     (p₁·Δu, exact floor)
  //   residual = Δ − price − volume       (absorbs the floors + cross)
  // The rows always reconcile by construction — the property a float
  // bridge loses. Periods split at the data midpoint (q374's rule);
  // brands must trade in both halves to enter the bridge.
  //
  // Scale: one lineitem×orders orderkey join with a broadcast part
  // dim, one (brand, period) aggregate over the bounded brand grid.
  def varianceBridge(lineitem: DataFrame, orders: DataFrame, part: DataFrame)
  : DataFrame = {
    val dated = lineitem.select(col("l_orderkey").as("ok"),
        col("l_partkey").as("pk"),
        col("l_quantity").cast("long").as("q"),
        expr("cast(floor(l_extendedprice * 100 + 0.5d) as bigint)").as("cents"))
      .join(orders.select(col("o_orderkey").as("ok"),
        to_date(col("o_orderdate")).as("d")), Seq("ok"))
      .join(broadcast(part.select(col("p_partkey").as("pk"),
        col("p_brand").as("brand"))), Seq("pk"))
    val mid = dated.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(expr("date_add(d0, cast(datediff(d1, d0) div 2L as int))")
        .as("dm"))
    dated.crossJoin(broadcast(mid))
      .groupBy(col("brand"))
      .agg(sum(when(col("d") < col("dm"), col("q")).otherwise(0L)).as("u1"),
        sum(when(col("d") < col("dm"), col("cents")).otherwise(0L)).as("r1"),
        sum(when(col("d") >= col("dm"), col("q")).otherwise(0L)).as("u2"),
        sum(when(col("d") >= col("dm"), col("cents")).otherwise(0L)).as("r2"))
      .filter(col("u1") > 0L && col("u2") > 0L)
      .select(col("brand"), col("u1"), col("r1"), col("u2"), col("r2"),
        (col("r2") - col("r1")).as("delta_cents"),
        expr("""cast((cast(u1 as decimal(38,0)) * r2) div u2 as bigint) - r1""")
          .as("price_eff_cents"),
        expr("""cast((cast(u2 - u1 as decimal(38,0)) * r1) div u1 as bigint)""")
          .as("volume_eff_cents"))
      .withColumn("residual_cents",
        col("delta_cents") - col("price_eff_cents") - col("volume_eff_cents"))
      .orderBy(col("brand"))
  }

  def q387VarianceBridge(spark: SparkSession, dir: String): DataFrame =
    varianceBridge(Tables.lineitem(spark, dir), Tables.orders(spark, dir),
      Tables.part(spark, dir))

  val q387Sql: String =
    """WITH dated AS (
      |  SELECT p_brand AS brand, CAST(l_quantity AS BIGINT) AS q,
      |    CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
      |    CAST(o_orderdate AS DATE) AS d
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN part ON l_partkey = p_partkey),
      |mid AS (
      |  SELECT MIN(d) + CAST(date_diff('day', MIN(d), MAX(d)) // 2 AS INT) AS dm
      |  FROM dated),
      |per AS (
      |  SELECT brand,
      |    SUM(CASE WHEN d < dm THEN q ELSE 0 END) AS u1,
      |    SUM(CASE WHEN d < dm THEN cents ELSE 0 END) AS r1,
      |    SUM(CASE WHEN d >= dm THEN q ELSE 0 END) AS u2,
      |    SUM(CASE WHEN d >= dm THEN cents ELSE 0 END) AS r2
      |  FROM dated, mid GROUP BY 1),
      |bridge AS (
      |  SELECT brand, u1, r1, u2, r2, r2 - r1 AS delta_cents,
      |    CAST((u1::HUGEINT * r2) // u2 AS BIGINT) - r1 AS price_eff_cents,
      |    CAST(((u2 - u1)::HUGEINT * r1) // u1 AS BIGINT) AS volume_eff_cents
      |  FROM per WHERE u1 > 0 AND u2 > 0)
      |SELECT brand, CAST(u1 AS BIGINT) AS u1, CAST(r1 AS BIGINT) AS r1,
      |  CAST(u2 AS BIGINT) AS u2, CAST(r2 AS BIGINT) AS r2,
      |  CAST(delta_cents AS BIGINT) AS delta_cents,
      |  CAST(price_eff_cents AS BIGINT) AS price_eff_cents,
      |  CAST(volume_eff_cents AS BIGINT) AS volume_eff_cents,
      |  CAST(delta_cents - price_eff_cents - volume_eff_cents AS BIGINT)
      |    AS residual_cents
      |FROM bridge ORDER BY brand""".stripMargin

  // --------------------------------------------------------------------------
  // q388 — OPEN-ORDER AGING REPORT: the receivables staple — orders
  // not yet finished (status ≠ 'F') bucketed by age at the data's own
  // snapshot date (max order date) into the standard 0–30/31–90/
  // 91–365/365+ bands, with counts, exact value cents, and value share
  // ppm. Bands are integer day arithmetic off exact dates — no float
  // touches the bucketing.
  //
  // Scale: one filter + broadcast 1-row snapshot + a 4-band aggregate.
  def agingReport(orders: DataFrame): DataFrame = {
    val snap = orders.agg(to_date(max(col("o_orderdate"))).as("snap"))
    val banded = orders.filter(col("o_orderstatus") =!= "F")
      .crossJoin(broadcast(snap))
      .select(expr("datediff(snap, to_date(o_orderdate))").cast("long")
          .as("age"),
        expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").as("cents"))
      .select(when(col("age") <= 30L, "a_0_30")
        .when(col("age") <= 90L, "b_31_90")
        .when(col("age") <= 365L, "c_91_365")
        .otherwise("d_over_365").as("band"), col("cents"))
    val tot = banded.agg(sum(col("cents")).as("t"))
    banded.groupBy(col("band"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("value_cents"))
      .crossJoin(broadcast(tot))
      .select(col("band"), col("n_orders"), col("value_cents"),
        expr("(1000000L * value_cents) div t").as("value_share_ppm"))
      .orderBy(col("band"))
  }

  def q388AgingReport(spark: SparkSession, dir: String): DataFrame =
    agingReport(Tables.orders(spark, dir))

  val q388Sql: String =
    """WITH snap AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS snap FROM orders),
      |banded AS (
      |  SELECT CASE
      |      WHEN date_diff('day', CAST(o_orderdate AS DATE), snap) <= 30
      |        THEN 'a_0_30'
      |      WHEN date_diff('day', CAST(o_orderdate AS DATE), snap) <= 90
      |        THEN 'b_31_90'
      |      WHEN date_diff('day', CAST(o_orderdate AS DATE), snap) <= 365
      |        THEN 'c_91_365'
      |      ELSE 'd_over_365' END AS band,
      |    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders, snap WHERE o_orderstatus <> 'F'),
      |tot AS (SELECT SUM(cents) AS t FROM banded)
      |SELECT band, COUNT(*) AS n_orders,
      |  CAST(SUM(cents) AS BIGINT) AS value_cents,
      |  CAST((1000000 * SUM(cents)) // t AS BIGINT) AS value_share_ppm
      |FROM banded, tot GROUP BY band, t ORDER BY band""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q387_variance_bridge", q387VarianceBridge _, Some(q387Sql)),
    ("q388_aging_report", q388AgingReport _, Some(q388Sql)))
}
