package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 forty-eighth operator batch: three-way mutual-independence
  * test and repeat-purchase latency quartiles — multi-factor
  * association and retention timing on the §8.4 exact-integer
  * discipline.
  */
object Round8avOps {

  // --------------------------------------------------------------------------
  // q401 — THREE-WAY MUTUAL INDEPENDENCE: q370 tests pairs; a report
  // sliced by (priority × status × segment) silently assumes the THREE
  // factors factorize. Under mutual independence E = n_a·n_b·n_c/N²,
  // and the observed-cells identity generalizes:
  //   χ² = Σ obs²·N²/(n_a·n_b·n_c) − N
  // (zero cells contribute only to the −N term), accumulated as
  // NON-NEGATIVE exact floors term_ppm = (10⁶·obs²·N²) div (n_a·n_b·n_c)
  // — sign-safe across div/floor-div engines, every margin an exact
  // BIGINT. Ships N, the three cardinalities, df, and χ²_ppm.
  //
  // Scale: one (a,b,c) grid aggregate (5×3×5 here) + three broadcast
  // margins; the fact table is scanned once for cells, once per
  // margin pair — all hash aggregates.
  def threewayIndependence(rows: DataFrame): DataFrame = {
    val cell = rows.groupBy(col("a"), col("b"), col("c"))
      .agg(count(lit(1)).as("obs")).localCheckpoint()
    val ma = cell.groupBy(col("a")).agg(sum(col("obs")).as("na"))
    val mb = cell.groupBy(col("b")).agg(sum(col("obs")).as("nb"))
    val mc = cell.groupBy(col("c")).agg(sum(col("obs")).as("nc"))
    val dims = cell.agg(sum(col("obs")).as("nn"),
      countDistinct(col("a")).as("ka"), countDistinct(col("b")).as("kb"),
      countDistinct(col("c")).as("kc"))
    cell.join(broadcast(ma), Seq("a")).join(broadcast(mb), Seq("b"))
      .join(broadcast(mc), Seq("c"))
      .crossJoin(broadcast(dims))
      .agg(first(col("nn")).as("n"), first(col("ka")).as("ka"),
        first(col("kb")).as("kb"), first(col("kc")).as("kc"),
        sum(expr(
          """(cast(1000000 as decimal(38,0)) * obs * obs * nn * nn)
            | div (cast(na as decimal(38,0)) * nb * nc)""".stripMargin))
          .as("sum_term"))
      .select(col("n"), col("ka"), col("kb"), col("kc"),
        expr("ka * kb * kc - ka - kb - kc + 2").as("df"),
        (col("sum_term") - expr("cast(1000000 as decimal(38,0)) * n"))
          .cast("long").as("chi2_ppm"))
  }

  def q401ThreewayIndependence(spark: SparkSession, dir: String): DataFrame =
    threewayIndependence(
      Tables.orders(spark, dir)
        .join(broadcast(Tables.customer(spark, dir)
          .select(col("c_custkey").as("o_custkey"),
            col("c_mktsegment").as("c"))), Seq("o_custkey"))
        .select(col("o_orderpriority").as("a"),
          col("o_orderstatus").as("b"), col("c")))

  val q401Sql: String =
    """WITH rows_ AS (
      |  SELECT o_orderpriority AS a, o_orderstatus AS b, c_mktsegment AS c
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |cell AS (
      |  SELECT a, b, c, COUNT(*) AS obs FROM rows_ GROUP BY 1, 2, 3),
      |ma AS (SELECT a, SUM(obs) AS na FROM cell GROUP BY 1),
      |mb AS (SELECT b, SUM(obs) AS nb FROM cell GROUP BY 1),
      |mc AS (SELECT c, SUM(obs) AS nc FROM cell GROUP BY 1),
      |dims AS (
      |  SELECT SUM(obs) AS nn, COUNT(DISTINCT a) AS ka,
      |    COUNT(DISTINCT b) AS kb, COUNT(DISTINCT c) AS kc
      |  FROM cell)
      |SELECT CAST(ANY_VALUE(nn) AS BIGINT) AS n,
      |  CAST(ANY_VALUE(ka) AS BIGINT) AS ka,
      |  CAST(ANY_VALUE(kb) AS BIGINT) AS kb,
      |  CAST(ANY_VALUE(kc) AS BIGINT) AS kc,
      |  CAST(ANY_VALUE(ka) * ANY_VALUE(kb) * ANY_VALUE(kc)
      |    - ANY_VALUE(ka) - ANY_VALUE(kb) - ANY_VALUE(kc) + 2 AS BIGINT)
      |    AS df,
      |  CAST(SUM((1000000::HUGEINT * obs * obs * nn * nn)
      |      // (na::HUGEINT * nb * nc))
      |    - 1000000::HUGEINT * ANY_VALUE(nn) AS BIGINT) AS chi2_ppm
      |FROM cell JOIN ma USING (a) JOIN mb USING (b) JOIN mc USING (c),
      |  dims""".stripMargin

  // --------------------------------------------------------------------------
  // q402 — REPEAT-PURCHASE LATENCY: per customer, the gaps between
  // consecutive orders (lead over the per-customer order sequence,
  // tie-broken by orderkey), then EXACT quartiles of the gap
  // distribution per market segment — nearest-rank picks off the
  // per-segment cumulative value grid (q298's partitioned machinery,
  // 10·cum ≥ p·n integer comparisons). The retention-timing readout
  // (how long until a customer comes back, by segment) that a mean
  // gap would smear.
  //
  // Scale: one per-customer sort window (natural key distribution),
  // a (segment, gap) grid aggregate, partitioned cum windows over the
  // bounded gap-day domain.
  def repeatLatency(orders: DataFrame, customer: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ck"))
      .orderBy(col("d"), col("o_orderkey"))
    val gaps = orders
      .select(col("o_orderkey"), col("o_custkey").cast("long").as("ck"),
        to_date(col("o_orderdate")).as("d"))
      .withColumn("nxt", lead(col("d"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("ck"), datediff(col("nxt"), col("d")).cast("long").as("gap"))
      .join(broadcast(customer.select(col("c_custkey").cast("long").as("ck"),
        col("c_mktsegment").as("segment"))), Seq("ck"))
    val grid = gaps.groupBy(col("segment"), col("gap"))
      .agg(count(lit(1)).as("cnt"))
    val cum = grid
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("segment")).orderBy(col("gap"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum(col("cnt")).over(
        Window.partitionBy(col("segment"))))
    def pick(p: Int) =
      min(when(col("cum") * 4 >= col("n") * p, col("gap"))).as(s"q$p")
    cum.groupBy(col("segment"))
      .agg(max(col("n")).as("n_gaps"), pick(1), pick(2), pick(3))
      .select(col("segment"), col("n_gaps"), col("q1").as("q1_days"),
        col("q2").as("median_days"), col("q3").as("q3_days"))
      .orderBy(col("segment"))
  }

  def q402RepeatLatency(spark: SparkSession, dir: String): DataFrame =
    repeatLatency(Tables.orders(spark, dir), Tables.customer(spark, dir))

  val q402Sql: String =
    """WITH seq AS (
      |  SELECT CAST(o_custkey AS BIGINT) AS ck, CAST(o_orderdate AS DATE) AS d,
      |    LEAD(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
      |      ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS nxt
      |  FROM orders),
      |gaps AS (
      |  SELECT c_mktsegment AS segment, date_diff('day', d, nxt) AS gap
      |  FROM seq JOIN customer ON ck = c_custkey
      |  WHERE nxt IS NOT NULL),
      |grid AS (
      |  SELECT segment, gap, COUNT(*) AS cnt FROM gaps GROUP BY 1, 2),
      |cum AS (
      |  SELECT segment, gap, cnt,
      |    SUM(cnt) OVER (PARTITION BY segment ORDER BY gap
      |      ROWS UNBOUNDED PRECEDING) AS cum,
      |    SUM(cnt) OVER (PARTITION BY segment) AS n
      |  FROM grid)
      |SELECT segment, CAST(MAX(n) AS BIGINT) AS n_gaps,
      |  CAST(MIN(CASE WHEN cum * 4 >= n * 1 THEN gap END) AS BIGINT)
      |    AS q1_days,
      |  CAST(MIN(CASE WHEN cum * 4 >= n * 2 THEN gap END) AS BIGINT)
      |    AS median_days,
      |  CAST(MIN(CASE WHEN cum * 4 >= n * 3 THEN gap END) AS BIGINT)
      |    AS q3_days
      |FROM cum GROUP BY segment ORDER BY segment""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q401_threeway_independence", q401ThreewayIndependence _, Some(q401Sql)),
    ("q402_repeat_latency", q402RepeatLatency _, Some(q402Sql)))
}
