package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 twenty-third operator batch: l-diversity privacy audit and
  * Haar wavelet energy decomposition — release-gating and multi-scale
  * series structure on the §8.4 exact-integer discipline.
  */
object Round8wOps {

  // --------------------------------------------------------------------------
  // q351 — L-DIVERSITY AUDIT: q180 measures k-anonymity (group SIZE);
  // this measures what k-anonymity famously misses — whether each
  // quasi-identifier group carries enough DISTINCT sensitive values
  // (distinct l) and whether one value dominates it (the homogeneity
  // attack: top_share_ppm). QI = (nation, segment), sensitive = the
  // $2000 account-balance band. Every cell an exact BIGINT; the l ≥ 3
  // release gate ships as a flag per group.
  //
  // Scale: two hash aggregates — (QI, band) then QI — over the bounded
  // 25×5 QI grid; the dominant band comes from a max over the grid,
  // not a window over the corpus.
  def lDiversity(customer: DataFrame, l: Int): DataFrame = {
    val banded = customer.select(
      col("c_nationkey").cast("long").as("nation"),
      col("c_mktsegment").as("segment"),
      expr("cast(floor(c_acctbal / 2000.0d) as bigint)").as("band"))
    val cell = banded.groupBy(col("nation"), col("segment"), col("band"))
      .agg(count(lit(1)).as("cn"))
    cell.groupBy(col("nation"), col("segment"))
      .agg(sum(col("cn")).as("group_n"),
        count(lit(1)).as("distinct_l"),
        max(col("cn")).as("top_band_n"))
      .select(col("nation"), col("segment"), col("group_n"), col("distinct_l"),
        expr("(1000000L * top_band_n) div group_n").as("top_share_ppm"),
        (col("distinct_l") >= l).as("l_ok"))
      .orderBy(col("nation"), col("segment"))
  }

  def q351LDiversity(spark: SparkSession, dir: String): DataFrame =
    lDiversity(Tables.customer(spark, dir), l = 3)

  val q351Sql: String =
    """WITH cell AS (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment,
      |    CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT) AS band, COUNT(*) AS cn
      |  FROM customer GROUP BY 1, 2, 3)
      |SELECT nation, segment, CAST(SUM(cn) AS BIGINT) AS group_n,
      |  COUNT(*) AS distinct_l,
      |  CAST((1000000 * MAX(cn)) // SUM(cn) AS BIGINT) AS top_share_ppm,
      |  COUNT(*) >= 3 AS l_ok
      |FROM cell GROUP BY 1, 2 ORDER BY nation, segment""".stripMargin

  // --------------------------------------------------------------------------
  // q352 — HAAR WAVELET ENERGY by timescale: which dyadic timescale
  // (2-day swings? 32-day waves? 512-day regimes?) carries the daily
  // order series' variance. Per level l, the Haar detail of every
  // COMPLETE 2^l-day block is d = Σ(first half) − Σ(second half) — an
  // exact BIGINT — and the level energy E_l = Σd²/2^l ships as
  // (10⁶·Σd²) div 2^l. Complete-block truncation (blocks with exactly
  // 2^l days present) makes the readout well-defined on any span
  // without a driver-side scan — levels with no complete block simply
  // vanish.
  //
  // Scale: the corpus collapses to the calendar grid; the level
  // expansion is the grid × a broadcast 12-row range, then two hash
  // aggregates on (level, block).
  def haarEnergy(orders: DataFrame, spark: SparkSession): DataFrame = {
    val day0 = orders.agg(to_date(min(col("o_orderdate"))).as("d0"))
    val daily = orders
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("x"))
      .crossJoin(broadcast(day0))
      .withColumn("i", datediff(col("d"), col("d0")).cast("long"))
    val levels = spark.range(1, 13).select(col("id").as("l"),
      expr("shiftleft(1L, cast(id as int))").as("w"))
    daily.crossJoin(broadcast(levels))
      .withColumn("b", expr("i div w"))
      .withColumn("sgn", expr("if((i div (w div 2)) % 2 = 0, 1L, -1L)"))
      .groupBy(col("l"), col("w"), col("b"))
      .agg(count(lit(1)).as("cnt"), sum(col("sgn") * col("x")).as("det"))
      .filter(col("cnt") === col("w"))
      .groupBy(col("l"), col("w"))
      .agg(count(lit(1)).as("n_blocks"), sum(col("det") * col("det")).as("raw_energy"))
      .select(col("l").as("level"), col("n_blocks"), col("raw_energy"),
        expr("(1000000L * raw_energy) div w").as("energy_ppm"))
      .orderBy(col("level"))
  }

  def q352HaarEnergy(spark: SparkSession, dir: String): DataFrame =
    haarEnergy(Tables.orders(spark, dir), spark)

  val q352Sql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS x
      |  FROM orders GROUP BY 1),
      |idx AS (
      |  SELECT CAST(d - (SELECT MIN(d) FROM daily) AS BIGINT) AS i, x
      |  FROM daily),
      |ex AS (
      |  SELECT l, (1::BIGINT << l) AS w, i // (1::BIGINT << l) AS b,
      |    CASE WHEN (i // (1::BIGINT << (l - 1))) % 2 = 0 THEN 1 ELSE -1 END
      |      * x AS sx
      |  FROM idx CROSS JOIN UNNEST(generate_series(1, 12)) AS u(l)),
      |blk AS (
      |  SELECT l, w, b, COUNT(*) AS cnt, SUM(sx) AS det
      |  FROM ex GROUP BY 1, 2, 3)
      |SELECT CAST(l AS BIGINT) AS level, COUNT(*) AS n_blocks,
      |  CAST(SUM(det * det) AS BIGINT) AS raw_energy,
      |  CAST((1000000 * SUM(det * det)) // w AS BIGINT) AS energy_ppm
      |FROM blk WHERE cnt = w
      |GROUP BY l, w ORDER BY level""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q351_l_diversity", q351LDiversity _, Some(q351Sql)),
    ("q352_haar_energy", q352HaarEnergy _, Some(q352Sql)))
}
