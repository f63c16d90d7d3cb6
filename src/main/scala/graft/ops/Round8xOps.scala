package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 twenty-fourth operator batch: exact two-sample energy
  * distance and the Fano overdispersion index — full-distribution
  * testing and count-process diagnostics on the §8.4 exact-integer
  * discipline.
  */
object Round8xOps {

  // --------------------------------------------------------------------------
  // q353 — TWO-SAMPLE ENERGY DISTANCE (Székely–Rizzo), EXACTLY:
  //   E = 2·E|X−Y| − E|X−X'| − E|Y−Y'|
  // between BUILDING and MACHINERY balances — the full-distribution
  // complement to q346's mean test and q341's rank test (E = 0 iff the
  // distributions are equal; catches variance/shape differences a
  // t-test can't). The naive computation is three quadratic pair sums;
  // on the sorted VALUE HISTOGRAM each collapses to prefix-sum algebra:
  //   Σ_pairs |u−v| = Σ_v cnt_v·(v·cum_lt − cumS_lt + (S − cumS_le)
  //                              − v·(N − cum_le))
  // so T_xy/T_xx/T_yy are exact BIGINTs off ONE window pass over the
  // distinct-cents grid, and E·n²m² cross-multiplies exactly in
  // DECIMAL(38,0). Ships E in exact micro-cents plus the permutation-
  // scale statistic nm/(n+m)·E via pround.
  //
  // Scale: q341's two-pass value-histogram shape — the only window
  // runs over the bounded distinct-cents grid; everything else is hash
  // aggregates.
  def energyDistance(rows: DataFrame, valueCol: String, groupCol: String,
                     gA: String, gB: String): DataFrame = {
    val hist = rows
      .filter(col(groupCol).isin(gA, gB))
      .select(expr(s"cast(floor($valueCol * 100 + 0.5d) as bigint)").as("v"),
        (col(groupCol) === gA).as("isa"))
      .groupBy(col("v"))
      .agg(count_if(col("isa")).as("a"), count_if(!col("isa")).as("b"))
    val w = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, -1)
    val pre = hist
      .withColumn("ca", coalesce(sum(col("a")).over(w), lit(0L)))
      .withColumn("cb", coalesce(sum(col("b")).over(w), lit(0L)))
      .withColumn("sa", coalesce(sum(col("a") * col("v")).over(w), lit(0L)))
      .withColumn("sb", coalesce(sum(col("b") * col("v")).over(w), lit(0L)))
    val tot = hist.agg(sum(col("a")).as("na"), sum(col("b")).as("nb"),
      sum(col("a") * col("v")).as("ta"), sum(col("b") * col("v")).as("tb"))
    def pairSum(cnt: String, cLt: String, sLt: String, n: String, s: String,
                selfCnt: String): String =
      // Σ over ordered pairs: cnt_v · (v·cum_lt − cumS_lt + (S − cumS_le) − v·(N − cum_le))
      s"""sum($cnt * (v * $cLt - $sLt + ($s - ($sLt + $selfCnt * v))
         |  - v * ($n - ($cLt + $selfCnt))))""".stripMargin
    pre.crossJoin(broadcast(tot))
      .agg(
        expr(pairSum("a", "cb", "sb", "nb", "tb", "b")).as("txy_half"),
        expr(pairSum("a", "ca", "sa", "na", "ta", "a")).as("txx"),
        expr(pairSum("b", "cb", "sb", "nb", "tb", "b")).as("tyy"),
        first(col("na")).as("n_x"), first(col("nb")).as("n_y"))
      .select(col("n_x"), col("n_y"), col("txy_half").as("t_xy"),
        col("txx").as("t_xx"), col("tyy").as("t_yy"))
      .withColumn("e_ucents", expr(
        """cast((cast(1000000 as decimal(38,0)) *
          |  (2L * cast(t_xy as decimal(38,0)) * n_x * n_y
          |   - cast(t_xx as decimal(38,0)) * n_y * n_y
          |   - cast(t_yy as decimal(38,0)) * n_x * n_x))
          | div (cast(n_x as decimal(38,0)) * n_x * n_y * n_y) as bigint)""".stripMargin))
      .withColumn("stat6", Num.pround(
        expr("(cast(n_x as double) * n_y / (n_x + n_y)) * (e_ucents / 1e6) / 100.0d"), 6))
      .select(col("n_x"), col("n_y"), col("t_xy"), col("t_xx"), col("t_yy"),
        col("e_ucents"), col("stat6"))
  }

  def q353EnergyDistance(spark: SparkSession, dir: String): DataFrame =
    energyDistance(Tables.customer(spark, dir), "c_acctbal", "c_mktsegment",
      "BUILDING", "MACHINERY")

  val q353Sql: String =
    """WITH hist AS (
      |  SELECT CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS v,
      |    COUNT(*) FILTER (c_mktsegment = 'BUILDING') AS a,
      |    COUNT(*) FILTER (c_mktsegment = 'MACHINERY') AS b
      |  FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      |  GROUP BY 1),
      |pre AS (
      |  SELECT v, a, b,
      |    COALESCE(SUM(a) OVER pw, 0) AS ca, COALESCE(SUM(b) OVER pw, 0) AS cb,
      |    COALESCE(SUM(a * v) OVER pw, 0) AS sa,
      |    COALESCE(SUM(b * v) OVER pw, 0) AS sb
      |  FROM hist
      |  WINDOW pw AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |tot AS (
      |  SELECT SUM(a) AS na, SUM(b) AS nb, SUM(a * v) AS ta, SUM(b * v) AS tb
      |  FROM hist),
      |su AS (
      |  SELECT
      |    SUM(a * (v * cb - sb + (tb - (sb + b * v)) - v * (nb - (cb + b)))) AS t_xy,
      |    SUM(a * (v * ca - sa + (ta - (sa + a * v)) - v * (na - (ca + a)))) AS t_xx,
      |    SUM(b * (v * cb - sb + (tb - (sb + b * v)) - v * (nb - (cb + b)))) AS t_yy,
      |    ANY_VALUE(na) AS n_x, ANY_VALUE(nb) AS n_y
      |  FROM pre CROSS JOIN tot),
      |fin AS (
      |  SELECT n_x, n_y, t_xy, t_xx, t_yy,
      |    CAST((1000000::HUGEINT *
      |      (2 * t_xy::HUGEINT * n_x * n_y
      |       - t_xx::HUGEINT * n_y * n_y - t_yy::HUGEINT * n_x * n_x))
      |     // (n_x::HUGEINT * n_x * n_y * n_y) AS BIGINT) AS e_ucents
      |  FROM su)
      |SELECT CAST(n_x AS BIGINT) AS n_x, CAST(n_y AS BIGINT) AS n_y,
      |  CAST(t_xy AS BIGINT) AS t_xy, CAST(t_xx AS BIGINT) AS t_xx,
      |  CAST(t_yy AS BIGINT) AS t_yy, e_ucents,
      |  FLOOR(((CAST(n_x AS DOUBLE) * n_y / (n_x + n_y)) * (e_ucents / 1e6)
      |    / 100.0) * 1e6 + 0.5) / 1e6 AS stat6
      |FROM fin""".stripMargin

  // --------------------------------------------------------------------------
  // q354 — FANO OVERDISPERSION INDEX per event type: D = Var/Mean of
  // the daily count series — 1 for a Poisson process, > 1 for bursty
  // (clumped) traffic, < 1 for throttled/regular traffic. The
  // bot-vs-organic / rate-limit diagnostic on count data, fully
  // cross-multiplied to the exact integer ppm
  //   D_ppm = (10⁶·(n·Σc² − (Σc)²)) div ((n−1)·Σc)
  // (DECIMAL(38,0) product guard). Days with zero events count as
  // zeros via the day×type grid (q347's densification), as the
  // dispersion of a count PROCESS must.
  //
  // Scale: the corpus collapses to the day×type grid; two hash
  // aggregates.
  def fanoDispersion(events: DataFrame): DataFrame = {
    val cnt = events.groupBy(
        to_date(col("ts")).as("d"), col("event_type").as("t"))
      .agg(count(lit(1)).as("c"))
    val grid = cnt.select(col("d")).distinct()
      .crossJoin(broadcast(cnt.select(col("t")).distinct()))
      .join(cnt, Seq("d", "t"), "left")
      .na.fill(0L, Seq("c"))
    grid.groupBy(col("t"))
      .agg(count(lit(1)).as("n_days"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("q"))
      .filter(col("s") > 0L && col("n_days") > 1L)
      .select(col("t").as("event_type"), col("n_days"), col("s").as("total"),
        expr("""cast((cast(1000000 as decimal(38,0)) * (n_days * q - s * s))
                | div ((n_days - 1L) * s) as bigint)""".stripMargin).as("fano_ppm"))
      .withColumn("verdict",
        when(col("fano_ppm") > 1100000L, lit("overdispersed"))
          .when(col("fano_ppm") < 900000L, lit("underdispersed"))
          .otherwise(lit("poisson-like")))
      .orderBy(col("event_type"))
  }

  def q354FanoDispersion(spark: SparkSession, dir: String): DataFrame =
    fanoDispersion(Tables.events(spark, dir))

  val q354Sql: String =
    """WITH cnt AS (
      |  SELECT CAST(ts AS DATE) AS d, event_type AS t, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT dd.d, tt.t, COALESCE(c, 0) AS c
      |  FROM (SELECT DISTINCT d FROM cnt) dd
      |  CROSS JOIN (SELECT DISTINCT t FROM cnt) tt
      |  LEFT JOIN cnt ON cnt.d = dd.d AND cnt.t = tt.t),
      |st AS (
      |  SELECT t, COUNT(*) AS n_days, SUM(c) AS s, SUM(c * c) AS q
      |  FROM grid GROUP BY t)
      |SELECT t AS event_type, CAST(n_days AS BIGINT) AS n_days,
      |  CAST(s AS BIGINT) AS total,
      |  CAST((1000000::HUGEINT * (n_days * q - s * s))
      |    // ((n_days - 1) * s) AS BIGINT) AS fano_ppm,
      |  CASE WHEN (1000000::HUGEINT * (n_days * q - s * s))
      |         // ((n_days - 1) * s) > 1100000 THEN 'overdispersed'
      |       WHEN (1000000::HUGEINT * (n_days * q - s * s))
      |         // ((n_days - 1) * s) < 900000 THEN 'underdispersed'
      |       ELSE 'poisson-like' END AS verdict
      |FROM st WHERE s > 0 AND n_days > 1 ORDER BY event_type""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q353_energy_distance", q353EnergyDistance _, Some(q353Sql)),
    ("q354_fano_dispersion", q354FanoDispersion _, Some(q354Sql)))
}
