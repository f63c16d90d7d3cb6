package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-8 twenty-seventh operator batch: Wald–Wolfowitz runs test on
  * the daily-revenue series and a per-source lexical-diversity panel —
  * sequence-randomness and corpus-vocabulary diagnostics on the §8.4
  * exact-integer discipline.
  */
object Round8aaOps {

  // --------------------------------------------------------------------------
  // q359 — RUNS TEST (Wald–Wolfowitz): is the daily revenue series
  // random around its median, or does it clump (momentum/regime) or
  // oscillate (over-correction)? Days dichotomize against the exact
  // low-median of daily cents (median-equal days drop, the classical
  // convention); R = 1 + #(sign changes) via one lag over the calendar
  // grid. n_above/n_below/runs/median ship as exact BIGINTs; the
  // normal-approximation moments are exact rational floors —
  // E[R]·1e6 = (1e6·(n+2·n1·n2)) div n and Var[R] via a DECIMAL(38,0)
  // cross-multiply — and z is ONE fixed double dag + pround(6).
  // Complements q167 (CUSUM locates level shifts; this tests the
  // whole-series randomness hypothesis) and q311 (Mann–Kendall tests
  // monotone trend; runs react to any serial dependence).
  //
  // Scale: orders collapse to the bounded per-day grid in ONE shuffle
  // (q167's argument); the rank/lag windows run on that ~2.4k-row grid,
  // never on orders.
  def runsTest(orders: DataFrame): DataFrame = {
    val byDay = orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg((sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
        .cast("long").as("rev_cents"))
      .localCheckpoint()
    val n = byDay.agg(count(lit(1)).as("nd"))
    val med = byDay.crossJoin(broadcast(n))
      .withColumn("rn",
        row_number().over(Window.orderBy(col("rev_cents"), col("day"))))
      .filter(col("rn") === expr("(nd + 1L) div 2L"))
      .select(col("rev_cents").as("med"))
    byDay.crossJoin(broadcast(med))
      .filter(col("rev_cents") =!= col("med"))
      .withColumn("s", when(col("rev_cents") > col("med"), 1L).otherwise(0L))
      .withColumn("prev", lag(col("s"), 1).over(Window.orderBy(col("day"))))
      .agg(count_if(col("s") === 1L).as("n_above"),
        count_if(col("s") === 0L).as("n_below"),
        (count_if(col("prev").isNotNull && col("s") =!= col("prev")) + 1L)
          .as("runs"),
        min(col("med")).as("median_cents"))
      .withColumn("n", col("n_above") + col("n_below"))
      .select(col("n_above"), col("n_below"), col("runs"), col("median_cents"),
        col("n"),
        expr("(1000000L * (n + 2L * n_above * n_below)) div n")
          .as("e_runs_ppm"),
        expr("""cast((cast(1000000 as decimal(38,0))
               |  * (2L * n_above * n_below)
               |  * (2L * n_above * n_below - n))
               | div (cast(n as decimal(38,0)) * n * (n - 1L)) as bigint)"""
          .stripMargin).as("var_ppm"),
        Num.pround(
          (col("runs").cast("double")
            - expr("cast(n + 2L * n_above * n_below as double)")
              / col("n").cast("double"))
          / sqrt(expr("cast(2L * n_above * n_below as double)")
              * expr("cast(2L * n_above * n_below - n as double)")
              / (col("n").cast("double") * col("n") * (col("n") - lit(1L)))),
          6).as("z6"))
  }

  def q359RunsTest(spark: SparkSession, dir: String): DataFrame =
    runsTest(Tables.orders(spark, dir))

  val q359Sql: String =
    """WITH byday AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1),
      |nn AS (SELECT COUNT(*) AS nd FROM byday),
      |med AS (
      |  SELECT rev_cents AS med FROM (
      |    SELECT rev_cents, ROW_NUMBER() OVER (ORDER BY rev_cents, day) AS rn
      |    FROM byday), nn
      |  WHERE rn = (nd + 1) // 2),
      |lagged AS (
      |  SELECT s, med, LAG(s) OVER (ORDER BY day) AS prev FROM (
      |    SELECT day, CASE WHEN rev_cents > med THEN 1 ELSE 0 END AS s, med
      |    FROM byday, med WHERE rev_cents <> med)),
      |agg AS (
      |  SELECT COUNT(*) FILTER (s = 1) AS n_above,
      |    COUNT(*) FILTER (s = 0) AS n_below,
      |    COUNT(*) FILTER (prev IS NOT NULL AND s <> prev) + 1 AS runs,
      |    ANY_VALUE(med) AS median_cents
      |  FROM lagged),
      |d AS (SELECT *, n_above + n_below AS n FROM agg)
      |SELECT CAST(n_above AS BIGINT) AS n_above,
      |  CAST(n_below AS BIGINT) AS n_below,
      |  CAST(runs AS BIGINT) AS runs, median_cents, CAST(n AS BIGINT) AS n,
      |  CAST((1000000 * (n + 2 * n_above * n_below)) // n AS BIGINT) AS e_runs_ppm,
      |  CAST((1000000::HUGEINT * (2 * n_above * n_below)
      |      * (2 * n_above * n_below - n))
      |    // (n::HUGEINT * n * (n - 1)) AS BIGINT) AS var_ppm,
      |  FLOOR(((CAST(runs AS DOUBLE)
      |      - CAST(n + 2 * n_above * n_below AS DOUBLE) / CAST(n AS DOUBLE))
      |    / sqrt(CAST(2 * n_above * n_below AS DOUBLE)
      |      * CAST(2 * n_above * n_below - n AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * n * (n - 1)))) * 1e6 + 0.5) / 1e6 AS z6
      |FROM d""".stripMargin

  // --------------------------------------------------------------------------
  // q360 — LEXICAL DIVERSITY PANEL per source: type-token ratio, hapax
  // share, and Yule's characteristic K — the corpus-health readouts
  // that expose template/boilerplate sources (low TTR, low hapax,
  // high K) before they skew a training mix. All three are exact
  // integer floors off the per-source (type, freq) table: K =
  // 1e4·(Σf² − N)/N² ships as K·1000 via a DECIMAL(38,0)
  // cross-multiply (Σf² exceeds BIGINT once a hot token passes ~3e9
  // occurrences). Complements q336 (vocab sizing) and q335 (novelty
  // curve) with the scale-free diversity constants.
  //
  // Scale: one (source, token) count shuffle, then a per-source
  // aggregate — same shape as q336's freq pass, nothing quadratic.
  def lexicalDiversity(docs: DataFrame): DataFrame = {
    docs.select(col("source"), explode(TextOps.toks).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("f"))
      .groupBy(col("source"))
      .agg(sum(col("f")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        count_if(col("f") === 1L).as("hapax"),
        sum(expr("cast(f as decimal(38,0)) * f")).as("s2"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("hapax"),
        expr("(1000000L * n_types) div n_tokens").as("ttr_ppm"),
        expr("(1000000L * hapax) div n_types").as("hapax_ppm"),
        expr("""cast((cast(10000000 as decimal(38,0)) * (s2 - n_tokens))
               | div (cast(n_tokens as decimal(38,0)) * n_tokens) as bigint)"""
          .stripMargin).as("yule_k_e3"))
      .orderBy(col("source"))
  }

  def q360LexicalDiversity(spark: SparkSession, dir: String): DataFrame =
    lexicalDiversity(Tables.documents(spark, dir))

  val q360Sql: String = {
    val toks = TextOps.toksSqlD
    s"""WITH tok AS (
       |  SELECT source, UNNEST(t) AS w
       |  FROM (SELECT source, $toks AS t FROM documents)),
       |freq AS (SELECT source, w, COUNT(*) AS f FROM tok GROUP BY 1, 2),
       |agg AS (
       |  SELECT source, SUM(f) AS n_tokens, COUNT(*) AS n_types,
       |    COUNT(*) FILTER (f = 1) AS hapax,
       |    SUM(f::HUGEINT * f) AS s2
       |  FROM freq GROUP BY 1)
       |SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens, n_types,
       |  CAST(hapax AS BIGINT) AS hapax,
       |  CAST((1000000 * n_types) // n_tokens AS BIGINT) AS ttr_ppm,
       |  CAST((1000000 * hapax) // n_types AS BIGINT) AS hapax_ppm,
       |  CAST((10000000::HUGEINT * (s2 - n_tokens))
       |    // (n_tokens::HUGEINT * n_tokens) AS BIGINT) AS yule_k_e3
       |FROM agg ORDER BY source""".stripMargin
  }

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q359_runs_test", q359RunsTest _, Some(q359Sql)),
    ("q360_lexical_diversity", q360LexicalDiversity _, Some(q360Sql)))
}
