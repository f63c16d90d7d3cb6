package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 thirtieth operator batch: Krippendorff's alpha for n-rater
  * agreement and Page's L ordered trend over week blocks — annotation
  * governance and blocked ordered-alternative testing on the §8.4
  * exact-integer discipline.
  */
object Round8adOps {

  // --------------------------------------------------------------------------
  // q365 — KRIPPENDORFF'S ALPHA: q324's Cohen κ handles exactly 2
  // raters; the label-ops standard for n raters with missing ratings
  // is Krippendorff. Units = docs, raters = the three Gopher gates
  // (q361's panel) emitting binary labels, rater 2 and 3 abstaining on
  // empty docs (genuine missingness). For nominal binary data the
  // whole statistic is an exact rational:
  //   O  = Σ_u 2·n_u0·n_u1/(m_u−1)   (integer for m_u ∈ {2,3})
  //   α  = 1 − O·(n−1)/(2·n_0·n_1)
  // shipped as alpha_ppm = 1e6 − (1e6·O·(n−1)) div (2·n_0·n_1), with
  // units of m_u < 2 dropped per the estimator's definition.
  //
  // Scale: one row-local gate pass, one global aggregate — no rater
  // cross-join; the coincidence algebra collapses to per-unit counts.
  def krippendorff(docs: DataFrame): DataFrame =
    docs
      .select(expr("filter(split(lower(text), ' '), t -> t != '')").as("t"))
      .select(size(col("t")).cast("long").as("wc"),
        expr("aggregate(t, 0L, (a, x) -> a + length(x))").as("sumlen"),
        expr("aggregate(t, 0L, (a, x) -> greatest(a, length(x)))").as("maxlen"))
      .select(
        when(col("wc") >= 50L, 1L).otherwise(0L).as("r1"),
        when(col("wc") === 0L, lit(null))
          .otherwise(when(col("sumlen") >= lit(3L) * col("wc") &&
            col("sumlen") <= lit(10L) * col("wc"), 1L).otherwise(0L)).as("r2"),
        when(col("wc") === 0L, lit(null))
          .otherwise(when(col("maxlen") <= 20L, 1L).otherwise(0L)).as("r3"))
      .select(
        (coalesce(col("r1"), lit(0L)) + coalesce(col("r2"), lit(0L)) +
          coalesce(col("r3"), lit(0L))).as("ones"),
        (when(col("r1").isNotNull, 1L).otherwise(0L) +
          when(col("r2").isNotNull, 1L).otherwise(0L) +
          when(col("r3").isNotNull, 1L).otherwise(0L)).as("m"))
      .filter(col("m") >= 2L)
      .agg(count(lit(1)).as("n_units"),
        sum(col("m")).as("n_ratings"),
        sum(col("ones")).as("n_1"),
        sum(col("m") - col("ones")).as("n_0"),
        sum(expr("(2L * ones * (m - ones)) div (m - 1L)")).as("o2"))
      .select(col("n_units"), col("n_ratings"), col("n_0"), col("n_1"),
        col("o2"),
        when(col("n_0") === 0L || col("n_1") === 0L, lit(null))
          .otherwise(expr(
            """1000000L - cast((cast(1000000 as decimal(38,0)) * o2
              |  * (n_ratings - 1L))
              | div (2L * (cast(n_0 as decimal(38,0)) * n_1)) as bigint)"""
            .stripMargin)).as("alpha_ppm"))

  def q365Krippendorff(spark: SparkSession, dir: String): DataFrame =
    krippendorff(Tables.documents(spark, dir))

  val q365Sql: String =
    s"""WITH f AS (
       |  SELECT len(t) AS wc,
       |    COALESCE(list_sum(list_transform(t, x -> length(x))), 0) AS sumlen,
       |    COALESCE(list_max(list_transform(t, x -> length(x))), 0) AS maxlen
       |  FROM (SELECT ${TextOps.toksSqlD} AS t FROM documents)),
       |r AS (
       |  SELECT CASE WHEN wc >= 50 THEN 1 ELSE 0 END AS r1,
       |    CASE WHEN wc = 0 THEN NULL
       |      WHEN sumlen >= 3 * wc AND sumlen <= 10 * wc THEN 1 ELSE 0 END AS r2,
       |    CASE WHEN wc = 0 THEN NULL
       |      WHEN maxlen <= 20 THEN 1 ELSE 0 END AS r3
       |  FROM f),
       |u AS (
       |  SELECT COALESCE(r1, 0) + COALESCE(r2, 0) + COALESCE(r3, 0) AS ones,
       |    (CASE WHEN r1 IS NOT NULL THEN 1 ELSE 0 END
       |     + CASE WHEN r2 IS NOT NULL THEN 1 ELSE 0 END
       |     + CASE WHEN r3 IS NOT NULL THEN 1 ELSE 0 END) AS m
       |  FROM r),
       |a AS (
       |  SELECT COUNT(*) AS n_units, SUM(m) AS n_ratings, SUM(ones) AS n_1,
       |    SUM(m - ones) AS n_0,
       |    SUM((2 * ones * (m - ones)) // (m - 1)) AS o2
       |  FROM u WHERE m >= 2)
       |SELECT n_units, CAST(n_ratings AS BIGINT) AS n_ratings,
       |  CAST(n_0 AS BIGINT) AS n_0, CAST(n_1 AS BIGINT) AS n_1,
       |  CAST(o2 AS BIGINT) AS o2,
       |  CASE WHEN n_0 = 0 OR n_1 = 0 THEN NULL
       |    ELSE 1000000 - CAST((1000000::HUGEINT * o2 * (n_ratings - 1))
       |      // (2 * (n_0::HUGEINT * n_1)) AS BIGINT) END AS alpha_ppm
       |FROM a""".stripMargin

  // --------------------------------------------------------------------------
  // q366 — PAGE'S L ORDERED TREND over week blocks: does order volume
  // trend MONOTONICALLY across the week (Mon→Sun)? Blocks = complete
  // Monday-aligned weeks (integer arithmetic off epoch Monday
  // 1970-01-05 — no engine dow function), treatments = the 7 weekday
  // positions, values = daily order counts ranked within each block
  // with doubled midranks (tie group spanning ranks a..b gets a+b —
  // always integer). L2 = Σ j·R2 ships exactly; E[L2] = 224·b for
  // k = 7; the TIE-EXACT conditional permutation variance is
  // Var = (14/3)·Σ_b Σ_i (2r_i − 8)² — an exact integer T — and z is
  // one fixed dag + pround. q347's Friedman asks ANY weekday
  // difference; this asks the ordered question, the right test for
  // "does the week ramp".
  //
  // Scale: orders collapse to the bounded day grid; ranking windows
  // partition per 7-row block.
  def pageL(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("x"))
      .withColumn("dd", datediff(col("d"), lit("1970-01-05")).cast("long"))
      .withColumn("wk", expr("dd div 7L"))
      .withColumn("j", expr("dd % 7L + 1L"))
    val complete = daily.groupBy(col("wk")).agg(count(lit(1)).as("ndays"))
      .filter(col("ndays") === 7L).select(col("wk"))
    val ranked = daily.join(broadcast(complete), Seq("wk"))
      .withColumn("a", rank().over(
        Window.partitionBy(col("wk")).orderBy(col("x"))))
      .withColumn("tc", count(lit(1)).over(
        Window.partitionBy(col("wk"), col("x"))))
      .withColumn("r2", lit(2L) * col("a") + col("tc") - 1L)
    ranked
      .agg((countDistinct(col("wk"))).as("b"),
        sum(col("j") * col("r2")).as("l2"),
        sum((col("r2") - lit(8L)) * (col("r2") - lit(8L))).as("t_comp"))
      .select(col("b"), col("l2"), (lit(224L) * col("b")).as("e_l2"),
        col("t_comp"),
        Num.pround((col("l2") - lit(224L) * col("b")).cast("double")
          / sqrt(lit(14.0) * col("t_comp").cast("double") / lit(3.0)), 6)
          .as("z6"))
  }

  def q366PageL(spark: SparkSession, dir: String): DataFrame =
    pageL(Tables.orders(spark, dir))

  val q366Sql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS x
      |  FROM orders GROUP BY 1),
      |keyed AS (
      |  SELECT x, date_diff('day', DATE '1970-01-05', d) // 7 AS wk,
      |    date_diff('day', DATE '1970-01-05', d) % 7 + 1 AS j
      |  FROM daily),
      |complete AS (
      |  SELECT wk FROM keyed GROUP BY wk HAVING COUNT(*) = 7),
      |ranked AS (
      |  SELECT j,
      |    2 * RANK() OVER (PARTITION BY wk ORDER BY x)
      |      + COUNT(*) OVER (PARTITION BY wk, x) - 1 AS r2
      |  FROM keyed JOIN complete USING (wk)),
      |a AS (
      |  SELECT COUNT(*) // 7 AS b, SUM(j * r2) AS l2,
      |    SUM((r2 - 8) * (r2 - 8)) AS t_comp
      |  FROM ranked)
      |SELECT CAST(b AS BIGINT) AS b, CAST(l2 AS BIGINT) AS l2,
      |  CAST(224 * b AS BIGINT) AS e_l2, CAST(t_comp AS BIGINT) AS t_comp,
      |  FLOOR((CAST(l2 - 224 * b AS DOUBLE)
      |    / sqrt(14.0 * CAST(t_comp AS DOUBLE) / 3.0)) * 1e6 + 0.5) / 1e6 AS z6
      |FROM a""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q365_krippendorff", q365Krippendorff _, Some(q365Sql)),
    ("q366_page_trend", q366PageL _, Some(q366Sql)))
}
