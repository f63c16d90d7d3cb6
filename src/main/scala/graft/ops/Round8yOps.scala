package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 twenty-fifth operator batch: intraclass correlation with the
  * cluster-sampling design effect, and the distribution-free median
  * confidence interval — survey-design and robust-inference surface on
  * the §8.4 exact-integer discipline.
  */
object Round8yOps {

  // --------------------------------------------------------------------------
  // q355 — INTRACLASS CORRELATION + DESIGN EFFECT: how much do line
  // prices cluster WITHIN orders, and what does that clustering cost a
  // cluster sample? One-way random-effects ICC from exact sufficient
  // statistics — per-order (n_g, Σx, Σx²) in cents — with the two
  // sums of squares shipped as deterministic integer floors
  // (SSW = Σq_g − Σ(s_g² div n_g): per-group exact floor, error < #groups,
  // identical in every engine), then ICC, Kish's n₀ and
  // DEFF = 1 + (m̄−1)·ICC as a fixed double-op dag + pround. The number
  // every two-stage eval-sampling plan needs before trusting its SE.
  //
  // Scale: one partial-aggregated pass to per-order rows, one global
  // aggregate. Nothing else moves.
  def iccDeff(lineitem: DataFrame): DataFrame = {
    val g = lineitem
      .select(col("l_orderkey").as("gk"),
        expr("cast(floor(l_extendedprice * 100 + 0.5d) as bigint)").as("v"))
      .groupBy(col("gk"))
      .agg(count(lit(1)).as("ng"), sum(col("v")).as("sg"),
        expr("sum(v * v)").as("qg"))
    // global Σv² and Σ(s²divn) exceed BIGINT at the 10× probe (cents²
    // over the whole fact table) → DECIMAL(38,0) accumulators; the SS
    // readouts ship floor-divided to whole dollars² so the hashed cells
    // stay BIGINT-exact
    g.agg(sum(col("ng")).as("n"), count(lit(1)).as("k"),
        sum(col("sg")).as("s"),
        sum(expr("cast(qg as decimal(38,0))")).as("q"),
        sum(expr("cast((sg * sg) div ng as decimal(38,0))")).as("between_floor"),
        sum(col("ng") * col("ng")).as("n2"))
      .withColumn("ssq", expr("(cast(s as decimal(38,0)) * s) div n"))
      .withColumn("ssw_floor", expr("q - between_floor"))
      .withColumn("ssb_floor", expr("between_floor - ssq"))
      .withColumn("msb", expr("cast(ssb_floor as double) / (k - 1L)"))
      .withColumn("msw", expr("cast(ssw_floor as double) / (n - k)"))
      .withColumn("n0", expr(
        "(cast(n as double) - cast(n2 as double) / n) / (k - 1L)"))
      .withColumn("icc", expr("(msb - msw) / (msb + (n0 - 1.0d) * msw)"))
      .select(col("n"), col("k"),
        expr("cast(ssw_floor div 10000 as bigint)").as("ssw_dollars2"),
        expr("cast(ssb_floor div 10000 as bigint)").as("ssb_dollars2"),
        Num.pround(col("n0"), 4).as("n0_4"),
        Num.pround(col("icc"), 6).as("icc6"),
        Num.pround(expr("1.0d + (cast(n as double) / k - 1.0d) * icc"), 6)
          .as("deff6"))
  }

  def q355IccDeff(spark: SparkSession, dir: String): DataFrame =
    iccDeff(Tables.lineitem(spark, dir))

  val q355Sql: String =
    """WITH g AS (
      |  SELECT l_orderkey AS gk, COUNT(*) AS ng,
      |    SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS sg,
      |    SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
      |      * CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS qg
      |  FROM lineitem GROUP BY 1),
      |su AS (
      |  SELECT SUM(ng) AS n, COUNT(*) AS k, SUM(sg) AS s,
      |    SUM(qg::HUGEINT) AS q,
      |    SUM(((sg * sg) // ng)::HUGEINT) AS between_floor, SUM(ng * ng) AS n2
      |  FROM g),
      |d AS (
      |  SELECT n, k,
      |    q - between_floor AS ssw_floor,
      |    between_floor - (s::HUGEINT * s) // n AS ssb_floor,
      |    CAST(between_floor - (s::HUGEINT * s) // n AS DOUBLE) / (k - 1) AS msb,
      |    CAST(q - between_floor AS DOUBLE) / (n - k) AS msw,
      |    (CAST(n AS DOUBLE) - CAST(n2 AS DOUBLE) / n) / (k - 1) AS n0
      |  FROM su),
      |e AS (
      |  SELECT *, (msb - msw) / (msb + (n0 - 1.0) * msw) AS icc FROM d)
      |SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
      |  CAST(ssw_floor // 10000 AS BIGINT) AS ssw_dollars2,
      |  CAST(ssb_floor // 10000 AS BIGINT) AS ssb_dollars2,
      |  FLOOR((n0) * 1e4 + 0.5) / 1e4 AS n0_4,
      |  FLOOR((icc) * 1e6 + 0.5) / 1e6 AS icc6,
      |  FLOOR((1.0 + (CAST(n AS DOUBLE) / k - 1.0) * icc) * 1e6 + 0.5) / 1e6
      |    AS deff6
      |FROM e""".stripMargin

  // --------------------------------------------------------------------------
  // q356 — DISTRIBUTION-FREE MEDIAN CI: the exact-rank 95% confidence
  // interval for the median balance — order statistics at
  // k = (n ∓ 1.959964·√n)/2, no normality assumption, no resampling
  // (the binomial-rank construction; q239's bootstrap is the moment
  // cousin). Ranks come from a fixed double-op dag over n (one sqrt),
  // then every value lookup is exact: the q169 VALUE-HISTOGRAM
  // cumulative grid answers "value at rank r" with an equi-bounded
  // range probe. Ships the median (both middle order statistics, exact
  // cents) and the CI endpoints.
  //
  // Scale: q341's histogram shape — one bounded-grid window; the rank
  // probes join a broadcast 4-row rank list against the grid.
  def medianCi(rows: DataFrame, valueCol: String): DataFrame = {
    val hist = rows
      .select(expr(s"cast(floor($valueCol * 100 + 0.5d) as bigint)").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)))
      .localCheckpoint()
    val n = hist.agg(sum(col("c")).as("n"))
    val ranks = n.select(col("n"), explode(array(
        struct(lit("ci_lo").as("which"),
          expr("cast(floor((n - 1.959964d * sqrt(cast(n as double))) / 2.0d) as long)").as("r")),
        struct(lit("med_lo").as("which"), expr("(n + 1L) div 2L").as("r")),
        struct(lit("med_hi").as("which"), expr("(n + 2L) div 2L").as("r")),
        struct(lit("ci_hi").as("which"),
          expr("cast(ceil(1.0d + (n + 1.959964d * sqrt(cast(n as double))) / 2.0d) as long)").as("r"))))
        .as("x"))
      .select(col("n"), col("x.which").as("which"),
        greatest(least(col("x.r"), col("n")), lit(1L)).as("r"))
    ranks.join(hist, col("cum") >= col("r") &&
        (col("cum") - col("c")) < col("r"))
      .groupBy(lit(1).as("one"))
      .agg(first(col("n")).as("n"),
        min(when(col("which") === "ci_lo", col("v"))).as("ci_lo_cents"),
        min(when(col("which") === "med_lo", col("v"))).as("med_lo_cents"),
        min(when(col("which") === "med_hi", col("v"))).as("med_hi_cents"),
        min(when(col("which") === "ci_hi", col("v"))).as("ci_hi_cents"))
      .drop("one")
  }

  def q356MedianCi(spark: SparkSession, dir: String): DataFrame =
    medianCi(Tables.customer(spark, dir), "c_acctbal")

  val q356Sql: String =
    """WITH hist AS (
      |  SELECT CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS v, COUNT(*) AS c
      |  FROM customer GROUP BY 1),
      |cumh AS (
      |  SELECT v, c, SUM(c) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM hist),
      |nn AS (SELECT SUM(c) AS n FROM hist),
      |rraw AS (
      |  SELECT n, 'ci_lo' AS which,
      |    CAST(FLOOR((n - 1.959964 * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT) AS r
      |  FROM nn
      |  UNION ALL SELECT n, 'med_lo', (n + 1) // 2 FROM nn
      |  UNION ALL SELECT n, 'med_hi', (n + 2) // 2 FROM nn
      |  UNION ALL SELECT n, 'ci_hi',
      |    CAST(CEIL(1.0 + (n + 1.959964 * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT)
      |  FROM nn),
      |ranks AS (SELECT n, which, GREATEST(LEAST(r, n), 1) AS r FROM rraw)
      |SELECT CAST(ANY_VALUE(n) AS BIGINT) AS n,
      |  MIN(v) FILTER (which = 'ci_lo') AS ci_lo_cents,
      |  MIN(v) FILTER (which = 'med_lo') AS med_lo_cents,
      |  MIN(v) FILTER (which = 'med_hi') AS med_hi_cents,
      |  MIN(v) FILTER (which = 'ci_hi') AS ci_hi_cents
      |FROM ranks JOIN cumh ON cum >= r AND (cum - c) < r""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q355_icc_deff", q355IccDeff _, Some(q355Sql)),
    ("q356_median_ci", q356MedianCi _, Some(q356Sql)))
}
