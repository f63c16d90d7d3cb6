package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 fourteenth operator batch: forecast backtesting and the
  * Siegel repeated-median slope — time-series eval/robust-stats surface
  * on the §8.4 exact-integer discipline; both collapse to the
  * calendar-day grid.
  */
object Round8nOps {

  // --------------------------------------------------------------------------
  // q333 — FORECAST BACKTEST (MASE): one-step naive-1 persistence
  // forecast scored against the seasonal-naive-7 baseline over the daily
  // order-count series — the scale-free forecast-accuracy readout
  // (MASE < 1 ⇔ persistence beats weekly seasonality). Integer series ⇒
  // both absolute-error sums are exact BIGINTs and mase_ppm is one
  // floor-div; no float enters the hashed row.
  //
  // Scale: the corpus collapses to the calendar grid in one aggregate;
  // lags are windows over that bounded grid (allowlisted class).
  def q333MaseBacktest(spark: SparkSession, dir: String): DataFrame = {
    val grid = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("x"))
      .withColumn("i", row_number().over(Window.orderBy(col("d"))))
    val w = Window.orderBy(col("i"))
    grid
      .withColumn("l1", lag(col("x"), 1).over(w))
      .withColumn("l7", lag(col("x"), 7).over(w))
      .filter(col("l7").isNotNull)
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("x") - col("l1"))).as("sum_abs_naive1"),
        sum(abs(col("x") - col("l7"))).as("sum_abs_naive7"))
      .select(col("n_eval"), col("sum_abs_naive1"), col("sum_abs_naive7"),
        expr("case when sum_abs_naive7 = 0L then null " +
          "else (1000000L * sum_abs_naive1) div sum_abs_naive7 end").as("mase_ppm"))
  }

  val q333Sql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS x
      |  FROM orders GROUP BY 1),
      |g AS (
      |  SELECT x,
      |    LAG(x, 1) OVER (ORDER BY d) AS l1,
      |    LAG(x, 7) OVER (ORDER BY d) AS l7
      |  FROM daily)
      |SELECT COUNT(*) AS n_eval,
      |  CAST(SUM(ABS(x - l1)) AS BIGINT) AS sum_abs_naive1,
      |  CAST(SUM(ABS(x - l7)) AS BIGINT) AS sum_abs_naive7,
      |  CASE WHEN SUM(ABS(x - l7)) = 0 THEN NULL
      |    ELSE CAST((1000000 * SUM(ABS(x - l1))) // SUM(ABS(x - l7)) AS BIGINT)
      |  END AS mase_ppm
      |FROM g WHERE l7 IS NOT NULL""".stripMargin

  // --------------------------------------------------------------------------
  // q334 — SIEGEL REPEATED-MEDIAN SLOPE: median over i of (median over
  // j≠i of pairwise slopes) — breakdown point 50%, the robust-trend
  // complement to q310's Theil–Sen (29%). Both median SELECTIONS use the
  // (slope-double, dy, dx) total order from exact integers (q310's
  // rule), so the chosen elements are engine-deterministic and their
  // exact (dy, dx) ship.
  //
  // Scale: the j≠i pair expansion is calendar-grid-bounded (≤ 730²
  // pairs at ANY corpus size, q310's joinAllow class); the inner rank is
  // partitioned by i, the outer rank runs over ≤ 730 medians. The grid
  // and the per-i medians each feed TWO consumers (both self-join sides;
  // the n-aggregate and the final rank) — LAZY localCheckpoints flatten
  // those shared subtrees to LogicalRDDs so the orders scan + daily
  // aggregate runs once, not four times (measured 8.9 s → 2.7 s at
  // sf0.1; the windows themselves were never the cost).
  def siegelSlope(daily: DataFrame): DataFrame = {
    val grid = daily
      .withColumn("i", row_number().over(Window.orderBy(col("d"))))
      .select(col("i"), col("x")).localCheckpoint(false)
    val a = grid.select(col("i").as("ia"), col("x").as("xa"))
    val b = grid.select(col("i").as("ib"), col("x").as("xb"))
    val sl = a.join(b, col("ib") =!= col("ia"))
      .select(col("ia"),
        (col("xb") - col("xa")).as("dy"),
        (col("ib") - col("ia")).cast("long").as("dx"))
      .withColumn("s", col("dy").cast("double") / col("dx"))
    val perI = sl
      .withColumn("m", count(lit(1)).over(Window.partitionBy(col("ia"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("ia")).orderBy(col("s"), col("dy"), col("dx"))))
      .filter(col("rk") === expr("(m + 1L) div 2L"))
      .select(col("ia"), col("s"), col("dy"), col("dx"))
      .localCheckpoint(false)
    val n = perI.agg(count(lit(1)).as("n_days"))
    perI.crossJoin(broadcast(n))
      .withColumn("rk2", row_number().over(
        Window.orderBy(col("s"), col("dy"), col("dx"), col("ia"))))
      .filter(col("rk2") === expr("(n_days + 1L) div 2L"))
      .select(col("n_days"), col("ia").as("med_day"), col("dy").as("med_dy"),
        col("dx").as("med_dx"), Num.pround(col("s"), 6).as("slope6"))
  }

  def q334SiegelSlope(spark: SparkSession, dir: String): DataFrame =
    siegelSlope(Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("x")))

  val q334Sql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS x
      |  FROM orders GROUP BY 1),
      |grid AS (SELECT ROW_NUMBER() OVER (ORDER BY d) AS i, x FROM daily),
      |sl AS (
      |  SELECT a.i AS ia, b.x - a.x AS dy, b.i - a.i AS dx,
      |    CAST(b.x - a.x AS DOUBLE) / CAST(b.i - a.i AS DOUBLE) AS s
      |  FROM grid a JOIN grid b ON b.i <> a.i),
      |pi AS (
      |  SELECT ia, s, dy, dx FROM (
      |    SELECT ia, s, dy, dx,
      |      COUNT(*) OVER (PARTITION BY ia) AS m,
      |      ROW_NUMBER() OVER (PARTITION BY ia ORDER BY s, dy, dx) AS rk
      |    FROM sl)
      |  WHERE rk = (m + 1) // 2),
      |n AS (SELECT COUNT(*) AS n_days FROM pi),
      |r AS (
      |  SELECT ia, s, dy, dx,
      |    ROW_NUMBER() OVER (ORDER BY s, dy, dx, ia) AS rk2
      |  FROM pi)
      |SELECT n_days, CAST(ia AS BIGINT) AS med_day, CAST(dy AS BIGINT) AS med_dy,
      |  CAST(dx AS BIGINT) AS med_dx,
      |  FLOOR((s) * 1e6 + 0.5) / 1e6 AS slope6
      |FROM r CROSS JOIN n WHERE rk2 = (n_days + 1) // 2""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q333_mase_backtest", q333MaseBacktest _, Some(q333Sql)),
    ("q334_siegel_slope", q334SiegelSlope _, Some(q334Sql)))
}
