package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series / longitudinal statistics over the event log and orders
  * fact: engagement stickiness, changepoint detection, time-weighted
  * aggregation, and higher statistical moments — the operators a metrics
  * warehouse layers on top of the raw analytics in [[EventOps]] ([EXT]
  * north-star surface; the reference has none of this).
  *
  * Shared scale shape: the log collapses to a per-entity or per-day grid
  * in ONE shuffle, and every subsequent window/aggregate runs on that grid
  * (bounded by the calendar span or the user population, both orders of
  * magnitude below the event count). Numeric policy per Relational.scala:
  * exact decimal/integer sums, one double expression at the end, ROUND.
  */
object SeriesOps {

  private def day(c: Column): Column = to_date(c)

  // --------------------------------------------------------------------------
  // q166 — DAU/WAU/MAU stickiness ratios: for every active day, distinct
  // users that day / trailing 7 days / trailing 28 days, plus the
  // DAU/WAU and DAU/MAU engagement ratios product teams track.
  //
  // Scale: the log dedups to (day, user) pairs in ONE shuffle (map-side
  // partial distinct); the trailing windows are the q139 REPLICATE-TO-
  // WINDOW shape — each pair fans out row-locally to the ≤28 target days
  // it covers, then ONE hash countDistinct per window length. No range
  // self-join of the log against itself, no window-frame distinct (which
  // Spark cannot express anyway). Fan-out is 35× the DEDUPED pair table,
  // not the log. Ratios are int/int double divisions — IEEE-deterministic.
  def q166Stickiness(spark: SparkSession, dir: String): DataFrame = {
    val du = Tables.events(spark, dir)
      .select(day(col("ts")).as("day"), col("user_id")).distinct()
    def trailing(n: Int, out: String): DataFrame = du
      .select(explode(expr(s"sequence(day, date_add(day, ${n - 1}), interval 1 day)")).as("day"),
        col("user_id"))
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as(out))
    du.groupBy(col("day")).agg(countDistinct(col("user_id")).as("dau"))
      .join(trailing(7, "wau"), Seq("day"))   // inner: fan-out days past the
      .join(trailing(28, "mau"), Seq("day"))  // data end drop here
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"), col("mau"),
        Num.pround(col("dau").cast("double") / col("wau"), 4).as("dau_wau"),
        Num.pround(col("dau").cast("double") / col("mau"), 4).as("dau_mau"))
      .orderBy(col("day"))
  }

  val q166Sql: String =
    """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM du GROUP BY day),
      |wau AS (SELECT d.day, COUNT(DISTINCT u.user_id) AS wau
      |        FROM dau d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day GROUP BY d.day),
      |mau AS (SELECT d.day, COUNT(DISTINCT u.user_id) AS mau
      |        FROM dau d JOIN du u ON u.day BETWEEN d.day - 27 AND d.day GROUP BY d.day)
      |SELECT STRFTIME(d.day, '%Y-%m-%d') AS day, d.dau, w.wau, m.mau,
      |  FLOOR((CAST(d.dau AS DOUBLE) / w.wau) * 1e4 + 0.5) / 1e4 AS dau_wau,
      |  FLOOR((CAST(d.dau AS DOUBLE) / m.mau) * 1e4 + 0.5) / 1e4 AS dau_mau
      |FROM dau d JOIN wau w USING (day) JOIN mau m USING (day)
      |ORDER BY day""".stripMargin

  // --------------------------------------------------------------------------
  // q167 — CUSUM changepoint statistic on daily revenue: the running sum of
  // deviations from the global daily mean; a sustained level shift makes
  // |CUSUM| ramp, so its extremes locate candidate changepoints.
  //
  // Scale: orders collapse to the per-day revenue grid in ONE shuffle; the
  // running windows are single-partition BUT over the bounded calendar
  // grid (~2 years of days), never over orders — PlanLintSpec allowlists
  // exactly this case. Numerics: revenue in exact decimal cents; the
  // deviation sum is the ALL-INTEGER identity cum·n − k·tot (no per-day
  // float mean subtraction accumulating error), carried in DECIMAL(38)
  // because k·tot overflows a long at warehouse scale; ONE double division
  // at the end, rounded.
  def q167Cusum(spark: SparkSession, dir: String): DataFrame = {
    val cents = (sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
      .cast(DecimalType(38, 0))
    val byDay = Tables.orders(spark, dir)
      .groupBy(day(col("o_orderdate")).as("day")).agg(cents.as("rev_cents"))
    val ord = Window.orderBy(col("day"))
    val tot = byDay.agg(sum(col("rev_cents")).cast(DecimalType(38, 0)).as("tot"),
      count(lit(1)).as("n"))
    byDay
      .withColumn("k", row_number().over(ord))
      .withColumn("cum", sum(col("rev_cents")).over(ord).cast(DecimalType(38, 0)))
      .crossJoin(broadcast(tot))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        Num.pround(col("rev_cents").cast("double") / 100.0, 2).as("rev"),
        Num.pround((col("cum") * col("n") - col("k") * col("tot")).cast("double")
          / (lit(100.0) * col("n")), 2).as("cusum"))
      .orderBy(col("day"))
  }

  val q167Sql: String =
    """WITH byday AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS DECIMAL(38,0)) AS rev_cents
      |  FROM orders GROUP BY 1),
      |g AS (SELECT CAST(SUM(rev_cents) AS DECIMAL(38,0)) AS tot, COUNT(*) AS n FROM byday),
      |w AS (
      |  SELECT day, rev_cents,
      |    ROW_NUMBER() OVER (ORDER BY day) AS k,
      |    CAST(SUM(rev_cents) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS DECIMAL(38,0)) AS cum
      |  FROM byday)
      |SELECT STRFTIME(day, '%Y-%m-%d') AS day,
      |  FLOOR((CAST(rev_cents AS DOUBLE) / 100e0) * 1e2 + 0.5) / 1e2 AS rev,
      |  FLOOR((CAST(cum * n - k * tot AS DOUBLE) / (100e0 * n)) * 1e2 + 0.5) / 1e2 AS cusum
      |FROM w, g ORDER BY day""".stripMargin

  // --------------------------------------------------------------------------
  // q233 — STL-LITE SEASONAL DECOMPOSITION of daily revenue: trend =
  // centered 7-day moving average, seasonal = per-weekday mean of the
  // detrended series, residual = observed − trend − seasonal, with a
  // 2σ residual anomaly flag — the decomposition that turns q167's "a
  // shift happened" into "Tuesday was anomalous AFTER accounting for
  // trend and weekday shape".
  //
  // Scale: orders collapse to the bounded per-day grid in ONE shuffle;
  // the ±3-day window runs over that grid (q167's allowlisted case); the
  // weekday profile is a 7-row broadcast.
  //
  // Exactness: everything through the residual is integer/decimal —
  // detrended numerator d7 = 7y − Σ₇y (exact), seasonal numerator per
  // weekday (exact sums), residual = (d7·cnt_w − s_num)/(7·cnt_w) one
  // double division; the z-score reads exact scaled-long moments (the
  // residual is re-gridded to 1e-4 dollars with an explicit
  // floor(x·1e4 + 0.5) spelled identically in both engines).
  def q233StlDecompose(spark: SparkSession, dir: String): DataFrame = {
    val cents = (sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
      .cast(DecimalType(38, 0))
    val byDay = Tables.orders(spark, dir)
      .groupBy(day(col("o_orderdate")).as("day")).agg(cents.as("y"))
    val w7 = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val t = byDay
      .withColumn("sum7", sum(col("y")).over(w7).cast(DecimalType(38, 0)))
      .withColumn("cnt7", count(lit(1)).over(w7))
      .filter(col("cnt7") === 7)
      .withColumn("d7", (col("y") * 7 - col("sum7")).cast(DecimalType(38, 0)))
      .withColumn("dow", dayofweek(col("day")))
    val seas = t.groupBy(col("dow"))
      .agg(sum(col("d7")).cast(DecimalType(38, 0)).as("s_num"),
        count(lit(1)).as("s_cnt"))
    val r = t.join(broadcast(seas), Seq("dow"))
      .withColumn("resid",
        (col("d7") * col("s_cnt") - col("s_num")).cast("double") /
          (lit(700.0) * col("s_cnt"))) // dollars
      .withColumn("rq", floor(col("resid") * 1e4 + 0.5).cast("long"))
    val st = r.agg(count(lit(1)).as("n"),
      sum(col("rq")).cast(DecimalType(38, 0)).as("s1"),
      sum((col("rq").cast(DecimalType(38, 0)) * col("rq"))).cast(DecimalType(38, 0)).as("s2"))
    r.crossJoin(broadcast(st))
      .withColumn("mu", col("s1").cast("double") / col("n"))
      .withColumn("sigma", sqrt(
        (col("s2") * col("n") - col("s1") * col("s1")).cast("double")) /
        col("n").cast("double"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        Num.pround(col("y").cast("double") / 100.0, 2).as("rev"),
        Num.pround(col("sum7").cast("double") / 700.0, 2).as("trend"),
        Num.pround(col("s_num").cast("double") / (lit(700.0) * col("s_cnt")), 2).as("seasonal"),
        Num.pround(col("resid"), 2).as("resid"),
        (abs(col("rq") - col("mu")) > lit(2.0) * col("sigma")).as("anomaly"))
      .orderBy(col("day"))
  }

  val q233Sql: String =
    """WITH byday AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS DECIMAL(38,0)) AS y
      |  FROM orders GROUP BY 1),
      |t AS (
      |  SELECT day, y,
      |    CAST(SUM(y) OVER w AS DECIMAL(38,0)) AS sum7,
      |    COUNT(*) OVER w AS cnt7,
      |    dayofweek(day) + 1 AS dow
      |  FROM byday WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |tf AS (SELECT *, CAST(y * 7 - sum7 AS DECIMAL(38,0)) AS d7 FROM t WHERE cnt7 = 7),
      |seas AS (
      |  SELECT dow, CAST(SUM(d7) AS DECIMAL(38,0)) AS s_num, COUNT(*) AS s_cnt
      |  FROM tf GROUP BY dow),
      |r AS (
      |  SELECT tf.*, s_num, s_cnt,
      |    CAST(d7 * s_cnt - s_num AS DOUBLE) / (700.0 * s_cnt) AS resid
      |  FROM tf JOIN seas USING (dow)),
      |rq AS (SELECT *, CAST(FLOOR(resid * 1e4 + 0.5) AS BIGINT) AS q FROM r),
      |st AS (
      |  SELECT COUNT(*) AS n, CAST(SUM(q) AS DECIMAL(38,0)) AS s1,
      |    CAST(SUM(CAST(q AS DECIMAL(38,0)) * q) AS DECIMAL(38,0)) AS s2
      |  FROM rq)
      |SELECT STRFTIME(day, '%Y-%m-%d') AS day,
      |  FLOOR((CAST(y AS DOUBLE) / 100e0) * 1e2 + 0.5) / 1e2 AS rev,
      |  FLOOR((CAST(sum7 AS DOUBLE) / 700e0) * 1e2 + 0.5) / 1e2 AS trend,
      |  FLOOR((CAST(s_num AS DOUBLE) / (700e0 * s_cnt)) * 1e2 + 0.5) / 1e2 AS seasonal,
      |  FLOOR((resid) * 1e2 + 0.5) / 1e2 AS resid,
      |  ABS(q - CAST(s1 AS DOUBLE) / n)
      |    > 2.0 * sqrt(CAST(s2 * n - s1 * s1 AS DOUBLE)) / n AS anomaly
      |FROM rq CROSS JOIN st ORDER BY day""".stripMargin

  // --------------------------------------------------------------------------
  // q168 — time-weighted average of `value` per user: each event's value
  // holds until the next event (step function), so the mean is
  // Σ vᵢ·Δtᵢ / Σ Δtᵢ — the correct average for IRREGULARLY sampled series
  // (a plain avg() overweights bursts).
  //
  // Scale: one user_id shuffle for the lead() window; everything after is
  // a per-user aggregate on the same exchange. Numerics: Δt is exact µs
  // (both engines truncate the parquet nanos to µs); v quantizes to
  // floor(v·1e6) — one double multiply + floor, deterministic IEEE — and
  // the v·Δt products sum as exact DECIMAL(38) integers (HUGEINT in the
  // oracle), so the sum is order-independent; ONE double division, ROUND.
  def q168TimeWeightedAvg(spark: SparkSession, dir: String): DataFrame = {
    val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("dt", unix_micros(lead(col("ts"), 1).over(byTs)) - unix_micros(col("ts")))
      .withColumn("contrib",
        floor(col("value") * 1e6).cast(DecimalType(38, 0)) * col("dt"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("dt")).as("span_us"),
        sum(col("contrib")).as("wsum"))
      .filter(col("n_events") >= 2 && col("span_us") > 0)
      .select(col("user_id"), col("n_events"),
        Num.pround(col("wsum").cast("double") / (lit(1e6) * col("span_us")), 4).as("twa"))
      .orderBy(col("user_id"))
  }

  val q168Sql: String =
    """WITH e AS (
      |  SELECT user_id,
      |    epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) - epoch_us(ts) AS dt,
      |    value
      |  FROM events),
      |agg AS (
      |  SELECT user_id, COUNT(*) AS n_events, SUM(dt) AS span_us,
      |    SUM(CAST(FLOOR(value * 1e6) AS HUGEINT) * dt) AS wsum
      |  FROM e GROUP BY user_id)
      |SELECT user_id, n_events,
      |  FLOOR((CAST(wsum AS DOUBLE) / (1e6 * span_us)) * 1e4 + 0.5) / 1e4 AS twa
      |FROM agg WHERE n_events >= 2 AND span_us > 0
      |ORDER BY user_id""".stripMargin

  // --------------------------------------------------------------------------
  // q175 — higher moments per group: skewness and excess kurtosis of order
  // value by priority, from raw integer power sums. Engine-builtin
  // skewness()/kurtosis() implementations disagree on the estimator
  // (population vs sample, bias correction), so both sides compute the
  // POPULATION moments from the same four exact sums — cent units cancel
  // in the standardized ratios.
  //
  // Scale: one map-side-partial hash aggregate; the shuffle carries 4
  // power sums × |groups|. Numerics: cents fit DECIMAL(10); the c⁴ sum
  // stays within DECIMAL(38) up to ~10¹² rows of 10⁶-dollar orders
  // (1e31·1e12 < 1e38 headroom documented here). Central-moment formulas
  // are the SAME double expression tree on both engines (exact int
  // inputs → IEEE-deterministic); pow()'s last-ulp slack absorbs in
  // ROUND(,4) (q65 ln() precedent).
  def q175Moments(spark: SparkSession, dir: String): DataFrame = {
    val c = (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast(DecimalType(10, 0))
    val agg = Tables.orders(spark, dir)
      .select(col("o_orderpriority"), c.as("c"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("c")).cast(DecimalType(38, 0)).as("s1"),
        sum(col("c") * col("c")).cast(DecimalType(38, 0)).as("s2"),
        sum(col("c") * col("c") * col("c")).cast(DecimalType(38, 0)).as("s3"),
        sum(col("c") * col("c") * col("c") * col("c")).cast(DecimalType(38, 0)).as("s4"))
    val n = col("n").cast("double")
    val m1 = col("s1").cast("double") / n
    val m2 = col("s2").cast("double") / n - m1 * m1
    val m3 = col("s3").cast("double") / n - lit(3.0) * m1 * (col("s2").cast("double") / n) +
      lit(2.0) * m1 * m1 * m1
    val m4 = col("s4").cast("double") / n - lit(4.0) * m1 * (col("s3").cast("double") / n) +
      lit(6.0) * m1 * m1 * (col("s2").cast("double") / n) - lit(3.0) * m1 * m1 * m1 * m1
    agg.select(col("o_orderpriority"), col("n"),
      Num.pround(m1 / 100.0, 2).as("mean"),
      Num.pround(m3 / pow(m2, 1.5), 4).as("skewness"),
      Num.pround(m4 / (m2 * m2) - 3.0, 4).as("kurtosis_excess"))
      .orderBy(col("o_orderpriority"))
  }

  val q175Sql: String =
    """WITH agg AS (
      |  SELECT o_orderpriority, COUNT(*) AS n,
      |    SUM(c) AS s1, SUM(c*c) AS s2, SUM(c*c*c) AS s3, SUM(c*c*c*c) AS s4
      |  FROM (SELECT o_orderpriority,
      |          CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS HUGEINT) AS c
      |        FROM orders) GROUP BY o_orderpriority),
      |m AS (
      |  SELECT o_orderpriority, n,
      |    CAST(s1 AS DOUBLE) / n AS m1,
      |    CAST(s2 AS DOUBLE) / n AS r2,
      |    CAST(s3 AS DOUBLE) / n AS r3,
      |    CAST(s4 AS DOUBLE) / n AS r4
      |  FROM agg)
      |SELECT o_orderpriority, n,
      |  FLOOR((m1 / 100e0) * 1e2 + 0.5) / 1e2 AS mean,
      |  FLOOR(((r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1)
      |        / POW(r2 - m1 * m1, 1.5)) * 1e4 + 0.5) / 1e4 AS skewness,
      |  FLOOR(((r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2 - 3.0 * m1 * m1 * m1 * m1)
      |        / ((r2 - m1 * m1) * (r2 - m1 * m1)) - 3.0) * 1e4 + 0.5) / 1e4 AS kurtosis_excess
      |FROM m ORDER BY o_orderpriority""".stripMargin

  // --------------------------------------------------------------------------
  // q245 — EWMA ONE-STEP-AHEAD FORECAST with DYADIC weights (α = 1/2):
  // forecast_t = Σ_{i=1..14} 2^(14−i)·y_{t−i} / (2^14 − 1) — exponential
  // smoothing truncated at 14 lags and renormalized. The α = 1/2 choice
  // is deliberate: every weight is a power of two, so the weighted sum is
  // an EXACT integer (cents × integer weights, decimal Σ) and the single
  // division at output is the only float op — no libm pow, no float
  // accumulation order to diverge across engines. Sequential-recurrence
  // smoothing becomes a 14-offset self-join ON THE BOUNDED DAY GRID (the
  // corpus collapses to per-day revenue in one shuffle first), which is
  // how a recursive filter goes distributed: reformulate as a finite
  // convolution, never iterate over rows.
  //
  // Output: per day (with full 14-day history) actual, forecast, and the
  // absolute percentage error as an exact rational |y·W − num| / (y·W).
  def q245EwmaForecast(spark: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val cents = (sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
      .cast(d38)
    val grid = Tables.orders(spark, dir)
      .groupBy(day(col("o_orderdate")).as("day")).agg(cents.as("y"))
      .withColumn("rn", row_number().over(Window.orderBy(col("day"))))
    val contrib = grid
      .withColumn("i", explode(sequence(lit(1), lit(14))))
      .select((col("rn") + col("i")).as("trn"),
        (col("y") * expr("cast(shiftleft(1L, 14 - i) as decimal(18,0))")).cast(d38).as("wy"))
      .groupBy(col("trn"))
      .agg(sum(col("wy")).cast(d38).as("num"), count(lit(1)).as("k"))
      .filter(col("k") === 14)
    grid.join(contrib, col("rn") === col("trn"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        Num.pround(col("y").cast("double") / 100.0, 2).as("rev"),
        Num.pround(col("num").cast("double") / 16383.0 / 100.0, 2).as("forecast"),
        Num.pround(abs(col("y") * 16383 - col("num")).cast("double") /
          (col("y") * 16383).cast("double"), 6).as("ape"))
      .orderBy(col("day"))
  }

  val q245Sql: String =
    """WITH byday AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS DECIMAL(38,0)) AS HUGEINT) AS y
      |  FROM orders GROUP BY 1),
      |grid AS (
      |  SELECT day, y, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM byday),
      |contrib AS (
      |  SELECT rn + i AS trn, SUM(y * (1::BIGINT << (14 - i))) AS num, COUNT(*) AS k
      |  FROM grid, LATERAL (SELECT unnest(range(1, 15)) AS i) o
      |  GROUP BY 1 HAVING COUNT(*) = 14)
      |SELECT STRFTIME(day, '%Y-%m-%d') AS day,
      |  FLOOR((CAST(y AS DOUBLE) / 100.0) * 1e2 + 0.5) / 1e2 AS rev,
      |  FLOOR((CAST(num AS DOUBLE) / 16383.0 / 100.0) * 1e2 + 0.5) / 1e2 AS forecast,
      |  FLOOR((CAST(ABS(y * 16383 - num) AS DOUBLE) / CAST(y * 16383 AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS ape
      |FROM grid JOIN contrib ON rn = trn
      |ORDER BY day""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q166_stickiness", q166Stickiness _, Some(q166Sql)),
    ("q245_ewma_forecast", q245EwmaForecast _, Some(q245Sql)),
    ("q167_cusum", q167Cusum _, Some(q167Sql)),
    ("q233_stl_decompose", q233StlDecompose _, Some(q233Sql)),
    ("q168_time_weighted_avg", q168TimeWeightedAvg _, Some(q168Sql)),
    ("q175_moments", q175Moments _, Some(q175Sql)))
}
