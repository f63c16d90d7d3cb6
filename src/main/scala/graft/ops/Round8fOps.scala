package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 sixth operator batch: Theil–Sen robust slope, the
  * Mann–Kendall trend test, deterministic class rebalancing, and
  * per-user interval union (gaps-and-islands coverage) — robust-stats
  * and pipeline surface on the §8.4 exact-integer discipline. The two
  * trend operators share one calendar-grid pair join (≤ 730² pairs by
  * construction, corpus-size-independent after the daily aggregate).
  */
object Round8fOps {

  /** (i, x) daily order-count grid and its i<j pair expansion —
    * calendar-bounded: the corpus collapses to ≤ 730 rows in one
    * aggregate, so the self-join is ≤ 730²/2 pairs at ANY corpus size.
    */
  private def dailyPairs(spark: SparkSession, dir: String): DataFrame = {
    val idx = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("x"))
      .withColumn("i", row_number().over(Window.orderBy(col("d"))))
      .select(col("i"), col("x"))
    val a = idx.select(col("i").as("ia"), col("x").as("xa"))
    val b = idx.select(col("i").as("ib"), col("x").as("xb"))
    a.join(b, col("ib") > col("ia"))
  }

  private val dailyPairsSql: String =
    """daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS x
      |  FROM orders GROUP BY 1),
      |idx AS (SELECT ROW_NUMBER() OVER (ORDER BY d) AS i, x FROM daily),
      |pairs AS (
      |  SELECT a.i AS ia, a.x AS xa, b.i AS ib, b.x AS xb
      |  FROM idx a JOIN idx b ON b.i > a.i)""".stripMargin

  // --------------------------------------------------------------------------
  // q310 — THEIL–SEN ROBUST SLOPE of the daily order-count series: the
  // median of all pairwise slopes (xj−xi)/(j−i) — the standard
  // outlier-resistant trend estimate (breakdown point 29%). The median
  // element is picked by rank k = (m+1) div 2 under the total order
  // (slope-double, dy, dx): the double division is one IEEE op from
  // exact integers — identical in both engines — and ties break on the
  // exact integer pair, so the SELECTED ELEMENT is deterministic and
  // its (dy, dx) ships exactly; only the display slope is pround'd.
  //
  // Scale: pair mass is calendar-grid-bounded (above); the rank window
  // is over that bounded pair set (allowlisted).
  def q310TheilSen(spark: SparkSession, dir: String): DataFrame = {
    val sl = dailyPairs(spark, dir)
      .select((col("xb") - col("xa")).as("dy"), (col("ib") - col("ia")).as("dx"))
      .withColumn("s", col("dy").cast("double") / col("dx").cast("double"))
    val m = sl.agg(count(lit(1)).as("m"))
    sl.crossJoin(broadcast(m))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("s"), col("dy"), col("dx"))))
      .filter(col("rk") === expr("(m + 1L) div 2L"))
      .select(col("m"), col("dy").as("med_dy"),
        col("dx").cast("long").as("med_dx"),
        Num.pround(col("s"), 6).as("slope6"))
  }

  val q310Sql: String =
    s"""WITH $dailyPairsSql,
       |sl AS (
       |  SELECT xb - xa AS dy, ib - ia AS dx,
       |    CAST(xb - xa AS DOUBLE) / CAST(ib - ia AS DOUBLE) AS s
       |  FROM pairs),
       |m AS (SELECT COUNT(*) AS m FROM sl),
       |rk AS (
       |  SELECT dy, dx, s, ROW_NUMBER() OVER (ORDER BY s, dy, dx) AS rk
       |  FROM sl)
       |SELECT m.m, dy AS med_dy, dx AS med_dx,
       |  FLOOR((s) * 1e6 + 0.5) / 1e6 AS slope6
       |FROM rk CROSS JOIN m WHERE rk = (m.m + 1) // 2""".stripMargin

  // --------------------------------------------------------------------------
  // q311 — MANN–KENDALL TREND TEST on the same series: S = Σ sign(xj−xi)
  // over i<j, tie-corrected variance 18·Var(S) = n(n−1)(2n+5) −
  // Σ t(t−1)(2t+5) kept as an EXACT integer, and the continuity-
  // corrected z — the nonparametric "is there a monotone trend" answer
  // that pairs with q310's slope estimate.
  //
  // Determinism: s and var18 are exact BIGINTs; z6 is pround of one
  // IEEE chain over them.
  def q311MannKendall(spark: SparkSession, dir: String): DataFrame = {
    val s = dailyPairs(spark, dir)
      .agg(sum(signum(col("xb") - col("xa")).cast("long")).as("s"))
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("x"))
    val ties = daily.groupBy(col("x")).agg(count(lit(1)).as("t"))
      .agg(sum(expr("t * (t - 1L) * (2L * t + 5L)")).as("tcorr"))
    val n = daily.agg(count(lit(1)).as("n"))
    s.crossJoin(broadcast(n)).crossJoin(broadcast(ties))
      .withColumn("var18", expr("n * (n - 1L) * (2L * n + 5L) - tcorr"))
      .withColumn("z6", Num.pround(
        (col("s") - signum(col("s")).cast("long")).cast("double") /
          sqrt(col("var18").cast("double") / lit(18.0d)), 6))
      .withColumn("trend",
        when(col("z6") > 1.96, lit("increasing"))
          .when(col("z6") < -1.96, lit("decreasing"))
          .otherwise(lit("none")))
      .select(col("n"), col("s"), col("var18"), col("z6"), col("trend"))
  }

  val q311Sql: String =
    s"""WITH $dailyPairsSql,
       |s AS (
       |  SELECT CAST(SUM(CASE WHEN xb > xa THEN 1 WHEN xb < xa THEN -1
       |    ELSE 0 END) AS BIGINT) AS s FROM pairs),
       |ties AS (
       |  SELECT CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tcorr
       |  FROM (SELECT COUNT(*) AS t FROM daily GROUP BY x)),
       |n AS (SELECT COUNT(*) AS n FROM daily),
       |g AS (
       |  SELECT n.n, s.s,
       |    CAST(n * (n - 1) * (2 * n + 5) - tcorr AS BIGINT) AS var18
       |  FROM s CROSS JOIN n CROSS JOIN ties)
       |SELECT n, s, var18,
       |  FLOOR((CAST(s - SIGN(s) AS DOUBLE) / sqrt(CAST(var18 AS DOUBLE) / 18.0))
       |    * 1e6 + 0.5) / 1e6 AS z6,
       |  CASE WHEN FLOOR((CAST(s - SIGN(s) AS DOUBLE) /
       |      sqrt(CAST(var18 AS DOUBLE) / 18.0)) * 1e6 + 0.5) / 1e6 > 1.96
       |    THEN 'increasing'
       |    WHEN FLOOR((CAST(s - SIGN(s) AS DOUBLE) /
       |      sqrt(CAST(var18 AS DOUBLE) / 18.0)) * 1e6 + 0.5) / 1e6 < -1.96
       |    THEN 'decreasing' ELSE 'none' END AS trend
       |FROM g""".stripMargin

  // --------------------------------------------------------------------------
  // q312 — DETERMINISTIC CLASS REBALANCING: downsample every language to
  // the minority-class count, keeping each class's m smallest
  // (md5(doc_id), doc_id) rows — reproducible on any partitioning /
  // rerun / engine (no RNG state), the standard pre-training class
  // balancing pass. The per-class selection set is PROVEN by shipping
  // the exact sum of kept doc_ids, not just the count.
  //
  // Scale: one count aggregate (broadcast 1-row min), one rank window
  // PARTITIONED by class; at 100 TB pre-filter with an md5-threshold
  // estimate (q27's sampling pattern) so the per-class sort sees ~m
  // rows instead of the whole class.
  def classRebalance(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_before"))
    val m = counts.agg(min(col("n_before")).as("m"))
    val ranked = docs.select(col("lang"), col("doc_id"))
      .withColumn("h", expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))))
    ranked.crossJoin(broadcast(m)).filter(col("rk") <= col("m"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("kept_id_sum"))
      .join(counts, Seq("lang"))
      .select(col("lang"), col("n_before"), col("n_kept"), col("kept_id_sum"))
      .orderBy(col("lang"))
  }

  def q312ClassRebalance(spark: SparkSession, dir: String): DataFrame =
    classRebalance(Tables.documents(spark, dir))

  val q312Sql: String =
    """WITH counts AS (SELECT lang, COUNT(*) AS n_before FROM documents GROUP BY 1),
      |m AS (SELECT MIN(n_before) AS m FROM counts),
      |ranked AS (
      |  SELECT lang, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT,
      |        doc_id) AS rk
      |  FROM documents)
      |SELECT lang, n_before, COUNT(*) AS n_kept,
      |  CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum
      |FROM ranked CROSS JOIN m JOIN counts USING (lang)
      |WHERE rk <= m.m
      |GROUP BY lang, n_before ORDER BY lang""".stripMargin

  // --------------------------------------------------------------------------
  // q313 — INTERVAL UNION (gaps-and-islands coverage): give every event a
  // 10-minute activity interval [ts, ts+600s) and compute each user's
  // union — merged island count and total covered seconds — the
  // standard "active time" rollup (and the same merge a PII-retention
  // window audit runs). New island when an interval starts after the
  // running max end of everything before it; all arithmetic in exact
  // epoch micros.
  //
  // Scale: two windows PARTITIONED by user (running max + island sum),
  // one aggregate — a single shuffle on user_id.
  def intervalUnion(events: DataFrame, lenSec: Long): DataFrame = {
    val iv = events.select(col("user_id"),
      unix_micros(col("ts")).as("s0"),
      (unix_micros(col("ts")) + lit(lenSec * 1000000L)).as("e0"),
      col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("s0"), col("event_id"))
    val flagged = iv
      .withColumn("prev_max_e",
        max(col("e0")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_max_e").isNull || col("s0") > col("prev_max_e"), 1L)
          .otherwise(0L))
      .withColumn("island",
        sum(col("new_island")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(col("user_id"), col("island"))
      .agg(min(col("s0")).as("is"), max(col("e0")).as("ie"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"),
        (sum(col("ie") - col("is")) / lit(1000000L)).cast("long").as("covered_sec"))
      .orderBy(col("user_id"))
  }

  def q313IntervalUnion(spark: SparkSession, dir: String): DataFrame =
    intervalUnion(Tables.events(spark, dir), lenSec = 600L)

  val q313Sql: String =
    """WITH iv AS (
      |  SELECT user_id, epoch_us(ts) AS s0,
      |    epoch_us(ts) + 600000000 AS e0, event_id
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, s0, e0, event_id,
      |    CASE WHEN MAX(e0) OVER (PARTITION BY user_id ORDER BY s0, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |      OR s0 > MAX(e0) OVER (PARTITION BY user_id ORDER BY s0, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      THEN 1 ELSE 0 END AS new_island
      |  FROM iv),
      |isl AS (
      |  SELECT user_id, s0, e0,
      |    SUM(new_island) OVER (PARTITION BY user_id ORDER BY s0, event_id
      |      ROWS UNBOUNDED PRECEDING) AS island
      |  FROM flagged),
      |merged AS (
      |  SELECT user_id, island, MIN(s0) AS i_s, MAX(e0) AS i_e
      |  FROM isl GROUP BY 1, 2)
      |SELECT user_id, COUNT(*) AS n_islands,
      |  CAST(SUM(i_e - i_s) // 1000000 AS BIGINT) AS covered_sec
      |FROM merged GROUP BY user_id ORDER BY user_id""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q310_theil_sen", q310TheilSen _, Some(q310Sql)),
    ("q311_mann_kendall", q311MannKendall _, Some(q311Sql)),
    ("q312_class_rebalance", q312ClassRebalance _, Some(q312Sql)),
    ("q313_interval_union", q313IntervalUnion _, Some(q313Sql)))
}
