package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 thirty-seventh operator batch: ranking-stability distance and
  * a peak-over-threshold episode census — leaderboard order distortion
  * and operational load-exceedance structure on the §8.4 exact-integer
  * discipline.
  */
object Round8akOps {

  // --------------------------------------------------------------------------
  // q379 — RANKING STABILITY (Kendall distance): take the top-100
  // suppliers by first-half revenue and by second-half revenue (q374's
  // midpoint split), rank the UNION in both periods (absent = revenue
  // 0, ties broken by suppkey — total orders, so the distance is
  // well-defined), and count discordant pairs exactly on the ≤200²
  // bounded pair grid. Ships |union|, discordant pairs, total pairs,
  // and the normalized distance ppm. q325 measures top-k IDENTITY
  // churn; this measures how much the ORDER itself shuffles — the
  // leaderboard-volatility readout.
  //
  // Scale: two per-supplier aggregates + top-k cuts; the pair count
  // runs on the ≤200-row union grid, corpus-size-independent.
  def rankStability(lineitem: DataFrame, orders: DataFrame, k: Int)
  : DataFrame = {
    val dated = lineitem.select(col("l_orderkey").as("ok"),
        col("l_suppkey").cast("long").as("sk"),
        expr("cast(floor(l_extendedprice * 100 + 0.5d) as bigint)").as("cents"))
      .join(orders.select(col("o_orderkey").as("ok"),
        to_date(col("o_orderdate")).as("d")), Seq("ok"))
    val mid = dated.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(expr("date_add(d0, cast(datediff(d1, d0) div 2L as int))")
        .as("dm"))
    val per = dated.crossJoin(broadcast(mid))
      .groupBy(col("sk"))
      .agg(sum(when(col("d") < col("dm"), col("cents")).otherwise(0L))
          .as("r1"),
        sum(when(col("d") >= col("dm"), col("cents")).otherwise(0L))
          .as("r2"))
      .localCheckpoint()
    val top1 = per.orderBy(col("r1").desc, col("sk")).limit(k).select(col("sk"))
    val top2 = per.orderBy(col("r2").desc, col("sk")).limit(k).select(col("sk"))
    val union = top1.unionByName(top2).distinct()
      .join(per, Seq("sk"))
      .withColumn("rank1", row_number().over(
        Window.orderBy(col("r1").desc, col("sk"))))
      .withColumn("rank2", row_number().over(
        Window.orderBy(col("r2").desc, col("sk"))))
      .select(col("sk"), col("rank1"), col("rank2"))
      .localCheckpoint()
    union.as("a").join(union.as("b"), col("a.sk") < col("b.sk"))
      .agg(count(lit(1)).as("pairs"),
        count_if(
          (col("a.rank1") < col("b.rank1")) =!=
            (col("a.rank2") < col("b.rank2"))).as("discordant"))
      .crossJoin(broadcast(union.agg(count(lit(1)).as("n_union"))))
      .select(col("n_union"), col("pairs"), col("discordant"),
        expr("(1000000L * discordant) div pairs").as("distance_ppm"))
  }

  def q379RankStability(spark: SparkSession, dir: String): DataFrame =
    rankStability(Tables.lineitem(spark, dir), Tables.orders(spark, dir),
      k = 100)

  val q379Sql: String =
    """WITH dated AS (
      |  SELECT CAST(l_suppkey AS BIGINT) AS sk,
      |    CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
      |    CAST(o_orderdate AS DATE) AS d
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |mid AS (
      |  SELECT MIN(d) + CAST(date_diff('day', MIN(d), MAX(d)) // 2 AS INT) AS dm
      |  FROM dated),
      |per AS (
      |  SELECT sk,
      |    SUM(CASE WHEN d < dm THEN cents ELSE 0 END) AS r1,
      |    SUM(CASE WHEN d >= dm THEN cents ELSE 0 END) AS r2
      |  FROM dated, mid GROUP BY 1),
      |t1 AS (SELECT sk FROM per ORDER BY r1 DESC, sk LIMIT 100),
      |t2 AS (SELECT sk FROM per ORDER BY r2 DESC, sk LIMIT 100),
      |u AS (
      |  SELECT per.sk,
      |    ROW_NUMBER() OVER (ORDER BY r1 DESC, per.sk) AS rank1,
      |    ROW_NUMBER() OVER (ORDER BY r2 DESC, per.sk) AS rank2
      |  FROM (SELECT sk FROM t1 UNION SELECT sk FROM t2) uu
      |  JOIN per ON uu.sk = per.sk),
      |pairs AS (
      |  SELECT COUNT(*) AS pairs,
      |    COUNT(*) FILTER ((a.rank1 < b.rank1) <> (a.rank2 < b.rank2))
      |      AS discordant
      |  FROM u a JOIN u b ON a.sk < b.sk),
      |n AS (SELECT COUNT(*) AS n_union FROM u)
      |SELECT CAST(n_union AS BIGINT) AS n_union, pairs, discordant,
      |  CAST((1000000 * discordant) // pairs AS BIGINT) AS distance_ppm
      |FROM pairs, n""".stripMargin

  // --------------------------------------------------------------------------
  // q380 — PEAK-OVER-THRESHOLD EPISODE CENSUS: how often does daily
  // order volume exceed its own p90, and for how long at a stretch?
  // The threshold is the exact low-p90 order statistic of the daily
  // grid (rank probe — q356's machinery), exceedance days merge into
  // consecutive-day episodes (the q137 gaps-and-islands core on the
  // calendar), and the census ships episodes, exceedance days, the
  // longest episode, its peak, and mean episode length ppm — the
  // capacity-planning readout behind "how long do load spikes last".
  //
  // Scale: orders collapse to the calendar grid; threshold, islands,
  // and census are all grid algebra.
  def potCensus(orders: DataFrame): DataFrame = {
    val daily = orders.groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("x"))
      .localCheckpoint()
    val n = daily.agg(count(lit(1)).as("nd"))
    val thr = daily.crossJoin(broadcast(n))
      .withColumn("rn", row_number().over(Window.orderBy(col("x"), col("d"))))
      .filter(col("rn") === expr("(9L * nd + 9L) div 10L"))
      .select(col("x").as("thr"))
    val exceed = daily.crossJoin(broadcast(thr))
      .filter(col("x") > col("thr"))
      .withColumn("dd", datediff(col("d"), lit("1970-01-05")).cast("long"))
      .withColumn("prev", lag(col("dd"), 1).over(Window.orderBy(col("dd"))))
      .withColumn("brk",
        when(col("prev").isNull || col("dd") - col("prev") > 1L, 1L)
          .otherwise(0L))
      .withColumn("ep", sum(col("brk")).over(
        Window.orderBy(col("dd")).rowsBetween(Window.unboundedPreceding, 0)))
    exceed.groupBy(col("ep"))
      .agg(count(lit(1)).as("len"), max(col("x")).as("pk"))
      .agg(count(lit(1)).as("episodes"), sum(col("len")).as("exceed_days"),
        max(col("len")).as("longest_episode"), max(col("pk")).as("peak_count"))
      .crossJoin(broadcast(thr))
      .select(col("thr").as("threshold_count"), col("episodes"),
        col("exceed_days"), col("longest_episode"), col("peak_count"),
        expr("(1000000L * exceed_days) div episodes").as("mean_len_ppm"))
  }

  def q380PotCensus(spark: SparkSession, dir: String): DataFrame =
    potCensus(Tables.orders(spark, dir))

  val q380Sql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS x
      |  FROM orders GROUP BY 1),
      |nn AS (SELECT COUNT(*) AS nd FROM daily),
      |thr AS (
      |  SELECT x AS thr FROM (
      |    SELECT x, ROW_NUMBER() OVER (ORDER BY x, d) AS rn FROM daily), nn
      |  WHERE rn = (9 * nd + 9) // 10),
      |exceed AS (
      |  SELECT date_diff('day', DATE '1970-01-05', d) AS dd, x
      |  FROM daily, thr WHERE x > thr),
      |lagged AS (
      |  SELECT dd, x, LAG(dd) OVER (ORDER BY dd) AS prev FROM exceed),
      |eps AS (
      |  SELECT x, SUM(CASE WHEN prev IS NULL OR dd - prev > 1 THEN 1 ELSE 0 END)
      |    OVER (ORDER BY dd ROWS UNBOUNDED PRECEDING) AS ep
      |  FROM lagged),
      |grouped AS (
      |  SELECT ep, COUNT(*) AS len, MAX(x) AS pk FROM eps GROUP BY 1),
      |census AS (
      |  SELECT COUNT(*) AS episodes, SUM(len) AS exceed_days,
      |    MAX(len) AS longest_episode, MAX(pk) AS peak_count
      |  FROM grouped)
      |SELECT CAST(thr AS BIGINT) AS threshold_count,
      |  episodes, CAST(exceed_days AS BIGINT) AS exceed_days,
      |  CAST(longest_episode AS BIGINT) AS longest_episode,
      |  CAST(peak_count AS BIGINT) AS peak_count,
      |  CAST((1000000 * exceed_days) // episodes AS BIGINT) AS mean_len_ppm
      |FROM census, thr""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q379_rank_stability", q379RankStability _, Some(q379Sql)),
    ("q380_pot_census", q380PotCensus _, Some(q380Sql)))
}
