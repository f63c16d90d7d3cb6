package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 seventeenth operator batch: cross-correlation by lag and the
  * Markov stationary distribution — lead/lag analytics on the §8.4
  * exact-integer discipline.
  */
object Round8qOps {

  // --------------------------------------------------------------------------
  // q339 — CROSS-CORRELATION FUNCTION: Pearson r between the daily
  // order-count series and the daily revenue series shifted by lag
  // k = 0..7 — "does volume lead revenue" and by how many days (the CCF
  // readout q303's ACF is the self-paired case of). Sufficient
  // statistics per lag are exact BIGINTs (q316's rule: num/dx/dy
  // shipped exactly, r = two sqrts + one division + pround); revenue is
  // quantized on q314's 10⁷-cent grid.
  //
  // Scale: the corpus collapses to the calendar grid; lag expansion is
  // the grid × a provably-8-row range (bounded), joined equi on the
  // shifted index.
  def q339CrossCorrelation(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("x"),
        expr("cast(floor(sum(cast(o_totalprice as decimal(18,2))) * 100 / 1e7) as long)")
          .as("y"))
      .withColumn("i", row_number().over(Window.orderBy(col("d"))).cast("long"))
    val a = daily.select(col("i").as("ia"), col("x"))
    val b = daily.select(col("i").as("ib"), col("y"))
    val lags = spark.range(0, 8).select(col("id").as("k"))
    a.crossJoin(broadcast(lags))
      .join(b, col("ia") + col("k") === col("ib"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("num", expr("n * sxy - sx * sy"))
      .withColumn("dx", expr("n * sxx - sx * sx"))
      .withColumn("dy", expr("n * syy - sy * sy"))
      .select(col("k"), col("n"), col("num"), col("dx"), col("dy"),
        when(col("dx") === 0L || col("dy") === 0L, lit(null))
          .otherwise(Num.pround(
            col("num") / (sqrt(col("dx")) * sqrt(col("dy"))), 6)).as("r6"))
      .orderBy(col("k"))
  }

  val q339Sql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS x,
      |    CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 / 1e7)
      |      AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |idx AS (SELECT ROW_NUMBER() OVER (ORDER BY d) AS i, x, y FROM daily),
      |p AS (
      |  SELECT k, COUNT(*) AS n, SUM(a.x) AS sx, SUM(b.y) AS sy,
      |    SUM(a.x * b.y) AS sxy, SUM(a.x * a.x) AS sxx, SUM(b.y * b.y) AS syy
      |  FROM idx a
      |  CROSS JOIN UNNEST(generate_series(0, 7)) AS l(k)
      |  JOIN idx b ON a.i + k = b.i
      |  GROUP BY k)
      |SELECT CAST(k AS BIGINT) AS k, n,
      |  CAST(n * sxy - sx * sy AS BIGINT) AS num,
      |  CAST(n * sxx - sx * sx AS BIGINT) AS dx,
      |  CAST(n * syy - sy * sy AS BIGINT) AS dy,
      |  CASE WHEN n * sxx = sx * sx OR n * syy = sy * sy THEN NULL
      |    ELSE FLOOR((CAST(n * sxy - sx * sy AS DOUBLE)
      |      / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
      |         * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))) * 1e6 + 0.5) / 1e6
      |  END AS r6
      |FROM p ORDER BY k""".stripMargin

  // --------------------------------------------------------------------------
  // q340 — MARKOV STATIONARY MIX: the long-run event-type occupancy of
  // the user transition chain (q132 builds the one-step matrix; this
  // answers "where do sessions settle"). Ten synchronous power
  // iterations from the uniform start, ENTIRELY in exact fixed-point
  // ppm (per-term floor products, then a floor renormalization to 10⁶ —
  // q329's discipline), so the trajectory is engine-identical without a
  // single float.
  //
  // Scale: one corpus pass builds the k×k transition counts (lead
  // window partitioned by user), materialized ONCE; the iterations are
  // k-row grid joins with per-round lineage truncation (each round
  // references its input twice — sum + join — so an unchecked lazy
  // chain doubles the plan per round; localCheckpoint keeps it flat,
  // the q300 iterative-family rule).
  def stationaryMix(events: DataFrame, iters: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = events
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("s_from"), col("nxt").as("s_to"))
      .agg(count(lit(1)).as("c"))
    val p = trans
      .withColumn("rt", sum(col("c")).over(Window.partitionBy(col("s_from"))))
      .withColumn("p_ppm", expr("(1000000L * c) div rt"))
      .select(col("s_from"), col("s_to"), col("p_ppm"))
      .localCheckpoint()
    val states = p.select(col("s_from").as("state")).distinct()
    val k = states.agg(count(lit(1)).as("k"))
    var v = states.crossJoin(broadcast(k))
      .withColumn("v", expr("1000000L div k"))
      .select(col("state"), col("v"))
    for (_ <- 1 to iters) {
      val stepped = v.join(p, col("state") === col("s_from"))
        .groupBy(col("s_to"))
        .agg(sum(expr("(v * p_ppm) div 1000000L")).as("v0"))
        .select(col("s_to").as("state"), col("v0"))
        .localCheckpoint()
      val s = stepped.agg(sum(col("v0")).as("sv"))
      v = stepped.crossJoin(broadcast(s))
        .withColumn("v", expr("(1000000L * v0) div sv"))
        .select(col("state"), col("v"))
    }
    v.select(col("state"), col("v").as("stationary_ppm"))
      .orderBy(col("state"))
  }

  def q340StationaryMix(spark: SparkSession, dir: String): DataFrame =
    stationaryMix(Tables.events(spark, dir), iters = 10)

  val q340Sql: String = {
    // AS MATERIALIZED: each iteration references its predecessor twice
    // (sum + join); inlined CTEs would double the plan per round — the
    // DuckDB mirror of the Spark-side localCheckpoint truncation.
    def step(prev: String, cur: String): String =
      s"""${cur}_u AS MATERIALIZED (
         |  SELECT s_to AS state, SUM((v * p_ppm) // 1000000) AS v0
         |  FROM $prev JOIN p ON $prev.state = p.s_from
         |  GROUP BY s_to),
         |${cur}_s AS (SELECT SUM(v0) AS sv FROM ${cur}_u),
         |$cur AS MATERIALIZED (
         |  SELECT state, (1000000 * v0) // sv AS v
         |  FROM ${cur}_u CROSS JOIN ${cur}_s)""".stripMargin
    val steps = (1 to 10).map(i => step(s"it${i - 1}", s"it$i")).mkString(",\n|")
    s"""WITH tr AS (
       |  SELECT event_type AS s_from,
       |    LEAD(event_type, 1) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS s_to
       |  FROM events),
       |cnt AS (
       |  SELECT s_from, s_to, COUNT(*) AS c FROM tr
       |  WHERE s_to IS NOT NULL GROUP BY 1, 2),
       |p AS MATERIALIZED (
       |  SELECT s_from, s_to,
       |    (1000000 * c) // SUM(c) OVER (PARTITION BY s_from) AS p_ppm
       |  FROM cnt),
       |st AS (SELECT DISTINCT s_from AS state FROM p),
       |kk AS (SELECT COUNT(*) AS k FROM st),
       |it0 AS (
       |  SELECT state, 1000000 // k AS v FROM st CROSS JOIN kk),
       |$steps
       |SELECT state, CAST(v AS BIGINT) AS stationary_ppm
       |FROM it10 ORDER BY state""".stripMargin
  }

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q339_cross_correlation", q339CrossCorrelation _, Some(q339Sql)),
    ("q340_stationary_mix", q340StationaryMix _, Some(q340Sql)))
}
