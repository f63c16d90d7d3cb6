package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 forty-sixth operator batch: tail-latency amplification and
  * Kaplan–Meier Greenwood bands — the straggler tax and survival-curve
  * uncertainty on the §8.4 exact-integer discipline.
  */
object Round8atOps {

  // --------------------------------------------------------------------------
  // q397 — TAIL AMPLIFICATION ("the tail at scale"): a stage of k
  // parallel tasks finishes when its SLOWEST task does, so the stage
  // 99th percentile needs the per-task CDF at (0.99)^(1/k) — but pow
  // is not cross-libm portable, so the test runs the OTHER way,
  // entirely in integers: per latency value, the per-task CDF ratio
  // quantizes to r = (10⁶·cum) div n, the stage CDF at fan-out 2^j is
  // the j-times repeated square in ppm fixed point (q273's s-curve
  // machinery — floors only, engine-identical), and the answer per
  // k ∈ {1,16,64,256,1024} is the SMALLEST latency whose chained ppm
  // clears 990000. The capacity table that says how many extra days of
  // latency budget each 4× of fan-out costs.
  //
  // Scale: the corpus collapses to the latency-day grid; the squaring
  // chain is 10 row-local integer ops; probes are grid minima.
  def tailAmplification(rows: DataFrame): DataFrame = {
    val grid = rows.groupBy(col("v")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)))
    val n = grid.agg(sum(col("c")).as("n"))
    var cur = grid.crossJoin(broadcast(n))
      .withColumn("s0", expr("(1000000L * cum) div n"))
    for (j <- 1 to 10)
      cur = cur.withColumn(s"s$j",
        expr(s"(s${j - 1} * s${j - 1}) div 1000000L"))
    val staged = cur.select(col("v"), col("n"),
      explode(expr(
        """array(named_struct('k', 1L,    's', s0),
          |      named_struct('k', 16L,   's', s4),
          |      named_struct('k', 64L,   's', s6),
          |      named_struct('k', 256L,  's', s8),
          |      named_struct('k', 1024L, 's', s10))""".stripMargin)).as("x"))
      .select(col("v"), col("n"), col("x.k").as("k"), col("x.s").as("s"))
    staged.filter(col("s") >= 990000L)
      .groupBy(col("k"))
      .agg(first(col("n")).as("n_tasks_pop"),
        min(col("v")).as("stage_p99_latency_days"))
      .orderBy(col("k"))
  }

  def q397TailAmplification(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("ok"), col("o_orderdate"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_shipdate"))
    tailAmplification(li.join(o, Seq("ok"))
      .select(datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
        .cast("long").as("v")))
  }

  val q397Sql: String = {
    val chain = (1 to 10).map(j =>
      s"t$j AS (SELECT *, (s${j - 1} * s${j - 1}) // 1000000 AS s$j FROM t${j - 1})")
      .mkString(",\n|")
    s"""WITH rows_ AS (
       |  SELECT date_diff('day', CAST(o_orderdate AS DATE),
       |    CAST(l_shipdate AS DATE)) AS v
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |grid AS (
       |  SELECT v, COUNT(*) AS c FROM rows_ GROUP BY 1),
       |cum AS (
       |  SELECT v, c, SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM grid),
       |nn AS (SELECT SUM(c) AS n FROM grid),
       |t0 AS (SELECT v, n, (1000000 * cum) // n AS s0 FROM cum, nn),
       |$chain,
       |staged AS (
       |  SELECT v, n, u.k,
       |    CASE u.k WHEN 1 THEN s0 WHEN 16 THEN s4 WHEN 64 THEN s6
       |      WHEN 256 THEN s8 ELSE s10 END AS s
       |  FROM t10, UNNEST([1, 16, 64, 256, 1024]) AS u(k))
       |SELECT CAST(k AS BIGINT) AS k, CAST(ANY_VALUE(n) AS BIGINT)
       |    AS n_tasks_pop,
       |  CAST(MIN(v) AS BIGINT) AS stage_p99_latency_days
       |FROM staged WHERE s >= 990000 GROUP BY k ORDER BY k""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q398 — KAPLAN–MEIER GREENWOOD BANDS: q237 ships the survival curve
  // point estimate; a release decision needs its uncertainty. The
  // Greenwood variance Var(S) = S²·Σ d/(n(n−d)) accumulates as ONE
  // more double cum-sum over the same duration grid (every summand a
  // ratio of exact integers), and the 95% bands clamp to [0,1]. Same
  // censoring rule, same grid, three new columns — the complete
  // survival readout.
  //
  // Scale: q237's shape exactly — the corpus collapses to the
  // duration grid, all windows run there.
  def q398KmBands(spark: SparkSession, dir: String): DataFrame =
    kmBands(Tables.events(spark, dir))

  def kmBands(events: DataFrame): DataFrame = {
    val perUser = events
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
    val g = perUser.agg(max(col("t1")).as("tend"), count(lit(1)).as("total"))
    val durs = perUser.crossJoin(broadcast(g))
      .withColumn("dur", datediff(to_date(col("t1")), to_date(col("t0"))))
      .withColumn("churn",
        (col("t1") < col("tend") - expr("INTERVAL 14 DAYS")).cast("int"))
    val byDur = durs.groupBy(col("dur"))
      .agg(sum(col("churn")).as("d"),
        (count(lit(1)) - sum(col("churn"))).as("c"),
        first(col("total")).as("total"))
    val wPrev = Window.orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDur
      .withColumn("n_risk",
        col("total") - coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
      .withColumn("lnf",
        when(col("d") < col("n_risk"),
          log((col("n_risk") - col("d")).cast("double") / col("n_risk")))
          .otherwise(lit(0.0)))
      .withColumn("gterm",
        when(col("d") > 0L && col("d") < col("n_risk"),
          col("d").cast("double")
            / (col("n_risk") * (col("n_risk") - col("d"))).cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("dead",
        max(when(col("d") === col("n_risk"), 1).otherwise(0)).over(wCum))
      .withColumn("surv", exp(sum(col("lnf")).over(wCum)))
      .withColumn("se", col("surv") * sqrt(sum(col("gterm")).over(wCum)))
      .select(col("dur"), col("n_risk"), col("d"), col("c"),
        when(col("dead") === 1, lit(0.0))
          .otherwise(Num.pround(col("surv"), 6)).as("survival"),
        when(col("dead") === 1, lit(0.0))
          .otherwise(Num.pround(col("se"), 6)).as("se6"),
        when(col("dead") === 1, lit(0.0))
          .otherwise(Num.pround(
            greatest(col("surv") - lit(1.959964) * col("se"), lit(0.0)), 6))
          .as("lo6"),
        when(col("dead") === 1, lit(0.0))
          .otherwise(Num.pround(
            least(col("surv") + lit(1.959964) * col("se"), lit(1.0)), 6))
          .as("hi6"))
      .orderBy(col("dur"))
  }

  val q398Sql: String =
    """WITH peru AS (
      |  SELECT user_id, MIN(ts) AS t0, MAX(ts) AS t1 FROM events GROUP BY 1),
      |g AS (SELECT MAX(t1) AS tend, COUNT(*) AS total FROM peru),
      |d AS (
      |  SELECT datediff('day', CAST(t0 AS DATE), CAST(t1 AS DATE)) AS dur,
      |    CASE WHEN t1 < tend - INTERVAL 14 DAY THEN 1 ELSE 0 END AS churn,
      |    total
      |  FROM peru, g),
      |byd AS (
      |  SELECT dur, CAST(SUM(churn) AS BIGINT) AS d,
      |    CAST(COUNT(*) - SUM(churn) AS BIGINT) AS c,
      |    ANY_VALUE(total) AS total
      |  FROM d GROUP BY 1),
      |w AS (
      |  SELECT dur, d, c,
      |    total - COALESCE(SUM(d + c) OVER (ORDER BY dur
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
      |  FROM byd),
      |s AS (
      |  SELECT dur, n_risk, d, c,
      |    MAX(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER cum AS dead,
      |    EXP(SUM(CASE WHEN d < n_risk
      |      THEN LN(CAST(n_risk - d AS DOUBLE) / n_risk) ELSE 0 END)
      |      OVER cum) AS surv,
      |    SUM(CASE WHEN d > 0 AND d < n_risk
      |      THEN CAST(d AS DOUBLE) / (n_risk * (n_risk - d)) ELSE 0 END)
      |      OVER cum AS gsum
      |  FROM w
      |  WINDOW cum AS (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND CURRENT ROW))
      |SELECT dur, CAST(n_risk AS BIGINT) AS n_risk, d, c,
      |  CASE WHEN dead = 1 THEN 0.0
      |    ELSE FLOOR((surv) * 1e6 + 0.5) / 1e6 END AS survival,
      |  CASE WHEN dead = 1 THEN 0.0
      |    ELSE FLOOR((surv * sqrt(gsum)) * 1e6 + 0.5) / 1e6 END AS se6,
      |  CASE WHEN dead = 1 THEN 0.0
      |    ELSE FLOOR((GREATEST(surv - 1.959964 * (surv * sqrt(gsum)), 0.0))
      |      * 1e6 + 0.5) / 1e6 END AS lo6,
      |  CASE WHEN dead = 1 THEN 0.0
      |    ELSE FLOOR((LEAST(surv + 1.959964 * (surv * sqrt(gsum)), 1.0))
      |      * 1e6 + 0.5) / 1e6 END AS hi6
      |FROM s ORDER BY dur""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q397_tail_amplification", q397TailAmplification _, Some(q397Sql)),
    ("q398_km_bands", q398KmBands _, Some(q398Sql)))
}
