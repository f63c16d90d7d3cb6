package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 thirty-fourth operator batch: Cramér–von Mises two-sample
  * test and a regression-to-the-mean audit — integrated-distance
  * distribution comparison and winner's-curse quantification on the
  * §8.4 exact-integer discipline.
  */
object Round8ahOps {

  // --------------------------------------------------------------------------
  // q373 — CRAMÉR–VON MISES TWO-SAMPLE: q118/q119's KS statistic is the
  // SUP of |F_A − F_B|; CvM integrates the squared gap over the pooled
  // sample — sensitive to broad shape differences a single crossing
  // hides. On the bounded l_quantity grid the statistic is exact
  // algebra: each pooled value's CDF gap quantizes FIRST to the exact
  // ppm floor g = (10⁶·cumA) div n − (10⁶·cumB) div m (bounded ≤ 10⁶,
  // so every later product stays inside DECIMAL(38,0) even at the
  // decade probe), then T_ppm = (n·m·Σ t_v·g²) div (N²·10⁶) is ONE
  // exact cross-multiplied floor — no float anywhere.
  //
  // Scale: one (group, value) histogram aggregate; everything after is
  // ≤50-row grid algebra.
  def cvmTest(rows: DataFrame): DataFrame = {
    val hist = rows.groupBy(col("v"))
      .agg(count_if(col("g") === "A").as("ca"),
        count_if(col("g") === "B").as("cb"))
      .withColumn("cuma", sum(col("ca")).over(
        Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cumb", sum(col("cb")).over(
        Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)))
    val tot = hist.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
      count(lit(1)).as("n_values"))
    hist.crossJoin(broadcast(tot))
      .withColumn("g",
        expr("(1000000L * cuma) div n_a - (1000000L * cumb) div n_b"))
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        first(col("n_values")).as("n_values"),
        sum(expr("cast(ca + cb as decimal(38,0)) * g * g")).as("s"))
      .select(col("n_a"), col("n_b"), col("n_values"),
        expr("""cast(((cast(n_a as decimal(38,0)) * n_b) * s)
               | div ((cast(n_a + n_b as decimal(38,0)) * (n_a + n_b))
               |   * 1000000L) as bigint)""".stripMargin).as("t_ppm"))
  }

  def q373Cvm(spark: SparkSession, dir: String): DataFrame =
    cvmTest(Tables.lineitem(spark, dir)
      .filter(col("l_returnflag").isin("R", "N"))
      .select(when(col("l_returnflag") === "R", "A").otherwise("B").as("g"),
        col("l_quantity").cast("long").as("v")))

  val q373Sql: String =
    """WITH rows_ AS (
      |  SELECT CASE WHEN l_returnflag = 'R' THEN 'A' ELSE 'B' END AS g,
      |    CAST(l_quantity AS BIGINT) AS v
      |  FROM lineitem WHERE l_returnflag IN ('R', 'N')),
      |hist AS (
      |  SELECT v, COUNT(*) FILTER (g = 'A') AS ca,
      |    COUNT(*) FILTER (g = 'B') AS cb
      |  FROM rows_ GROUP BY 1),
      |cum AS (
      |  SELECT v, ca, cb,
      |    SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
      |    SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb
      |  FROM hist),
      |tot AS (SELECT SUM(ca) AS n_a, SUM(cb) AS n_b, COUNT(*) AS n_values
      |  FROM hist),
      |gap AS (
      |  SELECT ca, cb,
      |    (1000000 * cuma) // n_a - (1000000 * cumb) // n_b AS g,
      |    n_a, n_b, n_values
      |  FROM cum, tot)
      |SELECT CAST(ANY_VALUE(n_a) AS BIGINT) AS n_a,
      |  CAST(ANY_VALUE(n_b) AS BIGINT) AS n_b,
      |  CAST(ANY_VALUE(n_values) AS BIGINT) AS n_values,
      |  CAST(((ANY_VALUE(n_a)::HUGEINT * ANY_VALUE(n_b))
      |      * SUM((ca + cb)::HUGEINT * g * g))
      |    // ((ANY_VALUE(n_a + n_b)::HUGEINT * ANY_VALUE(n_a + n_b))
      |      * 1000000) AS BIGINT) AS t_ppm
      |FROM gap""".stripMargin

  // --------------------------------------------------------------------------
  // q374 — REGRESSION-TO-THE-MEAN AUDIT: pick the top-20 customers by
  // first-half revenue and measure how their second-half revenue
  // shrinks relative to the whole population's ratio — the winner's
  // curse every leaderboard, A/B winner, and "best supplier" report
  // suffers. The period split is the data's own midpoint date
  // (min + span div 2 — deterministic, no literal calendar
  // assumption); all revenue in exact cents, ratios as exact ppm
  // floors. q325 tracks identity churn of a top-k; this quantifies the
  // VALUE shrinkage of the winners.
  //
  // Scale: two hash aggregates over orders (per-customer × period),
  // a broadcast 1-row midpoint/population join, a top-20 selection.
  def regressionToMean(orders: DataFrame): DataFrame = {
    val dated = orders.select(col("o_custkey").cast("long").as("ck"),
      to_date(col("o_orderdate")).as("d"),
      expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").as("cents"))
    val mid = dated.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(expr("date_add(d0, cast(datediff(d1, d0) div 2L as int))")
        .as("dm"))
    val per = dated.crossJoin(broadcast(mid))
      .groupBy(col("ck"))
      .agg(sum(when(col("d") < col("dm"), col("cents")).otherwise(0L))
          .as("rev1"),
        sum(when(col("d") >= col("dm"), col("cents")).otherwise(0L))
          .as("rev2"))
      .localCheckpoint()
    val pop = per.agg(sum(col("rev1")).as("p1"), sum(col("rev2")).as("p2"))
      .select(expr("(1000000L * p2) div greatest(p1, 1L)")
        .as("pop_ratio_ppm"))
    per.orderBy(col("rev1").desc, col("ck")).limit(20)
      .crossJoin(broadcast(pop))
      .select(col("ck").as("custkey"), col("rev1").as("rev1_cents"),
        col("rev2").as("rev2_cents"),
        expr("(1000000L * rev2) div greatest(rev1, 1L)").as("ratio_ppm"),
        col("pop_ratio_ppm"))
      .orderBy(col("rev1_cents").desc, col("custkey"))
  }

  def q374RegressionToMean(spark: SparkSession, dir: String): DataFrame =
    regressionToMean(Tables.orders(spark, dir))

  val q374Sql: String =
    """WITH dated AS (
      |  SELECT CAST(o_custkey AS BIGINT) AS ck, CAST(o_orderdate AS DATE) AS d,
      |    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders),
      |mid AS (
      |  SELECT MIN(d) + CAST(date_diff('day', MIN(d), MAX(d)) // 2 AS INT) AS dm
      |  FROM dated),
      |per AS (
      |  SELECT ck,
      |    SUM(CASE WHEN d < dm THEN cents ELSE 0 END) AS rev1,
      |    SUM(CASE WHEN d >= dm THEN cents ELSE 0 END) AS rev2
      |  FROM dated, mid GROUP BY 1),
      |pop AS (
      |  SELECT (1000000 * SUM(rev2)) // GREATEST(SUM(rev1), 1) AS pop_ratio_ppm
      |  FROM per),
      |top AS (
      |  SELECT * FROM per ORDER BY rev1 DESC, ck LIMIT 20)
      |SELECT ck AS custkey, CAST(rev1 AS BIGINT) AS rev1_cents,
      |  CAST(rev2 AS BIGINT) AS rev2_cents,
      |  CAST((1000000 * rev2) // GREATEST(rev1, 1) AS BIGINT) AS ratio_ppm,
      |  CAST(pop_ratio_ppm AS BIGINT) AS pop_ratio_ppm
      |FROM top, pop ORDER BY rev1_cents DESC, custkey""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q373_cvm_test", q373Cvm _, Some(q373Sql)),
    ("q374_regression_to_mean", q374RegressionToMean _, Some(q374Sql)))
}
