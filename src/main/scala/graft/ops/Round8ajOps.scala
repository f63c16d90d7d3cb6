package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 thirty-sixth operator batch: Simpson's-paradox detector and
  * the pass@k estimator — aggregation-reversal governance and the
  * standard sampled-eval metric on the §8.4 exact-integer discipline.
  */
object Round8ajOps {

  // --------------------------------------------------------------------------
  // q377 — SIMPSON'S PARADOX DETECTOR: does "URGENT orders are larger
  // than LOW orders" hold in every customer segment, or only in the
  // pooled aggregate (or vice versa)? Per stratum the mean comparison
  // is the exact cross-multiplication sign(s_A·n_B − s_B·n_A) — no
  // division, no float — and the pooled sign rides along on every row;
  // reversal = stratum direction strictly opposite the pooled one. The
  // BI-governance gate for any per-segment report whose pooled
  // headline someone is about to quote.
  //
  // Scale: one orders×customer equi-join (dimension broadcast), one
  // (stratum, group) aggregate over the bounded 5×2 grid.
  def simpsonDetector(orders: DataFrame, customer: DataFrame): DataFrame = {
    val graded = orders
      .filter(col("o_orderpriority").startsWith("1") ||
        col("o_orderpriority").startsWith("5"))
      .select(col("o_custkey").cast("long").as("ck"),
        when(col("o_orderpriority").startsWith("1"), "A").otherwise("B")
          .as("g"),
        expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").as("cents"))
      .join(broadcast(customer.select(col("c_custkey").cast("long").as("ck"),
        col("c_mktsegment").as("stratum"))), Seq("ck"))
    val cell = graded.groupBy(col("stratum"))
      .agg(count_if(col("g") === "A").as("n_a"),
        sum(when(col("g") === "A", col("cents")).otherwise(0L)).as("s_a"),
        count_if(col("g") === "B").as("n_b"),
        sum(when(col("g") === "B", col("cents")).otherwise(0L)).as("s_b"))
      .localCheckpoint()
    val pooled = cell.agg(sum(col("n_a")).as("pn_a"), sum(col("s_a")).as("ps_a"),
      sum(col("n_b")).as("pn_b"), sum(col("s_b")).as("ps_b"))
      .select(signum(expr(
        "cast(cast(ps_a as decimal(38,0)) * pn_b - cast(ps_b as decimal(38,0)) * pn_a as double)"))
        .cast("long").as("dir_pooled"))
    cell.crossJoin(broadcast(pooled))
      .select(col("stratum"), col("n_a"),
        expr("s_a div n_a").as("mean_a_cents"),
        col("n_b"), expr("s_b div n_b").as("mean_b_cents"),
        signum(expr(
          "cast(cast(s_a as decimal(38,0)) * n_b - cast(s_b as decimal(38,0)) * n_a as double)"))
          .cast("long").as("dir_stratum"),
        col("dir_pooled"))
      .withColumn("reversal",
        col("dir_stratum") =!= 0L && col("dir_stratum") === -col("dir_pooled"))
      .orderBy(col("stratum"))
  }

  def q377Simpson(spark: SparkSession, dir: String): DataFrame =
    simpsonDetector(Tables.orders(spark, dir), Tables.customer(spark, dir))

  val q377Sql: String =
    """WITH graded AS (
      |  SELECT c_mktsegment AS stratum,
      |    CASE WHEN o_orderpriority LIKE '1%' THEN 'A' ELSE 'B' END AS g,
      |    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE o_orderpriority LIKE '1%' OR o_orderpriority LIKE '5%'),
      |cell AS (
      |  SELECT stratum,
      |    COUNT(*) FILTER (g = 'A') AS n_a,
      |    SUM(CASE WHEN g = 'A' THEN cents ELSE 0 END) AS s_a,
      |    COUNT(*) FILTER (g = 'B') AS n_b,
      |    SUM(CASE WHEN g = 'B' THEN cents ELSE 0 END) AS s_b
      |  FROM graded GROUP BY 1),
      |pooled AS (
      |  SELECT CAST(SIGN(SUM(s_a)::HUGEINT * SUM(n_b)
      |    - SUM(s_b)::HUGEINT * SUM(n_a)) AS BIGINT) AS dir_pooled
      |  FROM cell)
      |SELECT stratum, n_a, CAST(s_a // n_a AS BIGINT) AS mean_a_cents,
      |  n_b, CAST(s_b // n_b AS BIGINT) AS mean_b_cents,
      |  CAST(SIGN(s_a::HUGEINT * n_b - s_b::HUGEINT * n_a) AS BIGINT)
      |    AS dir_stratum,
      |  dir_pooled,
      |  SIGN(s_a::HUGEINT * n_b - s_b::HUGEINT * n_a) <> 0
      |    AND CAST(SIGN(s_a::HUGEINT * n_b - s_b::HUGEINT * n_a) AS BIGINT)
      |      = -dir_pooled AS reversal
      |FROM cell, pooled ORDER BY stratum""".stripMargin

  // --------------------------------------------------------------------------
  // q378 — PASS@K ESTIMATOR: the standard sampled-eval metric
  // (HumanEval's unbiased form) pass@k = 1 − C(n−c,k)/C(n,k) over
  // tasks = users, samples = their events, success = purchase. The
  // combinatorial ratio telescopes to k sequential integer floors
  //   r ← (r·(n−c−i)) div (n−i),  r₀ = 10⁶
  // so every intermediate fits a BIGINT at any n, the zero factor at
  // n−c < k lands pass = 1 exactly (no clamp branch), and the whole
  // trajectory is engine-identical. Ships task count and mean
  // pass@{1,5,10} as exact ppm floors.
  //
  // Scale: one per-user aggregate, one global mean — the per-task
  // telescoping is row-local arithmetic.
  private def telescoped(k: Int): String =
    (1 until k).foldLeft("(1000000L * (n - c)) div n") { (acc, i) =>
      s"(($acc) * (n - c - $i)) div (n - $i)"
    }

  def passAtK(tasks: DataFrame): DataFrame =
    tasks.filter(col("n") >= 10L)
      .select(col("n"), col("c"),
        (lit(1000000L) - expr(telescoped(1))).as("p1"),
        (lit(1000000L) - expr(telescoped(5))).as("p5"),
        (lit(1000000L) - expr(telescoped(10))).as("p10"))
      .agg(count(lit(1)).as("n_tasks"),
        expr("sum(p1) div count(1)").as("mean_pass1_ppm"),
        expr("sum(p5) div count(1)").as("mean_pass5_ppm"),
        expr("sum(p10) div count(1)").as("mean_pass10_ppm"))

  def q378PassAtK(spark: SparkSession, dir: String): DataFrame =
    passAtK(Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        count_if(col("event_type") === "purchase").as("c")))

  val q378Sql: String = {
    def tele(k: Int): String =
      (1 until k).foldLeft("(1000000 * (n - c)) // n") { (acc, i) =>
        s"(($acc) * (n - c - $i)) // (n - $i)"
      }
    s"""WITH tasks AS (
       |  SELECT user_id, COUNT(*) AS n,
       |    COUNT(*) FILTER (event_type = 'purchase') AS c
       |  FROM events GROUP BY 1),
       |scored AS (
       |  SELECT 1000000 - (${tele(1)}) AS p1,
       |    1000000 - (${tele(5)}) AS p5,
       |    1000000 - (${tele(10)}) AS p10
       |  FROM tasks WHERE n >= 10)
       |SELECT COUNT(*) AS n_tasks,
       |  CAST(SUM(p1) // COUNT(*) AS BIGINT) AS mean_pass1_ppm,
       |  CAST(SUM(p5) // COUNT(*) AS BIGINT) AS mean_pass5_ppm,
       |  CAST(SUM(p10) // COUNT(*) AS BIGINT) AS mean_pass10_ppm
       |FROM scored""".stripMargin
  }

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q377_simpson_paradox", q377Simpson _, Some(q377Sql)),
    ("q378_pass_at_k", q378PassAtK _, Some(q378Sql)))
}
