package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 tenth operator batch: inter-annotator agreement, top-k rank
  * churn, and a capture–recapture audit of near-dup detector coverage —
  * label-quality and dedup-ops readouts on the §8.4 exact-integer
  * discipline.
  */
object Round8jOps {

  // --------------------------------------------------------------------------
  // q324 — COHEN'S KAPPA between two deterministic document annotators
  // (char-band vs token-band, 3 classes each): the chance-corrected
  // agreement readout every labeling pipeline runs before trusting its
  // raters. kappa = (N·Σdiag − Σ_c r_c·s_c) / (N² − Σ_c r_c·s_c) — every
  // term an exact BIGINT (kappa_ppm by integer division; both engines
  // truncate integral division identically, verified for negatives).
  //
  // Scale: one row-local labeling pass → a 9-row contingency aggregate;
  // marginals and the summary are grid-sized.
  def cohenKappa(labels: DataFrame): DataFrame = {
    val ct = labels.groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
    val tot = labels.agg(count(lit(1)).as("nn"))
    val pe = ct.groupBy(col("a")).agg(sum(col("n")).as("r"))
      .join(ct.groupBy(col("b")).agg(sum(col("n")).as("s")),
        col("a") === col("b"))
      .agg(coalesce(sum(col("r") * col("s")), lit(0L)).as("rs"))
    val diag = ct.filter(col("a") === col("b"))
      .agg(coalesce(sum(col("n")), lit(0L)).as("dg"))
    val summary = tot.crossJoin(broadcast(pe)).crossJoin(broadcast(diag))
      .select(col("nn").as("n_total"),
        expr("(1000000L * (nn * dg - rs)) div (nn * nn - rs)").as("kappa_ppm"))
    ct.crossJoin(broadcast(summary))
      .select(col("a"), col("b"), col("n"), col("n_total"), col("kappa_ppm"))
      .orderBy(col("a"), col("b"))
  }

  def q324CohenKappa(spark: SparkSession, dir: String): DataFrame =
    cohenKappa(Tables.documents(spark, dir).select(
      least(expr("n_chars div 200L"), lit(2L)).as("a"),
      least(floor(size(TextOps.toks) / lit(40)).cast("long"), lit(2L)).as("b")))

  val q324Sql: String = {
    val toks = TextOps.toksSqlD
    s"""WITH lab AS (
       |  SELECT LEAST(n_chars // 200, 2) AS a,
       |    LEAST(CAST(len($toks) AS BIGINT) // 40, 2) AS b
       |  FROM documents),
       |ct AS (SELECT a, b, COUNT(*) AS n FROM lab GROUP BY 1, 2),
       |tot AS (SELECT COUNT(*) AS nn FROM lab),
       |ra AS (SELECT a, SUM(n) AS r FROM ct GROUP BY 1),
       |sb AS (SELECT b, SUM(n) AS s FROM ct GROUP BY 1),
       |pe AS (
       |  SELECT COALESCE(SUM(r * s), 0) AS rs
       |  FROM ra JOIN sb ON ra.a = sb.b),
       |dg AS (SELECT COALESCE(SUM(n), 0) AS dg FROM ct WHERE a = b),
       |s AS (
       |  SELECT nn AS n_total,
       |    CAST((1000000 * (nn * dg - rs)) // (nn * nn - rs) AS BIGINT)
       |      AS kappa_ppm
       |  FROM tot CROSS JOIN pe CROSS JOIN dg)
       |SELECT a, b, CAST(n AS BIGINT) AS n, n_total, kappa_ppm
       |FROM ct CROSS JOIN s ORDER BY a, b""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q325 — TOP-K CHURN: per-day top-20 parts by revenue, then the
  // Jaccard stability of consecutive days' top sets — the rank-churn
  // readout dashboards run on trending lists (and drift monitors run on
  // feature top-k). Exact: rank is total-ordered (cents desc, partkey),
  // overlap/union counts are integers, jaccard in ppm.
  //
  // Scale: one (day, part) aggregate, a per-day rank window (partitioned
  // by day), and day-shifted equi-joins on (day+1, part) — the top sets
  // are k-bounded so every join side after the window is ≤ k·days rows.
  def q325TopkChurn(spark: SparkSession, dir: String): DataFrame = {
    val k = 20
    val dp = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"),
        col("l_partkey").as("p"))
      .agg(expr("sum(cast(floor(l_extendedprice * 100 + 0.5d) as bigint))").as("c"))
    val top = dp.withColumn("rk", row_number().over(
      Window.partitionBy(col("day")).orderBy(col("c").desc, col("p"))))
      .filter(col("rk") <= k)
      .select(col("day"), col("p"))
    val sizes = top.groupBy(col("day")).agg(count(lit(1)).as("kk"))
    val ovl = top.as("x")
      .join(top.as("y"),
        col("x.day") + expr("INTERVAL 1 DAY") === col("y.day") &&
          col("x.p") === col("y.p"))
      .groupBy(col("x.day").as("day")).agg(count(lit(1)).as("ov"))
    sizes.as("sa")
      .join(sizes.as("sb"),
        col("sa.day") + expr("INTERVAL 1 DAY") === col("sb.day"))
      .select(col("sa.day").as("day"), col("sa.kk").as("k_a"), col("sb.kk").as("k_b"))
      .join(ovl, Seq("day"), "left")
      .withColumn("overlap", coalesce(col("ov"), lit(0L)))
      .select(col("day"), col("k_a"), col("k_b"), col("overlap"),
        expr("(1000000L * overlap) div (k_a + k_b - overlap)").as("jaccard_ppm"))
      .orderBy(col("day"))
  }

  val q325Sql: String =
    """WITH dp AS (
      |  SELECT date_trunc('day', o_orderdate) AS day, l_partkey AS p,
      |    SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS c
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  GROUP BY 1, 2),
      |top AS (
      |  SELECT day, p FROM (
      |    SELECT day, p,
      |      ROW_NUMBER() OVER (PARTITION BY day ORDER BY c DESC, p) AS rk
      |    FROM dp) WHERE rk <= 20),
      |sizes AS (SELECT day, COUNT(*) AS kk FROM top GROUP BY 1),
      |ovl AS (
      |  SELECT x.day AS day, COUNT(*) AS ov
      |  FROM top x JOIN top y
      |    ON x.day + INTERVAL 1 DAY = y.day AND x.p = y.p
      |  GROUP BY 1)
      |SELECT sa.day AS day, sa.kk AS k_a, sb.kk AS k_b,
      |  COALESCE(ov, 0) AS overlap,
      |  CAST((1000000 * COALESCE(ov, 0)) // (sa.kk + sb.kk - COALESCE(ov, 0))
      |    AS BIGINT) AS jaccard_ppm
      |FROM sizes sa
      |JOIN sizes sb ON sa.day + INTERVAL 1 DAY = sb.day
      |LEFT JOIN ovl ON ovl.day = sa.day
      |ORDER BY day""".stripMargin

  // --------------------------------------------------------------------------
  // q326 — CAPTURE–RECAPTURE DEDUP COVERAGE: treat the MinHash detector
  // (q32, verified Jaccard ≥ 0.5) and the SimHash detector (q33,
  // hamming ≤ 3) as two captures of the same near-duplicate-pair
  // population and estimate its true size with the bias-corrected
  // Chapman estimator N̂ = (n₁+1)(n₂+1)/(m+1) − 1 — "how many dup pairs
  // do BOTH detectors miss", the question every dedup rollout asks.
  // (Assumes detector independence — stated, as in any ecology use.)
  //
  // Scale: the two detector pipelines are the banded equi-join paths
  // already probed linear; this adds one equi-join on the pair key and
  // three 1-row aggregates. All outputs exact BIGINTs.
  def q326CaptureRecapture(spark: SparkSession, dir: String): DataFrame = {
    val s1 = TextOps.q32MinhashLsh(spark, dir).select(col("id_a"), col("id_b"))
    val s2 = TextOps.q33Simhash(spark, dir).select(col("id_a"), col("id_b"))
    val c1 = s1.agg(count(lit(1)).as("n_minhash"))
    val c2 = s2.agg(count(lit(1)).as("n_simhash"))
    val m = s1.join(s2, Seq("id_a", "id_b")).agg(count(lit(1)).as("overlap"))
    c1.crossJoin(broadcast(c2)).crossJoin(broadcast(m))
      .withColumn("chapman_est", expr(
        "((n_minhash + 1L) * (n_simhash + 1L)) div (overlap + 1L) - 1L"))
      .select(col("n_minhash"), col("n_simhash"), col("overlap"),
        col("chapman_est"),
        (col("chapman_est") - (col("n_minhash") + col("n_simhash") - col("overlap")))
          .as("missed_by_both_est"),
        expr("(1000000L * n_minhash) div chapman_est").as("cov_minhash_ppm"),
        expr("(1000000L * n_simhash) div chapman_est").as("cov_simhash_ppm"))
  }

  /** Oracle: q32's pair population is exactly q31's (full-recall banding,
    * same verification — the documented q32 oracle identity) and q33 is
    * oracle-expressible outright, so the estimator replays over the two
    * embedded pair queries.
    */
  val q326Sql: String =
    s"""WITH s1 AS (SELECT id_a, id_b FROM (${TextOps.q31Sql})),
       |s2 AS (SELECT id_a, id_b FROM (${TextOps.q33Sql})),
       |c1 AS (SELECT COUNT(*) AS n_minhash FROM s1),
       |c2 AS (SELECT COUNT(*) AS n_simhash FROM s2),
       |m AS (SELECT COUNT(*) AS overlap FROM s1 JOIN s2 USING (id_a, id_b))
       |SELECT n_minhash, n_simhash, overlap,
       |  ((n_minhash + 1) * (n_simhash + 1)) // (overlap + 1) - 1 AS chapman_est,
       |  ((n_minhash + 1) * (n_simhash + 1)) // (overlap + 1) - 1
       |    - (n_minhash + n_simhash - overlap) AS missed_by_both_est,
       |  CAST((1000000 * n_minhash)
       |    // (((n_minhash + 1) * (n_simhash + 1)) // (overlap + 1) - 1)
       |    AS BIGINT) AS cov_minhash_ppm,
       |  CAST((1000000 * n_simhash)
       |    // (((n_minhash + 1) * (n_simhash + 1)) // (overlap + 1) - 1)
       |    AS BIGINT) AS cov_simhash_ppm
       |FROM c1 CROSS JOIN c2 CROSS JOIN m""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q324_cohen_kappa", q324CohenKappa _, Some(q324Sql)),
    ("q325_topk_churn", q325TopkChurn _, Some(q325Sql)),
    ("q326_capture_recapture", q326CaptureRecapture _, Some(q326Sql)))
}
