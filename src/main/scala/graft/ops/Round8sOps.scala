package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 nineteenth operator batch: Adamic–Adar link prediction and
  * dyadic-EWMA anomaly bands — graph-completion and time-series
  * monitoring surface on the §8.4 exact-integer discipline.
  */
object Round8sOps {

  // --------------------------------------------------------------------------
  // q343 — ADAMIC–ADAR LINK PREDICTION on the co-purchase graph
  // (q206's edge definition: part pairs co-ordered ≥ 2 times): for every
  // non-adjacent pair with common neighbors, AA = Σ_z 1/ln(deg z) over
  // shared neighbors z — rare connectors count more than hubs. Per-
  // center weights are pre-quantized to the exact integer
  // w_z = floor(10⁶/ln(deg_z)) so the pair score is an order-free
  // BIGINT SUM (no float accumulation across an unordered aggregate —
  // the one ln() per DISTINCT DEGREE is the same single-transcendental
  // class §8.4 already accepts for pround; quantizing per center, not
  // per pair, keeps any boundary flip localized and ~10⁻¹⁰-probable).
  // Ships the top-20 predicted links with score and common-neighbor
  // count — "which parts will be bought together next".
  //
  // Scale: wedges enumerate per-center neighbor pairs — Σ_z deg(z)²
  // — so super-connector centers (deg > 256) are dropped, the
  // standard AA guard (their 1/ln weight is noise anyway; the cap is
  // part of the operator contract and mirrored in the oracle). The
  // existing-edge exclusion is a broadcast-free left-anti equi-join.
  def adamicAdar(edges: DataFrame, degCap: Int, topK: Int): DataFrame = {
    val deg = CurateOps.degreeOf(edges)
    val adj = edges.select(col("p1").as("z"), col("p2").as("nb"))
      .unionAll(edges.select(col("p2").as("z"), col("p1").as("nb")))
    val centers = deg.filter(col("d") >= 2 && col("d") <= degCap)
      .withColumn("w", expr("cast(floor(1000000d / ln(cast(d as double))) as bigint)"))
      .select(col("v").as("z"), col("w"))
    val wadj = adj.join(centers, Seq("z"))
    val l = wadj.select(col("z"), col("w"), col("nb").as("a"))
    val r = wadj.select(col("z"), col("nb").as("b"))
    val scored = l.join(r, Seq("z")).filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(sum(col("w")).as("aa_score"), count(lit(1)).as("common_n"))
    scored
      .join(edges, scored("a") === edges("p1") && scored("b") === edges("p2"),
        "left_anti")
      .orderBy(col("aa_score").desc, col("a"), col("b"))
      .limit(topK)
  }

  def q343AdamicAdar(spark: SparkSession, dir: String): DataFrame = {
    val items = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct().localCheckpoint()
    val a = items.select(col("l_orderkey").as("ok"), col("l_partkey").as("p1"))
    val b = items.select(col("l_orderkey").as("ok"), col("l_partkey").as("p2"))
    val edges = a.join(b, Seq("ok")).filter(col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= 2).select(col("p1"), col("p2"))
      .localCheckpoint()
    adamicAdar(edges, degCap = 256, topK = 20)
  }

  val q343Sql: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
      |edges AS (
      |  SELECT a.p AS p1, b.p AS p2
      |  FROM items a JOIN items b ON a.ok = b.ok AND a.p < b.p
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |deg AS (
      |  SELECT v, COUNT(*) AS d FROM (
      |    SELECT p1 AS v FROM edges UNION ALL SELECT p2 FROM edges)
      |  GROUP BY v),
      |ctr AS (
      |  SELECT v AS z, CAST(FLOOR(1000000 / LN(CAST(d AS DOUBLE))) AS BIGINT) AS w
      |  FROM deg WHERE d BETWEEN 2 AND 256),
      |adj AS (
      |  SELECT p1 AS z, p2 AS nb FROM edges
      |  UNION ALL SELECT p2, p1 FROM edges),
      |wadj AS (SELECT adj.z, nb, w FROM adj JOIN ctr USING (z)),
      |sc AS (
      |  SELECT l.nb AS a, r.nb AS b, SUM(l.w) AS aa_score,
      |    COUNT(*) AS common_n
      |  FROM wadj l JOIN wadj r ON l.z = r.z AND l.nb < r.nb
      |  GROUP BY 1, 2)
      |SELECT a, b, CAST(aa_score AS BIGINT) AS aa_score,
      |  CAST(common_n AS BIGINT) AS common_n
      |FROM sc ANTI JOIN edges ON sc.a = edges.p1 AND sc.b = edges.p2
      |ORDER BY aa_score DESC, a, b LIMIT 20""".stripMargin

  // --------------------------------------------------------------------------
  // q344 — DYADIC-EWMA ANOMALY BANDS on the daily order-count series:
  // level_t = EWMA(α = ½) of the PRIOR 30 days, dev_t = |x_t − level_t|,
  // band_t = EWMA(α = ½) of the prior deviations, and the alert ratio
  // dev/band — the classic self-normalizing monitor (an EWMA control
  // chart), shipped as the top-20 most anomalous days. α = ½ makes the
  // truncated kernel EXACT dyadic integers: weight(lag k) = 1 << (31−k),
  // so level/band are pure BIGINT dot products normalized by the exact
  // geometric partial sum — not a single float anywhere (§8.4), and no
  // sequential recursion: the truncation error of the 30-lag kernel is
  // 2⁻³⁰, far below the ppm grid.
  //
  // Scale: the corpus collapses to the calendar grid; both EWMA passes
  // are the grid × a provably-23-row broadcast lag range, joined equi
  // on the shifted index. Overflow headroom: Σw = 2²⁴−2 ≈ 1.7·10⁷, so
  // the level pass (10⁶·Σ w·x ≤ 10⁶·1.7·10⁷·10⁴ ≈ 10¹⁷) and the band
  // pass (Σ w·dev_ppm ≤ 1.7·10⁷·10¹⁰ ≈ 10¹⁷ — dev is already in ppm,
  // so NO extra 10⁶ there) both stay inside BIGINT at 10× sf1.
  def ewmaBands(orders: DataFrame, spark: SparkSession, topK: Int): DataFrame = {
    val daily = orders
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("x"))
      .withColumn("i", row_number().over(Window.orderBy(col("d"))).cast("long"))
      .localCheckpoint()
    val lags = spark.range(1, 24)
      .select(col("id").as("k"), expr("shiftleft(1L, cast(24 - id as int))").as("w"))
    def priorEwma(series: DataFrame, vcol: String, scale: Long, out: String): DataFrame =
      series.select(col("i").as("bi"), col(vcol).as("bv"))
        .crossJoin(broadcast(lags))
        .withColumn("ai", col("bi") + col("k"))
        .groupBy(col("ai").as("i"))
        .agg(expr(s"(${scale}L * sum(w * bv)) div sum(w)").as(out))
    val lev = priorEwma(daily, "x", 1000000L, "lev_ppm")
    val dev = daily.join(lev, Seq("i"))
      .withColumn("dev_ppm", abs(lit(1000000L) * col("x") - col("lev_ppm")))
      .localCheckpoint()
    val band = priorEwma(
      dev.select(
        // re-index the dev series (it starts at i = 2) so the band
        // kernel sees contiguous lag positions
        (col("i") - 1L).as("i"), col("dev_ppm")), "dev_ppm", 1L, "band_ppm")
    dev.withColumn("bi", col("i") - 1L)
      .join(band.select(col("i").as("bi"), col("band_ppm")), Seq("bi"))
      .filter(col("band_ppm") > 0L)
      .withColumn("ratio_ppm", expr("(1000000L * dev_ppm) div band_ppm"))
      .select(col("d"), col("x"), col("lev_ppm"), col("dev_ppm"),
        col("band_ppm"), col("ratio_ppm"))
      .orderBy(col("ratio_ppm").desc, col("d"))
      .limit(topK)
  }

  def q344EwmaBands(spark: SparkSession, dir: String): DataFrame =
    ewmaBands(Tables.orders(spark, dir), spark, topK = 20)

  val q344Sql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS x
      |  FROM orders GROUP BY 1),
      |idx AS (SELECT ROW_NUMBER() OVER (ORDER BY d) AS i, d, x FROM daily),
      |lags AS (
      |  SELECT k, (1::BIGINT << (24 - k)) AS w
      |  FROM UNNEST(generate_series(1, 23)) AS u(k)),
      |lev AS (
      |  SELECT b.i + k AS i,
      |    (1000000 * SUM(w * b.x)) // SUM(w) AS lev_ppm
      |  FROM idx b CROSS JOIN lags GROUP BY 1),
      |dev AS (
      |  SELECT idx.i, d, x, lev_ppm,
      |    ABS(1000000 * x - lev_ppm) AS dev_ppm
      |  FROM idx JOIN lev ON idx.i = lev.i),
      |band AS (
      |  SELECT (b.i - 1) + k AS bi,
      |    SUM(w * b.dev_ppm) // SUM(w) AS band_ppm
      |  FROM dev b CROSS JOIN lags GROUP BY 1),
      |fin AS (
      |  SELECT d, x, lev_ppm, dev_ppm, band_ppm
      |  FROM dev JOIN band ON dev.i - 1 = band.bi)
      |SELECT d, x, CAST(lev_ppm AS BIGINT) AS lev_ppm,
      |  CAST(dev_ppm AS BIGINT) AS dev_ppm,
      |  CAST(band_ppm AS BIGINT) AS band_ppm,
      |  CAST((1000000 * dev_ppm) // band_ppm AS BIGINT) AS ratio_ppm
      |FROM fin WHERE band_ppm > 0
      |ORDER BY ratio_ppm DESC, d LIMIT 20""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q343_adamic_adar", q343AdamicAdar _, Some(q343Sql)),
    ("q344_ewma_bands", q344EwmaBands _, Some(q344Sql)))
}
