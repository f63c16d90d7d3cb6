package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 ninth operator batch: Kendall τ-b cross-series association,
  * the Murphy decomposition of the Brier score, systematic PPS
  * sampling, and distinct-n corpus diversity — eval/stats/sampling
  * surface on the §8.4 exact-integer discipline.
  */
object Round8iOps {

  // --------------------------------------------------------------------------
  // q320 — KENDALL τ-b between the daily order-count and daily
  // average-price series: concordant/discordant/tied pair counts as
  // exact BIGINTs over the calendar-grid pair join (q310/q311's
  // machinery — ≤ 730²/2 pairs at ANY corpus size), with the tie-
  // corrected denominator √(n₀−Tx)·√(n₀−Ty). Spearman (q316) weights by
  // rank distance; τ counts inversions — the pair completes the rank-
  // association family.
  //
  // Determinism: every count is an integer; τ is two correctly-rounded
  // sqrts + one division + pround. The y series is the integer-floor
  // average cent (exact BIGINT div), so tie structure is engine-exact.
  def q320KendallTau(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("x"),
        expr("sum(cast(floor(o_totalprice * 100 + 0.5d) as bigint)) div count(1)")
          .as("y"))
      .withColumn("i", row_number().over(Window.orderBy(col("d"))))
      .select(col("i"), col("x"), col("y"))
    val a = daily.select(col("i").as("ia"), col("x").as("xa"), col("y").as("ya"))
    val b = daily.select(col("i").as("ib"), col("x").as("xb"), col("y").as("yb"))
    val n = daily.agg(count(lit(1)).as("n_days"))
    a.join(b, col("ib") > col("ia"))
      .agg(
        sum(when((col("xb") - col("xa")) * (col("yb") - col("ya")) > 0, 1L)
          .otherwise(0L)).as("conc"),
        sum(when((col("xb") - col("xa")) * (col("yb") - col("ya")) < 0, 1L)
          .otherwise(0L)).as("disc"),
        sum(when(col("xa") === col("xb") && col("ya") =!= col("yb"), 1L)
          .otherwise(0L)).as("tie_x"),
        sum(when(col("ya") === col("yb") && col("xa") =!= col("xb"), 1L)
          .otherwise(0L)).as("tie_y"),
        sum(when(col("xa") === col("xb") && col("ya") === col("yb"), 1L)
          .otherwise(0L)).as("tie_xy"))
      .crossJoin(broadcast(n))
      .withColumn("n0", expr("n_days * (n_days - 1L) div 2L"))
      .select(col("n_days"), col("n0"), col("conc"), col("disc"),
        col("tie_x"), col("tie_y"), col("tie_xy"),
        Num.pround((col("conc") - col("disc")) /
          (sqrt(col("n0") - col("tie_x") - col("tie_xy")) *
            sqrt(col("n0") - col("tie_y") - col("tie_xy"))), 6).as("tau_b"))
  }

  val q320Sql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS x,
      |    SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) // COUNT(*) AS y
      |  FROM orders GROUP BY 1),
      |idx AS (SELECT ROW_NUMBER() OVER (ORDER BY d) AS i, x, y FROM daily),
      |n AS (SELECT COUNT(*) AS n_days FROM idx),
      |p AS (
      |  SELECT
      |    SUM(CASE WHEN (b.x - a.x) * (b.y - a.y) > 0 THEN 1 ELSE 0 END) AS conc,
      |    SUM(CASE WHEN (b.x - a.x) * (b.y - a.y) < 0 THEN 1 ELSE 0 END) AS disc,
      |    SUM(CASE WHEN a.x = b.x AND a.y <> b.y THEN 1 ELSE 0 END) AS tie_x,
      |    SUM(CASE WHEN a.y = b.y AND a.x <> b.x THEN 1 ELSE 0 END) AS tie_y,
      |    SUM(CASE WHEN a.x = b.x AND a.y = b.y THEN 1 ELSE 0 END) AS tie_xy
      |  FROM idx a JOIN idx b ON b.i > a.i)
      |SELECT n_days, n_days * (n_days - 1) // 2 AS n0,
      |  CAST(conc AS BIGINT) AS conc, CAST(disc AS BIGINT) AS disc,
      |  CAST(tie_x AS BIGINT) AS tie_x, CAST(tie_y AS BIGINT) AS tie_y,
      |  CAST(tie_xy AS BIGINT) AS tie_xy,
      |  FLOOR((CAST(conc - disc AS DOUBLE)
      |    / (sqrt(CAST(n_days * (n_days - 1) // 2 - tie_x - tie_xy AS DOUBLE))
      |       * sqrt(CAST(n_days * (n_days - 1) // 2 - tie_y - tie_xy AS DOUBLE))))
      |    * 1e6 + 0.5) / 1e6 AS tau_b
      |FROM p CROSS JOIN n""".stripMargin

  // --------------------------------------------------------------------------
  // q321 — BRIER SCORE MURPHY DECOMPOSITION: reliability − resolution +
  // uncertainty over 20 equal-width forecast bins (forecast discretized
  // to the bin center (2b+1)/40, so the identity is exact). q224 reads
  // the reliability DIAGRAM; this ships the scalar decomposition every
  // forecast-eval report pairs with it. Score = q224's synthetic
  // probabilistic model under an independent salt.
  //
  // Determinism: per-bin observed rates and the global base rate are
  // pround'd BEFORE the quadratic terms (identical doubles in both
  // engines); the 20-term folds run in pinned bin order (q201/q224's
  // sorted-array rule); uncertainty is an exact-integer cross product
  // p·(n−p) ≤ 2.5e11 — exact in a double through the 10× probe.
  //
  // Scale: one hash aggregate to 20 rows + a broadcast 1-row global —
  // nothing else touches the corpus.
  def q321BrierDecomposition(spark: SparkSession, dir: String): DataFrame = {
    val u = (conv(substring(md5(concat(lit("brier:"), col("event_id").cast("string"))), 1, 13),
      16, 10).cast("long").cast("double") + 0.5) / lit(4503599627370496.0)
    val sc = Tables.events(spark, dir)
      .select((col("event_type") === "purchase").as("pos"),
        (u * 0.8 + when(col("event_type") === "purchase", 0.2).otherwise(0.0)).as("p"))
    val bins = sc
      .withColumn("bin", floor(col("p") * 20).cast("int"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), count_if(col("pos")).as("n_pos"))
      .withColumn("obar",
        Num.pround(col("n_pos").cast("double") / col("n"), 6))
      .withColumn("pb", (lit(2) * col("bin") + 1) / lit(40.0))
    val g = sc.agg(count(lit(1)).as("nn"), count_if(col("pos")).as("pp"))
      .select(col("nn"), col("pp"),
        Num.pround(col("pp").cast("double") / col("nn"), 6).as("obar_g"),
        ((col("pp") * (col("nn") - col("pp"))).cast("double") /
          (col("nn") * col("nn")).cast("double")).as("unc_raw"))
    val summary = bins.crossJoin(broadcast(g))
      .agg(
        sort_array(collect_list(struct(col("bin"),
          (col("n") * (col("pb") - col("obar")) * (col("pb") - col("obar"))).as("tr"),
          (col("n") * (col("obar") - col("obar_g")) * (col("obar") - col("obar_g"))).as("ts"))))
          .as("arr"),
        max(col("nn")).as("nn"), max(col("unc_raw")).as("unc_raw"))
      .withColumn("rel_raw",
        expr("aggregate(arr, 0.0d, (a, x) -> a + x.tr)") / col("nn"))
      .withColumn("res_raw",
        expr("aggregate(arr, 0.0d, (a, x) -> a + x.ts)") / col("nn"))
      .select(
        Num.pround(col("rel_raw"), 6).as("reliability"),
        Num.pround(col("res_raw"), 6).as("resolution"),
        Num.pround(col("unc_raw"), 6).as("uncertainty"),
        Num.pround(col("rel_raw") - col("res_raw") + col("unc_raw"), 6).as("brier"))
    bins.crossJoin(broadcast(summary))
      .select(col("bin"), col("n"), col("n_pos"), col("obar"),
        col("reliability"), col("resolution"), col("uncertainty"), col("brier"))
      .orderBy(col("bin"))
  }

  val q321Sql: String =
    """WITH sc AS (
      |  SELECT event_type = 'purchase' AS pos,
      |    (('0x' || substr(md5('brier:' || event_id::VARCHAR), 1, 13))::BIGINT + 0.5)
      |      / 4503599627370496.0 * 0.8
      |      + CASE WHEN event_type = 'purchase' THEN 0.2 ELSE 0.0 END AS p
      |  FROM events),
      |b AS (
      |  SELECT CAST(FLOOR(p * 20) AS INT) AS bin, COUNT(*) AS n,
      |    CAST(COUNT(*) FILTER (pos) AS BIGINT) AS n_pos
      |  FROM sc GROUP BY 1),
      |b2 AS (
      |  SELECT bin, n, n_pos,
      |    FLOOR((CAST(n_pos AS DOUBLE) / n) * 1e6 + 0.5) / 1e6 AS obar,
      |    (2 * bin + 1) / 40.0 AS pb
      |  FROM b),
      |g AS (
      |  SELECT COUNT(*) AS nn, CAST(COUNT(*) FILTER (pos) AS BIGINT) AS pp,
      |    FLOOR((CAST(COUNT(*) FILTER (pos) AS DOUBLE) / COUNT(*)) * 1e6 + 0.5) / 1e6
      |      AS obar_g,
      |    CAST(COUNT(*) FILTER (pos) * (COUNT(*) - COUNT(*) FILTER (pos)) AS DOUBLE)
      |      / CAST(COUNT(*) * COUNT(*) AS DOUBLE) AS unc_raw
      |  FROM sc),
      |s AS (
      |  SELECT
      |    list_reduce(list(n * (pb - obar) * (pb - obar) ORDER BY bin),
      |      (x, y) -> x + y) / nn AS rel_raw,
      |    list_reduce(list(n * (obar - obar_g) * (obar - obar_g) ORDER BY bin),
      |      (x, y) -> x + y) / nn AS res_raw,
      |    MAX(unc_raw) AS unc_raw
      |  FROM b2 CROSS JOIN g GROUP BY nn),
      |f AS (
      |  SELECT FLOOR(rel_raw * 1e6 + 0.5) / 1e6 AS reliability,
      |    FLOOR(res_raw * 1e6 + 0.5) / 1e6 AS resolution,
      |    FLOOR(unc_raw * 1e6 + 0.5) / 1e6 AS uncertainty,
      |    FLOOR((rel_raw - res_raw + unc_raw) * 1e6 + 0.5) / 1e6 AS brier
      |  FROM s)
      |SELECT bin, n, n_pos, obar, reliability, resolution, uncertainty, brier
      |FROM b2 CROSS JOIN f ORDER BY bin""".stripMargin

  // --------------------------------------------------------------------------
  // q322 — SYSTEMATIC PPS SAMPLING (probability proportional to size):
  // draw k = 50 supplier units by revenue weight with the classic
  // cumulative-weight stride — thresholds r + j·step, step = W div k,
  // r = step div 2 — the survey-sampling workhorse that is FULLY
  // DETERMINISTIC (unlike q283's randomized A-ES): exact integer cents
  // end to end, selection counts proven by Σtimes = k.
  //
  // Scale: the global cumulative weight uses q169's two-pass shape —
  // range-bucket the key, exclusive prefix over the 257-row bucket grid
  // (allowlisted), within-bucket partitioned window — no global sort
  // through one task.
  def systematicPps(weights: DataFrame, k: Long): DataFrame = {
    val mx = weights.agg(max(col("sk")).as("mx"))
    val bucketed = weights.crossJoin(broadcast(mx))
      .withColumn("bucket", expr("sk div (mx div 256 + 1)")).drop("mx")
    val boff = bucketed.groupBy(col("bucket")).agg(sum(col("w")).as("bw"))
      .withColumn("boff", coalesce(sum(col("bw")).over(
        Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("bucket"), col("boff"))
    val tot = weights.agg(sum(col("w")).as("wtot"))
      .withColumn("step", expr(s"wtot div ${k}L"))
      .withColumn("r", expr("step div 2L"))
    bucketed.join(broadcast(boff), Seq("bucket"))
      .withColumn("cw", col("boff") + sum(col("w")).over(
        Window.partitionBy(col("bucket")).orderBy(col("sk"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(tot))
      .withColumn("prev", col("cw") - col("w"))
      // thresholds below x: 0 if x ≤ r else (x−r−1) div step + 1 — exact
      // BIGINT floor-div on positive operands in both engines
      .withColumn("times", expr(
        "(case when cw <= r then 0L else (cw - r - 1L) div step + 1L end) - " +
          "(case when prev <= r then 0L else (prev - r - 1L) div step + 1L end)"))
      .filter(col("times") >= 1L)
      .select(col("sk"), col("w"), col("cw"), col("times"),
        expr("(1000000L * w) div wtot").as("share_ppm"))
      .orderBy(col("sk"))
  }

  def q322SystematicPps(spark: SparkSession, dir: String): DataFrame = {
    val w = Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey").as("sk"))
      .agg(expr("sum(cast(floor(l_extendedprice * 100 + 0.5d) as bigint))").as("w"))
    systematicPps(w, k = 50L)
  }

  val q322Sql: String =
    """WITH w AS (
      |  SELECT l_suppkey AS sk,
      |    SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS w
      |  FROM lineitem GROUP BY 1),
      |t AS (
      |  SELECT SUM(w) AS wtot, SUM(w) // 50 AS step, SUM(w) // 50 // 2 AS r
      |  FROM w),
      |c AS (
      |  SELECT sk, w,
      |    SUM(w) OVER (ORDER BY sk ROWS UNBOUNDED PRECEDING) AS cw
      |  FROM w)
      |SELECT sk, CAST(w AS BIGINT) AS w, CAST(cw AS BIGINT) AS cw,
      |  CAST((CASE WHEN cw <= r THEN 0 ELSE (cw - r - 1) // step + 1 END)
      |    - (CASE WHEN cw - w <= r THEN 0 ELSE (cw - w - r - 1) // step + 1 END)
      |    AS BIGINT) AS times,
      |  CAST((1000000 * w) // wtot AS BIGINT) AS share_ppm
      |FROM c CROSS JOIN t
      |WHERE (CASE WHEN cw <= r THEN 0 ELSE (cw - r - 1) // step + 1 END)
      |    - (CASE WHEN cw - w <= r THEN 0 ELSE (cw - w - r - 1) // step + 1 END) >= 1
      |ORDER BY sk""".stripMargin

  // --------------------------------------------------------------------------
  // q323 — DISTINCT-N DIVERSITY per source: unique-n-gram / total-n-gram
  // ratios for n = 1, 2, 3 — the standard repetitiveness/diversity
  // readout for generated or scraped training text (low distinct-n =
  // templated/looping content). Exact BIGINT counts and ppm ratios.
  //
  // Scale: three explode → hash-aggregate passes (one per n), each one
  // shuffle keyed by (source, gram); joined on the small source
  // dimension at the end.
  def distinctN(docs: DataFrame): DataFrame = {
    val t = docs.select(col("source"), TextOps.toks.as("t"))
    def grams(n: Int): DataFrame = {
      val g = n match {
        case 1 => explode(col("t"))
        case _ => explode(expr(
          s"transform(sequence(1, size(t) - ${n - 1}), i -> " +
            (1 to n).map(j => s"element_at(t, cast(i as int) + ${j - 1})")
              .mkString("concat_ws(' ', ", ", ", ")") + ")"))
      }
      t.filter(size(col("t")) >= n)
        .select(col("source"), g.as("g"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as(s"tot_$n"), countDistinct(col("g")).as(s"uniq_$n"))
    }
    grams(1).join(grams(2), Seq("source")).join(grams(3), Seq("source"))
      .select(col("source"),
        col("tot_1"), col("uniq_1"), expr("(1000000L * uniq_1) div tot_1").as("d1_ppm"),
        col("tot_2"), col("uniq_2"), expr("(1000000L * uniq_2) div tot_2").as("d2_ppm"),
        col("tot_3"), col("uniq_3"), expr("(1000000L * uniq_3) div tot_3").as("d3_ppm"))
      .orderBy(col("source"))
  }

  def q323DistinctN(spark: SparkSession, dir: String): DataFrame =
    distinctN(Tables.documents(spark, dir))

  val q323Sql: String = {
    val toks = TextOps.toksSqlD
    s"""WITH t AS (SELECT source, $toks AS t FROM documents),
       |u1 AS (
       |  SELECT source, COUNT(*) AS tot_1, COUNT(DISTINCT g) AS uniq_1
       |  FROM (SELECT source, UNNEST(t) AS g FROM t) GROUP BY 1),
       |u2 AS (
       |  SELECT source, COUNT(*) AS tot_2, COUNT(DISTINCT g) AS uniq_2
       |  FROM (SELECT source, t[i] || ' ' || t[i+1] AS g
       |        FROM t, UNNEST(generate_series(1, len(t) - 1)) AS s(i)
       |        WHERE len(t) >= 2) GROUP BY 1),
       |u3 AS (
       |  SELECT source, COUNT(*) AS tot_3, COUNT(DISTINCT g) AS uniq_3
       |  FROM (SELECT source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
       |        FROM t, UNNEST(generate_series(1, len(t) - 2)) AS s(i)
       |        WHERE len(t) >= 3) GROUP BY 1)
       |SELECT source,
       |  CAST(tot_1 AS BIGINT) AS tot_1, CAST(uniq_1 AS BIGINT) AS uniq_1,
       |  CAST((1000000 * uniq_1) // tot_1 AS BIGINT) AS d1_ppm,
       |  CAST(tot_2 AS BIGINT) AS tot_2, CAST(uniq_2 AS BIGINT) AS uniq_2,
       |  CAST((1000000 * uniq_2) // tot_2 AS BIGINT) AS d2_ppm,
       |  CAST(tot_3 AS BIGINT) AS tot_3, CAST(uniq_3 AS BIGINT) AS uniq_3,
       |  CAST((1000000 * uniq_3) // tot_3 AS BIGINT) AS d3_ppm
       |FROM u1 JOIN u2 USING (source) JOIN u3 USING (source)
       |ORDER BY source""".stripMargin
  }

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q320_kendall_tau", q320KendallTau _, Some(q320Sql)),
    ("q321_brier_decomposition", q321BrierDecomposition _, Some(q321Sql)),
    ("q322_systematic_pps", q322SystematicPps _, Some(q322Sql)),
    ("q323_distinct_n", q323DistinctN _, Some(q323Sql)))
}
