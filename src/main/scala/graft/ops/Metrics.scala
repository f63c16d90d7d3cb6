package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** In-flight data-quality counters via `Dataset.observe` — the
  * production-pipeline surface for "how many rows / nulls / out-of-range
  * values flowed through this stage" WITHOUT a second pass over the data:
  * the accumulators piggyback on whatever action already runs. At 100 TB a
  * separate quality-count job doubles the scan cost; observe() is free.
  *
  * Read the counters after any action via
  * `df.queryExecution.observedMetrics(name)` (batch) or a
  * `QueryExecutionListener` / streaming progress events in a long-lived
  * pipeline.
  */
object Metrics {

  /** Attach row/null/min/max counters for `valueCol` under `name`. */
  def observeQuality(df: DataFrame, name: String, valueCol: String): DataFrame =
    df.observe(name,
      count(lit(1)).as("n_rows"),
      count_if(col(valueCol).isNull).as("n_null"),
      min(col(valueCol)).as("min_v"),
      max(col(valueCol)).as("max_v"))

  // --------------------------------------------------------------------------
  // q124 — observe() as a CATALOG operator: run the instrumented scan of
  // lineitem.l_extendedprice, then surface the OBSERVED METRICS THEMSELVES
  // as the query result, so the DuckDB oracle hash-checks the counters the
  // accumulators produced (not a re-computed aggregate). The scan is
  // executed through its own QueryExecution so the CollectMetrics
  // accumulators fill without a second pass; all four counters are
  // order-free (count/min/max), hence partition-deterministic.
  def q124ObserveQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val observed = observeQuality(
      Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_extendedprice")),
      "q124_quality", "l_extendedprice")
    val qe = observed.queryExecution
    qe.toRdd.foreach(_ => ()) // execute THIS plan; fills the metric accumulators
    val m = qe.observedMetrics("q124_quality")
    // min/max over a 0-row scan observe as SQL NULL — carry them as
    // Options so the encoder ships nullable doubles instead of failing
    Seq((m.getAs[Long]("n_rows"), m.getAs[Long]("n_null"),
        Option(m.getAs[java.lang.Double]("min_v")).map(_.toDouble),
        Option(m.getAs[java.lang.Double]("max_v")).map(_.toDouble)))
      .toDF("n_rows", "n_null", "min_v", "max_v")
  }

  val q124Sql: String =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(COUNT(*) FILTER (l_extendedprice IS NULL) AS BIGINT) AS n_null,
      |  MIN(l_extendedprice) AS min_v, MAX(l_extendedprice) AS max_v
      |FROM lineitem""".stripMargin

  // --------------------------------------------------------------------------
  // q193 — exact distributed ROC-AUC via the Mann–Whitney rank-sum
  // identity: AUC = (Σ_{i∈pos} rank_i − n⁺(n⁺+1)/2) / (n⁺·n⁻). The naive
  // formulation ranks every score through ONE task
  // (row_number().over(Window.orderBy(score))) — the exact plan class
  // PlanLintSpec bans — so the global rank is q169's two-pass bucketed
  // shape: range-bucket the score, per-bucket counts → exclusive prefix
  // sum over the BOUNDED bucket grid (allowlisted), broadcast offsets
  // back, rank within bucket partitioned. Sampling-free and exact at any
  // scale — the usual sklearn-on-a-sample detour is unnecessary.
  //
  // Determinism: the score is an INTEGER (md5-prefix uniform + a fixed
  // class shift so the ranking is non-trivial, AUC ≈ 0.73); ties broken by
  // (score, event_id) identically in both engines; everything stays in
  // integer arithmetic until the single final division.
  private val scoreExpr =
    "cast(conv(substring(md5(cast(event_id as string)), 1, 8), 16, 10) as bigint)" +
      " + if(event_type = 'purchase', 1500000000L, 0L)"

  def q193ExactAuc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = Tables.events(spark, dir)
      .select(col("event_id"),
        (col("event_type") === "purchase").as("pos"),
        expr(scoreExpr).as("score"))
    val mx = scored.agg(max(col("score")).as("mx"))
    val bucketed = scored.crossJoin(broadcast(mx))
      .withColumn("bucket", expr("score div (mx div 256 + 1)")).drop("mx")
    val offsets = bucketed.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
      .withColumn("offset",
        coalesce(sum(col("cnt")).over(
          Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("offset"))
    bucketed.join(broadcast(offsets), Seq("bucket"))
      .select(col("pos"),
        (col("offset") + row_number().over(
          Window.partitionBy(col("bucket")).orderBy(col("score"), col("event_id"))))
          .as("rk"))
      .agg(
        count_if(col("pos")).as("n_pos"),
        count_if(!col("pos")).as("n_neg"),
        Num.pround(
          (lit(2) * sum(when(col("pos"), col("rk")).otherwise(0L))
            - count_if(col("pos")) * (count_if(col("pos")) + 1)).cast("double")
            / (lit(2.0) * count_if(col("pos")) * count_if(!col("pos"))), 6).as("auc"))
  }

  val q193Sql: String =
    """WITH sc AS (
      |  SELECT event_id, event_type = 'purchase' AS pos,
      |    ('0x' || substr(md5(event_id::VARCHAR), 1, 8))::BIGINT
      |      + CASE WHEN event_type = 'purchase' THEN 1500000000 ELSE 0 END AS score
      |  FROM events),
      |r AS (SELECT pos, ROW_NUMBER() OVER (ORDER BY score, event_id) AS rk FROM sc)
      |SELECT CAST(COUNT(*) FILTER (pos) AS BIGINT) AS n_pos,
      |  CAST(COUNT(*) FILTER (NOT pos) AS BIGINT) AS n_neg,
      |  FLOOR((CAST(2 * SUM(CASE WHEN pos THEN rk ELSE 0 END)
      |             - COUNT(*) FILTER (pos) * (COUNT(*) FILTER (pos) + 1) AS DOUBLE)
      |        / (2.0 * COUNT(*) FILTER (pos) * COUNT(*) FILTER (NOT pos))) * 1e6 + 0.5) / 1e6 AS auc
      |FROM r""".stripMargin

  // --------------------------------------------------------------------------
  // q224 — CALIBRATION AUDIT (reliability diagram + Expected Calibration
  // Error): bin predicted probabilities into 10 equal-width confidence
  // bins; per bin report count, mean confidence, and observed positive
  // rate; ECE = Σ_b (n_b/N)·|acc_b − conf_b|. q193 measures RANKING
  // quality (AUC); this measures PROBABILITY quality — the model-eval
  // pair every scored-data pipeline ships together.
  //
  // The score is the q193 synthetic model made probabilistic: a dyadic
  // md5 uniform scaled by 0.8 plus a 0.2 class shift, so positives
  // concentrate in high bins and the diagram is non-trivial.
  //
  // Determinism: the per-bin mean confidence is an exact scaled-long sum
  // (floor(p·1e12) per row, order-free long Σ), accuracy is an integer
  // ratio; both are rounded to 6 dp BEFORE the gap so every engine
  // compares identical doubles; the 10-term ECE sum runs in pinned bin
  // order via a sorted-array fold (q201's order-pinning rule).
  //
  // Scale: one hash aggregate to 10 rows + a broadcast 1-row ECE join —
  // nothing else touches the corpus.
  def q224Calibration(spark: SparkSession, dir: String): DataFrame = {
    val u = (conv(substring(md5(concat(lit("cal:"), col("event_id").cast("string"))), 1, 13),
      16, 10).cast("long").cast("double") + 0.5) / lit(4503599627370496.0)
    val bins = Tables.events(spark, dir)
      .select((col("event_type") === "purchase").as("pos"),
        (u * 0.8 + when(col("event_type") === "purchase", 0.2).otherwise(0.0)).as("p"))
      .withColumn("bin", floor(col("p") * 10).cast("int"))
      .withColumn("pq", floor(col("p") * 1e12).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), count_if(col("pos")).as("n_pos"),
        Num.pround(sum(col("pq")).cast("double") / 1e12 / count(lit(1)), 6).as("conf"),
        Num.pround(count_if(col("pos")).cast("double") / count(lit(1)), 6).as("acc"))
    val ece = bins
      .agg(sort_array(collect_list(struct(col("bin"),
          (col("n") * abs(col("acc") - col("conf"))).as("t")))).as("ts"),
        sum(col("n")).as("nTot"))
      .select(Num.pround(expr(
        "aggregate(ts, cast(0 as double), (a, x) -> a + x.t)") / col("nTot"), 6).as("ece"))
    bins.crossJoin(broadcast(ece))
      .select(col("bin"), col("n"), col("n_pos"), col("conf"), col("acc"), col("ece"))
      .orderBy(col("bin"))
  }

  val q224Sql: String =
    """WITH sc AS (
      |  SELECT event_type = 'purchase' AS pos,
      |    (('0x' || substr(md5('cal:' || event_id::VARCHAR), 1, 13))::BIGINT + 0.5)
      |      / 4503599627370496.0 * 0.8
      |      + CASE WHEN event_type = 'purchase' THEN 0.2 ELSE 0.0 END AS p
      |  FROM events),
      |b AS (
      |  SELECT CAST(FLOOR(p * 10) AS INT) AS bin, COUNT(*) AS n,
      |    CAST(COUNT(*) FILTER (pos) AS BIGINT) AS n_pos,
      |    FLOOR((CAST(SUM(CAST(FLOOR(p * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 / COUNT(*)) * 1e6 + 0.5) / 1e6
      |      AS conf,
      |    FLOOR((CAST(COUNT(*) FILTER (pos) AS DOUBLE) / COUNT(*)) * 1e6 + 0.5) / 1e6 AS acc
      |  FROM sc GROUP BY 1),
      |e AS (
      |  SELECT FLOOR((list_reduce(list(n * abs(acc - conf) ORDER BY bin),
      |    (x, y) -> x + y) / SUM(n)) * 1e6 + 0.5) / 1e6 AS ece FROM b)
      |SELECT bin, n, n_pos, conf, acc, ece
      |FROM b CROSS JOIN e ORDER BY bin""".stripMargin

  // --------------------------------------------------------------------------
  // q232 — SPLIT-CONFORMAL PREDICTION INTERVAL + coverage audit: hash-split
  // lineitem into calibration/test halves, score a fixed base predictor
  // (price ≈ $30/unit), take q̂ = the ⌈(1−α)(n+1)⌉-th smallest calibration
  // residual (α = 0.25), and report the test-set coverage of |y−ŷ| ≤ q̂ —
  // finite-sample ≥ 75% guaranteed under exchangeability. Completes the
  // model-eval family: q193 ranks, q224 calibrates probabilities, q232
  // bounds regression error with a distribution-free interval.
  //
  // Scale: the k-th order statistic is EXACT and sample-free via q169's
  // two-pass bucketed rank (range-bucket → bounded 257-row prefix grid →
  // in-bucket partitioned rank); residuals are exact cent longs; the
  // split is the portable md5 hash. One pass for residuals, one broadcast
  // q̂ join for coverage.
  def q232Conformal(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = (conv(substring(md5(concat_ws(":", lit("conf"), col("l_orderkey"),
      col("l_linenumber"))), 1, 13), 16, 10).cast("long").cast("double") + 0.5) /
      lit(4503599627370496.0)
    val base = Tables.lineitem(spark, dir).select(
      (abs(expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)") -
        expr("cast(cast(l_quantity as decimal(18,2)) * 100 as bigint)") * 3000L)).as("r"),
      (u < 0.5).as("is_cal"))
      // lazy checkpoint (§8.22): the md5-scored residual scan feeds the
      // calibration count, the bucket pass, the in-bucket rank AND the
      // test-coverage aggregate — one slim (long, boolean) materialization
      // replaces four full scan+hash passes
      .localCheckpoint(false)
    val calib = base.filter(col("is_cal")).select(col("r"))
    val kTbl = calib.agg(count(lit(1)).as("n_cal"),
      ceil(lit(0.75) * (count(lit(1)) + 1)).cast("long").as("k"),
      max(col("r")).as("mx"))
    val bucketed = calib.crossJoin(broadcast(kTbl))
      .withColumn("bucket", expr("r div (mx div 256 + 1)"))
      .select(col("r"), col("bucket"))
    val offsets = bucketed.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(
        Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val target = offsets.crossJoin(broadcast(kTbl))
      .filter(col("off") < col("k") && col("off") + col("cnt") >= col("k"))
      .select(col("bucket"), col("off"), col("k"))
    val qhat = bucketed.join(broadcast(target), Seq("bucket"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("bucket")).orderBy(col("r"))))
      .filter(col("off") + col("rn") === col("k"))
      .select(col("r").as("qhat_cents"))
    base.filter(!col("is_cal")).crossJoin(broadcast(qhat))
      .crossJoin(broadcast(kTbl.select(col("n_cal"))))
      .agg(max(col("n_cal")).as("n_cal"), count(lit(1)).as("n_test"),
        (max(col("qhat_cents")) / 100.0).as("qhat"),
        Num.pround(count_if(col("r") <= col("qhat_cents")).cast("double") /
          count(lit(1)), 6).as("coverage"))
  }

  val q232Sql: String =
    """WITH base AS (
      |  SELECT ABS(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |           - CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) * 3000) AS r,
      |    (('0x' || substr(md5('conf:' || l_orderkey::VARCHAR || ':'
      |        || l_linenumber::VARCHAR), 1, 13))::BIGINT + 0.5)
      |      / 4503599627370496.0 < 0.5 AS is_cal
      |  FROM lineitem),
      |k AS (SELECT COUNT(*) AS n_cal,
      |  CAST(CEIL(0.75 * (COUNT(*) + 1)) AS BIGINT) AS kk
      |  FROM base WHERE is_cal),
      |q AS (SELECT r AS qhat_cents FROM (
      |    SELECT r, ROW_NUMBER() OVER (ORDER BY r) AS rn
      |    FROM base WHERE is_cal) x, k WHERE x.rn = k.kk)
      |SELECT MAX(n_cal) AS n_cal, COUNT(*) AS n_test,
      |  MAX(qhat_cents) / 100.0 AS qhat,
      |  FLOOR((CAST(COUNT(*) FILTER (r <= qhat_cents) AS DOUBLE) / COUNT(*)) * 1e6 + 0.5) / 1e6
      |    AS coverage
      |FROM base CROSS JOIN q CROSS JOIN (SELECT n_cal FROM k) kk
      |WHERE NOT is_cal""".stripMargin

  // --------------------------------------------------------------------------
  // q239 — POISSON BOOTSTRAP CONFIDENCE INTERVALS for the per-priority
  // mean order value: the resampling scheme that works at 100 TB. A
  // classic bootstrap resamples n rows WITH replacement B times — a
  // shuffle per replicate. The Poisson bootstrap instead gives every row
  // an independent Poisson(1) weight per replicate (n·B weight draws ≈
  // multinomial resample for large n), so all B = 32 replicates ride ONE
  // linear pass: explode ×32, one map-side-combinable weighted aggregate.
  // CI = 2nd / 31st order statistic of the 32 replicate means (~94%).
  //
  // Determinism: weights come from the portable md5 uniform
  // (conv-substring pattern, §8.4) pushed through the hard-coded
  // Poisson(1) inverse CDF — identical decimal literals in both engines,
  // so every engine draws the SAME weight for the same (order, replicate).
  // Replicate means are exact cent-long ratios rounded to 6 dp BEFORE the
  // order-statistic selection.
  //
  // Scale: ×32 row multiplier into a hash aggregate of 5·32 rows; the
  // order-statistic sort is a 32-element array per group. Nothing global.
  private val poissonCum = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183)

  def q239PoissonBootstrap(spark: SparkSession, dir: String): DataFrame = {
    val u = (conv(substring(md5(concat(lit("boot:"), col("o_orderkey").cast("string"),
      lit(":"), col("r").cast("string"))), 1, 13), 16, 10)
      .cast("long").cast("double") + 0.5) / lit(4503599627370496.0)
    val w = poissonCum.zipWithIndex.foldRight(lit(6): org.apache.spark.sql.Column) {
      case ((c, k), acc) => when(col("u") < c, k).otherwise(acc)
    }
    val rep = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("prio"), col("o_orderkey"),
        expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)").as("cents"))
      .withColumn("r", explode(sequence(lit(0), lit(31))))
      .withColumn("u", u)
      .withColumn("w", w)
    val perRep = rep.groupBy(col("prio"), col("r"))
      .agg(sum(col("w") * col("cents")).as("wx"), sum(col("w")).as("sw"),
        sum(col("cents")).as("sx"), count(lit(1)).as("n"))
      .withColumn("mean_r", Num.pround(col("wx").cast("double") / col("sw") / 100.0, 6))
    // per (prio, r) the group holds every order of the priority once, so
    // n and sx are already the per-priority count / exact total
    perRep.groupBy(col("prio"))
      .agg(first(col("n")).as("n"),
        Num.pround(first(col("sx")).cast("double") / first(col("n")) / 100.0, 6).as("mean"),
        element_at(sort_array(collect_list(col("mean_r"))), 2).as("ci_lo"),
        element_at(sort_array(collect_list(col("mean_r"))), 31).as("ci_hi"))
      .orderBy(col("prio"))
  }

  val q239Sql: String =
    """WITH rep AS (
      |  SELECT o_orderpriority AS prio, o_orderkey,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    unnest(generate_series(0, 31)) AS r
      |  FROM orders),
      |uw AS (
      |  SELECT prio, cents,
      |    (('0x' || substr(md5('boot:' || o_orderkey::VARCHAR || ':' || r::VARCHAR), 1, 13))::BIGINT
      |      + 0.5) / 4503599627370496.0 AS u, r
      |  FROM rep),
      |pw AS (
      |  SELECT prio, r, cents,
      |    CASE WHEN u < 0.36787944117144233 THEN 0
      |         WHEN u < 0.7357588823428847 THEN 1
      |         WHEN u < 0.9196986029286058 THEN 2
      |         WHEN u < 0.9810118431238463 THEN 3
      |         WHEN u < 0.9963401531726563 THEN 4
      |         WHEN u < 0.9994058151824183 THEN 5
      |         ELSE 6 END AS w
      |  FROM uw),
      |pr AS (
      |  SELECT prio, r,
      |    FLOOR((CAST(SUM(w * cents) AS DOUBLE) / SUM(w) / 100.0) * 1e6 + 0.5) / 1e6 AS mean_r,
      |    SUM(cents) AS sx, COUNT(*) AS n
      |  FROM pw GROUP BY 1, 2)
      |SELECT prio, CAST(ANY_VALUE(n) AS BIGINT) AS n,
      |  FLOOR((CAST(ANY_VALUE(sx) AS DOUBLE) / ANY_VALUE(n) / 100.0) * 1e6 + 0.5) / 1e6 AS mean,
      |  list_sort(list(mean_r))[2] AS ci_lo,
      |  list_sort(list(mean_r))[31] AS ci_hi
      |FROM pr GROUP BY prio ORDER BY prio""".stripMargin

  // --------------------------------------------------------------------------
  // q241 — ISOTONIC CALIBRATION (PAV) on a bounded bin grid: fit the
  // best monotone non-decreasing map from predicted score to observed
  // positive rate — the calibrator sklearn's IsotonicRegression ships,
  // recast for 100 TB. The corpus collapses to 50 weighted score bins in
  // ONE hash aggregate; the pool-adjacent-violators solution is then
  // computed EXACTLY on that grid via the minimax identity
  //   fit_i = max_{j≤i} min_{k≥i} wmean(y[j..k])
  // (no iterative pooling): interval means come from exact prefix sums,
  // the (j,k) interval grid is 50×50/2 rows by construction, and the
  // min/max collapse is a per-j descending running min + a per-k max —
  // all partitioned windows except the 50-row prefix sum.
  //
  // Scores/labels reuse q224's deterministic construction, so q224
  // (reliability bins + ECE) and q241 (the monotone recalibration map)
  // are two readouts of the same pipeline stage.
  def q241IsotonicCalibration(spark: SparkSession, dir: String): DataFrame = {
    val u = (conv(substring(md5(concat(lit("cal:"), col("event_id").cast("string"))), 1, 13),
      16, 10).cast("long").cast("double") + 0.5) / lit(4503599627370496.0)
    val bins = Tables.events(spark, dir)
      .select((col("event_type") === "purchase").as("pos"),
        (u * 0.8 + when(col("event_type") === "purchase", 0.2).otherwise(0.0)).as("p"))
      .withColumn("bin", floor(col("p") * 50).cast("int"))
      .withColumn("pq", floor(col("p") * 1e12).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("w"), count_if(col("pos")).as("y"),
        sum(col("pq")).as("spq"))
    val wCum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bins
      .withColumn("cw", sum(col("w")).over(wCum))
      .withColumn("cy", sum(col("y")).over(wCum))
    // interval grid (j ≤ k): wmean over bins j..k from exact prefix sums
    val a = cum.select(col("bin").as("j"), (col("cw") - col("w")).as("pw"),
      (col("cy") - col("y")).as("py"))
    val b = cum.select(col("bin").as("k"), col("cw"), col("cy"))
    val pairs = a.join(b, col("k") >= col("j"))
      .withColumn("wmean",
        (col("cy") - col("py")).cast("double") / (col("cw") - col("pw")).cast("double"))
    // min over k ≥ i within each j (descending running min), then max over j ≤ i
    val wMinDesc = Window.partitionBy(col("j")).orderBy(col("k").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fit = pairs
      .withColumn("runmin", min(col("wmean")).over(wMinDesc))
      .groupBy(col("k").as("bin"))
      .agg(Num.pround(max(col("runmin")), 6).as("iso_fit"))
    bins.join(fit, Seq("bin"))
      .select(col("bin"), col("w").as("n"),
        Num.pround(col("spq").cast("double") / 1e12 / col("w"), 6).as("conf"),
        Num.pround(col("y").cast("double") / col("w"), 6).as("raw_acc"),
        col("iso_fit"))
      .orderBy(col("bin"))
  }

  val q241Sql: String =
    """WITH sc AS (
      |  SELECT event_type = 'purchase' AS pos,
      |    (('0x' || substr(md5('cal:' || event_id::VARCHAR), 1, 13))::BIGINT + 0.5)
      |      / 4503599627370496.0 * 0.8
      |      + CASE WHEN event_type = 'purchase' THEN 0.2 ELSE 0.0 END AS p
      |  FROM events),
      |bins AS (
      |  SELECT CAST(FLOOR(p * 50) AS INT) AS bin, COUNT(*) AS w,
      |    CAST(COUNT(*) FILTER (pos) AS BIGINT) AS y,
      |    CAST(SUM(CAST(FLOOR(p * 1e12) AS BIGINT)) AS BIGINT) AS spq
      |  FROM sc GROUP BY 1),
      |cum AS (
      |  SELECT bin, w, y, spq,
      |    SUM(w) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cw,
      |    SUM(y) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cy
      |  FROM bins),
      |pairs AS (
      |  SELECT a.bin AS j, b.bin AS k,
      |    CAST(b.cy - (a.cy - a.y) AS DOUBLE) / CAST(b.cw - (a.cw - a.w) AS DOUBLE) AS wmean
      |  FROM cum a JOIN cum b ON b.bin >= a.bin),
      |mins AS (
      |  SELECT j, k,
      |    MIN(wmean) OVER (PARTITION BY j ORDER BY k DESC ROWS UNBOUNDED PRECEDING) AS runmin
      |  FROM pairs),
      |fit AS (
      |  SELECT k AS bin, FLOOR((MAX(runmin)) * 1e6 + 0.5) / 1e6 AS iso_fit FROM mins GROUP BY 1)
      |SELECT bins.bin, w AS n,
      |  FLOOR((CAST(spq AS DOUBLE) / 1e12 / w) * 1e6 + 0.5) / 1e6 AS conf,
      |  FLOOR((CAST(y AS DOUBLE) / w) * 1e6 + 0.5) / 1e6 AS raw_acc, iso_fit
      |FROM bins JOIN fit ON bins.bin = fit.bin
      |ORDER BY bins.bin""".stripMargin

  // --------------------------------------------------------------------------
  // q260 — HISTOGRAM-BASED BEST-SPLIT FINDER (the LightGBM/XGBoost
  // histogram-algorithm core): for each group, find the feature threshold
  // that maximally reduces squared error of the target — from ONE pass.
  // The feature (quantity) collapses to its bounded value grid with per-
  // bin sufficient stats (n, Σy); cumulative sums over the grid give
  // every candidate split's left/right stats simultaneously; gain(s) =
  // S_L²/n_L + S_R²/n_R − S²/n (the SSE-reduction identity). This is how
  // tree learners scale to 100 TB: histograms shuffle, rows never do.
  //
  // Exactness: Σy ride DECIMAL(38) cents; each candidate's gain is three
  // double divisions of exact decimals, identical expression both
  // engines; the argmax is max_by over (gain, −s) with gain rounded to
  // 4 dp BEFORE comparison so the winner is boundary-stable.
  def q260BestSplit(spark: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val bins = Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("flag"),
        col("l_quantity").cast("int").as("q"),
        expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as decimal(18,0))").as("y"))
      .groupBy(col("flag"), col("q"))
      .agg(count(lit(1)).cast(d38).as("n"), sum(col("y")).cast(d38).as("sy"))
    val wCum = Window.partitionBy(col("flag")).orderBy(col("q"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = bins.groupBy(col("flag"))
      .agg(sum(col("n")).cast(d38).as("tn"), sum(col("sy")).cast(d38).as("tsy"))
    val gains = bins
      .withColumn("nl", sum(col("n")).over(wCum).cast(d38))
      .withColumn("syl", sum(col("sy")).over(wCum).cast(d38))
      .join(broadcast(tot), Seq("flag"))
      .filter(col("nl") < col("tn")) // a split must leave a right side
      .withColumn("gain", Num.pround(
        (col("syl") * col("syl")).cast("double") / col("nl").cast("double")
          + ((col("tsy") - col("syl")) * (col("tsy") - col("syl"))).cast("double")
            / (col("tn") - col("nl")).cast("double")
          - (col("tsy") * col("tsy")).cast("double") / col("tn").cast("double"), 4))
    gains.groupBy(col("flag"))
      .agg(max(struct(col("gain"), (-col("q")).as("nq"))).as("m"),
        first(col("tn")).cast("long").as("n_rows"))
      .select(col("flag"), (-col("m.nq")).as("split_at_q_lte"),
        Num.pround(col("m.gain") / 1e8, 4).as("gain_dollars_sq"), col("n_rows"))
      .orderBy(col("flag"))
  }

  val q260Sql: String =
    """WITH b AS (
      |  SELECT l_returnflag AS flag, CAST(l_quantity AS INT) AS q,
      |    COUNT(*) AS n,
      |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS HUGEINT)) AS sy
      |  FROM lineitem GROUP BY 1, 2),
      |t AS (SELECT flag, SUM(n) AS tn, SUM(sy) AS tsy FROM b GROUP BY 1),
      |c AS (
      |  SELECT b.flag, q,
      |    SUM(n) OVER w AS nl, SUM(sy) OVER w AS syl, tn, tsy
      |  FROM b JOIN t ON b.flag = t.flag
      |  WINDOW w AS (PARTITION BY b.flag ORDER BY q ROWS UNBOUNDED PRECEDING)),
      |g AS (
      |  SELECT flag, q,
      |    FLOOR((CAST(syl * syl AS DOUBLE) / CAST(nl AS DOUBLE)
      |      + CAST((tsy - syl) * (tsy - syl) AS DOUBLE) / CAST(tn - nl AS DOUBLE)
      |      - CAST(tsy * tsy AS DOUBLE) / CAST(tn AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS gain,
      |    tn
      |  FROM c WHERE nl < tn),
      |rk AS (
      |  SELECT flag, q, gain, tn,
      |    ROW_NUMBER() OVER (PARTITION BY flag ORDER BY gain DESC, q) AS r
      |  FROM g QUALIFY r = 1)
      |SELECT flag, CAST(q AS INT) AS split_at_q_lte,
      |  FLOOR((gain / 1e8) * 1e4 + 0.5) / 1e4 AS gain_dollars_sq,
      |  CAST(tn AS BIGINT) AS n_rows
      |FROM rk ORDER BY flag""".stripMargin

  // --------------------------------------------------------------------------
  // q265 — PRECISION/RECALL CURVE + BEST-F1 THRESHOLD from score bins:
  // the classification-eval readout q193 (AUC) and q224 (calibration)
  // don't give — what operating point to SHIP. Scores collapse to the
  // 50-bin grid; suffix sums over it give every threshold's exact TP/FP
  // simultaneously; F1 = 2TP/(2TP + FP + FN) stays an integer rational
  // all the way to the OUTPUT: precision/recall/F1 ship as exact
  // parts-per-million BIGINT floor-divisions of the exact counts
  // (§8.4 portability policy — the round-7 driver flipped a 6th-decimal
  // ROUND of the double quotient on cells whose true value had a 4/5 in
  // the 7th decimal; integer div is bit-identical in every engine). The
  // best row is flagged via a max over the INTEGER f1_ppm.
  def q265PrCurve(spark: SparkSession, dir: String): DataFrame = {
    val u = (conv(substring(md5(concat(lit("cal:"), col("event_id").cast("string"))), 1, 13),
      16, 10).cast("long").cast("double") + 0.5) / lit(4503599627370496.0)
    val bins = Tables.events(spark, dir)
      .select((col("event_type") === "purchase").as("pos"),
        (u * 0.8 + when(col("event_type") === "purchase", 0.2).otherwise(0.0)).as("p"))
      .withColumn("bin", floor(col("p") * 50).cast("int"))
      .groupBy(col("bin"))
      .agg(count_if(col("pos")).as("np"), count_if(!col("pos")).as("nn"))
    val wSuf = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    bins
      .withColumn("tp", sum(col("np")).over(wSuf))
      .withColumn("fp", sum(col("nn")).over(wSuf))
      .withColumn("totp", sum(col("np")).over(wAll))
      // F1 = 2TP/(2TP+FP+FN), FN = totp−tp ⇒ denominator = tp+fp+totp
      .withColumn("f1_ppm", expr("(2000000L * tp) div (tp + fp + totp)"))
      .withColumn("best_f1", max(col("f1_ppm")).over(wAll))
      .select((col("bin") * 2).cast("int").as("threshold_pct"),
        col("tp"), col("fp"),
        expr("(1000000L * tp) div (tp + fp)").as("precision_ppm"),
        expr("(1000000L * tp) div totp").as("recall_ppm"),
        col("f1_ppm"), (col("f1_ppm") === col("best_f1")).as("is_best"))
      .orderBy(col("threshold_pct"))
  }

  val q265Sql: String =
    """WITH sc AS (
      |  SELECT event_type = 'purchase' AS pos,
      |    (('0x' || substr(md5('cal:' || event_id::VARCHAR), 1, 13))::BIGINT + 0.5)
      |      / 4503599627370496.0 * 0.8
      |      + CASE WHEN event_type = 'purchase' THEN 0.2 ELSE 0.0 END AS p
      |  FROM events),
      |b AS (
      |  SELECT CAST(FLOOR(p * 50) AS INT) AS bin,
      |    CAST(COUNT(*) FILTER (WHERE pos) AS BIGINT) AS np,
      |    CAST(COUNT(*) FILTER (WHERE NOT pos) AS BIGINT) AS nn
      |  FROM sc GROUP BY 1),
      |s AS (
      |  SELECT bin,
      |    SUM(np) OVER (ORDER BY bin DESC ROWS UNBOUNDED PRECEDING) AS tp,
      |    SUM(nn) OVER (ORDER BY bin DESC ROWS UNBOUNDED PRECEDING) AS fp,
      |    SUM(np) OVER () AS totp
      |  FROM b),
      |f AS (
      |  SELECT bin, tp, fp, totp,
      |    CAST((2000000 * tp) // (tp + fp + totp) AS BIGINT) AS f1_ppm
      |  FROM s)
      |SELECT CAST(bin * 2 AS INT) AS threshold_pct,
      |  CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
      |  CAST((1000000 * tp) // (tp + fp) AS BIGINT) AS precision_ppm,
      |  CAST((1000000 * tp) // totp AS BIGINT) AS recall_ppm,
      |  f1_ppm, f1_ppm = MAX(f1_ppm) OVER () AS is_best
      |FROM f ORDER BY threshold_pct""".stripMargin

  // --------------------------------------------------------------------------
  // q267 — CUPED VARIANCE REDUCTION (controlled-experiment sensitivity):
  // the pre-experiment covariate adjustment every experimentation
  // platform runs — y_adj = y − θ·(x − x̄) with θ = cov(x,y)/var(x),
  // where x = a user's PRE-period activity and y the experiment-period
  // metric. Reported: θ, the raw and adjusted metric variance, and the
  // variance-reduction percentage ρ² = A²/(B·C) — which is how much
  // smaller an A/B test this org needs to run.
  //
  // Exactness: per-user (x, y) are integer event counts split at the
  // integer-micros midpoint; all five moments ride DECIMAL(38); θ and
  // the reductions are ratios of EXACT integer quantities (A = nΣxy −
  // ΣxΣy, B = nΣx² − (Σx)², C = nΣy² − (Σy)², var_adj numerator =
  // C·B − A²) with one double division each at output.
  def q267Cuped(spark: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val span = ev.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
      .select(expr("lo + (hi - lo) div 2").as("mid"))
    val xy = ev.crossJoin(broadcast(span))
      .groupBy(col("user_id"))
      .agg(count_if(col("us") <= col("mid")).as("x"),
        count_if(col("us") > col("mid")).as("y"))
    val m = xy.agg(count(lit(1)).cast(d38).as("n"),
      sum(col("x")).cast(d38).as("sx"), sum(col("y")).cast(d38).as("sy"),
      sum(col("x") * col("y")).cast(d38).as("sxy"),
      sum(col("x") * col("x")).cast(d38).as("sxx"),
      sum(col("y") * col("y")).cast(d38).as("syy"))
    m.withColumn("a", (col("sxy") * col("n") - col("sx") * col("sy")).cast(d38))
      .withColumn("b", (col("sxx") * col("n") - col("sx") * col("sx")).cast(d38))
      .withColumn("c", (col("syy") * col("n") - col("sy") * col("sy")).cast(d38))
      .select(col("n").cast("long").as("n_users"),
        Num.pround(col("a").cast("double") / col("b").cast("double"), 6).as("theta"),
        Num.pround(col("c").cast("double") /
          (col("n") * col("n")).cast("double"), 4).as("var_y"),
        Num.pround((col("c") * col("b") - col("a") * col("a")).cast("double") /
          (col("b") * col("n") * col("n")).cast("double"), 4).as("var_y_adj"),
        Num.pround((col("a") * col("a")).cast("double") /
          (col("b") * col("c")).cast("double") * 100, 4).as("reduction_pct"))
  }

  val q267Sql: String =
    """WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      |sp AS (SELECT MIN(us) + (MAX(us) - MIN(us)) // 2 AS mid FROM ev),
      |xy AS (
      |  SELECT user_id,
      |    CAST(COUNT(*) FILTER (WHERE us <= mid) AS HUGEINT) AS x,
      |    CAST(COUNT(*) FILTER (WHERE us > mid) AS HUGEINT) AS y
      |  FROM ev, sp GROUP BY 1),
      |m AS (
      |  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
      |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      |  FROM xy),
      |d AS (
      |  SELECT n, sxy * n - sx * sy AS a, sxx * n - sx * sx AS b,
      |    syy * n - sy * sy AS c
      |  FROM m)
      |SELECT CAST(n AS BIGINT) AS n_users,
      |  FLOOR((CAST(a AS DOUBLE) / CAST(b AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS theta,
      |  FLOOR((CAST(c AS DOUBLE) / CAST(n * n AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS var_y,
      |  FLOOR((CAST(c * b - a * a AS DOUBLE) / CAST(b * n * n AS DOUBLE)) * 1e4 + 0.5) / 1e4
      |    AS var_y_adj,
      |  FLOOR((CAST(a * a AS DOUBLE) / CAST(b * c AS DOUBLE) * 100) * 1e4 + 0.5) / 1e4
      |    AS reduction_pct
      |FROM d""".stripMargin

  // --------------------------------------------------------------------------
  // q269 — MATCHED-COHORT BALANCE (observational causal readout):
  // purchase-heavy users (more purchases than views — the "converted"
  // behavioral segment; every user buys SOMETHING on this feed, so
  // any-purchase would leave an empty control) vs the rest differ in
  // activity, so their raw spend comparison is confounded. Exact-bin matching on the activity
  // covariate (n_events div 5, capped — 21 bins) reweights the control
  // side to the treated bin distribution over COMMON SUPPORT, and the
  // result reports the activity SMD plus raw vs matched control spend —
  // the confounding collapse made visible in one row.
  //
  // Exactness: per-bin counts/sums are exact; the reweighted control
  // mean is a Σ of per-bin rationals folded in PINNED bin order (q201's
  // sorted-array rule); SMD uses exact moments with one sqrt at output.
  def q269MatchedBalance(spark: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_ev"),
        (count_if(col("event_type") === "purchase") >
          count_if(col("event_type") === "view")).cast("int").as("t"),
        sum(expr("cast(cast(value as decimal(18,2)) * 100 as bigint)")).as("spend"))
      .withColumn("bin", least(expr("n_ev div 5"), lit(20L)).cast("int"))
    val byBin = perUser.groupBy(col("t"), col("bin"))
      .agg(count(lit(1)).cast(d38).as("n"), sum(col("spend")).cast(d38).as("s"),
        sum(col("n_ev")).cast(d38).as("sx"),
        sum(col("n_ev") * col("n_ev")).cast(d38).as("sxx"))
    val tb = byBin.filter(col("t") === 1)
      .select(col("bin"), col("n").as("nt"), col("s").as("st"),
        col("sx").as("sxt"), col("sxx").as("sxxt"))
    val cb = byBin.filter(col("t") === 0)
      .select(col("bin"), col("n").as("nc"), col("s").as("sc"),
        col("sx").as("sxc"), col("sxx").as("sxxc"))
    val joined = tb.join(cb, Seq("bin"), "full_outer")
    joined.agg(
      sum(coalesce(col("nt"), lit(0))).cast(d38).as("n_t"),
      sum(coalesce(col("nc"), lit(0))).cast(d38).as("n_c"),
      sum(coalesce(col("st"), lit(0))).cast(d38).as("s_t"),
      sum(coalesce(col("sc"), lit(0))).cast(d38).as("s_c"),
      sum(coalesce(col("sxt"), lit(0))).cast(d38).as("sx_t"),
      sum(coalesce(col("sxc"), lit(0))).cast(d38).as("sx_c"),
      sum(coalesce(col("sxxt"), lit(0))).cast(d38).as("sxx_t"),
      sum(coalesce(col("sxxc"), lit(0))).cast(d38).as("sxx_c"),
      // common support: bins where both sides exist
      sum(when(col("nt").isNotNull && col("nc").isNotNull, col("nt"))
        .otherwise(lit(0))).cast(d38).as("n_t_sup"),
      expr("aggregate(sort_array(collect_list(case when nt is not null and nc is not null " +
        "then struct(bin, cast(nt as double) * cast(sc as double) / cast(nc as double)) end)), " +
        "cast(0 as double), (a, x) -> a + x.col2)").as("wsum"))
      .select(col("n_t").cast("long").as("n_treated"),
        col("n_c").cast("long").as("n_control"),
        Num.pround((col("sx_t").cast("double") / col("n_t").cast("double") -
          col("sx_c").cast("double") / col("n_c").cast("double")) /
          sqrt(((col("sxx_t") * col("n_t") - col("sx_t") * col("sx_t")).cast("double") /
            (col("n_t") * col("n_t")).cast("double") +
            (col("sxx_c") * col("n_c") - col("sx_c") * col("sx_c")).cast("double") /
              (col("n_c") * col("n_c")).cast("double")) / 2.0), 6).as("smd_activity"),
        Num.pround(col("s_t").cast("double") / col("n_t").cast("double") / 100.0, 2)
          .as("spend_treated"),
        Num.pround(col("s_c").cast("double") / col("n_c").cast("double") / 100.0, 2)
          .as("spend_control_raw"),
        Num.pround(col("wsum") / col("n_t_sup").cast("double") / 100.0, 2)
          .as("spend_control_matched"),
        Num.pround(col("n_t_sup").cast("double") * 100 / col("n_t").cast("double"), 4)
          .as("pct_treated_on_support"))
  }

  val q269Sql: String =
    """WITH pu AS (
      |  SELECT user_id, COUNT(*) AS n_ev,
      |    CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') >
      |      COUNT(*) FILTER (WHERE event_type = 'view') AS INT) AS t,
      |    SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS spend,
      |    CAST(LEAST(COUNT(*) // 5, 20) AS INT) AS bin
      |  FROM events GROUP BY 1),
      |bb AS (
      |  SELECT t, bin, CAST(COUNT(*) AS HUGEINT) AS n, SUM(spend) AS s,
      |    SUM(CAST(n_ev AS HUGEINT)) AS sx, SUM(CAST(n_ev AS HUGEINT) * n_ev) AS sxx
      |  FROM pu GROUP BY 1, 2),
      |j AS (
      |  SELECT COALESCE(tb.bin, cb.bin) AS bin, tb.n AS nt, tb.s AS st,
      |    tb.sx AS sxt, tb.sxx AS sxxt,
      |    cb.n AS nc, cb.s AS sc, cb.sx AS sxc, cb.sxx AS sxxc
      |  FROM (SELECT * FROM bb WHERE t = 1) tb
      |  FULL OUTER JOIN (SELECT * FROM bb WHERE t = 0) cb ON tb.bin = cb.bin),
      |a AS (
      |  SELECT SUM(COALESCE(nt, 0)) AS n_t, SUM(COALESCE(nc, 0)) AS n_c,
      |    SUM(COALESCE(st, 0)) AS s_t, SUM(COALESCE(sc, 0)) AS s_c,
      |    SUM(COALESCE(sxt, 0)) AS sx_t, SUM(COALESCE(sxc, 0)) AS sx_c,
      |    SUM(COALESCE(sxxt, 0)) AS sxx_t, SUM(COALESCE(sxxc, 0)) AS sxx_c,
      |    SUM(CASE WHEN nt IS NOT NULL AND nc IS NOT NULL THEN nt ELSE 0 END)
      |      AS n_t_sup,
      |    list_reduce(list(CAST(nt AS DOUBLE) * CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE)
      |      ORDER BY bin) FILTER (WHERE nt IS NOT NULL AND nc IS NOT NULL),
      |      (x, y) -> x + y) AS wsum
      |  FROM j)
      |SELECT CAST(n_t AS BIGINT) AS n_treated, CAST(n_c AS BIGINT) AS n_control,
      |  FLOOR(((CAST(sx_t AS DOUBLE) / CAST(n_t AS DOUBLE)
      |      - CAST(sx_c AS DOUBLE) / CAST(n_c AS DOUBLE)) /
      |    sqrt((CAST(sxx_t * n_t - sx_t * sx_t AS DOUBLE) / CAST(n_t * n_t AS DOUBLE)
      |      + CAST(sxx_c * n_c - sx_c * sx_c AS DOUBLE) / CAST(n_c * n_c AS DOUBLE))
      |      / 2.0)) * 1e6 + 0.5) / 1e6 AS smd_activity,
      |  FLOOR((CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE) / 100.0) * 1e2 + 0.5) / 1e2 AS spend_treated,
      |  FLOOR((CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE) / 100.0) * 1e2 + 0.5) / 1e2
      |    AS spend_control_raw,
      |  FLOOR((wsum / CAST(n_t_sup AS DOUBLE) / 100.0) * 1e2 + 0.5) / 1e2 AS spend_control_matched,
      |  FLOOR((CAST(n_t_sup AS DOUBLE) * 100 / CAST(n_t AS DOUBLE)) * 1e4 + 0.5) / 1e4
      |    AS pct_treated_on_support
      |FROM a""".stripMargin

  // --------------------------------------------------------------------------
  // q271 — CUMULATIVE GAINS / LIFT CHART by score decile: "if we contact
  // the top-k% by model score, what share of all converters do we
  // reach?" — the targeting readout marketing ships next to q193's AUC
  // and q265's operating point. Scores (q224's construction) collapse to
  // 10 population deciles via the exact two-pass bucketed rank (q169's
  // shape on the 50-bin score grid: bin counts → prefix offsets →
  // in-bin rank, all partitioned); per decile: positives captured,
  // cumulative capture rate, and lift = capture_rate / population_rate —
  // every number an integer rational with one division at output.
  def q271GainsChart(spark: SparkSession, dir: String): DataFrame = {
    val u = (conv(substring(md5(concat(lit("cal:"), col("event_id").cast("string"))), 1, 13),
      16, 10).cast("long").cast("double") + 0.5) / lit(4503599627370496.0)
    val scored = Tables.events(spark, dir)
      .select(col("event_id"),
        (col("event_type") === "purchase").as("pos"),
        (u * 0.8 + when(col("event_type") === "purchase", 0.2).otherwise(0.0)).as("p"))
      .withColumn("bin", floor(col("p") * 50).cast("int"))
      .withColumn("pq", floor(col("p") * 1e12).cast("long"))
    val offsets = scored.groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
      .withColumn("offset", coalesce(sum(col("cnt")).over(
        Window.orderBy(col("bin").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bin"), col("offset"))
    val tot = scored.agg(count(lit(1)).as("n_all"),
      count_if(col("pos")).as("pos_all"))
    // global DESCENDING rank (best scores first) via bucket offsets +
    // in-bucket rank; decile = (rank−1)·10 div n
    scored.join(broadcast(offsets), Seq("bin"))
      .withColumn("rk", col("offset") + row_number().over(
        Window.partitionBy(col("bin"))
          .orderBy(col("pq").desc, col("event_id"))))
      .crossJoin(broadcast(tot))
      .withColumn("decile", expr("((rk - 1) * 10 div n_all) + 1").cast("int"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), count_if(col("pos")).as("n_pos"),
        first(col("n_all")).as("n_all"), first(col("pos_all")).as("pos_all"))
      .withColumn("cum_pos", sum(col("n_pos")).over(
        Window.orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cum_n", sum(col("n")).over(
        Window.orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("decile"), col("n"), col("n_pos"),
        Num.pround(col("cum_pos").cast("double") / col("pos_all"), 6).as("gain"),
        Num.pround((col("cum_pos") * col("n_all")).cast("double") /
          (col("cum_n") * col("pos_all")).cast("double"), 6).as("lift"))
      .orderBy(col("decile"))
  }

  val q271Sql: String =
    """WITH sc AS (
      |  SELECT event_id, event_type = 'purchase' AS pos,
      |    (('0x' || substr(md5('cal:' || event_id::VARCHAR), 1, 13))::BIGINT + 0.5)
      |      / 4503599627370496.0 * 0.8
      |      + CASE WHEN event_type = 'purchase' THEN 0.2 ELSE 0.0 END AS p
      |  FROM events),
      |q AS (
      |  SELECT pos,
      |    ROW_NUMBER() OVER (ORDER BY CAST(FLOOR(p * 1e12) AS BIGINT) DESC, event_id)
      |      AS rk,
      |    COUNT(*) OVER () AS n_all,
      |    CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) OVER () AS BIGINT) AS pos_all
      |  FROM sc),
      |d AS (
      |  SELECT CAST(((rk - 1) * 10) // n_all + 1 AS INT) AS decile, pos,
      |    n_all, pos_all
      |  FROM q),
      |g AS (
      |  SELECT decile, COUNT(*) AS n,
      |    CAST(COUNT(*) FILTER (WHERE pos) AS BIGINT) AS n_pos,
      |    ANY_VALUE(n_all) AS n_all, ANY_VALUE(pos_all) AS pos_all
      |  FROM d GROUP BY 1)
      |SELECT decile, n, n_pos,
      |  FLOOR((CAST(SUM(n_pos) OVER w AS DOUBLE) / pos_all) * 1e6 + 0.5) / 1e6 AS gain,
      |  FLOOR((CAST(SUM(n_pos) OVER w * n_all AS DOUBLE)
      |    / CAST(SUM(n) OVER w * pos_all AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS lift
      |FROM g
      |WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING)
      |ORDER BY decile""".stripMargin

  // --------------------------------------------------------------------------
  // q261 — MANN-WHITNEY U TEST on a bounded value grid: the rank-sum
  // two-sample test (does returned-lineitem quantity stochastically
  // dominate non-returned?) computed EXACTLY without any global rank
  // window: on a discrete domain, U = Σ_{a<b} n1(a)·n2(b) + ½Σ n1(v)·n2(v)
  // falls out of cumulative counts over the 50-value grid — integers to
  // the end. The tie-corrected normal approximation (the only floats:
  // one sqrt, one division) gives the z statistic.
  def q261MannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val grid = Tables.lineitem(spark, dir)
      .select(col("l_quantity").cast("int").as("q"),
        (col("l_returnflag") === "R").cast("int").as("g1"))
      .groupBy(col("q"))
      .agg(count_if(col("g1") === 1).cast(d38).as("n1"),
        count_if(col("g1") === 0).cast(d38).as("n2"))
    val wPrev = Window.orderBy(col("q"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val parts = grid
      .withColumn("c2prev", coalesce(sum(col("n2")).over(wPrev), lit(0)).cast(d38))
      .agg(sum(col("n1") * col("c2prev")).cast(d38).as("u_lt"),
        sum(col("n1") * col("n2")).cast(d38).as("u_tie"),
        sum(col("n1")).cast(d38).as("t1"), sum(col("n2")).cast(d38).as("t2"),
        sum((col("n1") + col("n2")) * (col("n1") + col("n2")) * (col("n1") + col("n2")))
          .cast(d38).as("st3"),
        sum(col("n1") + col("n2")).cast(d38).as("nn"))
    parts.select(
      (col("u_lt") * 2 + col("u_tie")).cast(d38).as("u2"), // 2·U (keeps ties integral)
      col("t1").cast("long").as("n_group1"), col("t2").cast("long").as("n_group2"),
      col("st3"), col("nn"))
      .withColumn("mu2", (col("n_group1") * col("n_group2")).cast(d38)) // 2·E[U] = n1·n2
      .withColumn("var_num", // Var[U]·12·(n(n−1)) exact: n1·n2·((n³−n) − Σ(t³−t))
        (col("n_group1") * col("n_group2") *
          ((col("nn") * col("nn") * col("nn") - col("nn")) -
            (col("st3") - col("nn")))).cast(d38))
      .select(col("n_group1"), col("n_group2"),
        (col("u2").cast("double") / 2).as("u"),
        Num.pround((col("u2") - col("mu2")).cast("double") /
          (lit(2.0) * sqrt(col("var_num").cast("double") /
            (lit(12.0) * (col("nn") * (col("nn") - 1)).cast("double")))), 6).as("z"))
      .withColumn("u", Num.pround(col("u"), 1))
      .select(col("n_group1"), col("n_group2"), col("u"), col("z"))
  }

  val q261Sql: String =
    """WITH g AS (
      |  SELECT CAST(l_quantity AS INT) AS q,
      |    CAST(COUNT(*) FILTER (l_returnflag = 'R') AS HUGEINT) AS n1,
      |    CAST(COUNT(*) FILTER (l_returnflag <> 'R') AS HUGEINT) AS n2
      |  FROM lineitem GROUP BY 1),
      |c AS (
      |  SELECT q, n1, n2,
      |    COALESCE(SUM(n2) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND 1 PRECEDING), 0) AS c2prev
      |  FROM g),
      |p AS (
      |  SELECT SUM(n1 * c2prev) AS u_lt, SUM(n1 * n2) AS u_tie,
      |    SUM(n1) AS t1, SUM(n2) AS t2,
      |    SUM((n1 + n2) * (n1 + n2) * (n1 + n2)) AS st3,
      |    SUM(n1 + n2) AS nn
      |  FROM c)
      |SELECT CAST(t1 AS BIGINT) AS n_group1, CAST(t2 AS BIGINT) AS n_group2,
      |  FLOOR((CAST(u_lt * 2 + u_tie AS DOUBLE) / 2) * 1e1 + 0.5) / 1e1 AS u,
      |  FLOOR((CAST((u_lt * 2 + u_tie) - t1 * t2 AS DOUBLE) /
      |    (2.0 * sqrt(CAST(t1 * t2 * ((nn * nn * nn - nn) - (st3 - nn)) AS DOUBLE) /
      |      (12.0 * CAST(nn * (nn - 1) AS DOUBLE))))) * 1e6 + 0.5) / 1e6 AS z
      |FROM p""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q239_poisson_bootstrap", q239PoissonBootstrap _, Some(q239Sql)),
    ("q241_isotonic_calibration", q241IsotonicCalibration _, Some(q241Sql)),
    ("q260_best_split", q260BestSplit _, Some(q260Sql)),
    ("q261_mann_whitney", q261MannWhitney _, Some(q261Sql)),
    ("q265_pr_curve", q265PrCurve _, Some(q265Sql)),
    ("q267_cuped", q267Cuped _, Some(q267Sql)),
    ("q269_matched_balance", q269MatchedBalance _, Some(q269Sql)),
    ("q271_gains_chart", q271GainsChart _, Some(q271Sql)),
    ("q124_observe_quality", q124ObserveQuality _, Some(q124Sql)),
    ("q224_calibration", q224Calibration _, Some(q224Sql)),
    ("q232_conformal", q232Conformal _, Some(q232Sql)),
    ("q193_exact_auc", q193ExactAuc _, Some(q193Sql)))
}
