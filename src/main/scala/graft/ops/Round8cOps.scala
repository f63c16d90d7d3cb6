package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 third operator batch: a one-pass multi-column data profiler,
  * binary-segmentation changepoint detection on the exact-integer
  * objective, and a storage-encoding advisor — the profile/layout
  * tooling a warehouse runs over every new table. [EXT] north-star
  * surface; §8.4-compliant (integer cells only).
  */
object Round8cOps {

  /** orders columns unpivoted to (col_name, v) with every value in a
    * PORTABLE canonical string form (ints and strings only — doubles ride
    * as exact cents, so no engine-specific float formatting is hashed).
    */
  private def unpivoted(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(explode(array(
      struct(lit("o_orderstatus").as("col_name"),
        col("o_orderstatus").cast("string").as("v")),
      struct(lit("o_orderpriority").as("col_name"),
        col("o_orderpriority").cast("string").as("v")),
      struct(lit("o_custkey").as("col_name"),
        col("o_custkey").cast("string").as("v")),
      struct(lit("o_totalprice_cents").as("col_name"),
        expr("cast(cast(floor(o_totalprice * 100 + 0.5d) as bigint) as string)").as("v"))))
      .as("c")).select(col("c.col_name").as("col_name"), col("c.v").as("v"))

  private val unpivotSql: String =
    """SELECT col_name, v FROM (
      |    SELECT 'o_orderstatus' AS col_name, o_orderstatus::VARCHAR AS v FROM orders
      |    UNION ALL
      |    SELECT 'o_orderpriority', o_orderpriority::VARCHAR FROM orders
      |    UNION ALL
      |    SELECT 'o_custkey', o_custkey::VARCHAR FROM orders
      |    UNION ALL
      |    SELECT 'o_totalprice_cents',
      |      CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR)
      |    FROM orders)""".stripMargin

  // --------------------------------------------------------------------------
  // q291 — ONE-PASS DATA PROFILER: per-column row count, null count,
  // exact distinct count, lexicographic min/max of the canonical string
  // form, and total character mass — the Deequ-style profile a warehouse
  // materializes for every landed table before anything else touches it.
  //
  // Scale: the unpivot is a row-local explode (4 rows per input row); the
  // profile is one hash aggregate per (column, value) then per column —
  // two shuffles on bounded-width keys, corpus-linear. At 100 TB swap the
  // exact distinct for q24's HLL and the plan shape is unchanged.
  //
  // Determinism: counts and lengths are exact integers; min/max are
  // ASCII-lexicographic on canonical integer/categorical strings —
  // identical collation both engines.
  def q291DataProfile(spark: SparkSession, dir: String): DataFrame =
    unpivoted(spark, dir)
      .groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_rows"),
        count_if(col("v").isNull).as("n_null"),
        countDistinct(col("v")).as("n_distinct"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"),
        sum(length(col("v"))).cast("long").as("total_chars"))
      .orderBy(col("col_name"))

  val q291Sql: String =
    s"""WITH u AS ($unpivotSql)
       |SELECT col_name, COUNT(*) AS n_rows,
       |  CAST(COUNT(*) FILTER (v IS NULL) AS BIGINT) AS n_null,
       |  CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
       |  MIN(v) AS min_v, MAX(v) AS max_v,
       |  CAST(SUM(length(v)) AS BIGINT) AS total_chars
       |FROM u GROUP BY col_name ORDER BY col_name""".stripMargin

  // --------------------------------------------------------------------------
  // q292 — CHANGEPOINT DETECTION via BINARY SEGMENTATION: find the two
  // best mean-shift changepoints in the daily-revenue series by
  // maximizing Σ S_j²/W_j over segments (equivalent to minimizing SSE —
  // q167's CUSUM flags drift against a fixed mean; this finds the
  // OPTIMAL split days). Step 1 picks the best single split; step 2 adds
  // the best second split given the first — textbook binseg.
  //
  // Scale: the corpus collapses to the bounded calendar-day grid (≤ 730
  // rows) in one aggregate; all candidate scans are grid×grid joins —
  // corpus-size-independent planning, exactly q266's DP discipline.
  //
  // Determinism (§8.4): revenue quantizes to exact hundred-kilodollar
  // units (floor(cents/1e7) — S ≈ 2e5 at sf0.1, so the fixed-point
  // objective (10⁴·S²) div W stays ≤ ~5e14, 4 orders of magnitude under
  // 2⁶³ even at the 10× probe); argmax ties break on the smaller split
  // index.
  def q292ChangepointBinseg(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(expr("cast(floor(sum(cast(o_totalprice as decimal(18,2))) * 100 / 1e7) as long)")
        .as("x"))
    val grid = daily.withColumn("i", row_number().over(Window.orderBy(col("d"))))
    val wCum = Window.orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = grid.withColumn("cs", sum(col("x")).over(wCum))
      .select(col("i"), col("d"), col("cs"))
    val tot = pre.agg(max(col("i")).as("n"), max(col("cs")).as("stot"))
    // v(seg) = (1e4·S²) div W ; candidates carry their prefix sums
    val cand = pre.crossJoin(broadcast(tot)).filter(col("i") < col("n"))
      .withColumn("v1", expr("(10000L * cs * cs) div i"))
      .withColumn("v2", expr("(10000L * (stot - cs) * (stot - cs)) div (n - i)"))
      .withColumn("gain", col("v1") + col("v2"))
    val cp1 = cand
      .agg(max(struct(col("gain"), (-col("i")).as("ni"))).as("m"))
      .select((-col("m.ni")).as("s1"), col("m.gain").as("obj1"))
    // step 2: for each s2 != s1 the three segments are cut at
    // lo = min(s1, s2), hi = max(s1, s2)
    val cuts = pre.select(col("i").as("ci"), col("cs").as("ccs"))
    val cand2 = pre.crossJoin(broadcast(tot)).crossJoin(broadcast(cp1))
      .filter(col("i") < col("n") && col("i") =!= col("s1"))
      .withColumn("lo", least(col("i"), col("s1")))
      .withColumn("hi", greatest(col("i"), col("s1")))
      .join(cuts.withColumnRenamed("ci", "lo").withColumnRenamed("ccs", "cs_lo"), Seq("lo"))
      .join(cuts.withColumnRenamed("ci", "hi").withColumnRenamed("ccs", "cs_hi"), Seq("hi"))
      .withColumn("v1", expr("(10000L * cs_lo * cs_lo) div lo"))
      .withColumn("v2", expr("(10000L * (cs_hi - cs_lo) * (cs_hi - cs_lo)) div (hi - lo)"))
      .withColumn("v3", expr("(10000L * (stot - cs_hi) * (stot - cs_hi)) div (n - hi)"))
      .withColumn("obj", col("v1") + col("v2") + col("v3"))
    val cp2 = cand2
      .agg(max(struct(col("obj"), (-col("i")).as("ni"))).as("m"))
      .select((-col("m.ni")).as("s2"), col("m.obj").as("obj2"))
    val steps = cp1.crossJoin(cp2)
      .select(explode(array(
        struct(lit(1).as("step"), col("s1").as("split_i"), col("obj1").as("objective_e4")),
        struct(lit(2).as("step"), col("s2").as("split_i"), col("obj2").as("objective_e4"))))
        .as("r"))
      .select(col("r.step").as("step"), col("r.split_i").as("split_i"),
        col("r.objective_e4").as("objective_e4"))
    steps.join(pre.select(col("i").as("split_i"), col("d").as("split_day")), Seq("split_i"))
      .select(col("step"), col("split_day"), col("objective_e4"))
      .orderBy(col("step"))
  }

  val q292Sql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 / 1e7) AS BIGINT)
      |      AS x
      |  FROM orders GROUP BY 1),
      |grid AS (SELECT d, x, ROW_NUMBER() OVER (ORDER BY d) AS i FROM daily),
      |pre AS (
      |  SELECT i, d,
      |    SUM(x) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS cs
      |  FROM grid),
      |tot AS (SELECT MAX(i) AS n, MAX(cs) AS stot FROM pre),
      |cand AS (
      |  SELECT i,
      |    (10000 * cs * cs) // i + (10000 * (stot - cs) * (stot - cs)) // (n - i)
      |      AS gain
      |  FROM pre CROSS JOIN tot WHERE i < n),
      |cp1 AS (
      |  SELECT i AS s1, gain AS obj1 FROM cand
      |  ORDER BY gain DESC, i LIMIT 1),
      |cand2 AS (
      |  SELECT p.i,
      |    (10000 * plo.cs * plo.cs) // LEAST(p.i, s1)
      |    + (10000 * (phi.cs - plo.cs) * (phi.cs - plo.cs))
      |      // (GREATEST(p.i, s1) - LEAST(p.i, s1))
      |    + (10000 * (stot - phi.cs) * (stot - phi.cs)) // (n - GREATEST(p.i, s1))
      |      AS obj
      |  FROM pre p CROSS JOIN tot CROSS JOIN cp1
      |  JOIN pre plo ON plo.i = LEAST(p.i, s1)
      |  JOIN pre phi ON phi.i = GREATEST(p.i, s1)
      |  WHERE p.i < n AND p.i != s1),
      |cp2 AS (
      |  SELECT i AS s2, obj AS obj2 FROM cand2
      |  ORDER BY obj DESC, i LIMIT 1),
      |steps AS (
      |  SELECT 1 AS step, s1 AS split_i, CAST(obj1 AS BIGINT) AS objective_e4
      |  FROM cp1
      |  UNION ALL
      |  SELECT 2, s2, CAST(obj2 AS BIGINT) FROM cp2)
      |SELECT step, pre.d AS split_day, objective_e4
      |FROM steps JOIN pre ON pre.i = steps.split_i
      |ORDER BY step""".stripMargin

  // --------------------------------------------------------------------------
  // q293 — STORAGE ENCODING ADVISOR: per column, estimate the byte cost
  // of PLAIN vs DICTIONARY encoding from one stats pass — plain =
  // total character mass; dict = distinct-value character mass +
  // n·ceil(log2(distinct))/8 index bytes — and recommend the cheaper
  // one. The decision a columnar writer (parquet's dictionary fallback)
  // makes per page, surfaced as a layout-planning readout (q195/q196's
  // zone-map family, applied to encoding choice).
  //
  // Determinism: bit width = length(bin(distinct − 1)) — exact integer
  // arithmetic end to end, no log2 libm call.
  def q293EncodingAdvisor(spark: SparkSession, dir: String): DataFrame = {
    val perValue = unpivoted(spark, dir)
      .groupBy(col("col_name"), col("v"))
      .agg(count(lit(1)).as("cnt"))
    perValue
      .groupBy(col("col_name"))
      .agg(sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_distinct"),
        sum(length(col("v")) * col("cnt")).cast("long").as("plain_bytes"),
        sum(length(col("v"))).cast("long").as("dict_value_bytes"))
      .withColumn("bits", when(col("n_distinct") <= 1, lit(1))
        .otherwise(length(expr("bin(n_distinct - 1)"))))
      .withColumn("dict_bytes",
        col("dict_value_bytes") + expr("(n_rows * bits + 7) div 8"))
      .select(col("col_name"), col("n_rows"), col("n_distinct"),
        col("plain_bytes"), col("dict_bytes").cast("long").as("dict_bytes"),
        when(col("dict_bytes") < col("plain_bytes"), lit("DICT"))
          .otherwise(lit("PLAIN")).as("encoding"))
      .orderBy(col("col_name"))
  }

  val q293Sql: String =
    s"""WITH u AS ($unpivotSql),
       |pv AS (SELECT col_name, v, COUNT(*) AS cnt FROM u GROUP BY 1, 2),
       |st AS (
       |  SELECT col_name, SUM(cnt) AS n_rows, COUNT(*) AS n_distinct,
       |    SUM(length(v) * cnt) AS plain_bytes,
       |    SUM(length(v)) AS dict_value_bytes
       |  FROM pv GROUP BY 1),
       |b AS (
       |  SELECT *, CASE WHEN n_distinct <= 1 THEN 1
       |    ELSE length(bin(CAST(n_distinct - 1 AS BIGINT))) END AS bits
       |  FROM st)
       |SELECT col_name, CAST(n_rows AS BIGINT) AS n_rows,
       |  CAST(n_distinct AS BIGINT) AS n_distinct,
       |  CAST(plain_bytes AS BIGINT) AS plain_bytes,
       |  CAST(dict_value_bytes + (n_rows * bits + 7) // 8 AS BIGINT) AS dict_bytes,
       |  CASE WHEN dict_value_bytes + (n_rows * bits + 7) // 8 < plain_bytes
       |    THEN 'DICT' ELSE 'PLAIN' END AS encoding
       |FROM b ORDER BY col_name""".stripMargin

  // --------------------------------------------------------------------------
  // q294 — RATE-LIMIT AUDIT: per user, count events that exceed a
  // 2-events-per-trailing-24h quota (RANGE frame on event time) — the
  // throttling/abuse readout an API gateway logs, and the windowed-rate
  // primitive q246's bot score approximates with fixed buckets. Emits
  // per-user violation counts and the worst trailing-window burst. (The
  // quota matches the synthetic feed's density — the operator is the
  // RANGE-frame shape, the constant is config.)
  //
  // Scale: ONE range-frame window partitioned by user_id (a single
  // shuffle); the frame is time-bounded so state per row is the 60-second
  // slice, independent of history length. All cells exact integers.
  def q294RateLimitAudit(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-86400000000L, 0L)
    Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"))
      .withColumn("in_window", count(lit(1)).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        count_if(col("in_window") > 2).as("n_violations"),
        max(col("in_window")).as("worst_burst"))
      .filter(col("n_violations") > 0)
      .orderBy(col("user_id"))
  }

  val q294Sql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us FROM events),
      |m AS (
      |  SELECT user_id,
      |    COUNT(*) OVER (PARTITION BY user_id ORDER BY us
      |      RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) AS in_window
      |  FROM e)
      |SELECT user_id, COUNT(*) AS n_events,
      |  CAST(COUNT(*) FILTER (in_window > 2) AS BIGINT) AS n_violations,
      |  CAST(MAX(in_window) AS BIGINT) AS worst_burst
      |FROM m GROUP BY user_id HAVING COUNT(*) FILTER (in_window > 2) > 0
      |ORDER BY user_id""".stripMargin

  // --------------------------------------------------------------------------
  // q295 — ONE-WAY ANOVA F-TEST across order priorities: does mean order
  // value differ by priority class? F = (SSB/(k−1)) / (SSW/(N−k)) from
  // exact sufficient statistics — completes the q118 (KS) / q261
  // (Mann-Whitney) / q175 (moments) hypothesis-testing family with the
  // k-group parametric test.
  //
  // Determinism (§8.4): per-group Σx rides as exact cent LONGs and Σx²
  // as exact DECIMAL(38,0) cents² (money-grid inputs); each group's
  // s²/n term is ONE double expression, summed in PINNED group order
  // via the q273 sorted-fold rule; F ships floor-quantized at 1e-6.
  //
  // Scale: one hash aggregate to k rows, one broadcast total — nothing
  // else touches the corpus.
  def q295Anova(spark: SparkSession, dir: String): DataFrame = {
    val dec0 = org.apache.spark.sql.types.DecimalType(38, 0)
    val g = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("grp"),
        expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").as("c"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
        sum((col("c").cast(dec0) * col("c"))).as("qc"))
      .withColumn("term", (col("sc").cast("double") * col("sc").cast("double"))
        / col("n"))
    val tot = g.agg(sum(col("n")).as("nn"), sum(col("sc")).as("ssc"),
      sum(col("qc")).cast(dec0).as("qqc"), count(lit(1)).as("k"),
      expr("aggregate(sort_array(collect_list(struct(grp, term))), " +
        "cast(0 as double), (a, x) -> a + x.term)").as("sb"))
    tot
      .withColumn("ssb", col("sb")
        - col("ssc").cast("double") * col("ssc").cast("double") / col("nn"))
      .withColumn("ssw", col("qqc").cast("double") - col("sb"))
      .withColumn("f_e6", floor(
        (col("ssb") / (col("k") - 1)) / (col("ssw") / (col("nn") - col("k")))
          * 1e6 + 0.5))
      .select(col("k").cast("int").as("k_groups"), col("nn").as("n_rows"),
        col("f_e6").cast("long").as("f_e6"))
  }

  val q295Sql: String =
    """WITH g AS (
      |  SELECT o_orderpriority AS grp, COUNT(*) AS n,
      |    SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS sc,
      |    SUM(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS DECIMAL(38,0))
      |      * CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS qc
      |  FROM orders GROUP BY 1),
      |t AS (
      |  SELECT grp, n, sc, qc,
      |    CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / n AS term
      |  FROM g),
      |tot AS (
      |  SELECT SUM(n) AS nn, SUM(sc) AS ssc,
      |    CAST(SUM(qc) AS DECIMAL(38,0)) AS qqc, COUNT(*) AS k,
      |    list_reduce(list(term ORDER BY grp), (a, b) -> a + b) AS sb
      |  FROM t)
      |SELECT CAST(k AS INT) AS k_groups, CAST(nn AS BIGINT) AS n_rows,
      |  CAST(FLOOR(((sb - CAST(ssc AS DOUBLE) * CAST(ssc AS DOUBLE) / nn) / (k - 1))
      |    / ((CAST(qqc AS DOUBLE) - sb) / (nn - k))
      |    * 1e6 + 0.5) AS BIGINT) AS f_e6
      |FROM tot""".stripMargin

  // --------------------------------------------------------------------------
  // q296 — AS-OF DIMENSION ENRICHMENT: join each purchase event to the
  // SCD2 version (q281's history) that was CURRENT at event time —
  // effective_from ≤ ts < effective_to — the "fact joined to the
  // dimension as it looked then" semantics every warehouse needs the
  // moment a dimension changes (joining today's attributes to last
  // year's facts misattributes everything). Reports events per (user,
  // version) with the version's exact cents value.
  //
  // Scale: equi-join on user_id with the validity range as a residual
  // predicate — one co-partitioned shuffle; at most one version matches
  // per event by construction (validity ranges partition time).
  def q296AsofEnrich(spark: SparkSession, dir: String): DataFrame = {
    val hist = q281ScdHistoryFor(spark, dir)
    val facts = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_micros(ts)").as("us"))
    facts.join(hist, Seq("user_id"))
      .filter(col("us") >= col("eff_from_us") &&
        (col("eff_to_us").isNull || col("us") < col("eff_to_us")))
      .groupBy(col("user_id"), col("version"), col("cents"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("user_id"), col("version"))
  }

  /** q281's SCD2 history, rebuilt here for the enrichment join. */
  private def q281ScdHistoryFor(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("cast(floor(value * 100 + 0.5d) as bigint)").as("cents"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val changes = ev
      .withColumn("prev", lag(col("cents"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("cents"))
    changes
      .withColumn("version", row_number().over(w))
      .withColumn("eff_from_us", expr("unix_micros(ts)"))
      .withColumn("eff_to_us", lead(expr("unix_micros(ts)"), 1).over(w))
      .select(col("user_id"), col("version"), col("cents"),
        col("eff_from_us"), col("eff_to_us"))
  }

  val q296Sql: String =
    """WITH e AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events),
      |c AS (
      |  SELECT *, LAG(cents) OVER w AS prev FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |f AS (SELECT user_id, ts, event_id, cents FROM c
      |      WHERE prev IS NULL OR prev != cents),
      |v AS (
      |  SELECT user_id, cents,
      |    CAST(ROW_NUMBER() OVER w AS INT) AS version,
      |    epoch_us(ts) AS eff_from_us,
      |    LEAD(epoch_us(ts)) OVER w AS eff_to_us
      |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |fact AS (
      |  SELECT user_id, epoch_us(ts) AS us FROM events
      |  WHERE event_type = 'purchase')
      |SELECT fact.user_id, version, cents, COUNT(*) AS n_events
      |FROM fact JOIN v ON v.user_id = fact.user_id
      |  AND us >= eff_from_us AND (eff_to_us IS NULL OR us < eff_to_us)
      |GROUP BY 1, 2, 3 ORDER BY fact.user_id, version""".stripMargin

  // --------------------------------------------------------------------------
  // q297 — HIERARCHICAL SHARE-OF-PARENT: revenue by nation with each
  // nation's exact ppm share of its region and each region's share of
  // the total — the drill-down readout every BI rollup renders next to
  // the raw numbers (q14's ROLLUP gives the totals; this gives the
  // RATIOS, integer-exact).
  //
  // Scale: fact aggregate to |nations| rows, two broadcast dimension
  // joins, shares on the bounded grid. Determinism: revenue rides as
  // exact cents; shares are BIGINT ppm floor-divisions.
  def q297ShareOfParent(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(expr("cast(sum(cast(o_totalprice as decimal(18,2))) * 100 as bigint)")
        .as("cents"))
    val dim = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .join(Tables.region(spark, dir)
        .select(col("r_regionkey"), col("r_name")),
        col("n_regionkey") === col("r_regionkey"))
    val wReg = Window.partitionBy(col("r_name"))
    val total = rev.agg(sum(col("cents")).as("total_cents"))
    rev.join(broadcast(dim), col("nationkey") === col("n_nationkey"))
      .withColumn("region_cents", sum(col("cents")).over(wReg))
      .crossJoin(broadcast(total))
      .select(col("r_name").as("region"), col("n_name").as("nation"),
        col("cents"),
        expr("(1000000L * cents) div region_cents").as("share_of_region_ppm"),
        expr("(1000000L * region_cents) div total_cents").as("region_share_ppm"))
      .orderBy(col("region"), col("nation"))
  }

  val q297Sql: String =
    """WITH rev AS (
      |  SELECT c_nationkey AS nationkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1),
      |j AS (
      |  SELECT r_name AS region, n_name AS nation, cents
      |  FROM rev
      |  JOIN nation ON n_nationkey = nationkey
      |  JOIN region ON r_regionkey = n_regionkey),
      |w AS (
      |  SELECT region, nation, cents,
      |    SUM(cents) OVER (PARTITION BY region) AS region_cents,
      |    SUM(cents) OVER () AS total_cents
      |  FROM j)
      |SELECT region, nation, cents,
      |  CAST((1000000 * cents) // region_cents AS BIGINT) AS share_of_region_ppm,
      |  CAST((1000000 * region_cents) // total_cents AS BIGINT) AS region_share_ppm
      |FROM w ORDER BY region, nation""".stripMargin

  // --------------------------------------------------------------------------
  // q298 — EXACT PERCENTILE BANDS PER GROUP (nearest-rank P50/P90/P99):
  // the SLA-style latency table, computed as exact order statistics —
  // q28 pins the INTERPOLATED percentile parity, q130 builds equi-depth
  // buckets; this reports the ceil(p·n)-th smallest exact value per
  // group, the definition SLO dashboards quote.
  //
  // Scale: the corpus collapses to the (group, cent-value) grid in one
  // aggregate; the cumulative scan is a window over the bounded VALUE
  // domain partitioned by group — never a corpus-sized task.
  // Determinism: everything is integer counts and exact cents; the
  // nearest-rank pick is min value with cum ≥ ceil(p·n) via exact
  // integer comparison (100·cum ≥ p·n avoids any float rank).
  def q298PercentileBands(spark: SparkSession, dir: String): DataFrame = {
    val grid = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("cast(floor(value * 100 + 0.5d) as bigint)").as("c"))
      .groupBy(col("event_type"), col("c")).agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("event_type"))))
    def pick(p: Int) = min(when(col("cum") * 100 >= col("n") * p, col("c")))
    cum.groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        pick(50).as("p50_cents"), pick(90).as("p90_cents"), pick(99).as("p99_cents"))
      .orderBy(col("event_type"))
  }

  val q298Sql: String =
    """WITH g AS (
      |  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c,
      |    COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, c, cnt,
      |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY c
      |      ROWS UNBOUNDED PRECEDING) AS cum,
      |    SUM(cnt) OVER (PARTITION BY event_type) AS n
      |  FROM g)
      |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
      |  CAST(MIN(CASE WHEN cum * 100 >= n * 50 THEN c END) AS BIGINT) AS p50_cents,
      |  CAST(MIN(CASE WHEN cum * 100 >= n * 90 THEN c END) AS BIGINT) AS p90_cents,
      |  CAST(MIN(CASE WHEN cum * 100 >= n * 99 THEN c END) AS BIGINT) AS p99_cents
      |FROM m GROUP BY event_type ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------------------
  // q299 — CURATION PIPELINE v2 (round-8 capstone, q100's modern twin):
  // canonicalize (q84's regex pair) → exact-dedup keeping the min doc_id
  // per canonical hash (q30) → DSIR importance selection against the
  // English target (q279's hashed-bigram LMs, built over the DEDUPED
  // corpus IN the same plan) → pack survivors into 512-token training
  // blocks (q285's global offsets) — reported per source: raw/dedup/kept
  // doc counts, kept and loss-masked token mass, and blocks touched. ONE
  // lazy Catalyst plan end to end; every stage reuses a proven shape.
  //
  // Scale: dedup and DSIR are hash aggregates + broadcast log-ratio
  // lookups; packing offsets ride the q169 two-pass bucketed prefix —
  // linear, no corpus-sized window.
  //
  // Determinism: hashes/counts/interval arithmetic exact; DSIR weights
  // are 1e-9-grid quantized longs (q279's rule).
  def q299CurationV2(spark: SparkSession, dir: String): DataFrame = {
    val canon = Tables.documents(spark, dir).select(
      col("doc_id"), col("source"), col("lang"),
      regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " ").as("tc"))
    val keepIds = canon.groupBy(md5(col("tc")).as("h"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val dedup = canon.join(keepIds, Seq("doc_id"))
    val toks = dedup.select(col("doc_id"), col("source"), col("lang"),
      expr("filter(split(tc, ' '), t -> t != '')").as("t"))
      .filter(size(col("t")) >= 2)
    val bigrams = toks.select(col("doc_id"), col("source"), col("lang"),
      explode(expr("zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1)," +
        " (a, b) -> concat(a, ' ', b))")).as("bg"))
      .withColumn("b",
        expr("cast(conv(substring(md5(bg), 1, 8), 16, 10) as bigint) % 1024"))
    val tgt = bigrams.filter(col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val srcC = bigrams.groupBy(col("b")).agg(count(lit(1)).as("cs"))
    val tots = bigrams.agg(
      count_if(col("lang") === "en").as("tot_t"), count(lit(1)).as("tot_s"))
    val lr = srcC.join(tgt, Seq("b"), "left")
      .na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(tots))
      .withColumn("lr_q", expr(
        "cast(floor(ln((ct + 1.0d) * (tot_s + 1024.0d) / ((cs + 1.0d) * (tot_t + 1024.0d)))" +
          " * 1e9 + 0.5d) as long)"))
      .select(col("b"), col("lr_q"))
    val kept = bigrams.join(broadcast(lr), Seq("b"))
      .groupBy(col("doc_id")).agg(sum(col("lr_q")).as("lw"))
      .filter(col("lw") > 0)
      .join(toks.select(col("doc_id"), col("source"),
        size(col("t")).cast("long").as("len")), Seq("doc_id"))
    // q285's two-pass offsets over the kept stream, then blocks touched
    val mx = kept.agg(max(col("doc_id")).as("mx"))
    val bucketed = kept.crossJoin(broadcast(mx))
      .withColumn("bucket", expr("doc_id div (mx div 256 + 1)")).drop("mx")
    val offs = bucketed.groupBy(col("bucket")).agg(sum(col("len")).as("btoks"))
      .withColumn("boff",
        coalesce(sum(col("btoks")).over(
          Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("bucket"), col("boff"))
    val wIn = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val spans = bucketed.join(broadcast(offs), Seq("bucket"))
      .withColumn("start", col("boff") + coalesce(sum(col("len")).over(wIn), lit(0L)))
    val blocksTouched = spans
      .select(col("source"),
        explode(expr("sequence(start div 512, (start + len - 1) div 512)")).as("blk"))
      .groupBy(col("source")).agg(countDistinct(col("blk")).as("n_blocks"))
    val raw = canon.groupBy(col("source")).agg(count(lit(1)).as("n_raw"))
    val dd = dedup.groupBy(col("source")).agg(count(lit(1)).as("n_dedup"))
    val ks = kept.groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("len")).as("tokens_kept"),
        sum(col("len") - expr("(len + 3) div 4")).as("loss_tokens"))
    raw.join(dd, Seq("source"), "left")
      .join(ks, Seq("source"), "left")
      .join(blocksTouched, Seq("source"), "left")
      .select(col("source"), col("n_raw"),
        coalesce(col("n_dedup"), lit(0L)).as("n_dedup"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"),
        coalesce(col("loss_tokens"), lit(0L)).as("loss_tokens"),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"))
      .orderBy(col("source"))
  }

  val q299Sql: String =
    """WITH canon AS (
      |  SELECT doc_id, source, lang,
      |    regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      |      ' +', ' ', 'g') AS tc
      |  FROM documents),
      |keep AS (SELECT MIN(doc_id) AS doc_id FROM canon GROUP BY md5(tc)),
      |dedup AS (SELECT c.* FROM canon c JOIN keep USING (doc_id)),
      |t2 AS (
      |  SELECT doc_id, source, lang,
      |    list_filter(string_split(tc, ' '), x -> x != '') AS t
      |  FROM dedup
      |  WHERE len(list_filter(string_split(tc, ' '), x -> x != '')) >= 2),
      |bg AS (
      |  SELECT doc_id, source, lang,
      |    ('0x' || substr(md5(t[i] || ' ' || t[i+1]), 1, 8))::BIGINT % 1024 AS b
      |  FROM t2, UNNEST(generate_series(1, len(t) - 1)) AS u(i)),
      |ct AS (SELECT b, COUNT(*) AS ct FROM bg WHERE lang = 'en' GROUP BY b),
      |cs AS (SELECT b, COUNT(*) AS cs FROM bg GROUP BY b),
      |tot AS (SELECT
      |  (SELECT COUNT(*) FROM bg WHERE lang = 'en') AS tot_t,
      |  (SELECT COUNT(*) FROM bg) AS tot_s),
      |lr AS (
      |  SELECT cs.b,
      |    CAST(FLOOR(ln((COALESCE(ct.ct, 0) + 1.0) * (tot_s + 1024.0)
      |      / ((cs.cs + 1.0) * (tot_t + 1024.0))) * 1e9 + 0.5) AS BIGINT) AS lr_q
      |  FROM cs LEFT JOIN ct ON ct.b = cs.b CROSS JOIN tot),
      |sc AS (
      |  SELECT doc_id, SUM(lr_q) AS lw
      |  FROM bg JOIN lr ON lr.b = bg.b GROUP BY 1),
      |kept AS (
      |  SELECT t2.doc_id, t2.source, len(t2.t)::BIGINT AS len
      |  FROM sc JOIN t2 ON t2.doc_id = sc.doc_id WHERE lw > 0),
      |sp AS (
      |  SELECT doc_id, source, len,
      |    COALESCE(SUM(len) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
      |  FROM kept),
      |blk AS (
      |  SELECT source, blk
      |  FROM (SELECT source, start, start + len AS e FROM sp),
      |    UNNEST(generate_series(CAST(start // 512 AS BIGINT),
      |      CAST((e - 1) // 512 AS BIGINT))) AS u(blk)),
      |raw AS (SELECT source, COUNT(*) AS n_raw FROM canon GROUP BY 1),
      |dd AS (SELECT source, COUNT(*) AS n_dedup FROM dedup GROUP BY 1),
      |ks AS (
      |  SELECT source, COUNT(*) AS n_kept, SUM(len) AS tokens_kept,
      |    SUM(len - (len + 3) // 4) AS loss_tokens
      |  FROM kept GROUP BY 1),
      |bl AS (SELECT source, COUNT(DISTINCT blk) AS n_blocks FROM blk GROUP BY 1)
      |SELECT raw.source, CAST(n_raw AS BIGINT) AS n_raw,
      |  CAST(COALESCE(n_dedup, 0) AS BIGINT) AS n_dedup,
      |  CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept,
      |  CAST(COALESCE(tokens_kept, 0) AS BIGINT) AS tokens_kept,
      |  CAST(COALESCE(loss_tokens, 0) AS BIGINT) AS loss_tokens,
      |  CAST(COALESCE(n_blocks, 0) AS BIGINT) AS n_blocks
      |FROM raw LEFT JOIN dd USING (source) LEFT JOIN ks USING (source)
      |LEFT JOIN bl USING (source)
      |ORDER BY raw.source""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q298_percentile_bands", q298PercentileBands _, Some(q298Sql)),
    ("q299_curation_v2", q299CurationV2 _, Some(q299Sql)),
    ("q291_data_profile", q291DataProfile _, Some(q291Sql)),
    ("q292_changepoint_binseg", q292ChangepointBinseg _, Some(q292Sql)),
    ("q293_encoding_advisor", q293EncodingAdvisor _, Some(q293Sql)),
    ("q294_rate_limit_audit", q294RateLimitAudit _, Some(q294Sql)),
    ("q295_anova", q295Anova _, Some(q295Sql)),
    ("q296_asof_enrich", q296AsofEnrich _, Some(q296Sql)),
    ("q297_share_of_parent", q297ShareOfParent _, Some(q297Sql)))
}
