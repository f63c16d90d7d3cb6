package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-correlation and robust-trend statistics — Theil-Sen, Mann-Kendall, Spearman, Kendall tau, Siegel repeated medians, cross-correlation, MASE backtests — plus the batch riders (class rebalance, interval union, Apriori triples, MRR, peak concurrency, Brier, systematic PPS, distinct-n, stationary mix).
  *
  * Consolidated from the round-8 per-batch files (Round8fOps, Round8hOps, Round8iOps, Round8nOps, Round8qOps)
  * per the round-8 verdict's maintainability task: same operators,
  * same catalog entries, same oracles, byte-identical results —
  * only the file layout changed. Section markers preserve the
  * original batch scaladocs and boundaries.
  */
object TrendStatOps {
  // ═════════════════ formerly Round8fOps ═════════════════
  /** Round-8 sixth operator batch: Theil–Sen robust slope, the
    * Mann–Kendall trend test, deterministic class rebalancing, and
    * per-user interval union (gaps-and-islands coverage) — robust-stats
    * and pipeline surface on the §8.4 exact-integer discipline. The two
    * trend operators share one calendar-grid pair join (≤ 730² pairs by
    * construction, corpus-size-independent after the daily aggregate).
    */

  /** (i, x) daily order-count grid and its i<j pair expansion —
    * calendar-bounded: the corpus collapses to ≤ 730 rows in one
    * aggregate, so the self-join is ≤ 730²/2 pairs at ANY corpus size.
    */
  private def dailyPairs(spark: SparkSession, dir: String): DataFrame = {
    // lazy checkpoint: the grid feeds BOTH self-join sides — without it
    // the orders scan + daily aggregate runs twice (q334's fix, §8.22)
    val idx = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("x"))
      .withColumn("i", row_number().over(Window.orderBy(col("d"))))
      .select(col("i"), col("x"))
      .localCheckpoint(false)
    val a = idx.select(col("i").as("ia"), col("x").as("xa"))
    val b = idx.select(col("i").as("ib"), col("x").as("xb"))
    a.join(b, col("ib") > col("ia"))
  }

  private val dailyPairsSql: String =
    """daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS x
      |  FROM orders GROUP BY 1),
      |idx AS (SELECT ROW_NUMBER() OVER (ORDER BY d) AS i, x FROM daily),
      |pairs AS (
      |  SELECT a.i AS ia, a.x AS xa, b.i AS ib, b.x AS xb
      |  FROM idx a JOIN idx b ON b.i > a.i)""".stripMargin

  // --------------------------------------------------------------------------
  // q310 — THEIL–SEN ROBUST SLOPE of the daily order-count series: the
  // median of all pairwise slopes (xj−xi)/(j−i) — the standard
  // outlier-resistant trend estimate (breakdown point 29%). The median
  // element is picked by rank k = (m+1) div 2 under the total order
  // (slope-double, dy, dx): the double division is one IEEE op from
  // exact integers — identical in both engines — and ties break on the
  // exact integer pair, so the SELECTED ELEMENT is deterministic and
  // its (dy, dx) ships exactly; only the display slope is pround'd.
  //
  // Scale: pair mass is calendar-grid-bounded (above) but NOT small —
  // the driver span is ~2400 days, so the pair set is ~2.9M rows and a
  // single-partition rank over it cost ~3.5 s of the round-8 bench. The
  // median SELECTION is therefore q169's two-pass bucketed rank: slope
  // histogram at 1/4096 granularity (slopes concentrate near 0 — most
  // pairs have large dx — so buckets stay small), exclusive prefix sum
  // over the bucket grid, pick the ONE bucket containing rank k, rank
  // only inside it. Equal slopes land in equal buckets, so the (s, dy,
  // dx) total order is preserved exactly and the selected element is
  // unchanged (the DuckDB oracle keeps the direct global rank).
  def q310TheilSen(spark: SparkSession, dir: String): DataFrame = {
    val sl = dailyPairs(spark, dir)
      .select((col("xb") - col("xa")).as("dy"), (col("ib") - col("ia")).as("dx"))
      .withColumn("s", col("dy").cast("double") / col("dx").cast("double"))
      .withColumn("bk", floor(col("s") * 4096).cast("long"))
      .localCheckpoint(false) // feeds the histogram AND the in-bucket rank
    val m = sl.agg(count(lit(1)).as("m"))
    val off = sl.groupBy(col("bk")).agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(
        Window.orderBy(col("bk")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val pick = off.crossJoin(broadcast(m))
      .filter(col("off") < expr("(m + 1L) div 2L") &&
        expr("(m + 1L) div 2L") <= col("off") + col("cnt"))
      .select(col("bk"), col("off"), col("m"))
    sl.join(broadcast(pick), Seq("bk"))
      .withColumn("rk", col("off") + row_number().over(
        Window.orderBy(col("s"), col("dy"), col("dx"))))
      .filter(col("rk") === expr("(m + 1L) div 2L"))
      .select(col("m"), col("dy").as("med_dy"),
        col("dx").cast("long").as("med_dx"),
        Num.pround(col("s"), 6).as("slope6"))
  }

  val q310Sql: String =
    s"""WITH $dailyPairsSql,
       |sl AS (
       |  SELECT xb - xa AS dy, ib - ia AS dx,
       |    CAST(xb - xa AS DOUBLE) / CAST(ib - ia AS DOUBLE) AS s
       |  FROM pairs),
       |m AS (SELECT COUNT(*) AS m FROM sl),
       |rk AS (
       |  SELECT dy, dx, s, ROW_NUMBER() OVER (ORDER BY s, dy, dx) AS rk
       |  FROM sl)
       |SELECT m.m, dy AS med_dy, dx AS med_dx,
       |  FLOOR((s) * 1e6 + 0.5) / 1e6 AS slope6
       |FROM rk CROSS JOIN m WHERE rk = (m.m + 1) // 2""".stripMargin

  // --------------------------------------------------------------------------
  // q311 — MANN–KENDALL TREND TEST on the same series: S = Σ sign(xj−xi)
  // over i<j, tie-corrected variance 18·Var(S) = n(n−1)(2n+5) −
  // Σ t(t−1)(2t+5) kept as an EXACT integer, and the continuity-
  // corrected z — the nonparametric "is there a monotone trend" answer
  // that pairs with q310's slope estimate.
  //
  // Determinism: s and var18 are exact BIGINTs; z6 is pround of one
  // IEEE chain over them.
  def q311MannKendall(spark: SparkSession, dir: String): DataFrame = {
    val s = dailyPairs(spark, dir)
      .agg(sum(signum(col("xb") - col("xa")).cast("long")).as("s"))
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("x"))
    val ties = daily.groupBy(col("x")).agg(count(lit(1)).as("t"))
      .agg(sum(expr("t * (t - 1L) * (2L * t + 5L)")).as("tcorr"))
    val n = daily.agg(count(lit(1)).as("n"))
    s.crossJoin(broadcast(n)).crossJoin(broadcast(ties))
      .withColumn("var18", expr("n * (n - 1L) * (2L * n + 5L) - tcorr"))
      .withColumn("z6", Num.pround(
        (col("s") - signum(col("s")).cast("long")).cast("double") /
          sqrt(col("var18").cast("double") / lit(18.0d)), 6))
      .withColumn("trend",
        when(col("z6") > 1.96, lit("increasing"))
          .when(col("z6") < -1.96, lit("decreasing"))
          .otherwise(lit("none")))
      .select(col("n"), col("s"), col("var18"), col("z6"), col("trend"))
  }

  val q311Sql: String =
    s"""WITH $dailyPairsSql,
       |s AS (
       |  SELECT CAST(SUM(CASE WHEN xb > xa THEN 1 WHEN xb < xa THEN -1
       |    ELSE 0 END) AS BIGINT) AS s FROM pairs),
       |ties AS (
       |  SELECT CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tcorr
       |  FROM (SELECT COUNT(*) AS t FROM daily GROUP BY x)),
       |n AS (SELECT COUNT(*) AS n FROM daily),
       |g AS (
       |  SELECT n.n, s.s,
       |    CAST(n * (n - 1) * (2 * n + 5) - tcorr AS BIGINT) AS var18
       |  FROM s CROSS JOIN n CROSS JOIN ties)
       |SELECT n, s, var18,
       |  FLOOR((CAST(s - SIGN(s) AS DOUBLE) / sqrt(CAST(var18 AS DOUBLE) / 18.0))
       |    * 1e6 + 0.5) / 1e6 AS z6,
       |  CASE WHEN FLOOR((CAST(s - SIGN(s) AS DOUBLE) /
       |      sqrt(CAST(var18 AS DOUBLE) / 18.0)) * 1e6 + 0.5) / 1e6 > 1.96
       |    THEN 'increasing'
       |    WHEN FLOOR((CAST(s - SIGN(s) AS DOUBLE) /
       |      sqrt(CAST(var18 AS DOUBLE) / 18.0)) * 1e6 + 0.5) / 1e6 < -1.96
       |    THEN 'decreasing' ELSE 'none' END AS trend
       |FROM g""".stripMargin

  // --------------------------------------------------------------------------
  // q312 — DETERMINISTIC CLASS REBALANCING: downsample every language to
  // the minority-class count, keeping each class's m smallest
  // (md5(doc_id), doc_id) rows — reproducible on any partitioning /
  // rerun / engine (no RNG state), the standard pre-training class
  // balancing pass. The per-class selection set is PROVEN by shipping
  // the exact sum of kept doc_ids, not just the count.
  //
  // Scale: one count aggregate (broadcast 1-row min), one rank window
  // PARTITIONED by class; at 100 TB pre-filter with an md5-threshold
  // estimate (q27's sampling pattern) so the per-class sort sees ~m
  // rows instead of the whole class.
  def classRebalance(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_before"))
    val m = counts.agg(min(col("n_before")).as("m"))
    val ranked = docs.select(col("lang"), col("doc_id"))
      .withColumn("h", expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))))
    ranked.crossJoin(broadcast(m)).filter(col("rk") <= col("m"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("kept_id_sum"))
      .join(counts, Seq("lang"))
      .select(col("lang"), col("n_before"), col("n_kept"), col("kept_id_sum"))
      .orderBy(col("lang"))
  }

  def q312ClassRebalance(spark: SparkSession, dir: String): DataFrame =
    classRebalance(Tables.documents(spark, dir))

  val q312Sql: String =
    """WITH counts AS (SELECT lang, COUNT(*) AS n_before FROM documents GROUP BY 1),
      |m AS (SELECT MIN(n_before) AS m FROM counts),
      |ranked AS (
      |  SELECT lang, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT,
      |        doc_id) AS rk
      |  FROM documents)
      |SELECT lang, n_before, COUNT(*) AS n_kept,
      |  CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum
      |FROM ranked CROSS JOIN m JOIN counts USING (lang)
      |WHERE rk <= m.m
      |GROUP BY lang, n_before ORDER BY lang""".stripMargin

  // --------------------------------------------------------------------------
  // q313 — INTERVAL UNION (gaps-and-islands coverage): give every event a
  // 10-minute activity interval [ts, ts+600s) and compute each user's
  // union — merged island count and total covered seconds — the
  // standard "active time" rollup (and the same merge a PII-retention
  // window audit runs). New island when an interval starts after the
  // running max end of everything before it; all arithmetic in exact
  // epoch micros.
  //
  // Scale: two windows PARTITIONED by user (running max + island sum),
  // one aggregate — a single shuffle on user_id.
  def intervalUnion(events: DataFrame, lenSec: Long): DataFrame = {
    val iv = events.select(col("user_id"),
      unix_micros(col("ts")).as("s0"),
      (unix_micros(col("ts")) + lit(lenSec * 1000000L)).as("e0"),
      col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("s0"), col("event_id"))
    val flagged = iv
      .withColumn("prev_max_e",
        max(col("e0")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_max_e").isNull || col("s0") > col("prev_max_e"), 1L)
          .otherwise(0L))
      .withColumn("island",
        sum(col("new_island")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(col("user_id"), col("island"))
      .agg(min(col("s0")).as("is"), max(col("e0")).as("ie"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"),
        (sum(col("ie") - col("is")) / lit(1000000L)).cast("long").as("covered_sec"))
      .orderBy(col("user_id"))
  }

  def q313IntervalUnion(spark: SparkSession, dir: String): DataFrame =
    intervalUnion(Tables.events(spark, dir), lenSec = 600L)

  val q313Sql: String =
    """WITH iv AS (
      |  SELECT user_id, epoch_us(ts) AS s0,
      |    epoch_us(ts) + 600000000 AS e0, event_id
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, s0, e0, event_id,
      |    CASE WHEN MAX(e0) OVER (PARTITION BY user_id ORDER BY s0, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |      OR s0 > MAX(e0) OVER (PARTITION BY user_id ORDER BY s0, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      THEN 1 ELSE 0 END AS new_island
      |  FROM iv),
      |isl AS (
      |  SELECT user_id, s0, e0,
      |    SUM(new_island) OVER (PARTITION BY user_id ORDER BY s0, event_id
      |      ROWS UNBOUNDED PRECEDING) AS island
      |  FROM flagged),
      |merged AS (
      |  SELECT user_id, island, MIN(s0) AS i_s, MAX(e0) AS i_e
      |  FROM isl GROUP BY 1, 2)
      |SELECT user_id, COUNT(*) AS n_islands,
      |  CAST(SUM(i_e - i_s) // 1000000 AS BIGINT) AS covered_sec
      |FROM merged GROUP BY user_id ORDER BY user_id""".stripMargin

  private val catalogF: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q310_theil_sen", q310TheilSen _, Some(q310Sql)),
    ("q311_mann_kendall", q311MannKendall _, Some(q311Sql)),
    ("q312_class_rebalance", q312ClassRebalance _, Some(q312Sql)),
    ("q313_interval_union", q313IntervalUnion _, Some(q313Sql)))

  // ═════════════════ formerly Round8hOps ═════════════════
  /** Round-8 eighth operator batch: rank correlation, Apriori candidate
    * pruning, the MRR/recall retrieval readout, and sweep-line peak
    * concurrency — all on the §8.4 exact-integer discipline.
    */

  // --------------------------------------------------------------------------
  // q316 — SPEARMAN RANK CORRELATION per market segment between customer
  // account balance and realized order spend (cents, exact). Ties use
  // average ranks; to stay integer the ranks are DOUBLED: r2 = 2·rank_min
  // + cnt − 1 (= 2× the tied average rank). Pearson-on-ranks sufficient
  // statistics (n, Σr, Σr², Σrxry) are exact BIGINTs; the three
  // cross-multiplied moments num/dx/dy ship as exact integers and ρ =
  // num / (√dx·√dy) is two correctly-rounded sqrts + one division +
  // pround — bit-identical across engines.
  //
  // Scale: the rank windows are partitioned by segment (5 groups — at
  // 100 TB lift the per-segment rank to q169's bucketed two-pass, or
  // for the bounded-cents balance axis q199's value-histogram rank);
  // everything after the ranks is one hash aggregate per segment.
  // Overflow: n·Σr² ≤ 4n⁴ ≈ 3.3e18 at the 10× decade probe — inside
  // BIGINT; the 100 TB lift is DECIMAL(38,0) (q307's pattern).
  def spearmanBySegment(base: DataFrame): DataFrame = {
    def r2(v: String): org.apache.spark.sql.Column =
      lit(2L) * rank().over(Window.partitionBy(col("segment")).orderBy(col(v))) +
        count(lit(1)).over(Window.partitionBy(col("segment"), col(v))) - lit(1L)
    base
      .withColumn("rx", r2("x")).withColumn("ry", r2("y"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n"),
        sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
        sum(col("rx") * col("ry")).as("sxy"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"))
      .withColumn("num", expr("n * sxy - sx * sy"))
      .withColumn("dx", expr("n * sxx - sx * sx"))
      .withColumn("dy", expr("n * syy - sy * sy"))
      .select(col("segment"), col("n"), col("num"), col("dx"), col("dy"),
        when(col("dx") === 0L || col("dy") === 0L, lit(null))
          .otherwise(Num.pround(
            col("num") / (sqrt(col("dx")) * sqrt(col("dy"))), 6))
          .as("rho_spearman"))
      .orderBy(col("segment"))
  }

  def q316Spearman(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select(
      col("c_custkey"), col("c_mktsegment").as("segment"),
      expr("cast(floor(c_acctbal * 100 + 0.5d) as bigint)").as("x"))
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(expr("sum(cast(floor(o_totalprice * 100 + 0.5d) as bigint))").as("y0"))
    val base = cust.join(spend, col("c_custkey") === col("o_custkey"), "left")
      .select(col("segment"), col("x"), coalesce(col("y0"), lit(0L)).as("y"))
    spearmanBySegment(base)
  }

  val q316Sql: String =
    """WITH cust AS (
      |  SELECT c_custkey, c_mktsegment AS segment,
      |    CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS x
      |  FROM customer),
      |sp AS (
      |  SELECT o_custkey,
      |    SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS y0
      |  FROM orders GROUP BY 1),
      |b AS (
      |  SELECT segment, x, COALESCE(y0, 0) AS y
      |  FROM cust LEFT JOIN sp ON c_custkey = o_custkey),
      |r AS (
      |  SELECT segment,
      |    2 * RANK() OVER (PARTITION BY segment ORDER BY x)
      |      + COUNT(*) OVER (PARTITION BY segment, x) - 1 AS rx,
      |    2 * RANK() OVER (PARTITION BY segment ORDER BY y)
      |      + COUNT(*) OVER (PARTITION BY segment, y) - 1 AS ry
      |  FROM b),
      |s AS (
      |  SELECT segment, COUNT(*) AS n, SUM(rx) AS sx, SUM(ry) AS sy,
      |    SUM(rx * ry) AS sxy, SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy
      |  FROM r GROUP BY 1)
      |SELECT segment, n,
      |  CAST(n * sxy - sx * sy AS BIGINT) AS num,
      |  CAST(n * sxx - sx * sx AS BIGINT) AS dx,
      |  CAST(n * syy - sy * sy AS BIGINT) AS dy,
      |  CASE WHEN n * sxx = sx * sx OR n * syy = sy * sy THEN NULL
      |    ELSE FLOOR((CAST(n * sxy - sx * sy AS DOUBLE)
      |      / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
      |         * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))) * 1e6 + 0.5) / 1e6
      |  END AS rho_spearman
      |FROM s ORDER BY segment""".stripMargin

  // --------------------------------------------------------------------------
  // q317 — APRIORI FREQUENT TRIPLES: 3-itemsets co-ordered ≥ 2 times,
  // with the level-wise candidate prune that makes Apriori scale: items
  // are first restricted to parts appearing in some FREQUENT PAIR (the
  // q198 level-2 table) — the downward-closure property guarantees no
  // frequent triple is lost. Readout: exact support_ppm and the
  // 3-way lift vs independence.
  //
  // Scale: triple fan-out is a co-partitioned double self-join on the
  // order key, bounded by basket size (C(7,3) = 35 per order — never
  // O(parts³)); the prune semi-join shrinks the input before the cubic
  // fan-out; per-item counts and the order total are broadcast. At
  // 100 TB raise both minsups proportionally (support is a fraction).
  def aprioriTriples(items0: DataFrame, minsup: Long): DataFrame = {
    // one distinct shuffle feeds five consumers (q198's staging rule)
    val items = items0.select(col("ok"), col("p")).distinct().localCheckpoint()
    val nOrd = items.agg(countDistinct(col("ok")).as("n_orders"))
    val ic = items.groupBy(col("p")).agg(count(lit(1)).as("c"))
    val a = items.select(col("ok"), col("p").as("p1"))
    val b = items.select(col("ok"), col("p").as("p2"))
    val c3 = items.select(col("ok"), col("p").as("p3"))
    val fp = a.join(b, Seq("ok")).filter(col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minsup)
    val fpParts = fp.select(col("p1").as("p"))
      .union(fp.select(col("p2").as("p"))).distinct()
    val pruned = items.join(fpParts, Seq("p"), "left_semi")
    val pa = pruned.select(col("ok"), col("p").as("p1"))
    val pb = pruned.select(col("ok"), col("p").as("p2"))
    val pc = pruned.select(col("ok"), col("p").as("p3"))
    pa.join(pb, Seq("ok")).filter(col("p1") < col("p2"))
      .join(pc, Seq("ok")).filter(col("p2") < col("p3"))
      .groupBy(col("p1"), col("p2"), col("p3")).agg(count(lit(1)).as("c123"))
      .filter(col("c123") >= minsup)
      .join(broadcast(ic.select(col("p").as("p1"), col("c").as("c1"))), Seq("p1"))
      .join(broadcast(ic.select(col("p").as("p2"), col("c").as("c2"))), Seq("p2"))
      .join(broadcast(ic.select(col("p").as("p3"), col("c").as("c3"))), Seq("p3"))
      .crossJoin(broadcast(nOrd))
      .select(col("p1"), col("p2"), col("p3"), col("c123"),
        expr("(1000000L * c123) div n_orders").as("support_ppm"),
        Num.pround(
          col("n_orders").cast("double") * col("n_orders") * col("c123") /
            (col("c1").cast("double") * col("c2") * col("c3")), 6).as("lift"))
      .orderBy(col("p1"), col("p2"), col("p3"))
  }

  def q317AprioriTriples(spark: SparkSession, dir: String): DataFrame =
    aprioriTriples(
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")),
      minsup = 2L)

  val q317Sql: String =
    """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
      |n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM items),
      |ic AS (SELECT p, COUNT(*) AS c FROM items GROUP BY 1),
      |fp AS (
      |  SELECT a.p AS p1, b.p AS p2
      |  FROM items a JOIN items b ON a.ok = b.ok AND a.p < b.p
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |fpp AS (SELECT p1 AS p FROM fp UNION SELECT p2 FROM fp),
      |pruned AS (SELECT * FROM items WHERE p IN (SELECT p FROM fpp)),
      |tri AS (
      |  SELECT a.p AS p1, b.p AS p2, c.p AS p3, COUNT(*) AS c123
      |  FROM pruned a
      |  JOIN pruned b ON a.ok = b.ok AND a.p < b.p
      |  JOIN pruned c ON a.ok = c.ok AND b.p < c.p
      |  GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2)
      |SELECT p1, p2, p3, c123,
      |  CAST((1000000 * c123) // n_orders AS BIGINT) AS support_ppm,
      |  FLOOR((CAST(n_orders AS DOUBLE) * n_orders * c123
      |    / (CAST(i1.c AS DOUBLE) * i2.c * i3.c)) * 1e6 + 0.5) / 1e6 AS lift
      |FROM tri CROSS JOIN n
      |JOIN ic i1 ON tri.p1 = i1.p
      |JOIN ic i2 ON tri.p2 = i2.p
      |JOIN ic i3 ON tri.p3 = i3.p
      |ORDER BY p1, p2, p3""".stripMargin

  // --------------------------------------------------------------------------
  // q318 — MRR + RECALL@10 retrieval readout: the reciprocal-rank metric
  // that completes the eval family (q193 AUC, q251 nDCG, q229 prefix
  // recall). Per query vector (vec_id < 20): candidates ranked by cosine
  // (pround 6 BEFORE ranking, vec_id tie-break — q229's rule); first
  // relevant rank, rr_ppm = 10⁶ div rank, hits@10 and recall@10 as exact
  // BIGINT ppm — every shipped cell is an integer.
  //
  // Scale: one corpus pass against 20 broadcast queries; the rank window
  // is partitioned by query. At 100 TB the first-relevant rank needs no
  // global sort: argmax the best relevant (sim, id) pair, then COUNT the
  // candidates strictly better — two aggregates and a join.
  def mrrEval(emb: DataFrame, nQueries: Int): DataFrame = {
    val base = emb.select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    val queries = base.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"), col("v").as("qv"))
    val relTot = base.groupBy(col("label")).agg(count(lit(1)).as("n_label"))
    val sim = Num.pround(
      expr("aggregate(zip_with(v, qv, (x, y) -> x * y), 0.0d, (a, x) -> a + x)") /
        sqrt(expr("aggregate(v, 0.0d, (a, x) -> a + x * x)") *
          expr("aggregate(qv, 0.0d, (a, x) -> a + x * x)")), 6)
    base.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("qlabel"), col("vec_id"), col("label"), sim.as("sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))))
      .withColumn("rel", (col("label") === col("qlabel")).cast("long"))
      .groupBy(col("qid"), col("qlabel"))
      .agg(min(when(col("rel") === 1L, col("rk"))).as("first_rel_rank"),
        sum(when(col("rel") === 1L && col("rk") <= 10, 1L).otherwise(0L))
          .as("hits_at_10"))
      .join(broadcast(relTot), col("qlabel") === col("label"))
      .withColumn("n_rel", col("n_label") - 1) // the query itself is excluded
      .select(col("qid"), col("n_rel"), col("first_rel_rank"),
        expr("1000000L div first_rel_rank").as("rr_ppm"),
        col("hits_at_10"),
        expr("(1000000L * hits_at_10) div n_rel").as("recall10_ppm"))
      .orderBy(col("qid"))
  }

  def q318MrrEval(spark: SparkSession, dir: String): DataFrame =
    mrrEval(Tables.embeddings(spark, dir), nQueries = 20)

  val q318Sql: String =
    """WITH base AS (
      |  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
      |  FROM embeddings),
      |q AS (SELECT vec_id AS qid, label AS qlabel, v AS qv FROM base WHERE vec_id < 20),
      |rt AS (SELECT label, COUNT(*) AS n_label FROM base GROUP BY 1),
      |sc AS (
      |  SELECT qid, qlabel, b.vec_id, b.label,
      |    FLOOR((list_reduce(list_transform(range(1, 65), i -> b.v[i] * qv[i]), (a, x) -> a + x)
      |      / sqrt(list_reduce(list_transform(range(1, 65), i -> b.v[i] * b.v[i]), (a, x) -> a + x)
      |        * list_reduce(list_transform(range(1, 65), i -> qv[i] * qv[i]), (a, x) -> a + x))) * 1e6 + 0.5) / 1e6
      |      AS sim
      |  FROM base b CROSS JOIN q WHERE b.vec_id <> qid),
      |rk AS (
      |  SELECT qid, qlabel, label, sim,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
      |  FROM sc),
      |ag AS (
      |  SELECT qid, qlabel,
      |    MIN(CASE WHEN label = qlabel THEN rk END) AS first_rel_rank,
      |    SUM(CASE WHEN label = qlabel AND rk <= 10 THEN 1 ELSE 0 END) AS hits_at_10
      |  FROM rk GROUP BY 1, 2)
      |SELECT qid, rt.n_label - 1 AS n_rel,
      |  CAST(first_rel_rank AS BIGINT) AS first_rel_rank,
      |  CAST(1000000 // first_rel_rank AS BIGINT) AS rr_ppm,
      |  CAST(hits_at_10 AS BIGINT) AS hits_at_10,
      |  CAST((1000000 * hits_at_10) // (rt.n_label - 1) AS BIGINT) AS recall10_ppm
      |FROM ag JOIN rt ON ag.qlabel = rt.label
      |ORDER BY qid""".stripMargin

  // --------------------------------------------------------------------------
  // q319 — PEAK CONCURRENCY sweep line: give every event a 30-minute
  // activity interval (half-open [ts, ts+1800s)) and report, per day,
  // the maximum number of simultaneously-active intervals and the first
  // instant the peak is reached. Intervals crossing midnight are split
  // into day-clipped pieces so days are independent; all arithmetic in
  // exact epoch micros (q313's discipline). Ends sort BEFORE starts at
  // the same instant (delta −1 < +1), so touching intervals don't count
  // as overlapping.
  //
  // Scale: the running sum is the TWO-LEVEL exclusive-scan shape — a
  // within-(day, hour) running sum plus a per-day prefix over the 24
  // hour totals (a 30×24 grid joined back by equi-key) — so no partition
  // ever holds more than an hour of deltas; the oracle's single
  // per-day window is the same math. Peak/first-instant per day is one
  // argmax aggregate (min t at max cum is order-deterministic: the
  // multiset of (t, cum) pairs is invariant to tie order within (t,
  // delta) groups).
  def peakConcurrency(events: DataFrame, lenSec: Long): DataFrame = {
    val DAY = 86400000000L
    val HOUR = 3600000000L
    val base = events.select(col("event_id"), unix_micros(col("ts")).as("s0"))
      .withColumn("e0", col("s0") + lit(lenSec * 1000000L))
      .withColumn("d0", expr(s"s0 div ${DAY}L"))
      .withColumn("dend", expr(s"(s0 div ${DAY}L + 1L) * ${DAY}L"))
    val pieces = base.select(col("event_id"), explode(expr(
      "filter(array(named_struct('d', d0, 't0', s0, 't1', least(e0, dend)), " +
        "named_struct('d', d0 + 1L, 't0', dend, 't1', e0)), p -> p.t1 > p.t0)"))
      .as("p"))
      .select(col("event_id"), col("p.d").as("d"), col("p.t0"), col("p.t1"))
    val deltas = pieces.select(col("event_id"), col("d"), explode(expr(
      "array(named_struct('t', t0, 'delta', 1L), named_struct('t', t1, 'delta', -1L))"))
      .as("x"))
      .select(col("event_id"), col("d"), col("x.t").as("t"), col("x.delta").as("delta"))
      .withColumn("h", least(expr(s"(t - d * ${DAY}L) div ${HOUR}L"), lit(23L)))
    val wh = Window.partitionBy(col("d"), col("h"))
      .orderBy(col("t"), col("delta"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumh = deltas.withColumn("cumh", sum(col("delta")).over(wh))
    val off = deltas.groupBy(col("d"), col("h")).agg(sum(col("delta")).as("ht"))
      .withColumn("off", coalesce(
        sum(col("ht")).over(Window.partitionBy(col("d")).orderBy(col("h"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("d"), col("h"), col("off"))
    cumh.join(broadcast(off), Seq("d", "h"))
      .withColumn("cum", col("off") + col("cumh"))
      .groupBy(col("d"))
      .agg(max(struct(col("cum").as("c"), (-col("t")).as("nt"))).as("m"))
      .select(col("d").as("day"), col("m.c").as("peak"),
        (-col("m.nt")).as("first_peak_us"))
      .orderBy(col("day"))
  }

  def q319PeakConcurrency(spark: SparkSession, dir: String): DataFrame =
    peakConcurrency(Tables.events(spark, dir), lenSec = 1800L)

  val q319Sql: String =
    """WITH ev AS (
      |  SELECT event_id, epoch_us(ts) AS s0, epoch_us(ts) + 1800000000 AS e0,
      |    epoch_us(ts) // 86400000000 AS d0,
      |    (epoch_us(ts) // 86400000000 + 1) * 86400000000 AS dend
      |  FROM events),
      |pieces AS (
      |  SELECT event_id, d0 AS d, s0 AS t0, LEAST(e0, dend) AS t1 FROM ev
      |  UNION ALL
      |  SELECT event_id, d0 + 1, dend, e0 FROM ev WHERE e0 > dend),
      |deltas AS (
      |  SELECT event_id, d, t0 AS t, 1 AS delta FROM pieces
      |  UNION ALL
      |  SELECT event_id, d, t1, -1 FROM pieces),
      |c AS (
      |  SELECT d, t,
      |    SUM(delta) OVER (PARTITION BY d ORDER BY t, delta, event_id
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM deltas),
      |m AS (SELECT d, MAX(cum) AS peak FROM c GROUP BY d)
      |SELECT c.d AS day, CAST(m.peak AS BIGINT) AS peak,
      |  CAST(MIN(t) AS BIGINT) AS first_peak_us
      |FROM c JOIN m ON c.d = m.d AND c.cum = m.peak
      |GROUP BY c.d, m.peak ORDER BY day""".stripMargin

  private val catalogH: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q316_spearman", q316Spearman _, Some(q316Sql)),
    ("q317_apriori_triples", q317AprioriTriples _, Some(q317Sql)),
    ("q318_mrr_eval", q318MrrEval _, Some(q318Sql)),
    ("q319_peak_concurrency", q319PeakConcurrency _, Some(q319Sql)))

  // ═════════════════ formerly Round8iOps ═════════════════
  /** Round-8 ninth operator batch: Kendall τ-b cross-series association,
    * the Murphy decomposition of the Brier score, systematic PPS
    * sampling, and distinct-n corpus diversity — eval/stats/sampling
    * surface on the §8.4 exact-integer discipline.
    */

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

  private val catalogI: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q320_kendall_tau", q320KendallTau _, Some(q320Sql)),
    ("q321_brier_decomposition", q321BrierDecomposition _, Some(q321Sql)),
    ("q322_systematic_pps", q322SystematicPps _, Some(q322Sql)),
    ("q323_distinct_n", q323DistinctN _, Some(q323Sql)))

  // ═════════════════ formerly Round8nOps ═════════════════
  /** Round-8 fourteenth operator batch: forecast backtesting and the
    * Siegel repeated-median slope — time-series eval/robust-stats surface
    * on the §8.4 exact-integer discipline; both collapse to the
    * calendar-day grid.
    */

  // --------------------------------------------------------------------------
  // q333 — FORECAST BACKTEST (MASE): one-step naive-1 persistence
  // forecast scored against the seasonal-naive-7 baseline over the daily
  // order-count series — the scale-free forecast-accuracy readout
  // (MASE < 1 ⇔ persistence beats weekly seasonality). Integer series ⇒
  // both absolute-error sums are exact BIGINTs and mase_ppm is one
  // floor-div; no float enters the hashed row.
  //
  // Scale: the corpus collapses to the calendar grid in one aggregate;
  // lags are windows over that bounded grid (allowlisted class).
  def q333MaseBacktest(spark: SparkSession, dir: String): DataFrame = {
    val grid = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("x"))
      .withColumn("i", row_number().over(Window.orderBy(col("d"))))
    val w = Window.orderBy(col("i"))
    grid
      .withColumn("l1", lag(col("x"), 1).over(w))
      .withColumn("l7", lag(col("x"), 7).over(w))
      .filter(col("l7").isNotNull)
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("x") - col("l1"))).as("sum_abs_naive1"),
        sum(abs(col("x") - col("l7"))).as("sum_abs_naive7"))
      .select(col("n_eval"), col("sum_abs_naive1"), col("sum_abs_naive7"),
        expr("case when sum_abs_naive7 = 0L then null " +
          "else (1000000L * sum_abs_naive1) div sum_abs_naive7 end").as("mase_ppm"))
  }

  val q333Sql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS x
      |  FROM orders GROUP BY 1),
      |g AS (
      |  SELECT x,
      |    LAG(x, 1) OVER (ORDER BY d) AS l1,
      |    LAG(x, 7) OVER (ORDER BY d) AS l7
      |  FROM daily)
      |SELECT COUNT(*) AS n_eval,
      |  CAST(SUM(ABS(x - l1)) AS BIGINT) AS sum_abs_naive1,
      |  CAST(SUM(ABS(x - l7)) AS BIGINT) AS sum_abs_naive7,
      |  CASE WHEN SUM(ABS(x - l7)) = 0 THEN NULL
      |    ELSE CAST((1000000 * SUM(ABS(x - l1))) // SUM(ABS(x - l7)) AS BIGINT)
      |  END AS mase_ppm
      |FROM g WHERE l7 IS NOT NULL""".stripMargin

  // --------------------------------------------------------------------------
  // q334 — SIEGEL REPEATED-MEDIAN SLOPE: median over i of (median over
  // j≠i of pairwise slopes) — breakdown point 50%, the robust-trend
  // complement to q310's Theil–Sen (29%). Both median SELECTIONS use the
  // (slope-double, dy, dx) total order from exact integers (q310's
  // rule), so the chosen elements are engine-deterministic and their
  // exact (dy, dx) ship.
  //
  // Scale: the j≠i pair expansion is calendar-grid-bounded (≤ 730²
  // pairs at ANY corpus size, q310's joinAllow class); the inner rank is
  // partitioned by i, the outer rank runs over ≤ 730 medians. The grid
  // and the per-i medians each feed TWO consumers (both self-join sides;
  // the n-aggregate and the final rank) — LAZY localCheckpoints flatten
  // those shared subtrees to LogicalRDDs so the orders scan + daily
  // aggregate runs once, not four times (measured 8.9 s → 2.7 s at
  // sf0.1; the windows themselves were never the cost).
  def siegelSlope(daily: DataFrame): DataFrame = {
    val grid = daily
      .withColumn("i", row_number().over(Window.orderBy(col("d"))))
      .select(col("i"), col("x")).localCheckpoint(false)
    val a = grid.select(col("i").as("ia"), col("x").as("xa"))
    val b = grid.select(col("i").as("ib"), col("x").as("xb"))
    val sl = a.join(b, col("ib") =!= col("ia"))
      .select(col("ia"),
        (col("xb") - col("xa")).as("dy"),
        (col("ib") - col("ia")).cast("long").as("dx"))
      .withColumn("s", col("dy").cast("double") / col("dx"))
    val perI = sl
      .withColumn("m", count(lit(1)).over(Window.partitionBy(col("ia"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("ia")).orderBy(col("s"), col("dy"), col("dx"))))
      .filter(col("rk") === expr("(m + 1L) div 2L"))
      .select(col("ia"), col("s"), col("dy"), col("dx"))
      .localCheckpoint(false)
    val n = perI.agg(count(lit(1)).as("n_days"))
    perI.crossJoin(broadcast(n))
      .withColumn("rk2", row_number().over(
        Window.orderBy(col("s"), col("dy"), col("dx"), col("ia"))))
      .filter(col("rk2") === expr("(n_days + 1L) div 2L"))
      .select(col("n_days"), col("ia").as("med_day"), col("dy").as("med_dy"),
        col("dx").as("med_dx"), Num.pround(col("s"), 6).as("slope6"))
  }

  def q334SiegelSlope(spark: SparkSession, dir: String): DataFrame =
    siegelSlope(Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("x")))

  val q334Sql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS x
      |  FROM orders GROUP BY 1),
      |grid AS (SELECT ROW_NUMBER() OVER (ORDER BY d) AS i, x FROM daily),
      |sl AS (
      |  SELECT a.i AS ia, b.x - a.x AS dy, b.i - a.i AS dx,
      |    CAST(b.x - a.x AS DOUBLE) / CAST(b.i - a.i AS DOUBLE) AS s
      |  FROM grid a JOIN grid b ON b.i <> a.i),
      |pi AS (
      |  SELECT ia, s, dy, dx FROM (
      |    SELECT ia, s, dy, dx,
      |      COUNT(*) OVER (PARTITION BY ia) AS m,
      |      ROW_NUMBER() OVER (PARTITION BY ia ORDER BY s, dy, dx) AS rk
      |    FROM sl)
      |  WHERE rk = (m + 1) // 2),
      |n AS (SELECT COUNT(*) AS n_days FROM pi),
      |r AS (
      |  SELECT ia, s, dy, dx,
      |    ROW_NUMBER() OVER (ORDER BY s, dy, dx, ia) AS rk2
      |  FROM pi)
      |SELECT n_days, CAST(ia AS BIGINT) AS med_day, CAST(dy AS BIGINT) AS med_dy,
      |  CAST(dx AS BIGINT) AS med_dx,
      |  FLOOR((s) * 1e6 + 0.5) / 1e6 AS slope6
      |FROM r CROSS JOIN n WHERE rk2 = (n_days + 1) // 2""".stripMargin

  private val catalogN: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q333_mase_backtest", q333MaseBacktest _, Some(q333Sql)),
    ("q334_siegel_slope", q334SiegelSlope _, Some(q334Sql)))

  // ═════════════════ formerly Round8qOps ═════════════════
  /** Round-8 seventeenth operator batch: cross-correlation by lag and the
    * Markov stationary distribution — lead/lag analytics on the §8.4
    * exact-integer discipline.
    */

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
  // window partitioned by user) — that is the ONLY distributed work.
  // The states are EVENT TYPES, a fixed vocabulary at any corpus size,
  // so the k×k ppm matrix is collected once and the ten power
  // iterations run ON THE DRIVER in exact integer arithmetic (r14,
  // q368's treatment): per-term floor products and exact sums make the
  // driver trajectory bit-identical to the former per-round Catalyst
  // loop (the DuckDB oracle replays the same fixed point and
  // CrossCorrelationStationaryMixSpec pins the dynamics), while paying
  // zero per-round planning/checkpoint/scheduling — measured 1.26 →
  // 0.57 s (bench-min → warm-min) at sf0.1 on the r14 host. Collecting
  // a fixed-vocabulary grid is the broadcast-side pattern, not a
  // driver risk.
  def stationaryMix(events: DataFrame, iters: Int): DataFrame = {
    val spark = events.sparkSession
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = events
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("s_from"), col("nxt").as("s_to"))
      .agg(count(lit(1)).as("c"))
    val pRows = trans
      .withColumn("rt", sum(col("c")).over(Window.partitionBy(col("s_from"))))
      .withColumn("p_ppm", expr("(1000000L * c) div rt"))
      .select(col("s_from"), col("s_to"), col("p_ppm"))
      .collect()
    val byFrom = pRows.toSeq.groupBy(_.get(0))
    val states = byFrom.keys.toSeq
    val k = states.size.toLong
    var v: Map[Any, BigInt] = states.map(_ -> BigInt(1000000L / k)).toMap
    for (_ <- 1 to iters) {
      val stepped = scala.collection.mutable.Map.empty[Any, BigInt]
        .withDefaultValue(BigInt(0))
      // same join semantics as the former grid loop: only states present
      // in v AND in the s_from domain emit mass; keys are s_to values
      for ((from, rows) <- byFrom; vf <- v.get(from); r <- rows)
        stepped(r.get(1)) += (vf * BigInt(r.getLong(2))) / 1000000L
      val sv = stepped.values.sum
      v = stepped.map { case (st, v0) => st -> (BigInt(1000000) * v0) / sv }.toMap
    }
    val stateType = trans.schema("s_from").dataType
    val rows = v.toSeq.map { case (st, vv) =>
      org.apache.spark.sql.Row(st, vv.toLong)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("state", stateType),
      org.apache.spark.sql.types.StructField("stationary_ppm",
        org.apache.spark.sql.types.LongType, nullable = false)))
    spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
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

  private val catalogQ: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q339_cross_correlation", q339CrossCorrelation _, Some(q339Sql)),
    ("q340_stationary_mix", q340StationaryMix _, Some(q340Sql)))

  // ═════════════════ formerly Round8bOps (consolidated round 10) ═════════════════

  // --------------------------------------------------------------------------
  // q289 — EXPONENTIALLY-DECAYED TRENDING LEADERBOARD: top-10 parts by
  // half-life-decayed purchase mass (weight 2^-(age_weeks), 7-day
  // half-life) — the "trending now" ranking every storefront serves,
  // where yesterday's purchase outweighs last month's 16×.
  //
  // Scale: weight derives row-locally from the order date (broadcast
  // 1-row max-date); one hash aggregate per part; the global top-10 is
  // orderBy+limit → TakeOrderedAndProject (per-partition heaps + driver
  // merge of 10-row tips — never a global sort).
  //
  // Determinism (§8.4): ages bucket to whole weeks, so the weight is an
  // EXACT power of two — score_e12 = Σ 10¹² div 2^min(k,40) is pure
  // BIGINT arithmetic; ranking ties break on part id.
  def q289TrendingDecay(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od"))
    val mx = o.agg(max(col("od")).as("mxd"))
    Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .crossJoin(broadcast(mx))
      .withColumn("k", expr("least(datediff(mxd, od) div 7, 40)").cast("int"))
      .withColumn("w_e12", expr("1000000000000L div shiftleft(1L, k)"))
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_items"), sum(col("w_e12")).as("score_e12"))
      .orderBy(col("score_e12").desc, col("l_partkey"))
      .limit(10)
  }

  val q289Sql: String =
    """WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS mxd FROM orders),
      |s AS (
      |  SELECT l_partkey,
      |    LEAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), mxd) // 7, 40) AS k
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey CROSS JOIN mx)
      |SELECT l_partkey, COUNT(*) AS n_items,
      |  CAST(SUM(1000000000000 // CAST(POWER(2, k) AS BIGINT)) AS BIGINT)
      |    AS score_e12
      |FROM s GROUP BY 1 ORDER BY score_e12 DESC, l_partkey LIMIT 10""".stripMargin


  // ═════════════════ formerly Round8cOps (consolidated round 10) ═════════════════

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


  private val catalogR8: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q289_trending_decay", q289TrendingDecay _, Some(q289Sql)),
    ("q292_changepoint_binseg", q292ChangepointBinseg _, Some(q292Sql)))

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    catalogF ++ catalogH ++ catalogI ++ catalogN ++ catalogQ ++ catalogR8
}
