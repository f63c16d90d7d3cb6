package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 seventh operator batch: changepoint-segmented trend fitting
  * and bounded-round bipartite label propagation — composition capstones
  * over q292's split machinery and q300's purchase graph, on the §8.4
  * exact-integer discipline.
  */
object Round8gOps {

  // --------------------------------------------------------------------------
  // q314 — SEGMENTED TREND FIT: find the single best mean-shift split of
  // the daily-revenue series (q292's exact fixed-point objective, same
  // 10⁷-cent units), then fit an OLS slope per side on exact integer
  // sufficient statistics — slope_ppm = (10⁶·(n·Σiy − Σi·Σy)) div
  // (n·Σi² − (Σi)²), the "did growth change after the break" readout.
  //
  // Scale: the corpus collapses to the calendar-day grid; candidate
  // scan and per-segment sums are grid-sized (q292's discipline).
  // Overflow: y ≈ 250 units at sf0.1 (10⁷-cent grid), i ≤ 730 ⇒
  // n·Σiy ≈ 5·10¹⁰ and 10⁶·num ≈ 5·10¹⁶ « 2⁶³ with 100× headroom.
  def q314SegmentedTrend(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(expr("cast(floor(sum(cast(o_totalprice as decimal(18,2))) * 100 / 1e7) as long)")
        .as("x"))
    segmentedTrend(daily)
  }

  /** q314's core on an explicit (d, x) daily grid — property-testable. */
  private[ops] def segmentedTrend(daily: DataFrame): DataFrame = {
    val grid = daily
      .withColumn("i", row_number().over(Window.orderBy(col("d"))).cast("long"))
      .select(col("i"), col("x"))
    val wCum = Window.orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = grid.withColumn("cs", sum(col("x")).over(wCum))
      .select(col("i"), col("cs"))
    val tot = pre.agg(max(col("i")).as("n"), max(col("cs")).as("stot"))
    val split = pre.crossJoin(broadcast(tot)).filter(col("i") < col("n"))
      .withColumn("gain", expr(
        "(10000L * cs * cs) div i + (10000L * (stot - cs) * (stot - cs)) div (n - i)"))
      .agg(max(struct(col("gain"), (-col("i")).as("ni"))).as("m"))
      .select((-col("m.ni")).as("s1"))
    val seg = grid.crossJoin(broadcast(split))
      .withColumn("segment",
        when(col("i") <= col("s1"), lit("before")).otherwise(lit("after")))
    seg.groupBy(col("segment"))
      .agg(count(lit(1)).as("n_days"), max(col("s1")).as("split_day"),
        sum(col("i")).as("si"), sum(col("x")).as("sy"),
        sum(col("i") * col("x")).as("siy"), sum(col("i") * col("i")).as("sii"))
      .withColumn("num", expr("n_days * siy - si * sy"))
      .withColumn("den", expr("n_days * sii - si * si"))
      // a 1-day segment has den = 0: undefined slope, not an error
      .withColumn("slope_ppm",
        expr("case when den = 0L then null else (1000000L * num) div den end"))
      .select(col("segment"), col("n_days"), col("split_day"),
        col("num"), col("den"), col("slope_ppm"))
      .orderBy(col("segment"))
  }

  val q314Sql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 / 1e7)
      |      AS BIGINT) AS x
      |  FROM orders GROUP BY 1),
      |grid AS (SELECT ROW_NUMBER() OVER (ORDER BY d) AS i, x FROM daily),
      |pre AS (
      |  SELECT i, SUM(x) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS cs
      |  FROM grid),
      |tot AS (SELECT MAX(i) AS n, MAX(cs) AS stot FROM pre),
      |cand AS (
      |  SELECT i,
      |    (10000 * cs * cs) // i + (10000 * (stot - cs) * (stot - cs)) // (n - i)
      |      AS gain
      |  FROM pre CROSS JOIN tot WHERE i < n),
      |split AS (
      |  SELECT i AS s1 FROM cand
      |  ORDER BY gain DESC, i ASC LIMIT 1),
      |seg AS (
      |  SELECT CASE WHEN i <= s1 THEN 'before' ELSE 'after' END AS segment,
      |    i, x, s1
      |  FROM grid CROSS JOIN split),
      |st AS (
      |  SELECT segment, COUNT(*) AS n_days, MAX(s1) AS split_day,
      |    SUM(i) AS si, SUM(x) AS sy, SUM(i * x) AS siy, SUM(i * i) AS sii
      |  FROM seg GROUP BY 1)
      |SELECT segment, n_days, CAST(split_day AS BIGINT) AS split_day,
      |  CAST(n_days * siy - si * sy AS BIGINT) AS num,
      |  CAST(n_days * sii - si * si AS BIGINT) AS den,
      |  CASE WHEN n_days * sii - si * si = 0 THEN NULL
      |    ELSE CAST((1000000 * (n_days * siy - si * sy))
      |      // (n_days * sii - si * si) AS BIGINT) END AS slope_ppm
      |FROM st ORDER BY segment""".stripMargin

  // --------------------------------------------------------------------------
  // q315 — BOUNDED-ROUND LABEL PROPAGATION over the customer–part
  // purchase graph (side-synchronous bipartite LPA): labels start as
  // disjoint node ids (2·ck for customers, 2·pk+1 for parts); each round
  // updates customers from their parts' labels, then parts from the NEW
  // customer labels (Gauss–Seidel by side — the standard bipartite
  // schedule), mode with (count desc, min label) tie-break. The readout
  // is the per-round CONVERGENCE TRAJECTORY — surviving label count and
  // the dominant community's (label, size) — q300's profile style: on
  // the real purchase graph LPA floods to ONE community within 3 rounds
  // (the same density q300's k-core measures), and the trajectory is
  // the informative artifact, not the degenerate final partition.
  //
  // Scale: each half-round is one equi-join on the edge key + one hash
  // aggregate + one per-node argmax (struct-min, map-side partial) —
  // rounds bounded at 3, all shuffles on node ids. The edge list and
  // every half-round label frame get a LAZY localCheckpoint: the plan
  // flattens to a LogicalRDD (the label frame feeds the NEXT half-round
  // AND the round's stats aggregate, so an unflattened subtree would
  // double per half-round), and eager=false lets the per-round stats —
  // 1-row aggregates UNIONed into one lazy plan — execute as a single
  // final action with RDD-level stage reuse instead of 2·rounds+1 eager
  // jobs (measured 9.0 s → 4.8 s at sf0.1; the edge-list materialization
  // alone was the round-8 6.5 s → 2.5 s fix, now subsumed).
  def lpaCommunities(edges0: DataFrame, rounds: Int): DataFrame = {
    val edges = edges0.localCheckpoint(false)
    def half(msgs: DataFrame, node: String): DataFrame =
      msgs.groupBy(col(node), col("lbl")).agg(count(lit(1)).as("cnt"))
        .groupBy(col(node))
        .agg(min(struct((-col("cnt")).as("nc"), col("lbl"))).as("m"))
        .select(col(node), col("m.lbl").as("lbl"))
    def stats(lc: DataFrame, lp: DataFrame, r: Int): DataFrame =
      lc.select(col("lbl")).union(lp.select(col("lbl")))
        .groupBy(col("lbl")).agg(count(lit(1)).as("size"))
        .agg(count(lit(1)).as("n_labels"),
          min(struct((-col("size")).as("ns"), col("lbl"))).as("m"))
        .select(lit(r).as("round"), col("n_labels"),
          col("m.lbl").as("top_lbl"), (-col("m.ns")).as("top_size"))
    var lc = edges.select(col("ck")).distinct()
      .withColumn("lbl", col("ck") * 2).localCheckpoint(false)
    var lp = edges.select(col("pk")).distinct()
      .withColumn("lbl", col("pk") * 2 + 1).localCheckpoint(false)
    var out = stats(lc, lp, 0)
    for (r <- 1 to rounds) {
      lc = half(edges.join(lp, Seq("pk")), "ck").localCheckpoint(false)
      lp = half(edges.join(lc, Seq("ck")), "pk").localCheckpoint(false)
      out = out.union(stats(lc, lp, r))
    }
    out.orderBy(col("round"))
  }

  def q315LpaCommunities(spark: SparkSession, dir: String): DataFrame = {
    val edges = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("ck"), col("l_partkey").as("pk"))
      .distinct()
    lpaCommunities(edges, rounds = 3)
  }

  val q315Sql: String = {
    // one half-round: mode of the opposite side's labels with
    // (count desc, min label) tie-break
    def half(out: String, nodeCol: String, src: String, joinKey: String): String =
      s"""$out AS (
         |  SELECT $nodeCol, lbl FROM (
         |    SELECT $nodeCol, lbl,
         |      ROW_NUMBER() OVER (PARTITION BY $nodeCol
         |        ORDER BY cnt DESC, lbl ASC) AS rn
         |    FROM (SELECT e.$nodeCol, s.lbl, COUNT(*) AS cnt
         |          FROM e JOIN $src s USING ($joinKey)
         |          GROUP BY e.$nodeCol, s.lbl))
         |  WHERE rn = 1)""".stripMargin
    s"""WITH e AS (
       |  SELECT DISTINCT o_custkey AS ck, l_partkey AS pk
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |lc0 AS (SELECT DISTINCT ck, 2 * ck AS lbl FROM e),
       |lp0 AS (SELECT DISTINCT pk, 2 * pk + 1 AS lbl FROM e),
       |${half("lc1", "ck", "lp0", "pk")},
       |${half("lp1", "pk", "lc1", "ck")},
       |${half("lc2", "ck", "lp1", "pk")},
       |${half("lp2", "pk", "lc2", "ck")},
       |${half("lc3", "ck", "lp2", "pk")},
       |${half("lp3", "pk", "lc3", "ck")},
       |${sz(0)},
       |${sz(1)},
       |${sz(2)},
       |${sz(3)}
       |${st(0)}
       |UNION ALL ${st(1)}
       |UNION ALL ${st(2)}
       |UNION ALL ${st(3)}
       |ORDER BY round""".stripMargin
  }

  /** Per-round community-size CTE and trajectory row for the q315 oracle. */
  private def sz(r: Int): String =
    s"""sz$r AS (
       |  SELECT lbl, COUNT(*) AS size FROM (
       |    SELECT lbl FROM lc$r UNION ALL SELECT lbl FROM lp$r)
       |  GROUP BY lbl)""".stripMargin

  private def st(r: Int): String =
    s"""SELECT $r AS round, (SELECT COUNT(*) FROM sz$r) AS n_labels,
       |  (SELECT lbl FROM sz$r ORDER BY size DESC, lbl LIMIT 1) AS top_lbl,
       |  (SELECT size FROM sz$r ORDER BY size DESC, lbl LIMIT 1) AS top_size""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q314_segmented_trend", q314SegmentedTrend _, Some(q314Sql)),
    ("q315_lpa_communities", q315LpaCommunities _, Some(q315Sql)))
}
