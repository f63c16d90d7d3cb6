package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 thirty-second operator batch: Hodges–Lehmann shift estimator
  * and a Cramér's V association panel — robust effect size and
  * categorical dependence strength on the §8.4 exact-integer
  * discipline.
  */
object Round8afOps {

  // --------------------------------------------------------------------------
  // q369 — HODGES–LEHMANN SHIFT: q363 tests WHETHER priority orders the
  // latencies; this estimates BY HOW MANY DAYS — the median of all
  // n_A·n_B pairwise differences (LOW minus URGENT), the robust
  // location-shift estimator paired with Mann–Whitney (q261). On the
  // bounded latency grid the difference distribution is exact: the
  // 122×122 histogram cross collapses to per-difference pair mass
  // c_A(u)·c_B(v), and the low-median difference is a rank probe into
  // its cumulative — every cell an exact BIGINT, the estimate an exact
  // integer day count. Also ships the gt/eq/lt pair masses (the
  // U-statistic decomposition).
  //
  // Scale: q363's orderkey join collapses to two ≤122-cell histograms;
  // the cross and rank probe are grid-local.
  def hlShift(rows: DataFrame): DataFrame = {
    val hist = rows.groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val a = hist.filter(col("g") === "A").select(col("v").as("va"),
      col("c").as("ca"))
    val b = hist.filter(col("g") === "B").select(col("v").as("vb"),
      col("c").as("cb"))
    val diff = broadcast(a).crossJoin(broadcast(b))
      .groupBy((col("vb") - col("va")).as("d"))
      .agg(sum(col("ca") * col("cb")).as("m"))
      .withColumn("cum", sum(col("m")).over(
        Window.orderBy(col("d")).rowsBetween(Window.unboundedPreceding, 0)))
      .localCheckpoint()
    val tot = diff.agg(sum(col("m")).as("t"),
      sum(when(col("d") > 0L, col("m")).otherwise(0L)).as("gt_pairs"),
      sum(when(col("d") === 0L, col("m")).otherwise(0L)).as("eq_pairs"),
      sum(when(col("d") < 0L, col("m")).otherwise(0L)).as("lt_pairs"))
    val na = a.agg(sum(col("ca")).as("n_a"))
    val nb = b.agg(sum(col("cb")).as("n_b"))
    diff.crossJoin(broadcast(tot))
      .filter(col("cum") >= expr("(t + 1L) div 2L") &&
        col("cum") - col("m") < expr("(t + 1L) div 2L"))
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(col("n_a"), col("n_b"), col("t").as("pairs"),
        col("gt_pairs"), col("eq_pairs"), col("lt_pairs"),
        col("d").as("hl_shift_days"))
  }

  def q369HlShift(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority").startsWith("1") ||
        col("o_orderpriority").startsWith("5"))
      .select(col("o_orderkey").as("ok"), col("o_orderdate"),
        when(col("o_orderpriority").startsWith("1"), "A").otherwise("B")
          .as("g"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_shipdate"))
    hlShift(li.join(o, Seq("ok"))
      .select(col("g"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("v")))
  }

  val q369Sql: String =
    """WITH rows_ AS (
      |  SELECT CASE WHEN o_orderpriority LIKE '1%' THEN 'A' ELSE 'B' END AS g,
      |    date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS v
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderpriority LIKE '1%' OR o_orderpriority LIKE '5%'),
      |hist AS (SELECT g, v, COUNT(*) AS c FROM rows_ GROUP BY 1, 2),
      |a AS (SELECT v AS va, c AS ca FROM hist WHERE g = 'A'),
      |b AS (SELECT v AS vb, c AS cb FROM hist WHERE g = 'B'),
      |diff AS (
      |  SELECT vb - va AS d, SUM(ca * cb) AS m
      |  FROM a CROSS JOIN b GROUP BY 1),
      |cumd AS (
      |  SELECT d, m, SUM(m) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM diff),
      |tot AS (
      |  SELECT SUM(m) AS t,
      |    SUM(CASE WHEN d > 0 THEN m ELSE 0 END) AS gt_pairs,
      |    SUM(CASE WHEN d = 0 THEN m ELSE 0 END) AS eq_pairs,
      |    SUM(CASE WHEN d < 0 THEN m ELSE 0 END) AS lt_pairs
      |  FROM diff),
      |na AS (SELECT SUM(ca) AS n_a FROM a),
      |nb AS (SELECT SUM(cb) AS n_b FROM b)
      |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |  CAST(t AS BIGINT) AS pairs, CAST(gt_pairs AS BIGINT) AS gt_pairs,
      |  CAST(eq_pairs AS BIGINT) AS eq_pairs,
      |  CAST(lt_pairs AS BIGINT) AS lt_pairs,
      |  CAST(d AS BIGINT) AS hl_shift_days
      |FROM cumd, tot, na, nb
      |WHERE cum >= (t + 1) // 2 AND cum - m < (t + 1) // 2""".stripMargin

  // --------------------------------------------------------------------------
  // q370 — CRAMÉR'S V ASSOCIATION PANEL: q362 asks whether A DETERMINES
  // B (exact dependency); this measures how strongly A and B are
  // statistically ASSOCIATED — the normalized χ² effect size on the
  // same kind of column pairs. χ² uses the observed-cells-only identity
  // χ² = Σ obs²·N/(n_r·n_c) − N (zero cells contribute exactly their
  // n_r·n_c/N mass to the −N term), accumulated as NON-NEGATIVE exact
  // floors term_ppm = (10⁶·obs²·N) div (n_r·n_c) — sign-safe across
  // div/floor-div engines; V = √(χ²/(N·(min(r,c)−1))) is ONE pround'd
  // dag.
  // Together the two queries split "schema constraint" from
  // "distributional signal" — the profiling pair.
  //
  // Scale: per pair one (A,B) hash aggregate plus broadcast margins —
  // bounded by the pair's distinct grid, never wider than the scan.
  def cramersV(df: DataFrame, pairName: String, colA: String, colB: String)
  : DataFrame = {
    val cell = df.groupBy(col(colA).cast("string").as("a"),
        col(colB).cast("string").as("b"))
      .agg(count(lit(1)).as("obs")).localCheckpoint()
    val ra = cell.groupBy(col("a")).agg(sum(col("obs")).as("nr"))
    val rb = cell.groupBy(col("b")).agg(sum(col("obs")).as("nc"))
    val dims = cell.agg(countDistinct(col("a")).as("r"),
      countDistinct(col("b")).as("c"), sum(col("obs")).as("nn"))
    cell.join(broadcast(ra), Seq("a")).join(broadcast(rb), Seq("b"))
      .crossJoin(broadcast(dims))
      .agg(first(col("nn")).as("n"), first(col("r")).as("r"),
        first(col("c")).as("c"),
        sum(expr(
          """(cast(1000000 as decimal(38,0)) * obs * obs * nn)
            | div (cast(nr as decimal(38,0)) * nc)""".stripMargin))
          .as("sum_term"))
      .withColumn("chi2_ppm_d",
        col("sum_term") - expr("cast(1000000 as decimal(38,0)) * n"))
      .select(lit(pairName).as("pair"), col("n"), col("r"), col("c"),
        col("chi2_ppm_d").cast("long").as("chi2_ppm"),
        Num.pround(sqrt(
          greatest(col("chi2_ppm_d").cast("double") / lit(1e6), lit(0.0))
            / (col("n").cast("double")
              * (least(col("r"), col("c")) - lit(1L)).cast("double"))), 6)
          .as("v6"))
  }

  def q370CramersV(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val docs = Tables.documents(spark, dir)
    cramersV(cust, "customer.c_mktsegment~c_nationkey",
        "c_mktsegment", "c_nationkey")
      .unionByName(cramersV(ord, "orders.o_orderpriority~o_orderstatus",
        "o_orderpriority", "o_orderstatus"))
      .unionByName(cramersV(li, "lineitem.l_returnflag~l_linestatus",
        "l_returnflag", "l_linestatus"))
      .unionByName(cramersV(docs, "documents.source~lang", "source", "lang"))
      .orderBy(col("pair"))
  }

  private def vSql(pairName: String, table: String, a: String, b: String)
  : String =
    s"""SELECT '$pairName' AS pair, CAST(ANY_VALUE(nn) AS BIGINT) AS n,
       |  CAST(ANY_VALUE(r) AS BIGINT) AS r, CAST(ANY_VALUE(c) AS BIGINT) AS c,
       |  CAST(SUM((1000000::HUGEINT * obs * obs * nn)
       |      // (nr::HUGEINT * nc)) - 1000000::HUGEINT * ANY_VALUE(nn)
       |    AS BIGINT) AS chi2_ppm,
       |  FLOOR(sqrt(GREATEST(CAST(SUM((1000000::HUGEINT * obs * obs * nn)
       |        // (nr::HUGEINT * nc)) - 1000000::HUGEINT * ANY_VALUE(nn)
       |      AS DOUBLE) / 1e6, 0.0)
       |    / (CAST(ANY_VALUE(nn) AS DOUBLE)
       |      * CAST(LEAST(ANY_VALUE(r), ANY_VALUE(c)) - 1 AS DOUBLE)))
       |    * 1e6 + 0.5) / 1e6 AS v6
       |FROM (
       |  SELECT obs, nr, nc, nn, r, c FROM (
       |    SELECT CAST($a AS VARCHAR) AS a, CAST($b AS VARCHAR) AS b,
       |      COUNT(*) AS obs
       |    FROM $table GROUP BY 1, 2) cell
       |  JOIN (SELECT a2 AS a, SUM(obs2) AS nr FROM (
       |      SELECT CAST($a AS VARCHAR) AS a2, COUNT(*) AS obs2
       |      FROM $table GROUP BY 1) GROUP BY 1) ra USING (a)
       |  JOIN (SELECT b2 AS b, SUM(obs2) AS nc FROM (
       |      SELECT CAST($b AS VARCHAR) AS b2, COUNT(*) AS obs2
       |      FROM $table GROUP BY 1) GROUP BY 1) rb USING (b)
       |  CROSS JOIN (SELECT COUNT(DISTINCT CAST($a AS VARCHAR)) AS r,
       |    COUNT(DISTINCT CAST($b AS VARCHAR)) AS c, COUNT(*) AS nn
       |    FROM $table) dims)""".stripMargin

  val q370Sql: String = Seq(
    vSql("customer.c_mktsegment~c_nationkey", "customer",
      "c_mktsegment", "c_nationkey"),
    vSql("orders.o_orderpriority~o_orderstatus", "orders",
      "o_orderpriority", "o_orderstatus"),
    vSql("lineitem.l_returnflag~l_linestatus", "lineitem",
      "l_returnflag", "l_linestatus"),
    vSql("documents.source~lang", "documents", "source", "lang"))
    .mkString("", "\nUNION ALL\n", "\nORDER BY pair")

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q369_hl_shift", q369HlShift _, Some(q369Sql)),
    ("q370_cramers_v", q370CramersV _, Some(q370Sql)))
}
