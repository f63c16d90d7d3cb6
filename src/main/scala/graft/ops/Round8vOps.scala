package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 twenty-second operator batch: Granger-style lead-lag F-test
  * and HITS hubs/authorities — causal-screening and bipartite-ranking
  * surface on the §8.4 exact-integer discipline.
  */
object Round8vOps {

  // --------------------------------------------------------------------------
  // q349 — GRANGER-STYLE LEAD-LAG F-TEST: does yesterday's ORDER VOLUME
  // improve today's REVENUE forecast beyond revenue's own history?
  // (q339 measures the lagged correlation; this is the conditional
  // version that controls for autocorrelation — the difference between
  // "x leads y" and "x merely trends with y".) Restricted model
  // y_t ~ y_{t−1} vs full y_t ~ y_{t−1} + x_{t−1};
  // F = (n−3)·(RSS_r − RSS_f)/RSS_f. All nine sufficient statistics are
  // exact BIGINTs on the calendar grid (revenue on q314's 10⁷-cent
  // grid); centered moments C_ab = n·Σab − Σa·Σb ship exactly and every
  // derived number (Cramer 2-var slopes, RSS ratio, F) is a fixed
  // double-op dag over them + pround (§8.4).
  //
  // Scale: the corpus collapses to the calendar grid; the lag pairing
  // is one equi-join on the shifted index.
  def grangerLite(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("x"),
        expr("cast(floor(sum(cast(o_totalprice as decimal(18,2))) * 100 / 1e7) as long)")
          .as("y"))
      .withColumn("i", row_number().over(Window.orderBy(col("d"))).cast("long"))
    val cur = daily.select(col("i"), col("y"))
    val prev = daily.select((col("i") + 1L).as("i"),
      col("y").as("l"), col("x").as("xl"))
    val m = cur.join(prev, Seq("i"))
      .agg(count(lit(1)).as("n"),
        sum(col("y")).as("sy"), sum(col("l")).as("sl"), sum(col("xl")).as("sx"),
        sum(col("y") * col("l")).as("syl"), sum(col("y") * col("xl")).as("syx"),
        sum(col("l") * col("l")).as("sll"), sum(col("xl") * col("xl")).as("sxx"),
        sum(col("l") * col("xl")).as("slx"),
        sum(col("y") * col("y")).as("syy"))
    m.select(col("n"),
        expr("n * syy - sy * sy").as("cyy"),
        expr("n * sll - sl * sl").as("cll"),
        expr("n * sxx - sx * sx").as("cxx"),
        expr("n * syl - sy * sl").as("cyl"),
        expr("n * syx - sy * sx").as("cyx"),
        expr("n * slx - sl * sx").as("clx"))
      .withColumn("det", expr("cast(cll as double) * cxx - cast(clx as double) * clx"))
      .withColumn("b", expr("(cast(cyl as double) * cxx - cast(cyx as double) * clx) / det"))
      .withColumn("c", expr("(cast(cyx as double) * cll - cast(cyl as double) * clx) / det"))
      .withColumn("rss_f", expr("cast(cyy as double) - b * cyl - c * cyx"))
      .withColumn("rss_r", expr("cast(cyy as double) - (cast(cyl as double) / cll) * cyl"))
      .withColumn("f", expr("(n - 3L) * (rss_r - rss_f) / rss_f"))
      .select(col("n"), col("cyy"), col("cll"), col("cxx"), col("cyl"),
        col("cyx"), col("clx"),
        Num.pround(col("b"), 6).as("b_own6"),
        Num.pround(col("c"), 6).as("c_cross6"),
        Num.pround(col("f"), 4).as("f4"))
  }

  def q349GrangerLite(spark: SparkSession, dir: String): DataFrame =
    grangerLite(Tables.orders(spark, dir))

  val q349Sql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS x,
      |    CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 / 1e7)
      |      AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |idx AS (SELECT ROW_NUMBER() OVER (ORDER BY d) AS i, x, y FROM daily),
      |j AS (
      |  SELECT a.y AS y, b.y AS l, b.x AS xl
      |  FROM idx a JOIN idx b ON a.i = b.i + 1),
      |m AS (
      |  SELECT COUNT(*) AS n, SUM(y) AS sy, SUM(l) AS sl, SUM(xl) AS sx,
      |    SUM(y * l) AS syl, SUM(y * xl) AS syx, SUM(l * l) AS sll,
      |    SUM(xl * xl) AS sxx, SUM(l * xl) AS slx, SUM(y * y) AS syy
      |  FROM j),
      |cm AS (
      |  SELECT n,
      |    n * syy - sy * sy AS cyy, n * sll - sl * sl AS cll,
      |    n * sxx - sx * sx AS cxx, n * syl - sy * sl AS cyl,
      |    n * syx - sy * sx AS cyx, n * slx - sl * sx AS clx
      |  FROM m),
      |dd AS (
      |  SELECT *,
      |    CAST(cll AS DOUBLE) * cxx - CAST(clx AS DOUBLE) * clx AS det
      |  FROM cm),
      |bb AS (
      |  SELECT *,
      |    (CAST(cyl AS DOUBLE) * cxx - CAST(cyx AS DOUBLE) * clx) / det AS b,
      |    (CAST(cyx AS DOUBLE) * cll - CAST(cyl AS DOUBLE) * clx) / det AS c
      |  FROM dd),
      |rr AS (
      |  SELECT *,
      |    CAST(cyy AS DOUBLE) - b * cyl - c * cyx AS rss_f,
      |    CAST(cyy AS DOUBLE) - (CAST(cyl AS DOUBLE) / cll) * cyl AS rss_r
      |  FROM bb)
      |SELECT CAST(n AS BIGINT) AS n, CAST(cyy AS BIGINT) AS cyy,
      |  CAST(cll AS BIGINT) AS cll, CAST(cxx AS BIGINT) AS cxx,
      |  CAST(cyl AS BIGINT) AS cyl, CAST(cyx AS BIGINT) AS cyx,
      |  CAST(clx AS BIGINT) AS clx,
      |  FLOOR((b) * 1e6 + 0.5) / 1e6 AS b_own6,
      |  FLOOR((c) * 1e6 + 0.5) / 1e6 AS c_cross6,
      |  FLOOR(((n - 3) * (rss_r - rss_f) / rss_f) * 1e4 + 0.5) / 1e4 AS f4
      |FROM rr""".stripMargin

  // --------------------------------------------------------------------------
  // q350 — HITS HUBS & AUTHORITIES on the bipartite supplier→part
  // supply graph: eight synchronous h = Σa / a = Σh iterations with
  // L1 floor-renormalization to the 10⁶ ppm grid each half-step —
  // ENTIRELY exact fixed-point arithmetic, q340's power-iteration
  // discipline (its Markov chain is the stochastic cousin; HITS is the
  // bipartite SVD cousin). Readout: the top-10 authority parts with
  // their ppm mass — "which parts anchor the supply network". q120's
  // PageRank ranks a directed unipartite graph; HITS is the two-sided
  // ranking a procurement/recsys pipeline wants on interaction data.
  //
  // Scale: the edge list (distinct supplier→part) materializes once;
  // each half-step is one equi-join + hash aggregate over it, with
  // LAZY localCheckpoint lineage truncation per half-round. Lazy (not
  // eager) is load-bearing twice over: the checkpoint flattens the
  // logical plan to a LogicalRDD, so the hRaw/aRaw subtrees — each
  // referenced TWICE (by the ppm renormalization AND its 1-row total) —
  // don't double the plan per round (8 rounds of doubling = a 4^8 plan
  // Catalyst cannot optimize; measured: the uncheckpointed form never
  // finished at sf0.1); and eager=false collapses the 17 per-round
  // checkpoint jobs into ONE final action whose shared shuffle stages
  // dedup at the RDD level (measured 14.9 s → 5.9 s at sf0.1).
  def hits(edges: DataFrame, iters: Int, topK: Int): DataFrame = {
    val e = edges.toDF("s", "p").localCheckpoint()
    val parts = e.select(col("p")).distinct()
    val np = parts.agg(count(lit(1)).as("k"))
    var auth = parts.crossJoin(broadcast(np))
      .select(col("p"), expr("1000000L div k").as("a"))
      .localCheckpoint(false)
    for (_ <- 1 to iters) {
      val hRaw = e.join(auth, Seq("p"))
        .groupBy(col("s")).agg(sum(col("a")).as("h0"))
        .localCheckpoint(false)
      val hTot = hRaw.agg(sum(col("h0")).as("ht"))
      val hub = hRaw.crossJoin(broadcast(hTot))
        .select(col("s"), expr("(1000000L * h0) div ht").as("h"))
      val aRaw = e.join(hub, Seq("s"))
        .groupBy(col("p")).agg(sum(col("h")).as("a0"))
        .localCheckpoint(false)
      val aTot = aRaw.agg(sum(col("a0")).as("at"))
      auth = aRaw.crossJoin(broadcast(aTot))
        .select(col("p"), expr("(1000000L * a0) div at").as("a"))
    }
    auth.orderBy(col("a").desc, col("p")).limit(topK)
      .select(col("p").as("part"), col("a").as("authority_ppm"))
  }

  def q350Hits(spark: SparkSession, dir: String): DataFrame =
    hits(Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_partkey")).distinct(),
      iters = 8, topK = 10)

  val q350Sql: String = {
    def step(prev: String, i: Int): String =
      s"""h${i}_r AS MATERIALIZED (
         |  SELECT s, SUM(a) AS h0 FROM e JOIN $prev USING (p) GROUP BY s),
         |h${i}_t AS (SELECT SUM(h0) AS ht FROM h${i}_r),
         |h$i AS MATERIALIZED (
         |  SELECT s, (1000000 * h0) // ht AS h FROM h${i}_r CROSS JOIN h${i}_t),
         |a${i}_r AS MATERIALIZED (
         |  SELECT p, SUM(h) AS a0 FROM e JOIN h$i USING (s) GROUP BY p),
         |a${i}_t AS (SELECT SUM(a0) AS at FROM a${i}_r),
         |a$i AS MATERIALIZED (
         |  SELECT p, (1000000 * a0) // at AS a FROM a${i}_r CROSS JOIN a${i}_t)""".stripMargin
    val steps = (1 to 8).map(i => step(if (i == 1) "a0x" else s"a${i - 1}", i))
      .mkString(",\n|")
    s"""WITH e AS MATERIALIZED (
       |  SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
       |pp AS (SELECT DISTINCT p FROM e),
       |kk AS (SELECT COUNT(*) AS k FROM pp),
       |a0x AS (SELECT p, 1000000 // k AS a FROM pp CROSS JOIN kk),
       |$steps
       |SELECT p AS part, CAST(a AS BIGINT) AS authority_ppm
       |FROM a8 ORDER BY a DESC, p LIMIT 10""".stripMargin
  }

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q349_granger_lite", q349GrangerLite _, Some(q349Sql)),
    ("q350_hits", q350Hits _, Some(q350Sql)))
}
