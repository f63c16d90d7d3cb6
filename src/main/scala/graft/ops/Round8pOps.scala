package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 sixteenth operator batch: categorical assortativity over the
  * trade graph and deterministic span-corruption planning — graph-mixing
  * and pretraining-data surface on the §8.4 exact-integer discipline.
  */
object Round8pOps {

  // --------------------------------------------------------------------------
  // q337 — TRADE HOMOPHILY (categorical assortativity): the customer-
  // nation × supplier-nation mixing matrix over lineitem trade edges,
  // with Newman's categorical assortativity coefficient — which is
  // EXACTLY Cohen's κ on the edge-endpoint contingency (r = (Σeᵢᵢ −
  // Σaᵢbᵢ)/(1 − Σaᵢbᵢ) in edge fractions = q324's integer formula), so
  // the q324 machinery is reused verbatim and every cell stays an exact
  // BIGINT. "Do customers buy domestically" as one ppm number plus the
  // 25×25 matrix.
  //
  // Scale: one fact-scan join to the two broadcast nation-key sides,
  // then q324's grid-sized contingency math.
  def q337TradeHomophily(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"))
    val cust = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey").as("cn"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("cn"))
    val sup = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey").as("sn"))
    val labels = li
      .join(cust, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("cn").cast("long").as("a"), col("sn").cast("long").as("b"))
    Round8jOps.cohenKappa(labels)
      .withColumnRenamed("a", "cust_nation")
      .withColumnRenamed("b", "supp_nation")
      .withColumnRenamed("kappa_ppm", "homophily_ppm")
  }

  val q337Sql: String =
    """WITH lab AS (
      |  SELECT CAST(c.c_nationkey AS BIGINT) AS a,
      |    CAST(s.s_nationkey AS BIGINT) AS b
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey),
      |ct AS (SELECT a, b, COUNT(*) AS n FROM lab GROUP BY 1, 2),
      |tot AS (SELECT COUNT(*) AS nn FROM lab),
      |ra AS (SELECT a, SUM(n) AS r FROM ct GROUP BY 1),
      |sb AS (SELECT b, SUM(n) AS s FROM ct GROUP BY 1),
      |pe AS (
      |  SELECT COALESCE(SUM(r * s), 0) AS rs
      |  FROM ra JOIN sb ON ra.a = sb.b),
      |dg AS (SELECT COALESCE(SUM(n), 0) AS dg FROM ct WHERE a = b),
      |su AS (
      |  SELECT nn AS n_total,
      |    CAST((1000000 * (nn * dg - rs)) // (nn * nn - rs) AS BIGINT)
      |      AS homophily_ppm
      |  FROM tot CROSS JOIN pe CROSS JOIN dg)
      |SELECT a AS cust_nation, b AS supp_nation, CAST(n AS BIGINT) AS n,
      |  n_total, homophily_ppm
      |FROM ct CROSS JOIN su ORDER BY cust_nation, supp_nation""".stripMargin

  // --------------------------------------------------------------------------
  // q338 — SPAN-CORRUPTION MASK PLAN (T5-style): deterministically plan
  // 3-token corruption spans per document — a position starts a span
  // when its md5 draw lands in 1/20 of the hash space (≈15% token mask
  // budget), overlapping spans merge via q313's gaps-and-islands — and
  // ship each doc's exact mask accounting (span count, masked tokens,
  // ratio_ppm). Every pipeline that pretrains with denoising objectives
  // plans masks ahead of packing; md5 arithmetic keeps the plan
  // engine-portable and shardable.
  //
  // Scale: one row-local position explode (≤ tokens rows), the island
  // merge windows are partitioned BY DOC, one aggregate back to docs.
  def spanCorruptionPlan(docs: DataFrame, spanLen: Int, modulus: Int): DataFrame = {
    val pos = docs
      .select(col("doc_id"), size(TextOps.toks).as("m"))
      .filter(col("m") >= 1)
      .select(col("doc_id"), col("m"), explode(expr("sequence(1, m)")).as("p"))
    val starts = pos.filter(
      expr("cast(conv(substring(md5(concat(cast(doc_id as string), ':', " +
        s"cast(p as string))), 1, 13), 16, 10) as bigint) % $modulus") === 0)
      .select(col("doc_id"), col("m"), col("p").as("s0"),
        least(col("p") + spanLen, col("m") + 1).as("e0"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("s0"))
    val islands = starts
      .withColumn("prev_max_e",
        max(col("e0")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_max_e").isNull || col("s0") > col("prev_max_e"), 1L)
          .otherwise(0L))
      .withColumn("island",
        sum(col("new_island")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("m"), col("island"))
      .agg(min(col("s0")).as("is"), max(col("e0")).as("ie"))
    islands.groupBy(col("doc_id"), col("m"))
      .agg(count(lit(1)).as("n_spans"), sum(col("ie") - col("is")).as("masked"))
      .select(col("doc_id"), col("m").cast("long").as("n_tok"),
        col("n_spans"), col("masked"),
        expr("(1000000L * masked) div m").as("ratio_ppm"))
      .orderBy(col("doc_id"))
  }

  def q338SpanCorruption(spark: SparkSession, dir: String): DataFrame =
    spanCorruptionPlan(Tables.documents(spark, dir), spanLen = 3, modulus = 20)

  val q338Sql: String = {
    val toks = TextOps.toksSqlD
    s"""WITH d AS (
       |  SELECT doc_id, len($toks) AS m FROM documents),
       |pos AS (
       |  SELECT doc_id, m, UNNEST(generate_series(1, m)) AS p
       |  FROM d WHERE m >= 1),
       |st AS (
       |  SELECT doc_id, m, p AS s0, LEAST(p + 3, m + 1) AS e0
       |  FROM pos
       |  WHERE ('0x' || substr(md5(doc_id || ':' || p), 1, 13))::BIGINT % 20 = 0),
       |fl AS (
       |  SELECT doc_id, m, s0, e0,
       |    CASE WHEN MAX(e0) OVER (PARTITION BY doc_id ORDER BY s0
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |      OR s0 > MAX(e0) OVER (PARTITION BY doc_id ORDER BY s0
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      THEN 1 ELSE 0 END AS new_island
       |  FROM st),
       |isl AS (
       |  SELECT doc_id, m, s0, e0,
       |    SUM(new_island) OVER (PARTITION BY doc_id ORDER BY s0
       |      ROWS UNBOUNDED PRECEDING) AS island
       |  FROM fl),
       |mg AS (
       |  SELECT doc_id, m, island, MIN(s0) AS i_s, MAX(e0) AS i_e
       |  FROM isl GROUP BY 1, 2, 3)
       |SELECT doc_id, CAST(m AS BIGINT) AS n_tok, COUNT(*) AS n_spans,
       |  CAST(SUM(i_e - i_s) AS BIGINT) AS masked,
       |  CAST((1000000 * SUM(i_e - i_s)) // m AS BIGINT) AS ratio_ppm
       |FROM mg GROUP BY doc_id, m ORDER BY doc_id""".stripMargin
  }

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q337_trade_homophily", q337TradeHomophily _, Some(q337Sql)),
    ("q338_span_corruption", q338SpanCorruption _, Some(q338Sql)))
}
