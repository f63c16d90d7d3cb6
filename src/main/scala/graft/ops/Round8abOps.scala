package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 twenty-eighth operator batch: Cochran's Q over k paired
  * binary gates and functional-dependency discovery — filter governance
  * and schema profiling on the §8.4 exact-integer discipline.
  */
object Round8abOps {

  // --------------------------------------------------------------------------
  // q361 — COCHRAN'S Q TEST: q342's McNemar generalized from 2 paired
  // gates to k = 3 — do the word-count floor, the mean-word-length
  // band, and the max-token-length cap (Gopher's three cheapest gates)
  // pass the SAME documents, or do they measure different things?
  // Blocks = docs, treatments = gates;
  //   Q = (k−1)·(k·ΣG_j² − T²) / (k·T − ΣL_i²)
  // with column totals G_j, row totals L_i, T = ΣL — every term an
  // exact integer, numerator in DECIMAL(38,0) (G² crosses 10¹³ at
  // warehouse scale ×2e6 scaling), shipped as q_ppm with a NULL guard
  // for the all-concordant degenerate corpus.
  //
  // Scale: one row-local token pass, one 6-counter global aggregate —
  // q342's shape exactly; nothing shuffles but the counters.
  def cochranQ(docs: DataFrame): DataFrame =
    docs
      .select(expr("filter(split(lower(text), ' '), t -> t != '')").as("t"))
      .select(size(col("t")).cast("long").as("wc"),
        expr("aggregate(t, 0L, (a, x) -> a + length(x))").as("sumlen"),
        expr("aggregate(t, 0L, (a, x) -> greatest(a, length(x)))").as("maxlen"))
      .select(when(col("wc") >= 50L, 1L).otherwise(0L).as("x1"),
        when(col("sumlen") >= lit(3L) * col("wc") &&
          col("sumlen") <= lit(10L) * col("wc"), 1L).otherwise(0L).as("x2"),
        when(col("maxlen") >= 1L && col("maxlen") <= 20L, 1L).otherwise(0L)
          .as("x3"))
      .withColumn("l", col("x1") + col("x2") + col("x3"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("x1")).as("g1"), sum(col("x2")).as("g2"),
        sum(col("x3")).as("g3"),
        sum(col("l")).as("t_total"),
        sum(col("l") * col("l")).as("sum_l2"))
      .select(col("n_docs"), col("g1"), col("g2"), col("g3"),
        col("t_total"), col("sum_l2"),
        when(lit(3L) * col("t_total") - col("sum_l2") === 0L, lit(null))
          .otherwise(expr(
            """cast((cast(1000000 as decimal(38,0)) * 2L
              |  * (3L * (g1 * g1 + g2 * g2 + g3 * g3) - t_total * t_total))
              | div (3L * t_total - sum_l2) as bigint)""".stripMargin))
          .as("q_ppm"))

  def q361CochranQ(spark: SparkSession, dir: String): DataFrame =
    cochranQ(Tables.documents(spark, dir))

  val q361Sql: String =
    s"""WITH f AS (
       |  SELECT len(t) AS wc,
       |    COALESCE(list_sum(list_transform(t, x -> length(x))), 0) AS sumlen,
       |    COALESCE(list_max(list_transform(t, x -> length(x))), 0) AS maxlen
       |  FROM (SELECT ${TextOps.toksSqlD} AS t FROM documents)),
       |p AS (
       |  SELECT CASE WHEN wc >= 50 THEN 1 ELSE 0 END AS x1,
       |    CASE WHEN sumlen >= 3 * wc AND sumlen <= 10 * wc THEN 1 ELSE 0 END AS x2,
       |    CASE WHEN maxlen >= 1 AND maxlen <= 20 THEN 1 ELSE 0 END AS x3
       |  FROM f),
       |a AS (
       |  SELECT COUNT(*) AS n_docs, SUM(x1) AS g1, SUM(x2) AS g2,
       |    SUM(x3) AS g3, SUM(x1 + x2 + x3) AS t_total,
       |    SUM((x1 + x2 + x3) * (x1 + x2 + x3)) AS sum_l2
       |  FROM p)
       |SELECT n_docs, CAST(g1 AS BIGINT) AS g1, CAST(g2 AS BIGINT) AS g2,
       |  CAST(g3 AS BIGINT) AS g3, CAST(t_total AS BIGINT) AS t_total,
       |  CAST(sum_l2 AS BIGINT) AS sum_l2,
       |  CASE WHEN 3 * t_total - sum_l2 = 0 THEN NULL
       |    ELSE CAST((1000000::HUGEINT * 2
       |        * (3 * (g1 * g1 + g2 * g2 + g3 * g3) - t_total * t_total))
       |      // (3 * t_total - sum_l2) AS BIGINT) END AS q_ppm
       |FROM a""".stripMargin

  // --------------------------------------------------------------------------
  // q362 — FUNCTIONAL-DEPENDENCY DISCOVERY: for each declared candidate
  // A→B, the minimal-repair violation count Σ_a (n_a − max_b n_ab) —
  // rows that must change for the dependency to hold exactly — plus the
  // determinant-group census. The schema-profiling readout q291's
  // per-column profile can't see (it needs the PAIR distribution);
  // feeds normalization, dictionary-encoding (q293), and data-quality
  // gates. The panel mixes near-keys (p_name→p_brand), conditional
  // FDs (returnflag→linestatus), and independent pairs, so every
  // verdict path is exercised.
  //
  // Scale: per pair, one (A,B) hash aggregate then an A-grouped
  // reduction — both bounded by the pair's distinct count, never wider
  // than the scan; pairs union trivially (independent stages).
  def fdAudit(df: DataFrame, fdName: String, det: String, dep: String)
  : DataFrame =
    df.groupBy(col(det).as("a"), col(dep).as("b"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("a"))
      .agg(sum(col("c")).as("na"), max(col("c")).as("maxc"),
        count(lit(1)).as("nb"))
      .agg(sum(col("na")).as("n_rows"),
        count(lit(1)).as("n_det_groups"),
        count_if(col("nb") > 1L).as("violating_groups"),
        sum(col("na") - col("maxc")).as("violating_rows"))
      .select(lit(fdName).as("fd"), col("n_rows"), col("n_det_groups"),
        col("violating_groups"), col("violating_rows"),
        expr("(1000000L * violating_rows) div n_rows").as("violation_ppm"),
        (col("violating_rows") === 0L).as("holds"))

  def q362FdDiscovery(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
    fdAudit(part, "part.p_name->p_brand", "p_name", "p_brand")
      .unionByName(fdAudit(part, "part.p_brand->p_size", "p_brand", "p_size"))
      .unionByName(fdAudit(li, "lineitem.l_returnflag->l_linestatus",
        "l_returnflag", "l_linestatus"))
      .unionByName(fdAudit(cust, "customer.c_mktsegment->c_nationkey",
        "c_mktsegment", "c_nationkey"))
      .unionByName(fdAudit(ord, "orders.o_orderpriority->o_orderstatus",
        "o_orderpriority", "o_orderstatus"))
      .orderBy(col("fd"))
  }

  private def fdSql(fdName: String, table: String, det: String, dep: String)
  : String =
    s"""SELECT '$fdName' AS fd, CAST(SUM(na) AS BIGINT) AS n_rows,
       |  COUNT(*) AS n_det_groups,
       |  COUNT(*) FILTER (nb > 1) AS violating_groups,
       |  CAST(SUM(na - maxc) AS BIGINT) AS violating_rows,
       |  CAST((1000000 * SUM(na - maxc)) // SUM(na) AS BIGINT) AS violation_ppm,
       |  SUM(na - maxc) = 0 AS holds
       |FROM (
       |  SELECT a, SUM(c) AS na, MAX(c) AS maxc, COUNT(*) AS nb
       |  FROM (SELECT $det AS a, $dep AS b, COUNT(*) AS c
       |        FROM $table GROUP BY 1, 2)
       |  GROUP BY 1)""".stripMargin

  val q362Sql: String = Seq(
    fdSql("part.p_name->p_brand", "part", "p_name", "p_brand"),
    fdSql("part.p_brand->p_size", "part", "p_brand", "p_size"),
    fdSql("lineitem.l_returnflag->l_linestatus", "lineitem",
      "l_returnflag", "l_linestatus"),
    fdSql("customer.c_mktsegment->c_nationkey", "customer",
      "c_mktsegment", "c_nationkey"),
    fdSql("orders.o_orderpriority->o_orderstatus", "orders",
      "o_orderpriority", "o_orderstatus"))
    .mkString("", "\nUNION ALL\n", "\nORDER BY fd")

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q361_cochran_q", q361CochranQ _, Some(q361Sql)),
    ("q362_fd_discovery", q362FdDiscovery _, Some(q362Sql)))
}
