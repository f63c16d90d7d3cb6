package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-8 twenty-ninth operator batch: Jonckheere–Terpstra ordered
  * trend test and a t-closeness privacy audit — ordered-alternative
  * inference and distribution-level disclosure control on the §8.4
  * exact-integer discipline.
  */
object Round8acOps {

  // --------------------------------------------------------------------------
  // q363 — JONCKHEERE–TERPSTRA ORDERED TREND: do urgent orders actually
  // ship sooner? Groups = the 5 ordered o_orderpriority classes,
  // values = ship latency in days (l_shipdate − o_orderdate, a bounded
  // ~122-value grid). JT = Σ_{i<j} U_ij needs every cross-group pair —
  // computed EXACTLY on the (group, latency) histogram self-join
  // (5×122 cells, broadcast), in ×4 units so tie halves stay integer:
  // jt_x4 = Σ 2·c_i(u)·c_j(v)·(2·[u<v] + [u=v]). The
  // tie-corrected Hollander–Wolfe variance is assembled from seven
  // exact DECIMAL(38,0) component sums (A..G below) with ONE fixed
  // double dag + pround for z. Unlike q341 (Kruskal–Wallis: ANY
  // difference) this tests the MONOTONE alternative, which is what an
  // SLA question actually asks.
  //
  // Scale: one orderkey-shuffle join collapses to the bounded
  // histogram; everything after is grid algebra on ≤ 610 rows.
  /** JT over rows (g ordered group, v bounded discrete value). */
  def histJt(rows: DataFrame): DataFrame = {
    val hist = rows.groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val jt = hist.as("a").join(hist.as("b"), col("a.g") < col("b.g"))
      .agg(sum(expr(
        """cast(a.c as decimal(38,0)) * b.c *
          | (2L * (case when a.v < b.v then 2L
          |             when a.v = b.v then 1L else 0L end))"""
        .stripMargin)).as("jt_x4"))
    val grp = hist.groupBy(col("g")).agg(sum(col("c")).as("ni"))
      .agg(sum(col("ni")).as("n"),
        count(lit(1)).as("k"),
        sum(col("ni") * col("ni")).as("sum_ni2"),
        sum(expr("cast(ni as decimal(38,0)) * (ni - 1L) * (2L * ni + 5L)"))
          .as("b_comp"),
        sum(expr("cast(ni as decimal(38,0)) * (ni - 1L) * (ni - 2L)"))
          .as("d_comp"),
        sum(expr("cast(ni as decimal(38,0)) * (ni - 1L)")).as("f_comp"))
    val ties = hist.groupBy(col("v")).agg(sum(col("c")).as("tv"))
      .agg(sum(expr("cast(tv as decimal(38,0)) * (tv - 1L) * (2L * tv + 5L)"))
          .as("c_comp"),
        sum(expr("cast(tv as decimal(38,0)) * (tv - 1L) * (tv - 2L)"))
          .as("e_comp"),
        sum(expr("cast(tv as decimal(38,0)) * (tv - 1L)")).as("g_comp"))
    jt.crossJoin(broadcast(grp)).crossJoin(broadcast(ties))
      .withColumn("e_jt_x4",
        expr("cast(n as decimal(38,0)) * n - sum_ni2"))
      .withColumn("a_comp",
        expr("cast(n as decimal(38,0)) * (n - 1L) * (2L * n + 5L)"))
      .withColumn("var_d", expr(
        """cast(a_comp - b_comp - c_comp as double) / 72.0d
          | + cast(d_comp * e_comp as double)
          |   / cast(36L * (cast(n as decimal(38,0)) * (n - 1L) * (n - 2L)) as double)
          | + cast(f_comp * g_comp as double)
          |   / cast(8L * (cast(n as decimal(38,0)) * (n - 1L)) as double)"""
        .stripMargin))
      .select(col("n"), col("k").as("n_groups"),
        col("jt_x4").cast("long").as("jt_x4"),
        col("e_jt_x4").cast("long").as("e_jt_x4"),
        Num.pround(expr("cast(jt_x4 - e_jt_x4 as double)")
          / (lit(4.0) * sqrt(col("var_d"))), 6).as("z6"))
  }

  /** JT via per-group prefix sums on the pooled value grid — the scale
    * path for the fixed g ∈ 1..5 catalog query. The real latency grid
    * carries ~24k (g, v) cells, so histJt's non-equi pair join would
    * evaluate ~230M cell pairs; telescoping U_ij = Σ_v c_j(v)·(2·cum_i(<v)
    * + c_i(v)) turns that into ONE window over the ≤~5k-value grid with a
    * row-local 25-term dag (q353's prefix-sum collapse). Output and
    * numerics identical to histJt (the spec pins equality on fixtures).
    */
  def pooledJt5(rows: DataFrame): DataFrame = {
    def cg(i: Int) = count_if(col("g") === i.toLong).as(s"c$i")
    val grid = rows.groupBy(col("v"))
      .agg(cg(1), cg(2), cg(3), cg(4), cg(5))
      .localCheckpoint()
    val wlt = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = (1 to 5).foldLeft(grid) { (df, i) =>
      df.withColumn(s"m$i", coalesce(sum(col(s"c$i")).over(wlt), lit(0L)))
    }
    val jtTerm = (2 to 5).map { j =>
      val low = (1 until j).map(i => s"m$i").mkString(" + ")
      val eq = (1 until j).map(i => s"c$i").mkString(" + ")
      s"cast(c$j as decimal(38,0)) * (4L * ($low) + 2L * ($eq))"
    }.mkString(" + ")
    val jt = cum.agg(sum(expr(jtTerm)).as("jt_x4"))
    val grp = grid.agg(sum(col("c1")).as("n1"),
      (2 to 5).map(i => sum(col(s"c$i")).as(s"n$i")): _*)
    val comps = grp.select(
      expr((1 to 5).map(i => s"n$i").mkString(" + ")).as("n"),
      expr((1 to 5).map(i => s"(case when n$i > 0 then 1L else 0L end)")
        .mkString(" + ")).as("k"),
      expr((1 to 5).map(i => s"n$i * n$i").mkString(" + ")).as("sum_ni2"),
      expr((1 to 5).map(i =>
        s"cast(n$i as decimal(38,0)) * (n$i - 1L) * (2L * n$i + 5L)")
        .mkString(" + ")).as("b_comp"),
      expr((1 to 5).map(i =>
        s"cast(n$i as decimal(38,0)) * (n$i - 1L) * (n$i - 2L)")
        .mkString(" + ")).as("d_comp"),
      expr((1 to 5).map(i => s"cast(n$i as decimal(38,0)) * (n$i - 1L)")
        .mkString(" + ")).as("f_comp"))
    val ties = grid
      .select(expr("c1 + c2 + c3 + c4 + c5").as("tv"))
      .agg(sum(expr("cast(tv as decimal(38,0)) * (tv - 1L) * (2L * tv + 5L)"))
          .as("c_comp"),
        sum(expr("cast(tv as decimal(38,0)) * (tv - 1L) * (tv - 2L)"))
          .as("e_comp"),
        sum(expr("cast(tv as decimal(38,0)) * (tv - 1L)")).as("g_comp"))
    jt.crossJoin(broadcast(comps)).crossJoin(broadcast(ties))
      .withColumn("e_jt_x4",
        expr("cast(n as decimal(38,0)) * n - sum_ni2"))
      .withColumn("a_comp",
        expr("cast(n as decimal(38,0)) * (n - 1L) * (2L * n + 5L)"))
      .withColumn("var_d", expr(
        """cast(a_comp - b_comp - c_comp as double) / 72.0d
          | + cast(d_comp * e_comp as double)
          |   / cast(36L * (cast(n as decimal(38,0)) * (n - 1L) * (n - 2L)) as double)
          | + cast(f_comp * g_comp as double)
          |   / cast(8L * (cast(n as decimal(38,0)) * (n - 1L)) as double)"""
        .stripMargin))
      .select(col("n").cast("long").as("n"), col("k").cast("long").as("n_groups"),
        col("jt_x4").cast("long").as("jt_x4"),
        col("e_jt_x4").cast("long").as("e_jt_x4"),
        Num.pround(expr("cast(jt_x4 - e_jt_x4 as double)")
          / (lit(4.0) * sqrt(col("var_d"))), 6).as("z6"))
  }

  def q363Jonckheere(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_shipdate"))
    val hist = li
      .join(o.withColumnRenamed("o_orderkey", "ok"), Seq("ok"))
      .select(substring(col("o_orderpriority"), 1, 1).cast("long").as("g"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("v"))
    pooledJt5(hist)
  }

  val q363Sql: String = {
    val cs = (1 to 5).map(i => s"COUNT(*) FILTER (g = $i) AS c$i")
      .mkString(", ")
    val ms = (1 to 5).map(i =>
      s"""COALESCE(SUM(c$i) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS m$i"""
        .stripMargin).mkString(",\n      |    ")
    val jtTerm = (2 to 5).map { j =>
      val low = (1 until j).map(i => s"m$i").mkString(" + ")
      val eq = (1 until j).map(i => s"c$i").mkString(" + ")
      s"c$j::HUGEINT * (4 * ($low) + 2 * ($eq))"
    }.mkString("\n      |    + ")
    s"""WITH rows_ AS (
       |  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS g,
       |    date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS v
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |grid AS (
       |  SELECT v, $cs FROM rows_ GROUP BY 1),
       |cum AS (
       |  SELECT v, c1, c2, c3, c4, c5,
       |    $ms
       |  FROM grid),
       |jt AS (
       |  SELECT SUM($jtTerm) AS jt_x4
       |  FROM cum),
       |grp AS (
       |  SELECT ${(1 to 5).map(i => s"SUM(c$i) AS n$i").mkString(", ")}
       |  FROM grid),
       |comps AS (
       |  SELECT ${(1 to 5).map(i => s"n$i").mkString(" + ")} AS n,
       |    ${(1 to 5).map(i => s"(CASE WHEN n$i > 0 THEN 1 ELSE 0 END)")
            .mkString(" + ")} AS k,
       |    ${(1 to 5).map(i => s"n$i * n$i").mkString(" + ")} AS sum_ni2,
       |    ${(1 to 5).map(i => s"n$i::HUGEINT * (n$i - 1) * (2 * n$i + 5)")
            .mkString(" + ")} AS b_comp,
       |    ${(1 to 5).map(i => s"n$i::HUGEINT * (n$i - 1) * (n$i - 2)")
            .mkString(" + ")} AS d_comp,
       |    ${(1 to 5).map(i => s"n$i::HUGEINT * (n$i - 1)")
            .mkString(" + ")} AS f_comp
       |  FROM grp),
       |ties AS (
       |  SELECT SUM(tv::HUGEINT * (tv - 1) * (2 * tv + 5)) AS c_comp,
       |    SUM(tv::HUGEINT * (tv - 1) * (tv - 2)) AS e_comp,
       |    SUM(tv::HUGEINT * (tv - 1)) AS g_comp
       |  FROM (SELECT c1 + c2 + c3 + c4 + c5 AS tv FROM grid)),
       |d AS (
       |  SELECT n, k, jt_x4,
       |    n::HUGEINT * n - sum_ni2 AS e_jt_x4,
       |    CAST(n::HUGEINT * (n - 1) * (2 * n + 5) - b_comp - c_comp AS DOUBLE) / 72.0
       |      + CAST(d_comp * e_comp AS DOUBLE)
       |        / CAST(36 * (n::HUGEINT * (n - 1) * (n - 2)) AS DOUBLE)
       |      + CAST(f_comp * g_comp AS DOUBLE)
       |        / CAST(8 * (n::HUGEINT * (n - 1)) AS DOUBLE) AS var_d
       |  FROM jt, comps, ties)
       |SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS n_groups,
       |  CAST(jt_x4 AS BIGINT) AS jt_x4, CAST(e_jt_x4 AS BIGINT) AS e_jt_x4,
       |  FLOOR((CAST(jt_x4 - e_jt_x4 AS DOUBLE) / (4.0 * sqrt(var_d))) * 1e6 + 0.5)
       |    / 1e6 AS z6
       |FROM d""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q364 — T-CLOSENESS AUDIT: q351's l-diversity counts distinct
  // sensitive values, but a group can be "diverse" while its
  // DISTRIBUTION still leaks (all-rich vs all-poor neighborhoods).
  // t-closeness bounds the ordered earth-mover distance between each
  // QI group's sensitive distribution and the global one; over k
  // ordered $1000 balance bands (exact cents arithmetic — no float
  // banding) EMD = (1/(k−1))·Σ_i |cum_g(i)/n_g − cum(i)/N|, shipped as
  // the exact cross-multiplied floor
  //   t_ppm = (10⁶·Σ_i |cum_g(i)·N − cum(i)·n_g|) div ((k−1)·n_g·N).
  // The release gate pairs with q351 and q180 as the third rung of the
  // privacy ladder.
  //
  // Scale: one (QI, band) aggregate; the dense QI×band grid is the
  // bounded 125×11 cross (broadcast fill); cum windows partition BY
  // GROUP over ≤ 11 rows each.
  def tCloseness(customer: DataFrame, tPpm: Long): DataFrame = {
    val banded = customer.select(
      col("c_nationkey").cast("long").as("nation"),
      col("c_mktsegment").as("segment"),
      expr("(cast(floor(c_acctbal * 100 + 0.5d) as bigint) + 100000L) div 100000L")
        .as("band"))
    val cell = banded.groupBy(col("nation"), col("segment"), col("band"))
      .agg(count(lit(1)).as("cn")).localCheckpoint()
    val groups = cell.select(col("nation"), col("segment")).distinct()
    val bands = cell.select(col("band")).distinct()
    val nBands = bands.agg(count(lit(1)).as("k"))
    val dense = groups.crossJoin(bands)
      .join(cell, Seq("nation", "segment", "band"), "left")
      .withColumn("cn", coalesce(col("cn"), lit(0L)))
    val wg = Window.partitionBy(col("nation"), col("segment"))
      .orderBy(col("band")).rowsBetween(Window.unboundedPreceding, 0)
    val cum = dense.withColumn("cum_g", sum(col("cn")).over(wg))
    val glob = dense.groupBy(col("band")).agg(sum(col("cn")).as("nb"))
      .withColumn("cum_all", sum(col("nb")).over(
        Window.orderBy(col("band")).rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("band"), col("cum_all"))
    val tot = cell.agg(sum(col("cn")).as("nn"))
    val gn = cell.groupBy(col("nation"), col("segment"))
      .agg(sum(col("cn")).as("n_g"))
    cum.select(col("nation"), col("segment"), col("band"), col("cum_g"))
      .join(broadcast(glob), Seq("band"))
      .join(broadcast(gn), Seq("nation", "segment"))
      .crossJoin(broadcast(tot))
      .crossJoin(broadcast(nBands))
      .groupBy(col("nation"), col("segment"))
      .agg(first(col("n_g")).as("n_g"),
        first(col("nn")).as("nn"), first(col("k")).as("k"),
        sum(abs(expr("cast(cum_g as decimal(38,0)) * nn - cum_all * n_g")
          .cast(DecimalType(38, 0)))).as("emd_num"))
      .select(col("nation"), col("segment"), col("n_g"),
        expr("""cast((cast(1000000 as decimal(38,0)) * emd_num)
               | div ((k - 1L) * (cast(n_g as decimal(38,0)) * nn)) as bigint)"""
          .stripMargin).as("t_ppm"))
      .withColumn("t_ok", col("t_ppm") <= tPpm)
      .orderBy(col("nation"), col("segment"))
  }

  def q364TCloseness(spark: SparkSession, dir: String): DataFrame =
    tCloseness(Tables.customer(spark, dir), tPpm = 200000L)

  val q364Sql: String =
    """WITH banded AS (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment,
      |    (CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) + 100000) // 100000 AS band
      |  FROM customer),
      |cell AS (
      |  SELECT nation, segment, band, COUNT(*) AS cn
      |  FROM banded GROUP BY 1, 2, 3),
      |dense AS (
      |  SELECT g.nation, g.segment, b.band, COALESCE(cell.cn, 0) AS cn
      |  FROM (SELECT DISTINCT nation, segment FROM cell) g
      |  CROSS JOIN (SELECT DISTINCT band FROM cell) b
      |  LEFT JOIN cell ON cell.nation = g.nation AND cell.segment = g.segment
      |    AND cell.band = b.band),
      |cum AS (
      |  SELECT nation, segment, band, cn,
      |    SUM(cn) OVER (PARTITION BY nation, segment ORDER BY band
      |      ROWS UNBOUNDED PRECEDING) AS cum_g
      |  FROM dense),
      |gcum AS (
      |  SELECT band, SUM(nb) OVER (ORDER BY band ROWS UNBOUNDED PRECEDING)
      |    AS cum_all
      |  FROM (SELECT band, SUM(cn) AS nb FROM dense GROUP BY 1)),
      |tot AS (SELECT SUM(cn) AS nn FROM cell),
      |nb AS (SELECT COUNT(DISTINCT band) AS k FROM cell),
      |gn AS (SELECT nation, segment, SUM(cn) AS n_g FROM cell GROUP BY 1, 2),
      |emd AS (
      |  SELECT cum.nation, cum.segment, CAST(ANY_VALUE(n_g) AS BIGINT) AS n_g,
      |    CAST((1000000::HUGEINT
      |        * SUM(ABS(cum_g::HUGEINT * nn - cum_all * n_g)))
      |      // ((k - 1) * ANY_VALUE(n_g)::HUGEINT * nn) AS BIGINT) AS t_ppm
      |  FROM cum JOIN gcum USING (band)
      |    JOIN gn ON gn.nation = cum.nation AND gn.segment = cum.segment,
      |    tot, nb
      |  GROUP BY cum.nation, cum.segment, nn, k)
      |SELECT nation, segment, n_g, t_ppm, t_ppm <= 200000 AS t_ok
      |FROM emd ORDER BY nation, segment""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q363_jonckheere", q363Jonckheere _, Some(q363Sql)),
    ("q364_t_closeness", q364TCloseness _, Some(q364Sql)))
}
