package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 thirty-ninth operator batch: quantile treatment effect and
  * consistent-hash ring balance — distribution-level effect profiling
  * and placement-layer capacity audit on the §8.4 exact-integer
  * discipline.
  */
object Round8amOps {

  // --------------------------------------------------------------------------
  // q383 — QUANTILE TREATMENT EFFECT: q369's Hodges–Lehmann gives ONE
  // robust shift; the QTE profile shows WHERE the distributions differ
  // — the exact nearest-rank decile (d = 1..9) of URGENT vs LOW order
  // value and their difference, at whole-dollar resolution (the grid
  // quantum that keeps the per-group value domain bounded — q118's
  // price-domain argument). Rank picks are pure integer comparisons
  // (10·cum ≥ d·n); a uniform shift moves every decile equally, a
  // tail effect only the top — the readout an A/B mean hides.
  //
  // Scale: one (group, dollar) grid aggregate; cum windows are
  // PARTITIONED by group over the bounded price domain; the decile
  // reshape is a 9-row explode.
  def qteProfile(orders: DataFrame): DataFrame = {
    val grid = orders
      .filter(col("o_orderpriority").startsWith("1") ||
        col("o_orderpriority").startsWith("5"))
      .select(when(col("o_orderpriority").startsWith("1"), "A").otherwise("B")
          .as("g"),
        expr("cast(floor(o_totalprice + 0.5d) as bigint)").as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
    val cum = grid
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("g")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("g"))))
    def pick(d: Int) =
      min(when(col("cum") * 10 >= col("n") * d, col("v"))).as(s"d$d")
    val picks = cum.groupBy(col("g"))
      .agg(pick(1), pick(2), pick(3), pick(4), pick(5), pick(6), pick(7),
        pick(8), pick(9))
      .withColumn("x", explode(array((1 to 9).map(d =>
        struct(lit(d).as("decile"), col(s"d$d").as("q"))): _*)))
      .select(col("g"), col("x.decile").as("decile"), col("x.q").as("q"))
      .localCheckpoint()
    picks.filter(col("g") === "A")
      .select(col("decile"), col("q").as("q_urgent_dollars"))
      .join(picks.filter(col("g") === "B")
        .select(col("decile"), col("q").as("q_low_dollars")), Seq("decile"))
      .withColumn("qte_dollars", col("q_low_dollars") - col("q_urgent_dollars"))
      .orderBy(col("decile"))
  }

  def q383QteProfile(spark: SparkSession, dir: String): DataFrame =
    qteProfile(Tables.orders(spark, dir))

  val q383Sql: String = {
    val picks = (1 to 9).map(d =>
      s"MIN(CASE WHEN cum * 10 >= n * $d THEN v END) AS d$d").mkString(",\n      |    ")
    s"""WITH grid AS (
       |  SELECT CASE WHEN o_orderpriority LIKE '1%' THEN 'A' ELSE 'B' END AS g,
       |    CAST(FLOOR(o_totalprice + 0.5) AS BIGINT) AS v, COUNT(*) AS cnt
       |  FROM orders
       |  WHERE o_orderpriority LIKE '1%' OR o_orderpriority LIKE '5%'
       |  GROUP BY 1, 2),
       |cum AS (
       |  SELECT g, v, cnt,
       |    SUM(cnt) OVER (PARTITION BY g ORDER BY v ROWS UNBOUNDED PRECEDING)
       |      AS cum,
       |    SUM(cnt) OVER (PARTITION BY g) AS n
       |  FROM grid),
       |picks AS (
       |  SELECT g,
       |    $picks
       |  FROM cum GROUP BY g),
       |longp AS (
       |  SELECT g, u.decile, CASE u.decile
       |      WHEN 1 THEN d1 WHEN 2 THEN d2 WHEN 3 THEN d3 WHEN 4 THEN d4
       |      WHEN 5 THEN d5 WHEN 6 THEN d6 WHEN 7 THEN d7 WHEN 8 THEN d8
       |      ELSE d9 END AS q
       |  FROM picks, UNNEST([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS u(decile))
       |SELECT a.decile, a.q AS q_urgent_dollars, b.q AS q_low_dollars,
       |  b.q - a.q AS qte_dollars
       |FROM (SELECT decile, q FROM longp WHERE g = 'A') a
       |JOIN (SELECT decile, q FROM longp WHERE g = 'B') b USING (decile)
       |ORDER BY decile""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q384 — CONSISTENT-HASH RING BALANCE: place 8 nodes × 16 vnodes on
  // the md5 ring (the house md5-uniform idiom — engine-portable, no
  // native hash), assign every supplier key to its clockwise-next
  // vnode (wrap to the ring minimum), and ship per-node key loads with
  // the imbalance ratio — the placement-layer audit behind any
  // sharded-serving or shuffle-service sizing question. All positions
  // and loads exact BIGINTs.
  //
  // Scale: the 128-vnode table is data-independent and broadcast; key
  // assignment is one broadcast range join (×128 candidate rows per
  // key collapsed by a min aggregate), linear in keys.
  def ringBalance(keys: DataFrame, nNodes: Int, nVnodes: Int): DataFrame = {
    val spark = keys.sparkSession
    // pos is made strictly unique (pos·128 + id) so the clockwise-next
    // pick needs no tie-break convention across engines
    val vnodes = spark.range(nNodes.toLong * nVnodes)
      .select((col("id") % nNodes).as("node"),
        (expr("cast(conv(substring(md5(concat('ring:', cast(id as string))), 1, 13), 16, 10) as bigint)")
          * lit(128L) + col("id")).as("pos"))
      .localCheckpoint()
    val ringMin = vnodes.orderBy(col("pos")).limit(1)
      .select(col("node").as("wrap_node"))
    val keyed = keys.select(col("k"),
      (expr("cast(conv(substring(md5(concat('key:', cast(k as string))), 1, 13), 16, 10) as bigint)")
        * lit(128L)).as("kpos"))
    val owner = keyed.join(broadcast(vnodes), col("pos") >= col("kpos"), "left")
      .groupBy(col("k"), col("kpos"))
      .agg(min(struct(col("pos"), col("node"))).as("o"))
      .crossJoin(broadcast(ringMin))
      .select(col("k"),
        coalesce(col("o.node"), col("wrap_node")).as("node"))
    owner.groupBy(col("node")).agg(count(lit(1)).as("n_keys"))
      .crossJoin(broadcast(owner.agg(count(lit(1)).as("total"))))
      .select(col("node"), col("n_keys"),
        expr(s"(1000000L * n_keys * ${nNodes}L) div total").as("load_ppm"))
      .orderBy(col("node"))
  }

  def q384RingBalance(spark: SparkSession, dir: String): DataFrame =
    ringBalance(Tables.supplier(spark, dir)
      .select(col("s_suppkey").cast("long").as("k")), nNodes = 8, nVnodes = 16)

  val q384Sql: String =
    """WITH vn AS (
      |  SELECT i % 8 AS node,
      |    CAST(('0x' || substring(md5('ring:' || CAST(i AS VARCHAR)), 1, 13))
      |      AS BIGINT) * 128 + i AS pos
      |  FROM UNNEST(range(0, 128)) AS t(i)),
      |rmin AS (
      |  SELECT node AS wrap_node FROM vn ORDER BY pos LIMIT 1),
      |keyed AS (
      |  SELECT CAST(s_suppkey AS BIGINT) AS k,
      |    CAST(('0x' || substring(md5('key:' ||
      |      CAST(CAST(s_suppkey AS BIGINT) AS VARCHAR)), 1, 13)) AS BIGINT)
      |      * 128 AS kpos
      |  FROM supplier),
      |owner AS (
      |  SELECT k, COALESCE(arg_min(node, pos), ANY_VALUE(wrap_node)) AS node
      |  FROM keyed LEFT JOIN vn ON pos >= kpos, rmin
      |  GROUP BY k),
      |loads AS (SELECT node, COUNT(*) AS n_keys FROM owner GROUP BY 1),
      |tot AS (SELECT SUM(n_keys) AS total FROM loads)
      |SELECT node, n_keys,
      |  CAST((1000000 * n_keys * 8) // total AS BIGINT) AS load_ppm
      |FROM loads, tot ORDER BY node""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q383_qte_profile", q383QteProfile _, Some(q383Sql)),
    ("q384_ring_balance", q384RingBalance _, Some(q384Sql)))
}
