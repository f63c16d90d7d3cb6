package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 fiftieth operator batch: ABC inventory classification and
  * supply-concentration risk — the two procurement staples, on the
  * §8.4 exact-integer discipline.
  */
object Round8axOps {

  // --------------------------------------------------------------------------
  // q405 — ABC CLASSIFICATION: parts rank into A (the units carrying
  // the top ~80% of revenue), B (next ~15%) and C (the long tail) — at
  // $100 revenue-band granularity, so the classification runs on the
  // BOUNDED band grid instead of a global part sort (a per-part rank
  // window would grow with the dimension; the band histogram does
  // not). Descending cumulative share classifies each band by exact
  // cross-multiplication (100·cum vs 80·total / 95·total); per class:
  // part count, revenue cents, exact share ppm. The skew census behind
  // every cycle-count policy.
  //
  // Scale: one part-revenue aggregate, one band histogram, one cum
  // window over the ≤ price-domain band grid.
  def abcClassification(lineitem: DataFrame): DataFrame = {
    val perPart = lineitem
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(expr("cast(floor(l_extendedprice * 100 + 0.5d) as bigint)"))
        .as("rev"))
    val bands = perPart.groupBy(expr("rev div 10000L").as("band"))
      .agg(count(lit(1)).as("n_parts"), sum(col("rev")).as("rev"))
    val tot = bands.agg(sum(col("rev")).as("t"))
    val classed = bands.crossJoin(broadcast(tot))
      .withColumn("cum", sum(col("rev")).over(
        Window.orderBy(col("band").desc)
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cls",
        when(col("cum") * 100 <= col("t") * 80, "A")
          .when(col("cum") * 100 <= col("t") * 95, "B")
          .otherwise("C"))
    classed.groupBy(col("cls"))
      .agg(sum(col("n_parts")).as("n_parts"), sum(col("rev")).as("rev_cents"),
        first(col("t")).as("t"))
      .select(col("cls"), col("n_parts"), col("rev_cents"),
        expr("(1000000L * rev_cents) div t").as("rev_share_ppm"))
      .orderBy(col("cls"))
  }

  def q405AbcClassification(spark: SparkSession, dir: String): DataFrame =
    abcClassification(Tables.lineitem(spark, dir))

  val q405Sql: String =
    """WITH perpart AS (
      |  SELECT l_partkey AS pk,
      |    SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS rev
      |  FROM lineitem GROUP BY 1),
      |bands AS (
      |  SELECT rev // 10000 AS band, COUNT(*) AS n_parts, SUM(rev) AS rev
      |  FROM perpart GROUP BY 1),
      |tot AS (SELECT SUM(rev) AS t FROM bands),
      |classed AS (
      |  SELECT n_parts, rev, t,
      |    CASE WHEN SUM(rev) OVER (ORDER BY band DESC
      |        ROWS UNBOUNDED PRECEDING) * 100 <= t * 80 THEN 'A'
      |      WHEN SUM(rev) OVER (ORDER BY band DESC
      |        ROWS UNBOUNDED PRECEDING) * 100 <= t * 95 THEN 'B'
      |      ELSE 'C' END AS cls
      |  FROM bands, tot)
      |SELECT cls, CAST(SUM(n_parts) AS BIGINT) AS n_parts,
      |  CAST(SUM(rev) AS BIGINT) AS rev_cents,
      |  CAST((1000000 * SUM(rev)) // ANY_VALUE(t) AS BIGINT)
      |    AS rev_share_ppm
      |FROM classed GROUP BY cls ORDER BY cls""".stripMargin

  // --------------------------------------------------------------------------
  // q406 — SUPPLY CONCENTRATION: per part, how much of its revenue
  // runs through its single largest supplier (top_share_ppm — the
  // exact per-part analogue of q304's market-level HHI). Ships the
  // top-10 most supplier-concentrated parts (deterministic rank:
  // revenue desc, suppkey asc inside each part; share desc, part asc
  // across parts) with the global census columns — part count,
  // single-source count (the hard failure mode), and the exact mean
  // top-share — riding on every row. The procurement-risk readout
  // beside q163 (integrity) and q304 (HHI).
  //
  // Scale: one (part, supplier) aggregate; the per-part argmax is a
  // window PARTITIONED by part; census is one broadcast row.
  def supplyConcentration(lineitem: DataFrame): DataFrame = {
    val ps = lineitem.groupBy(col("l_partkey").as("pk"),
        col("l_suppkey").as("sk"))
      .agg(sum(expr("cast(floor(l_extendedprice * 100 + 0.5d) as bigint)"))
        .as("rev"))
      .localCheckpoint()
    val top = ps
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("pk"))
          .orderBy(col("rev").desc, col("sk"))))
      .withColumn("n_supp", count(lit(1)).over(
        Window.partitionBy(col("pk"))))
      .withColumn("tot", sum(col("rev")).over(Window.partitionBy(col("pk"))))
      .filter(col("rn") === 1)
      .select(col("pk"), col("sk").as("top_suppkey"), col("n_supp"),
        expr("(1000000L * rev) div tot").as("top_share_ppm"))
      .localCheckpoint()
    val census = top.agg(count(lit(1)).as("n_parts"),
      count_if(col("n_supp") === 1L).as("single_source_parts"),
      expr("sum(top_share_ppm) div count(1)").as("mean_top_share_ppm"))
    top.crossJoin(broadcast(census))
      .orderBy(col("top_share_ppm").desc, col("pk"))
      .limit(10)
      .select(col("pk").as("partkey"), col("top_suppkey"), col("n_supp"),
        col("top_share_ppm"), col("n_parts"), col("single_source_parts"),
        col("mean_top_share_ppm"))
  }

  def q406SupplyConcentration(spark: SparkSession, dir: String): DataFrame =
    supplyConcentration(Tables.lineitem(spark, dir))

  val q406Sql: String =
    """WITH ps AS (
      |  SELECT l_partkey AS pk, l_suppkey AS sk,
      |    SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS rev
      |  FROM lineitem GROUP BY 1, 2),
      |ranked AS (
      |  SELECT pk, sk, rev,
      |    ROW_NUMBER() OVER (PARTITION BY pk ORDER BY rev DESC, sk) AS rn,
      |    COUNT(*) OVER (PARTITION BY pk) AS n_supp,
      |    SUM(rev) OVER (PARTITION BY pk) AS tot
      |  FROM ps),
      |top AS (
      |  SELECT pk, sk AS top_suppkey, n_supp,
      |    (1000000 * rev) // tot AS top_share_ppm
      |  FROM ranked WHERE rn = 1),
      |census AS (
      |  SELECT COUNT(*) AS n_parts,
      |    COUNT(*) FILTER (n_supp = 1) AS single_source_parts,
      |    SUM(top_share_ppm) // COUNT(*) AS mean_top_share_ppm
      |  FROM top)
      |SELECT pk AS partkey, top_suppkey, CAST(n_supp AS BIGINT) AS n_supp,
      |  CAST(top_share_ppm AS BIGINT) AS top_share_ppm,
      |  n_parts, CAST(single_source_parts AS BIGINT) AS single_source_parts,
      |  CAST(mean_top_share_ppm AS BIGINT) AS mean_top_share_ppm
      |FROM top, census ORDER BY top_share_ppm DESC, pk LIMIT 10""".stripMargin


  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q405_abc_classification", q405AbcClassification _, Some(q405Sql)),
    ("q406_supply_concentration", q406SupplyConcentration _, Some(q406Sql)))
}
