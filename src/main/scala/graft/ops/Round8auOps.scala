package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 forty-seventh operator batch: boilerplate template census
  * and price-endings forensic — cross-doc template detection and
  * digit-distribution auditing on the §8.4 exact-integer discipline.
  */
object Round8auOps {

  // --------------------------------------------------------------------------
  // q399 — TEMPLATE CENSUS: boilerplate generators leave families of
  // documents sharing an identical opening; grouping on the exact
  // first-8-token key finds them without any similarity join at all —
  // the cheapest dedup signal in the stack (q73 sees WITHIN-doc
  // repetition, q371 tail→head continuation, q31 fuzzy pairs; this is
  // the exact-prefix family detector). Ships the top-15 template
  // families (size, distinct sources, share of the eligible corpus)
  // plus the family-count census columns on every row.
  //
  // Scale: one row-local prefix key + two hash aggregates; never a
  // pair join.
  def templateCensus(docs: DataFrame, minFamily: Long): DataFrame = {
    val keyed = docs.select(col("doc_id"), col("source"),
        TextOps.toks.as("t"))
      .filter(size(col("t")) >= 8)
      .select(col("doc_id"), col("source"),
        expr("array_join(slice(t, 1, 8), ' ')").as("tpl"))
      .localCheckpoint()
    val fams = keyed.groupBy(col("tpl"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"))
    val census = fams.agg(sum(col("n_docs")).as("n_eligible"),
      count_if(col("n_docs") >= minFamily).as("n_families"),
      sum(when(col("n_docs") >= minFamily, col("n_docs")).otherwise(0L))
        .as("docs_in_families"))
    fams.filter(col("n_docs") >= minFamily)
      .crossJoin(broadcast(census))
      .withColumn("share_ppm", expr("(1000000L * n_docs) div n_eligible"))
      .orderBy(col("n_docs").desc, col("tpl"))
      .limit(15)
      .select(col("tpl"), col("n_docs"), col("n_sources"), col("share_ppm"),
        col("n_eligible"), col("n_families"), col("docs_in_families"))
  }

  def q399TemplateCensus(spark: SparkSession, dir: String): DataFrame =
    templateCensus(Tables.documents(spark, dir), minFamily = 2L)

  val q399Sql: String =
    s"""WITH keyed AS (
       |  SELECT doc_id, source, array_to_string(list_slice(t, 1, 8), ' ')
       |    AS tpl
       |  FROM (SELECT doc_id, source, ${TextOps.toksSqlD} AS t FROM documents)
       |  WHERE len(t) >= 8),
       |fams AS (
       |  SELECT tpl, COUNT(*) AS n_docs,
       |    COUNT(DISTINCT source) AS n_sources
       |  FROM keyed GROUP BY 1),
       |census AS (
       |  SELECT SUM(n_docs) AS n_eligible,
       |    COUNT(*) FILTER (n_docs >= 2) AS n_families,
       |    SUM(CASE WHEN n_docs >= 2 THEN n_docs ELSE 0 END)
       |      AS docs_in_families
       |  FROM fams)
       |SELECT tpl, n_docs, CAST(n_sources AS BIGINT) AS n_sources,
       |  CAST((1000000 * n_docs) // n_eligible AS BIGINT) AS share_ppm,
       |  CAST(n_eligible AS BIGINT) AS n_eligible,
       |  CAST(n_families AS BIGINT) AS n_families,
       |  CAST(docs_in_families AS BIGINT) AS docs_in_families
       |FROM fams, census WHERE n_docs >= 2
       |ORDER BY n_docs DESC, tpl LIMIT 15""".stripMargin

  // --------------------------------------------------------------------------
  // q400 — PRICE-ENDINGS FORENSIC: q151 audits the FIRST digit
  // (Benford); synthetic or manipulated price columns also betray
  // themselves in their LAST digits — the cents ending should be
  // near-uniform over 00..99 for organic prices. Ships the top-10
  // endings by count and the whole-distribution χ² vs uniform via the
  // observed-cells identity (10⁶·Σ obs²·k) div N − 10⁶·N-style exact
  // floors (q370's sign-safe form, k = 100 cells, uniform margins make
  // it one term per cell: χ² = (100·Σobs²)/N − N).
  //
  // Scale: one row-local modulus + a ≤100-cell aggregate.
  def priceEndings(orders: DataFrame): DataFrame = {
    val cell = orders.select(
        pmod(expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)"),
          lit(100L)).as("ending"))
      .groupBy(col("ending")).agg(count(lit(1)).as("obs"))
      .localCheckpoint()
    val chi = cell.agg(sum(col("obs")).as("n"),
        count(lit(1)).as("k_present"),
        sum(expr("cast(obs as decimal(38,0)) * obs")).as("q2"))
      .select(col("n"), col("k_present"),
        expr("""cast((cast(1000000 as decimal(38,0)) * 100L * q2) div n
               | - cast(1000000 as decimal(38,0)) * n as bigint)"""
          .stripMargin).as("chi2_ppm"))
    cell.crossJoin(broadcast(chi))
      .withColumn("share_ppm", expr("(1000000L * obs) div n"))
      .orderBy(col("obs").desc, col("ending"))
      .limit(10)
      .select(col("ending"), col("obs"), col("share_ppm"), col("n"),
        col("k_present"), col("chi2_ppm"))
  }

  def q400PriceEndings(spark: SparkSession, dir: String): DataFrame =
    priceEndings(Tables.orders(spark, dir))

  val q400Sql: String =
    """WITH cell AS (
      |  SELECT ((CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) % 100)
      |    + 100) % 100 AS ending, COUNT(*) AS obs
      |  FROM orders GROUP BY 1),
      |chi AS (
      |  SELECT SUM(obs) AS n, COUNT(*) AS k_present,
      |    CAST((1000000::HUGEINT * 100 * SUM(obs::HUGEINT * obs)) // SUM(obs)
      |      - 1000000::HUGEINT * SUM(obs) AS BIGINT) AS chi2_ppm
      |  FROM cell)
      |SELECT ending, obs, CAST((1000000 * obs) // n AS BIGINT) AS share_ppm,
      |  CAST(n AS BIGINT) AS n, k_present, chi2_ppm
      |FROM cell, chi ORDER BY obs DESC, ending LIMIT 10""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q399_template_census", q399TemplateCensus _, Some(q399Sql)),
    ("q400_price_endings", q400PriceEndings _, Some(q400Sql)))
}
