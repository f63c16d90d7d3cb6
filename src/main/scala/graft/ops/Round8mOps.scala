package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 thirteenth operator batch: dedup saturation and order-
  * insensitive duplicate detection — corpus-growth planning readouts on
  * the §8.4 exact-integer discipline.
  */
object Round8mOps {

  // --------------------------------------------------------------------------
  // q331 — DEDUP SATURATION CURVE: duplicate rate over ingestion-id
  // prefixes (¼, ½, ¾, full id range) — "does scraping more still yield
  // new content", the marginal-value curve that decides when to stop
  // collecting. A text counts as new at its FIRST occurrence id; each
  // prefix reports docs, distinct texts and dup_ppm, all exact.
  //
  // Scale: one md5 groupBy for first occurrences, then each side
  // aggregates against a broadcast 4-row threshold grid (value-range
  // prefixes from a 1-row min/max — no global rank, no sort).
  def dedupSaturation(docs: DataFrame): DataFrame = {
    val ids = docs.select(col("doc_id"), md5(col("text")).as("h"))
    val fo = ids.groupBy(col("h")).agg(min(col("doc_id")).as("fo"))
    val bounds = ids.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
    val grid = bounds.select(explode(expr(
      "transform(sequence(1, 4), k -> named_struct('k', cast(k as long), " +
        "'t', lo + ((hi - lo + 1L) * k) div 4L - 1L))")).as("g"))
      .select(col("g.k").as("k"), col("g.t").as("t"))
    val d = ids.crossJoin(broadcast(grid)).filter(col("doc_id") <= col("t"))
      .groupBy(col("k"), col("t")).agg(count(lit(1)).as("docs"))
    val u = fo.crossJoin(broadcast(grid)).filter(col("fo") <= col("t"))
      .groupBy(col("k")).agg(count(lit(1)).as("distinct_texts"))
    d.join(u, Seq("k"))
      .select(col("k").as("prefix_quarter"), col("t").as("max_doc_id"),
        col("docs"), col("distinct_texts"),
        expr("1000000L - (1000000L * distinct_texts) div docs").as("dup_ppm"))
      .orderBy(col("prefix_quarter"))
  }

  def q331DedupSaturation(spark: SparkSession, dir: String): DataFrame =
    dedupSaturation(Tables.documents(spark, dir))

  val q331Sql: String =
    """WITH ids AS (SELECT doc_id, md5(text) AS h FROM documents),
      |fo AS (SELECT h, MIN(doc_id) AS fo FROM ids GROUP BY 1),
      |b AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM ids),
      |grid AS (
      |  SELECT k, lo + ((hi - lo + 1) * k) // 4 - 1 AS t
      |  FROM b, UNNEST(generate_series(1, 4)) AS s(k)),
      |d AS (
      |  SELECT k, t, COUNT(*) AS docs
      |  FROM ids CROSS JOIN grid WHERE doc_id <= t GROUP BY 1, 2),
      |u AS (
      |  SELECT k, COUNT(*) AS distinct_texts
      |  FROM fo CROSS JOIN grid WHERE fo <= t GROUP BY 1)
      |SELECT CAST(k AS BIGINT) AS prefix_quarter, CAST(t AS BIGINT) AS max_doc_id,
      |  docs, distinct_texts,
      |  CAST(1000000 - (1000000 * distinct_texts) // docs AS BIGINT) AS dup_ppm
      |FROM d JOIN u USING (k)
      |ORDER BY prefix_quarter""".stripMargin

  // --------------------------------------------------------------------------
  // q332 — TOKEN-SET DEDUP GROUPS: duplicate groups keyed by the
  // distinct-token SET (md5 of the sorted deduped token array), with
  // multiset (bag) and byte-text sub-counts — the order- and
  // repetition-insensitive family detector that catches shuffled and
  // padded template pages q30's exact hash misses. n_bags > 1 = members
  // differ by token counts (template family); n_texts > n_bags = pure
  // reorders of the same multiset.
  //
  // Scale: both canonical keys are ROW-LOCAL (sort within the doc, never
  // a corpus sort); one hash groupBy on the set digest. Token strings
  // are ASCII-lowercase, so Spark's sort_array and the oracle's
  // list_sort agree bytewise.
  def tokenSetGroups(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), md5(col("text")).as("th"),
        md5(concat_ws(" ", sort_array(TextOps.toks))).as("bag"),
        md5(concat_ws(" ", sort_array(array_distinct(TextOps.toks)))).as("tset"))
      .groupBy(col("tset"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"),
        countDistinct(col("th")).as("n_texts"),
        countDistinct(col("bag")).as("n_bags"))
      .filter(col("n_docs") >= 2)
      .select(col("keep_id"), col("n_docs"), col("n_texts"), col("n_bags"))
      .orderBy(col("keep_id"))

  def q332TokenSetGroups(spark: SparkSession, dir: String): DataFrame =
    tokenSetGroups(Tables.documents(spark, dir))

  val q332Sql: String = {
    val toks = TextOps.toksSqlD
    s"""SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_docs,
       |  COUNT(DISTINCT md5(text)) AS n_texts,
       |  COUNT(DISTINCT bag) AS n_bags
       |FROM (SELECT doc_id, text,
       |        md5(array_to_string(list_sort($toks), ' ')) AS bag,
       |        md5(array_to_string(list_sort(list_distinct($toks)), ' ')) AS tset
       |      FROM documents)
       |GROUP BY tset HAVING COUNT(*) >= 2
       |ORDER BY keep_id""".stripMargin
  }

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q331_dedup_saturation", q331DedupSaturation _, Some(q331Sql)),
    ("q332_token_set_groups", q332TokenSetGroups _, Some(q332Sql)))
}
