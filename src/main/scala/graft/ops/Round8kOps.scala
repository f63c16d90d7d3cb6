package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 eleventh operator batch: eval-set contamination coverage and
  * serpentine shard balancing — train/eval hygiene and layout planning
  * on the §8.4 exact-integer discipline.
  */
object Round8kOps {

  // --------------------------------------------------------------------------
  // q327 — EVAL-CONTAMINATION COVERAGE: for a held-out eval slice
  // (doc_id % 50 == 0), what fraction of each eval doc's distinct
  // 3-grams also appears in the train split? q106 REMOVES contaminated
  // docs; this MEASURES the overlap distribution — the memorization-risk
  // readout a benchmark release runs before publishing. Ships the decile
  // histogram of per-doc coverage plus the exact integer mean.
  //
  // Scale: one shingle pass split into train/eval sides; the train gram
  // VOCABULARY (distinct s) left-semi-joins the eval grams — one shuffle
  // keyed by gram; per-doc and decile aggregates are hash aggs. At
  // 100 TB the train vocabulary side gets a bloom/stop-gram cap
  // (q194/q176's guards).
  def evalContamination(docs: DataFrame, modulus: Long): DataFrame = {
    val sh = TextOps.shingleEdges(docs)
    val evalSh = sh.filter(col("doc_id") % modulus === 0)
    val trainVocab = sh.filter(col("doc_id") % modulus =!= 0)
      .select(col("s")).distinct()
    val perDoc = evalSh
      .join(trainVocab.withColumn("hit", lit(1L)), Seq("s"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("tot"),
        sum(coalesce(col("hit"), lit(0L))).as("cov"))
      .withColumn("cov_ppm", expr("(1000000L * cov) div tot"))
    val summary = perDoc.agg(
      count(lit(1)).as("n_eval_docs"),
      expr("sum(cov_ppm) div count(1)").as("mean_cov_ppm"))
    perDoc
      .withColumn("decile", least(expr("cov_ppm div 100000L"), lit(9L)))
      .groupBy(col("decile")).agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(summary))
      .select(col("decile"), col("n_docs"), col("n_eval_docs"), col("mean_cov_ppm"))
      .orderBy(col("decile"))
  }

  def q327EvalContamination(spark: SparkSession, dir: String): DataFrame =
    evalContamination(Tables.documents(spark, dir), modulus = 50L)

  val q327Sql: String = {
    val toks = TextOps.toksSqlD
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       |    FROM (SELECT doc_id, $toks AS t FROM documents),
       |         UNNEST(generate_series(1, len(t) - 2)) AS u(i))),
       |tv AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 <> 0),
       |pd AS (
       |  SELECT doc_id, COUNT(*) AS tot,
       |    SUM(CASE WHEN tv.s IS NOT NULL THEN 1 ELSE 0 END) AS cov
       |  FROM sh LEFT JOIN tv ON sh.s = tv.s
       |  WHERE doc_id % 50 = 0 GROUP BY 1),
       |pc AS (SELECT doc_id, (1000000 * cov) // tot AS cov_ppm FROM pd),
       |su AS (
       |  SELECT COUNT(*) AS n_eval_docs,
       |    CAST(SUM(cov_ppm) // COUNT(*) AS BIGINT) AS mean_cov_ppm
       |  FROM pc)
       |SELECT CAST(LEAST(cov_ppm // 100000, 9) AS BIGINT) AS decile,
       |  COUNT(*) AS n_docs, n_eval_docs, mean_cov_ppm
       |FROM pc CROSS JOIN su
       |GROUP BY 1, 3, 4 ORDER BY decile""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q328 — SERPENTINE SHARD BALANCING: assign documents to 32 shards in
  // size rank order, reversing direction every block (rank serpentine —
  // the deterministic greedy that keeps every shard within one unit of
  // byte balance without LPT's sequential state). Readout: per-shard doc
  // and byte totals plus the signed ppm deviation from the ideal share.
  //
  // Scale: the global size rank uses the VALUE-HISTOGRAM two-pass
  // (q169's shape on the bounded n_chars domain): per-size counts →
  // exclusive prefix over the size grid (allowlisted), within-size rank
  // partitioned by size. No corpus-wide single-task sort.
  def serpentineShards(docs: DataFrame, shards: Int): DataFrame = {
    val sized = docs.select(col("doc_id"), col("n_chars").as("sz"))
    val hist = sized.groupBy(col("sz")).agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(
        Window.orderBy(col("sz").desc).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("sz"), col("off"))
    val ranked = sized.join(broadcast(hist), Seq("sz"))
      .withColumn("r", col("off") + row_number().over(
        Window.partitionBy(col("sz")).orderBy(col("doc_id"))))
      .withColumn("block", expr(s"(r - 1L) div ${shards}L"))
      .withColumn("pos", expr(s"(r - 1L) % ${shards}L"))
      .withColumn("shard",
        when(col("block") % 2 === 0, col("pos")).otherwise(lit(shards - 1L) - col("pos")))
    val tot = sized.agg(sum(col("sz")).as("bt"))
      .withColumn("ideal", expr(s"bt div ${shards}L"))
    ranked.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("sz")).as("bytes"))
      .crossJoin(broadcast(tot))
      .select(col("shard"), col("n_docs"), col("bytes"),
        expr("(1000000L * (bytes - ideal)) div ideal").as("dev_ppm"))
      .orderBy(col("shard"))
  }

  def q328SerpentineShards(spark: SparkSession, dir: String): DataFrame =
    serpentineShards(Tables.documents(spark, dir), shards = 32)

  val q328Sql: String =
    """WITH ranked AS (
      |  SELECT n_chars AS sz,
      |    ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS r
      |  FROM documents),
      |a AS (
      |  SELECT sz, (r - 1) // 32 AS block, (r - 1) % 32 AS pos
      |  FROM ranked),
      |s AS (
      |  SELECT CASE WHEN block % 2 = 0 THEN pos ELSE 31 - pos END AS shard, sz
      |  FROM a),
      |t AS (SELECT SUM(sz) AS bt, SUM(sz) // 32 AS ideal FROM s)
      |SELECT shard, COUNT(*) AS n_docs, CAST(SUM(sz) AS BIGINT) AS bytes,
      |  CAST((1000000 * (SUM(sz) - ideal)) // ideal AS BIGINT) AS dev_ppm
      |FROM s CROSS JOIN t
      |GROUP BY shard, ideal ORDER BY shard""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q327_eval_contamination", q327EvalContamination _, Some(q327Sql)),
    ("q328_serpentine_shards", q328SerpentineShards _, Some(q328Sql)))
}
