package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 forty-fourth operator batch: feature-hash width audit and
  * count-min fidelity audit — hashing-layer capacity planning and
  * sketch-error measurement on the §8.4 exact-integer discipline.
  */
object Round8arOps {

  // --------------------------------------------------------------------------
  // q393 — HASH-WIDTH COLLISION AUDIT: feature hashing (q171's layer)
  // trades width for collisions; this measures the actual trade on the
  // real vocabulary — for each candidate width w ∈ {1k, 4k, 16k, 64k},
  // the occupied-bucket census and the share of types that share a
  // bucket (the features whose signal gets mixed). All exact counts
  // off md5 buckets (engine-portable); the sizing table a feature
  // pipeline consults instead of folklore ("64k is enough").
  //
  // Scale: one type-count pass, a ×4 width explode over the vocabulary
  // (Heaps-bounded, far below the corpus), two hash aggregates.
  def hashWidthAudit(docs: DataFrame, widths: Seq[Int]): DataFrame = {
    val types = docs.select(explode(TextOps.toks).as("w"))
      .select(col("w")).distinct()
      .withColumn("h", expr(
        "cast(conv(substring(md5(concat('fh:', w)), 1, 13), 16, 10) as bigint)"))
      .localCheckpoint()
    val widthCol = array(widths.map(lit): _*)
    val buckets = types
      .select(explode(widthCol).as("width"), col("h"))
      .select(col("width"), pmod(col("h"), col("width").cast("long"))
        .as("bucket"))
      .groupBy(col("width"), col("bucket")).agg(count(lit(1)).as("k"))
    buckets.groupBy(col("width"))
      .agg(sum(col("k")).as("n_types"),
        count(lit(1)).as("occupied_buckets"),
        sum(when(col("k") === 1L, 1L).otherwise(0L)).as("singleton_types"),
        sum(when(col("k") > 1L, col("k")).otherwise(0L)).as("collided_types"))
      .withColumn("collision_ppm",
        expr("(1000000L * collided_types) div n_types"))
      .orderBy(col("width"))
  }

  def q393HashWidthAudit(spark: SparkSession, dir: String): DataFrame =
    hashWidthAudit(Tables.documents(spark, dir),
      Seq(1024, 4096, 16384, 65536))

  val q393Sql: String =
    s"""WITH types AS (
       |  SELECT DISTINCT w FROM (
       |    SELECT UNNEST(t) AS w
       |    FROM (SELECT ${TextOps.toksSqlD} AS t FROM documents))),
       |hashed AS (
       |  SELECT w, CAST(('0x' || substring(md5('fh:' || w), 1, 13)) AS BIGINT)
       |    AS h
       |  FROM types),
       |buckets AS (
       |  SELECT width, ((h % width) + width) % width AS bucket,
       |    COUNT(*) AS k
       |  FROM hashed, UNNEST([1024, 4096, 16384, 65536]) AS u(width)
       |  GROUP BY 1, 2)
       |SELECT CAST(width AS INT) AS width, CAST(SUM(k) AS BIGINT) AS n_types,
       |  COUNT(*) AS occupied_buckets,
       |  CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS singleton_types,
       |  CAST(SUM(CASE WHEN k > 1 THEN k ELSE 0 END) AS BIGINT)
       |    AS collided_types,
       |  CAST((1000000 * SUM(CASE WHEN k > 1 THEN k ELSE 0 END)) // SUM(k)
       |    AS BIGINT) AS collision_ppm
       |FROM buckets GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // q394 — COUNT-MIN FIDELITY AUDIT: q77 ships a CMS; this MEASURES
  // one — a d = 4 × w = 256 sketch built from md5 row-hashes over the
  // token stream, audited against the exact counts of the top-20
  // types: est = min over rows of the cell sum, always ≥ truth, with
  // the overestimate in exact ppm. The sketch-sizing evidence (does
  // 4×256 hold this corpus's skew?) that otherwise lives in a paper's
  // ε·N bound.
  //
  // Scale: one token-count pass; cells are a (4 × 256)-bounded
  // aggregate over the vocabulary; the audit joins 20 keys × 4 rows
  // against the broadcast cell grid.
  def cmsAudit(docs: DataFrame, depth: Int, width: Int, topK: Int)
  : DataFrame = {
    val freq = docs.select(explode(TextOps.toks).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .localCheckpoint()
    val rows = freq.select(col("w"), col("f"),
      explode(expr(s"sequence(0, ${depth - 1})")).as("d"))
      .withColumn("bucket", expr(
        s"cast(conv(substring(md5(concat('cms', d, ':', w)), 1, 13), 16, 10) as bigint) % ${width}L"))
    val cells = rows.groupBy(col("d"), col("bucket"))
      .agg(sum(col("f")).as("cell"))
    val top = freq.orderBy(col("f").desc, col("w")).limit(topK)
      .select(col("w"), col("f"),
        explode(expr(s"sequence(0, ${depth - 1})")).as("d"))
      .withColumn("bucket", expr(
        s"cast(conv(substring(md5(concat('cms', d, ':', w)), 1, 13), 16, 10) as bigint) % ${width}L"))
    top.join(broadcast(cells), Seq("d", "bucket"))
      .groupBy(col("w"), col("f"))
      .agg(min(col("cell")).as("est"))
      .select(col("w").as("token"), col("f").as("true_f"), col("est"),
        expr("(1000000L * (est - f)) div f").as("over_ppm"))
      .orderBy(col("true_f").desc, col("token"))
  }

  def q394CmsAudit(spark: SparkSession, dir: String): DataFrame =
    cmsAudit(Tables.documents(spark, dir), depth = 4, width = 256,
      topK = 20)

  val q394Sql: String =
    s"""WITH freq AS (
       |  SELECT w, COUNT(*) AS f FROM (
       |    SELECT UNNEST(t) AS w
       |    FROM (SELECT ${TextOps.toksSqlD} AS t FROM documents))
       |  GROUP BY 1),
       |rows_ AS (
       |  SELECT w, f, d,
       |    CAST(('0x' || substring(md5('cms' || d || ':' || w), 1, 13))
       |      AS BIGINT) % 256 AS bucket
       |  FROM freq, UNNEST([0, 1, 2, 3]) AS u(d)),
       |cells AS (
       |  SELECT d, bucket, SUM(f) AS cell FROM rows_ GROUP BY 1, 2),
       |top AS (
       |  SELECT w, f FROM freq ORDER BY f DESC, w LIMIT 20),
       |audit AS (
       |  SELECT t.w, t.f, MIN(cell) AS est
       |  FROM (
       |    SELECT top.w, top.f, u.d,
       |      CAST(('0x' || substring(md5('cms' || u.d || ':' || top.w), 1, 13))
       |        AS BIGINT) % 256 AS bucket
       |    FROM top, UNNEST([0, 1, 2, 3]) AS u(d)) t
       |  JOIN cells ON t.d = cells.d AND t.bucket = cells.bucket
       |  GROUP BY 1, 2)
       |SELECT w AS token, CAST(f AS BIGINT) AS true_f,
       |  CAST(est AS BIGINT) AS est,
       |  CAST((1000000 * (est - f)) // f AS BIGINT) AS over_ppm
       |FROM audit ORDER BY true_f DESC, token""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q393_hash_width_audit", q393HashWidthAudit _, Some(q393Sql)),
    ("q394_cms_audit", q394CmsAudit _, Some(q394Sql)))
}
