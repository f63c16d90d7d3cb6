package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 thirty-eighth operator batch: task-skew memory audit and
  * small-cell suppression release — straggler risk quantification and
  * disclosure-control enforcement on the §8.4 exact-integer discipline.
  */
object Round8alOps {

  // --------------------------------------------------------------------------
  // q381 — TASK-SKEW MEMORY AUDIT: q376 picks a partition count and
  // q357 decides salting; this AUDITS what a given width p actually
  // does to the shuffle: bucket every key by the portable `key mod p`
  // (hash functions differ across engines; the modulus is the
  // documented stand-in with the same collision structure for
  // sequential keys), and ship the exact max single-key mass, max
  // bucket mass, the skew ratio (max·p/total, 10⁶ = perfectly even),
  // and the est bytes of the heaviest task at the declared row width.
  // The "will one task OOM" readout a plan review wants BEFORE the job
  // runs.
  //
  // Scale: one key histogram, one p-bucket aggregate — the audit never
  // shuffles the fact table itself.
  def taskSkewAudit(fact: DataFrame, keyCol: String, p: Int, rowBytes: Long)
  : DataFrame = {
    val freq = fact.groupBy(col(keyCol).cast("long").as("k"))
      .agg(count(lit(1)).as("f"))
      .localCheckpoint()
    val buckets = freq.groupBy(expr(s"pmod(k, ${p}L)").as("b"))
      .agg(sum(col("f")).as("load"))
    freq.agg(sum(col("f")).as("total_rows"), max(col("f")).as("max_key_rows"),
        count(lit(1)).as("n_keys"))
      .crossJoin(broadcast(
        buckets.agg(max(col("load")).as("max_bucket_rows"),
          count(lit(1)).as("n_buckets"))))
      .select(lit(p.toLong).as("p"), col("total_rows"), col("n_keys"),
        col("n_buckets"), col("max_key_rows"), col("max_bucket_rows"),
        expr(s"(1000000L * max_bucket_rows * ${p}L) div total_rows")
          .as("skew_ppm"),
        (col("max_bucket_rows") * lit(rowBytes)).as("est_task_bytes"))
  }

  def q381TaskSkewAudit(spark: SparkSession, dir: String): DataFrame =
    taskSkewAudit(Tables.lineitem(spark, dir), "l_suppkey", p = 32,
      rowBytes = 48L)

  val q381Sql: String =
    """WITH freq AS (
      |  SELECT CAST(l_suppkey AS BIGINT) AS k, COUNT(*) AS f
      |  FROM lineitem GROUP BY 1),
      |buckets AS (
      |  SELECT ((k % 32) + 32) % 32 AS b, SUM(f) AS load
      |  FROM freq GROUP BY 1),
      |fa AS (
      |  SELECT SUM(f) AS total_rows, MAX(f) AS max_key_rows,
      |    COUNT(*) AS n_keys
      |  FROM freq),
      |ba AS (
      |  SELECT MAX(load) AS max_bucket_rows, COUNT(*) AS n_buckets
      |  FROM buckets)
      |SELECT CAST(32 AS BIGINT) AS p, CAST(total_rows AS BIGINT) AS total_rows,
      |  n_keys, n_buckets, CAST(max_key_rows AS BIGINT) AS max_key_rows,
      |  CAST(max_bucket_rows AS BIGINT) AS max_bucket_rows,
      |  CAST((1000000 * max_bucket_rows * 32) // total_rows AS BIGINT)
      |    AS skew_ppm,
      |  CAST(max_bucket_rows * 48 AS BIGINT) AS est_task_bytes
      |FROM fa, ba""".stripMargin

  // --------------------------------------------------------------------------
  // q382 — SMALL-CELL SUPPRESSION RELEASE: q180 AUDITS k-anonymity;
  // this ENFORCES it on the way out — the (nation, segment) balance
  // grid releases count and sum only where the cell holds ≥ k = 20
  // people, suppressed cells ship NULLs with the flag (primary
  // suppression; the grid's margins are not released, so no
  // complementary pass is needed). Every released number exact cents;
  // the suppression census rides on each row. The standard
  // statistical-disclosure-control release shape (frequency-threshold
  // rule).
  //
  // Scale: one grid aggregate over the bounded 25×5 QI cross + a
  // broadcast census row.
  def suppressedRelease(customer: DataFrame, k: Long): DataFrame = {
    val cell = customer.groupBy(col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(floor(c_acctbal * 100 + 0.5d) as bigint)")).as("s"))
      .localCheckpoint()
    val census = cell.agg(count(lit(1)).as("n_cells"),
      count_if(col("n") < k).as("n_suppressed"))
    cell.crossJoin(broadcast(census))
      .select(col("nation"), col("segment"),
        when(col("n") >= k, col("n")).otherwise(lit(null)).as("released_n"),
        when(col("n") >= k, col("s")).otherwise(lit(null))
          .as("released_sum_cents"),
        (col("n") < k).as("suppressed"),
        col("n_cells"), col("n_suppressed"))
      .orderBy(col("nation"), col("segment"))
  }

  def q382SuppressedRelease(spark: SparkSession, dir: String): DataFrame =
    suppressedRelease(Tables.customer(spark, dir), k = 20L)

  val q382Sql: String =
    """WITH cell AS (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment,
      |    COUNT(*) AS n,
      |    SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS s
      |  FROM customer GROUP BY 1, 2),
      |census AS (
      |  SELECT COUNT(*) AS n_cells,
      |    COUNT(*) FILTER (n < 20) AS n_suppressed
      |  FROM cell)
      |SELECT nation, segment,
      |  CASE WHEN n >= 20 THEN n END AS released_n,
      |  CASE WHEN n >= 20 THEN CAST(s AS BIGINT) END AS released_sum_cents,
      |  n < 20 AS suppressed, n_cells, n_suppressed
      |FROM cell, census ORDER BY nation, segment""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q381_task_skew_audit", q381TaskSkewAudit _, Some(q381Sql)),
    ("q382_suppressed_release", q382SuppressedRelease _, Some(q382Sql)))
}
