package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 twenty-sixth operator batch: adaptive salting planner and
  * split balance audit — shuffle-skew capacity planning and split
  * hygiene on the §8.4 exact-integer discipline.
  */
object Round8zOps {

  // --------------------------------------------------------------------------
  // q357 — SALT-FACTOR PLANNER: Skew.scala ships the salting MECHANISMS
  // (fixed salt count); this is the planner that sizes them from the
  // measured key histogram — per key, salt_k = ceil(freq/target), so
  // hot keys split into ≤ target-row buckets while cold keys stay
  // un-salted (q273 is the same tool for LSH banding; q277 audits the
  // cardinality estimates this plan consumes). Ships the top-20
  // hottest keys (freq, salt, post-salt bucket ceiling) plus the plan
  // summary every row carries: #keys, #hot keys, small-side
  // replication cost Σ salt_k, and the max bucket before/after — the
  // straggler headroom the plan buys. All exact BIGINTs.
  //
  // Scale: one hash aggregate over the fact scan, a 1-row summary
  // broadcast, a top-20 selection. The planner itself never shuffles
  // the fact table.
  def saltPlanner(fact: DataFrame, keyCol: String, target: Long,
                  topK: Int): DataFrame = {
    val freq = fact.groupBy(col(keyCol).cast("long").as("k"))
      .agg(count(lit(1)).as("freq"))
      .withColumn("salt", expr(s"(freq + ${target}L - 1L) div ${target}L"))
      .withColumn("bucket_ceil", expr("(freq + salt - 1L) div salt"))
    val su = freq.agg(count(lit(1)).as("n_keys"),
      count_if(col("salt") > 1L).as("n_hot_keys"),
      sum(col("salt")).as("replication_cost"),
      max(col("freq")).as("max_before"),
      max(col("bucket_ceil")).as("max_after"))
    freq.crossJoin(broadcast(su))
      .orderBy(col("freq").desc, col("k"))
      .limit(topK)
      .select(col("k").as("key"), col("freq"), col("salt"), col("bucket_ceil"),
        col("n_keys"), col("n_hot_keys"), col("replication_cost"),
        col("max_before"), col("max_after"))
  }

  def q357SaltPlanner(spark: SparkSession, dir: String): DataFrame =
    saltPlanner(Tables.lineitem(spark, dir), "l_suppkey", target = 100L,
      topK = 20)

  val q357Sql: String =
    """WITH freq AS (
      |  SELECT CAST(l_suppkey AS BIGINT) AS k, COUNT(*) AS freq
      |  FROM lineitem GROUP BY 1),
      |pl AS (
      |  SELECT k, freq, (freq + 99) // 100 AS salt,
      |    (freq + (freq + 99) // 100 - 1) // ((freq + 99) // 100) AS bucket_ceil
      |  FROM freq),
      |su AS (
      |  SELECT COUNT(*) AS n_keys,
      |    COUNT(*) FILTER (salt > 1) AS n_hot_keys,
      |    SUM(salt) AS replication_cost,
      |    MAX(freq) AS max_before, MAX(bucket_ceil) AS max_after
      |  FROM pl)
      |SELECT k AS key, freq, CAST(salt AS BIGINT) AS salt,
      |  CAST(bucket_ceil AS BIGINT) AS bucket_ceil,
      |  CAST(n_keys AS BIGINT) AS n_keys, CAST(n_hot_keys AS BIGINT) AS n_hot_keys,
      |  CAST(replication_cost AS BIGINT) AS replication_cost,
      |  CAST(max_before AS BIGINT) AS max_before,
      |  CAST(max_after AS BIGINT) AS max_after
      |FROM pl CROSS JOIN su
      |ORDER BY freq DESC, k LIMIT 20""".stripMargin

  // --------------------------------------------------------------------------
  // q358 — SPLIT BALANCE AUDIT: after a deterministic content-hash
  // 3-way split (q90's md5 rule: train/val/test by hash band), does
  // each split carry the GLOBAL source mixture? Per split, the χ²
  // distance to the pooled source distribution with every term an
  // exact per-cell floor:
  //   term_ppm = (10⁶·(obs·N − n_split·n_src)²) div (n_split·n_src·N)
  // summed as exact BIGINTs (term-wise floors are deterministic). The
  // release gate that catches a split whose hash key accidentally
  // correlates with provenance.
  //
  // Scale: one row-local hash + two grid aggregates over the
  // (split × source) contingency — 3×20 cells.
  def splitBalance(docs: DataFrame): DataFrame = {
    val tagged = docs.select(col("source"),
      expr("""case when cast(conv(substring(md5(concat('split:', cast(doc_id as string))), 1, 4), 16, 10) as bigint) % 10 < 8
             |  then 'train'
             |  when cast(conv(substring(md5(concat('split:', cast(doc_id as string))), 1, 4), 16, 10) as bigint) % 10 < 9
             |  then 'val' else 'test' end""".stripMargin).as("split"))
    val cell = tagged.groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("obs"))
    val bySplit = cell.groupBy(col("split")).agg(sum(col("obs")).as("ns"))
    val bySrc = cell.groupBy(col("source")).agg(sum(col("obs")).as("nr"))
    val tot = cell.agg(sum(col("obs")).as("nn"))
    cell.join(broadcast(bySplit), Seq("split"))
      .join(broadcast(bySrc), Seq("source"))
      .crossJoin(broadcast(tot))
      .withColumn("term_ppm", expr(
        """cast(((cast(1000000 as decimal(38,0))
          |  * (obs * nn - ns * nr) * (obs * nn - ns * nr))
          | div (cast(ns as decimal(38,0)) * nr * nn)) as bigint)""".stripMargin))
      .groupBy(col("split"))
      .agg(first(col("ns")).as("n_docs"),
        count(lit(1)).as("n_sources"),
        sum(col("term_ppm")).as("chi2_ppm"))
      .orderBy(col("split"))
  }

  def q358SplitBalance(spark: SparkSession, dir: String): DataFrame =
    splitBalance(Tables.documents(spark, dir))

  val q358Sql: String =
    """WITH tagged AS (
      |  SELECT source,
      |    CASE WHEN CAST(('0x' || substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 10 < 8
      |      THEN 'train'
      |      WHEN CAST(('0x' || substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 10 < 9
      |      THEN 'val' ELSE 'test' END AS split
      |  FROM documents),
      |cell AS (SELECT split, source, COUNT(*) AS obs FROM tagged GROUP BY 1, 2),
      |bs AS (SELECT split, SUM(obs) AS ns FROM cell GROUP BY 1),
      |br AS (SELECT source, SUM(obs) AS nr FROM cell GROUP BY 1),
      |tt AS (SELECT SUM(obs) AS nn FROM cell),
      |terms AS (
      |  SELECT split, ns,
      |    CAST((1000000::HUGEINT * (obs * nn - ns * nr) * (obs * nn - ns * nr))
      |      // (ns::HUGEINT * nr * nn) AS BIGINT) AS term_ppm
      |  FROM cell JOIN bs USING (split) JOIN br USING (source) CROSS JOIN tt)
      |SELECT split, CAST(ANY_VALUE(ns) AS BIGINT) AS n_docs,
      |  COUNT(*) AS n_sources, CAST(SUM(term_ppm) AS BIGINT) AS chi2_ppm
      |FROM terms GROUP BY split ORDER BY split""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q357_salt_planner", q357SaltPlanner _, Some(q357Sql)),
    ("q358_split_balance", q358SplitBalance _, Some(q358Sql)))
}
