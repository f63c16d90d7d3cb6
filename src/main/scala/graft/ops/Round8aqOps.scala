package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 forty-third operator batch: sample-based join-size
  * estimation and inverse-propensity off-policy replay — CBO sampling
  * fidelity and logged-bandit policy evaluation on the §8.4
  * exact-integer discipline.
  */
object Round8aqOps {

  // --------------------------------------------------------------------------
  // q391 — SAMPLED JOIN-SIZE ESTIMATE: the self-join size Σ f_k² (how
  // many lineitem pairs share a part) is what an optimizer must guess
  // before picking a strategy; KEY-correlated sampling — keep every
  // key whose md5 band < 1/64, scale by 64 — is the unbiased
  // estimator catalogs actually run. Ships truth, estimate, and the
  // signed error ppm so estimate drift is a regression the gate
  // catches. q277 estimates via range-bucket histograms; this is the
  // sampling alternative, both against EXACT truth.
  //
  // Scale: one key-frequency aggregate; truth and estimate come from
  // the same grid — the fact table is scanned once.
  def sampledJoinSize(fact: DataFrame, keyCol: String, invRate: Int)
  : DataFrame = {
    val freq = fact.groupBy(col(keyCol).cast("long").as("k"))
      .agg(count(lit(1)).as("f"))
      .withColumn("sampled", expr(
        s"cast(conv(substring(md5(concat('smp:', cast(k as string))), 1, 4), 16, 10) as bigint) % ${invRate}L = 0L"))
    freq.agg(count(lit(1)).as("n_keys"),
        sum(expr("cast(f as decimal(38,0)) * f")).as("true_pairs_d"),
        count_if(col("sampled")).as("sampled_keys"),
        sum(when(col("sampled"), expr("cast(f as decimal(38,0)) * f"))
          .otherwise(expr("cast(0 as decimal(38,0))"))).as("sampled_pairs_d"))
      .select(col("n_keys"), col("sampled_keys"),
        col("true_pairs_d").cast("long").as("true_pairs"),
        (col("sampled_pairs_d") * invRate).cast("long").as("est_pairs"))
      .withColumn("err_ppm", expr(
        "(1000000L * (est_pairs - true_pairs)) div greatest(true_pairs, 1L)"))
  }

  def q391SampledJoinSize(spark: SparkSession, dir: String): DataFrame =
    sampledJoinSize(Tables.lineitem(spark, dir), "l_partkey", invRate = 64)

  val q391Sql: String =
    """WITH freq AS (
      |  SELECT CAST(l_partkey AS BIGINT) AS k, COUNT(*) AS f,
      |    CAST(('0x' || substring(md5('smp:' ||
      |      CAST(CAST(l_partkey AS BIGINT) AS VARCHAR)), 1, 4)) AS BIGINT)
      |      % 64 = 0 AS sampled
      |  FROM lineitem GROUP BY 1, 3),
      |a AS (
      |  SELECT COUNT(*) AS n_keys,
      |    SUM(f::HUGEINT * f) AS true_pairs,
      |    COUNT(*) FILTER (sampled) AS sampled_keys,
      |    SUM(CASE WHEN sampled THEN f::HUGEINT * f ELSE 0 END) AS sp
      |  FROM freq)
      |SELECT n_keys, CAST(sampled_keys AS BIGINT) AS sampled_keys,
      |  CAST(true_pairs AS BIGINT) AS true_pairs,
      |  CAST(sp * 64 AS BIGINT) AS est_pairs,
      |  CAST((1000000 * (sp * 64 - true_pairs))
      |    // GREATEST(true_pairs, 1) AS BIGINT) AS err_ppm
      |FROM a""".stripMargin

  // --------------------------------------------------------------------------
  // q392 — INVERSE-PROPENSITY REPLAY (off-policy evaluation): from a
  // logged event stream, learn the greedy per-segment action on the
  // md5-split train half (argmax mean value, exact ppm floor ordering
  // with the action-name tie-break), then estimate what that policy
  // WOULD earn on the held-out half via IPS — each matched reward
  // reweighted by the inverse of the action's TRAIN-estimated logging
  // propensity n_seg/n_(seg,a). The logged-bandit eval every
  // recommendation/RLHF pipeline runs before shipping a policy; the
  // behavior average rides along as the baseline. All counts and cents
  // exact; the two per-segment quotients are documented floors.
  //
  // Scale: two hash aggregates over the event stream (train policy,
  // eval replay) joined on the bounded 8-segment grid.
  def ipsReplay(events: DataFrame): DataFrame = {
    val tagged = events.select(
        pmod(col("user_id").cast("long"), lit(8L)).as("seg"),
        col("event_type").as("a"),
        expr("cast(floor(value * 100 + 0.5d) as bigint)").as("cents"),
        expr("cast(conv(substring(md5(concat('ope:', cast(event_id as string))), 1, 4), 16, 10) as bigint) % 2L = 0L")
          .as("train"))
      .localCheckpoint()
    val trainStats = tagged.filter(col("train"))
      .groupBy(col("seg"), col("a"))
      .agg(count(lit(1)).as("na"), sum(col("cents")).as("sa"))
      .withColumn("mean_ppm", expr("(1000000L * sa) div na"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("seg"))
          .orderBy(col("mean_ppm").desc, col("a"))))
      .localCheckpoint()
    val pi = trainStats.filter(col("rk") === 1)
      .select(col("seg"), col("a").as("pi_a"), col("na").as("n_pi_train"))
    val nSeg = trainStats.groupBy(col("seg"))
      .agg(sum(col("na")).as("n_seg_train"))
    val eval0 = tagged.filter(!col("train"))
      .join(broadcast(pi), Seq("seg"))
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n_eval"),
        sum(col("cents")).as("cents_eval"),
        count_if(col("a") === col("pi_a")).as("n_matched"),
        sum(when(col("a") === col("pi_a"), col("cents")).otherwise(0L))
          .as("cents_matched"),
        first(col("pi_a")).as("pi_a"),
        first(col("n_pi_train")).as("n_pi_train"))
    eval0.join(broadcast(nSeg), Seq("seg"))
      .select(col("seg"), col("pi_a"), col("n_eval"), col("n_matched"),
        expr("cents_eval div n_eval").as("behavior_avg_cents"),
        expr("""((cast(cents_matched as decimal(38,0)) * n_seg_train)
               | div n_pi_train) div n_eval""".stripMargin)
          .cast("long").as("ips_avg_cents"))
      .orderBy(col("seg"))
  }

  def q392IpsReplay(spark: SparkSession, dir: String): DataFrame =
    ipsReplay(Tables.events(spark, dir))

  val q392Sql: String =
    """WITH tagged AS (
      |  SELECT ((CAST(user_id AS BIGINT) % 8) + 8) % 8 AS seg,
      |    event_type AS a,
      |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
      |    CAST(('0x' || substring(md5('ope:' || CAST(event_id AS VARCHAR)),
      |      1, 4)) AS BIGINT) % 2 = 0 AS train
      |  FROM events),
      |ts AS (
      |  SELECT seg, a, COUNT(*) AS na, SUM(cents) AS sa,
      |    (1000000 * SUM(cents)) // COUNT(*) AS mean_ppm
      |  FROM tagged WHERE train GROUP BY 1, 2),
      |rk AS (
      |  SELECT seg, a, na,
      |    ROW_NUMBER() OVER (PARTITION BY seg
      |      ORDER BY mean_ppm DESC, a) AS rk
      |  FROM ts),
      |pi AS (SELECT seg, a AS pi_a, na AS n_pi_train FROM rk WHERE rk = 1),
      |nseg AS (SELECT seg, SUM(na) AS n_seg_train FROM ts GROUP BY 1),
      |ev AS (
      |  SELECT t.seg, ANY_VALUE(pi_a) AS pi_a, COUNT(*) AS n_eval,
      |    SUM(cents) AS cents_eval,
      |    COUNT(*) FILTER (a = pi_a) AS n_matched,
      |    SUM(CASE WHEN a = pi_a THEN cents ELSE 0 END) AS cents_matched,
      |    ANY_VALUE(n_pi_train) AS n_pi_train
      |  FROM tagged t JOIN pi ON t.seg = pi.seg
      |  WHERE NOT train GROUP BY 1)
      |SELECT ev.seg, pi_a, n_eval, CAST(n_matched AS BIGINT) AS n_matched,
      |  CAST(cents_eval // n_eval AS BIGINT) AS behavior_avg_cents,
      |  CAST(((cents_matched::HUGEINT * n_seg_train) // n_pi_train)
      |    // n_eval AS BIGINT) AS ips_avg_cents
      |FROM ev JOIN nseg ON ev.seg = nseg.seg ORDER BY ev.seg""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q391_sampled_join_size", q391SampledJoinSize _, Some(q391Sql)),
    ("q392_ips_replay", q392IpsReplay _, Some(q392Sql)))
}
