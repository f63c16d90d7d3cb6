package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 forty-fifth operator batch: doubly-robust off-policy
  * evaluation and duplicate-provenance decomposition — the estimator
  * step beyond q392's IPS and the licensing-angle dedup readout, on
  * the §8.4 exact-integer discipline.
  */
object Round8asOps {

  // --------------------------------------------------------------------------
  // q395 — DOUBLY-ROBUST REPLAY: IPS (q392) is unbiased but
  // high-variance when the target action is rare in the logs; the DR
  // estimator anchors on the train-half value model q̂(seg, π) and
  // IPS-corrects only the model's residuals:
  //   DR = q̂(seg,π) + 1[a=π]·(r − q̂(seg,π))·n_seg/n_(seg,π) / n
  // Every input is an exact integer (train means as floor cents,
  // matched residual sums, propensity counts); the final per-segment
  // average is ONE fixed double dag + pround(4) because its numerator
  // is legitimately signed (residuals) and signed integer division is
  // not div/floor-portable. Ships model, behavior, and DR columns side
  // by side — the estimator-comparison row an OPE review wants.
  //
  // Scale: q392's two hash aggregates on the bounded 8-segment grid.
  def drReplay(events: DataFrame): DataFrame = {
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
      .select(col("seg"), col("a").as("pi_a"),
        col("na").as("n_pi_train"), expr("sa div na").as("m_pi_cents"))
    val nSeg = trainStats.groupBy(col("seg"))
      .agg(sum(col("na")).as("n_seg_train"))
    tagged.filter(!col("train"))
      .join(broadcast(pi), Seq("seg"))
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n_eval"),
        sum(col("cents")).as("cents_eval"),
        count_if(col("a") === col("pi_a")).as("n_matched"),
        sum(when(col("a") === col("pi_a"), col("cents")).otherwise(0L))
          .as("cents_matched"),
        first(col("pi_a")).as("pi_a"),
        first(col("n_pi_train")).as("n_pi_train"),
        first(col("m_pi_cents")).as("m_pi_cents"))
      .join(broadcast(nSeg), Seq("seg"))
      .select(col("seg"), col("pi_a"), col("n_eval"), col("n_matched"),
        expr("cents_eval div n_eval").as("behavior_avg_cents"),
        col("m_pi_cents").as("model_avg_cents"),
        Num.pround(
          col("m_pi_cents").cast("double")
            + (col("cents_matched").cast("double")
                - col("n_matched").cast("double") * col("m_pi_cents"))
              * col("n_seg_train").cast("double")
              / col("n_pi_train").cast("double")
              / col("n_eval").cast("double"), 4).as("dr_avg_cents4"))
      .orderBy(col("seg"))
  }

  def q395DrReplay(spark: SparkSession, dir: String): DataFrame =
    drReplay(Tables.events(spark, dir))

  val q395Sql: String =
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
      |  SELECT seg, a, na, sa,
      |    ROW_NUMBER() OVER (PARTITION BY seg
      |      ORDER BY mean_ppm DESC, a) AS rk
      |  FROM ts),
      |pi AS (
      |  SELECT seg, a AS pi_a, na AS n_pi_train, sa // na AS m_pi_cents
      |  FROM rk WHERE rk = 1),
      |nseg AS (SELECT seg, SUM(na) AS n_seg_train FROM ts GROUP BY 1),
      |ev AS (
      |  SELECT t.seg, ANY_VALUE(pi_a) AS pi_a, COUNT(*) AS n_eval,
      |    SUM(cents) AS cents_eval,
      |    COUNT(*) FILTER (a = pi_a) AS n_matched,
      |    SUM(CASE WHEN a = pi_a THEN cents ELSE 0 END) AS cents_matched,
      |    ANY_VALUE(n_pi_train) AS n_pi_train,
      |    ANY_VALUE(m_pi_cents) AS m_pi_cents
      |  FROM tagged t JOIN pi ON t.seg = pi.seg
      |  WHERE NOT train GROUP BY 1)
      |SELECT ev.seg, pi_a, n_eval, CAST(n_matched AS BIGINT) AS n_matched,
      |  CAST(cents_eval // n_eval AS BIGINT) AS behavior_avg_cents,
      |  CAST(m_pi_cents AS BIGINT) AS model_avg_cents,
      |  FLOOR((CAST(m_pi_cents AS DOUBLE)
      |    + (CAST(cents_matched AS DOUBLE)
      |        - CAST(n_matched AS DOUBLE) * m_pi_cents)
      |      * CAST(n_seg_train AS DOUBLE) / CAST(n_pi_train AS DOUBLE)
      |      / CAST(n_eval AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS dr_avg_cents4
      |FROM ev JOIN nseg ON ev.seg = nseg.seg ORDER BY ev.seg""".stripMargin

  // --------------------------------------------------------------------------
  // q396 — DUPLICATE-PROVENANCE DECOMPOSITION: q31's verified near-dup
  // pairs, split by WHERE the two copies live — same source
  // (re-serving, fine to dedup silently) vs cross source (licensing /
  // contamination signal: the same text entering the corpus under two
  // provenances). Ships the same/cross census plus the top-10 source
  // pairs by cross-duplicate mass with exact per-pair shares.
  //
  // Scale: the pair set is q31's inverted-index join (probe-linear);
  // the provenance join is two broadcast doc_id→source lookups over
  // pair-sized data.
  def dupProvenance(pairs: DataFrame, docs: DataFrame): DataFrame = {
    val src = docs.select(col("doc_id"), col("source"))
    val tagged = pairs
      .join(src.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("source", "src_a"), Seq("id_a"))
      .join(src.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("source", "src_b"), Seq("id_b"))
      .select(least(col("src_a"), col("src_b")).as("s1"),
        greatest(col("src_a"), col("src_b")).as("s2"))
      .localCheckpoint()
    val census = tagged.agg(count(lit(1)).as("n_pairs"),
      count_if(col("s1") === col("s2")).as("same_source"),
      count_if(col("s1") =!= col("s2")).as("cross_source"))
    tagged.filter(col("s1") =!= col("s2"))
      .groupBy(col("s1"), col("s2")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(census))
      .withColumn("share_ppm", expr("(1000000L * n) div cross_source"))
      .orderBy(col("n").desc, col("s1"), col("s2"))
      .limit(10)
      .select(col("s1"), col("s2"), col("n"), col("n_pairs"),
        col("same_source"), col("cross_source"), col("share_ppm"))
  }

  def q396DupProvenance(spark: SparkSession, dir: String): DataFrame =
    dupProvenance(
      TextOps.q32MinhashLsh(spark, dir).select(col("id_a"), col("id_b")),
      Tables.documents(spark, dir))

  val q396Sql: String =
    s"""WITH pairs AS (SELECT id_a, id_b FROM (${TextOps.q31Sql})),
       |tagged AS (
       |  SELECT LEAST(da.source, db.source) AS s1,
       |    GREATEST(da.source, db.source) AS s2
       |  FROM pairs
       |  JOIN documents da ON pairs.id_a = da.doc_id
       |  JOIN documents db ON pairs.id_b = db.doc_id),
       |census AS (
       |  SELECT COUNT(*) AS n_pairs,
       |    COUNT(*) FILTER (s1 = s2) AS same_source,
       |    COUNT(*) FILTER (s1 <> s2) AS cross_source
       |  FROM tagged)
       |SELECT s1, s2, COUNT(*) AS n, ANY_VALUE(n_pairs) AS n_pairs,
       |  CAST(ANY_VALUE(same_source) AS BIGINT) AS same_source,
       |  CAST(ANY_VALUE(cross_source) AS BIGINT) AS cross_source,
       |  CAST((1000000 * COUNT(*)) // ANY_VALUE(cross_source) AS BIGINT)
       |    AS share_ppm
       |FROM tagged, census WHERE s1 <> s2
       |GROUP BY s1, s2 ORDER BY n DESC, s1, s2 LIMIT 10""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q395_dr_replay", q395DrReplay _, Some(q395Sql)),
    ("q396_dup_provenance", q396DupProvenance _, Some(q396Sql)))
}
