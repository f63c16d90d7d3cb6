package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 twentieth operator batch: ROUGE-2 clipped-overlap audit of
  * near-dup pairs and Welch's unequal-variance t-test — dup-pair
  * alignment and two-sample inference on the §8.4 discipline.
  */
object Round8tOps {

  // --------------------------------------------------------------------------
  // q345 — ROUGE-2 CLIPPED OVERLAP on the verified near-dup pairs: for
  // every q31 pair (exact Jaccard ≥ 0.5), the MULTISET bigram overlap
  // clip = Σ_g min(c_A(g), c_B(g)) with precision/recall/F1 in exact
  // ppm. Set-based Jaccard (q31) can call two docs 60% similar when one
  // repeats a phrase 50 times and the other once; the clipped counts —
  // ROUGE/BLEU's modified-precision trick — are the alignment audit
  // that distinguishes genuine duplication from phrase spam. Every
  // hashed cell an exact BIGINT.
  //
  // Scale: the pair set is the already-probed banded path; bigram
  // count tables are semi-joined down to paired docs before the
  // per-gram equi-join, so cost tracks the true pair set, never the
  // corpus square.
  def rouge2Pairs(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val ids = pairs.select(col("id_a").as("doc_id"))
      .unionAll(pairs.select(col("id_b").as("doc_id"))).distinct()
    val grams = docs.join(ids, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        expr("filter(split(lower(text), ' '), t -> t != '')").as("t"))
      .select(col("doc_id"), explode(expr(
        """if(size(t) >= 2,
          |   transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i+1])),
          |   array())""".stripMargin)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val sizes = grams.groupBy(col("doc_id")).agg(sum(col("c")).as("tb"))
    val inter = pairs
      .join(grams.select(col("doc_id").as("id_a"), col("g"), col("c").as("ca")),
        Seq("id_a"))
      .join(grams.select(col("doc_id").as("id_b"), col("g"), col("c").as("cb")),
        Seq("id_b", "g"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(least(col("ca"), col("cb"))).as("clip"))
    pairs
      .join(sizes.select(col("doc_id").as("id_a"), col("tb").as("tb_a")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("tb").as("tb_b")), Seq("id_b"))
      .join(inter, Seq("id_a", "id_b"), "left")
      .withColumn("clip", coalesce(col("clip"), lit(0L)))
      .select(col("id_a"), col("id_b"), col("clip"), col("tb_a"), col("tb_b"),
        expr("(1000000L * clip) div tb_a").as("p_ppm"),
        expr("(1000000L * clip) div tb_b").as("r_ppm"),
        expr("(2000000L * clip) div (tb_a + tb_b)").as("f1_ppm"))
      .orderBy(col("id_a"), col("id_b"))
  }

  def q345Rouge2Pairs(spark: SparkSession, dir: String): DataFrame =
    rouge2Pairs(Tables.documents(spark, dir),
      TextOps.q31NgramJaccard(spark, dir).select(col("id_a"), col("id_b")))

  val q345Sql: String =
    s"""WITH pairs AS (SELECT id_a, id_b FROM (${TextOps.q31Sql})),
       |ids AS (
       |  SELECT id_a AS doc_id FROM pairs
       |  UNION SELECT id_b FROM pairs),
       |grams AS (
       |  SELECT doc_id, t[i] || ' ' || t[i+1] AS g, COUNT(*) AS c
       |  FROM (SELECT doc_id, ${TextOps.toksSqlD} AS t FROM documents
       |        WHERE doc_id IN (SELECT doc_id FROM ids)),
       |       UNNEST(generate_series(1, len(t) - 1)) AS u(i)
       |  GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, SUM(c) AS tb FROM grams GROUP BY 1),
       |inter AS (
       |  SELECT id_a, id_b, SUM(LEAST(a.c, b.c)) AS clip
       |  FROM pairs
       |  JOIN grams a ON a.doc_id = id_a
       |  JOIN grams b ON b.doc_id = id_b AND a.g = b.g
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, CAST(COALESCE(clip, 0) AS BIGINT) AS clip,
       |  CAST(sa.tb AS BIGINT) AS tb_a, CAST(sb.tb AS BIGINT) AS tb_b,
       |  CAST((1000000 * COALESCE(clip, 0)) // sa.tb AS BIGINT) AS p_ppm,
       |  CAST((1000000 * COALESCE(clip, 0)) // sb.tb AS BIGINT) AS r_ppm,
       |  CAST((2000000 * COALESCE(clip, 0)) // (sa.tb + sb.tb) AS BIGINT) AS f1_ppm
       |FROM pairs
       |JOIN sizes sa ON sa.doc_id = id_a
       |JOIN sizes sb ON sb.doc_id = id_b
       |LEFT JOIN inter USING (id_a, id_b)
       |ORDER BY id_a, id_b""".stripMargin

  // --------------------------------------------------------------------------
  // q346 — WELCH'S UNEQUAL-VARIANCE t-TEST: do BUILDING and MACHINERY
  // customers hold different balances? The default two-sample test when
  // variances differ (q295's ANOVA assumes they don't; q341 ranks away
  // the scale entirely). Sufficient statistics per group are exact
  // cent sums (the variance numerator n·Σx² − (Σx)² in DECIMAL(38,0)
  // so the square cannot overflow at any SF — q307's guard); t and the
  // Welch–Satterthwaite df are a fixed double-op dag over those exact
  // integers (§8.4), shipped via pround.
  //
  // Scale: ONE conditional aggregate over the filtered scan — both
  // groups' sufficient statistics land in a single row, so there is no
  // join (and nothing for the plan lint to doubt).
  def welchT(rows: DataFrame, valueCol: String, groupCol: String,
             gA: String, gB: String): DataFrame = {
    rows
      .filter(col(groupCol).isin(gA, gB))
      .select((col(groupCol) === gA).as("isa"),
        expr(s"cast(floor($valueCol * 100 + 0.5d) as bigint)").as("v"))
      .agg(
        count_if(col("isa")).as("n_a"),
        sum(when(col("isa"), col("v"))).as("s1a"),
        sum(when(col("isa"), expr("cast(v as decimal(38,0)) * v"))).as("s2a"),
        count_if(!col("isa")).as("n_b"),
        sum(when(!col("isa"), col("v"))).as("s1b"),
        sum(when(!col("isa"), expr("cast(v as decimal(38,0)) * v"))).as("s2b"))
      // per-group sample variance in cents², as a double over exact ints
      .withColumn("va", expr(
        "cast(cast(n_a as decimal(38,0)) * s2a - cast(s1a as decimal(38,0)) * s1a as double)" +
          " / (cast(n_a as double) * (n_a - 1L))"))
      .withColumn("vb", expr(
        "cast(cast(n_b as decimal(38,0)) * s2b - cast(s1b as decimal(38,0)) * s1b as double)" +
          " / (cast(n_b as double) * (n_b - 1L))"))
      .withColumn("se2", expr("va / n_a + vb / n_b"))
      .withColumn("t", expr(
        "(cast(s1a as double) / n_a - cast(s1b as double) / n_b) / sqrt(se2)"))
      .withColumn("df", expr(
        """(se2 * se2) / ((va / n_a) * (va / n_a) / (n_a - 1L)
          |  + (vb / n_b) * (vb / n_b) / (n_b - 1L))""".stripMargin))
      .select(col("n_a"), col("n_b"),
        expr("s1a div n_a").as("mean_a_cents"),
        expr("s1b div n_b").as("mean_b_cents"),
        Num.pround(sqrt(col("va")), 2).as("sd_a_cents2"),
        Num.pround(sqrt(col("vb")), 2).as("sd_b_cents2"),
        Num.pround(col("t"), 6).as("t6"),
        Num.pround(col("df"), 4).as("df4"))
  }

  def q346WelchT(spark: SparkSession, dir: String): DataFrame =
    welchT(Tables.customer(spark, dir), "c_acctbal", "c_mktsegment",
      "BUILDING", "MACHINERY")

  val q346Sql: String =
    """WITH st AS (
      |  SELECT
      |    COUNT(*) FILTER (c_mktsegment = 'BUILDING') AS n_a,
      |    SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))
      |      FILTER (c_mktsegment = 'BUILDING') AS s1a,
      |    SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)
      |      * CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))
      |      FILTER (c_mktsegment = 'BUILDING') AS s2a,
      |    COUNT(*) FILTER (c_mktsegment = 'MACHINERY') AS n_b,
      |    SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))
      |      FILTER (c_mktsegment = 'MACHINERY') AS s1b,
      |    SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)
      |      * CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))
      |      FILTER (c_mktsegment = 'MACHINERY') AS s2b
      |  FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
      |j AS (
      |  SELECT n_a, n_b, s1a, s1b,
      |    CAST(n_a * s2a - s1a * s1a AS DOUBLE) / (CAST(n_a AS DOUBLE) * (n_a - 1)) AS va,
      |    CAST(n_b * s2b - s1b * s1b AS DOUBLE) / (CAST(n_b AS DOUBLE) * (n_b - 1)) AS vb
      |  FROM st),
      |k AS (SELECT *, va / n_a + vb / n_b AS se2 FROM j)
      |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |  CAST(s1a // n_a AS BIGINT) AS mean_a_cents,
      |  CAST(s1b // n_b AS BIGINT) AS mean_b_cents,
      |  FLOOR((sqrt(va)) * 1e2 + 0.5) / 1e2 AS sd_a_cents2,
      |  FLOOR((sqrt(vb)) * 1e2 + 0.5) / 1e2 AS sd_b_cents2,
      |  FLOOR(((CAST(s1a AS DOUBLE) / n_a - CAST(s1b AS DOUBLE) / n_b)
      |    / sqrt(se2)) * 1e6 + 0.5) / 1e6 AS t6,
      |  FLOOR(((se2 * se2) / ((va / n_a) * (va / n_a) / (n_a - 1)
      |    + (vb / n_b) * (vb / n_b) / (n_b - 1))) * 1e4 + 0.5) / 1e4 AS df4
      |FROM k""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q345_rouge2_pairs", q345Rouge2Pairs _, Some(q345Sql)),
    ("q346_welch_t", q346WelchT _, Some(q346Sql)))
}
