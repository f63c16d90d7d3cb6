package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 twelfth operator batch: fixed-point mixture reweighting and
  * leave-one-out source contribution — training-mixture planning
  * readouts on the §8.4 exact-integer discipline.
  */
object Round8lOps {

  // --------------------------------------------------------------------------
  // q329 — MIXTURE REWEIGHTING (DoReMi-lite): start from uniform source
  // weights and run 3 multiplicative-weights rounds against an excess-
  // loss proxy (sources whose mean doc length trails the corpus mean get
  // upweighted), renormalizing each round — the domain-reweighting loop
  // training-mixture planners run, in EXACT fixed-point ppm integers
  // (w ← w·(10⁶ + e/4) div 10⁶, then w ← 10⁶·|S|·w div Σw) so the
  // trajectory is bit-identical on every engine. q210/q115 ship STATIC
  // mixtures; this is the iterative planner.
  //
  // Scale: the corpus is touched ONCE (per-source token totals); the
  // three rounds are |S|-row grid arithmetic with 1-row sum joins.
  def mixtureReweight(docs: DataFrame, rounds: Int): DataFrame = {
    val src = docs
      .select(col("source"), size(TextOps.toks).cast("long").as("ntok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("tok"))
      .withColumn("m_ppm", expr("(1000000L * tok) div n_docs"))
    val g = src.agg(sum(col("n_docs")).as("gn"), sum(col("tok")).as("gt"),
      count(lit(1)).as("ns"))
      .withColumn("gm_ppm", expr("(1000000L * gt) div gn"))
    var cur = src.crossJoin(broadcast(g))
      .withColumn("e_ppm", greatest(col("gm_ppm") - col("m_ppm"), lit(0L)))
      .withColumn("w", lit(1000000L))
      .select(col("source"), col("n_docs"), col("m_ppm"), col("e_ppm"),
        col("ns"), col("w"))
    val traj = (1 to rounds).map { t =>
      val up = cur.withColumn("w", expr("(w * (1000000L + e_ppm div 4L)) div 1000000L"))
      val s = up.agg(sum(col("w")).as("sw"))
      cur = up.crossJoin(broadcast(s))
        .withColumn("w", expr("(1000000L * ns * w) div sw"))
        .select(col("source"), col("n_docs"), col("m_ppm"), col("e_ppm"),
          col("ns"), col("w"))
      cur.select(col("source"), col("w").as(s"w$t"))
    }
    traj.foldLeft(
      cur.select(col("source"), col("n_docs"), col("m_ppm"), col("e_ppm")))(
      (acc, t) => acc.join(t, Seq("source")))
      .orderBy(col("source"))
  }

  def q329MixtureReweight(spark: SparkSession, dir: String): DataFrame =
    mixtureReweight(Tables.documents(spark, dir), rounds = 3)

  val q329Sql: String = {
    val toks = TextOps.toksSqlD
    def round(prev: String, cur: String): String =
      s"""${cur}u AS (
         |  SELECT source, n_docs, m_ppm, e_ppm, ns,
         |    (w * (1000000 + e_ppm // 4)) // 1000000 AS w
         |  FROM $prev),
         |${cur}s AS (SELECT SUM(w) AS sw FROM ${cur}u),
         |$cur AS (
         |  SELECT source, n_docs, m_ppm, e_ppm, ns,
         |    (1000000 * ns * w) // sw AS w
         |  FROM ${cur}u CROSS JOIN ${cur}s)""".stripMargin
    s"""WITH src AS (
       |  SELECT source, COUNT(*) AS n_docs,
       |    SUM(len($toks)) AS tok
       |  FROM documents GROUP BY 1),
       |s2 AS (
       |  SELECT source, n_docs, tok,
       |    (1000000 * tok) // n_docs AS m_ppm
       |  FROM src),
       |g AS (
       |  SELECT SUM(n_docs) AS gn, SUM(tok) AS gt, COUNT(*) AS ns,
       |    (1000000 * SUM(tok)) // SUM(n_docs) AS gm_ppm
       |  FROM s2),
       |it0 AS (
       |  SELECT source, n_docs, m_ppm,
       |    GREATEST(gm_ppm - m_ppm, 0) AS e_ppm, ns,
       |    CAST(1000000 AS BIGINT) AS w
       |  FROM s2 CROSS JOIN g),
       |${round("it0", "it1")},
       |${round("it1", "it2")},
       |${round("it2", "it3")}
       |SELECT it1.source, CAST(it1.n_docs AS BIGINT) AS n_docs,
       |  CAST(it1.m_ppm AS BIGINT) AS m_ppm, CAST(it1.e_ppm AS BIGINT) AS e_ppm,
       |  CAST(it1.w AS BIGINT) AS w1, CAST(it2.w AS BIGINT) AS w2,
       |  CAST(it3.w AS BIGINT) AS w3
       |FROM it1 JOIN it2 USING (source) JOIN it3 USING (source)
       |ORDER BY source""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q330 — LEAVE-ONE-OUT SOURCE CONTRIBUTION: what happens to corpus
  // length and unigram diversity when each source is dropped — computed
  // by SUFFICIENT-STATISTIC SUBTRACTION (global sums minus per-source
  // sums; sole-source token types from a per-type source count), so the
  // 20 ablations cost ONE corpus pass instead of 20 rescans. The
  // "which scrape is pulling its weight" readout mixture planning runs
  // before q329's reweighting.
  //
  // Scale: one tokenize pass → (type, source)-distinct aggregate →
  // per-type source counts; everything after is grid-sized. Exact
  // integers; LOO ratios are BIGINT floor-divs.
  def looSourceStats(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("source"), explode(TextOps.toks).as("w"))
    val src = toks.groupBy(col("source")).agg(count(lit(1)).as("tok"))
      .join(docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs")), Seq("source"))
    val typeSrc = toks.select(col("source"), col("w")).distinct()
    val soleTypes = typeSrc
      .withColumn("nsrc", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("w"))))
      .filter(col("nsrc") === 1)
      .groupBy(col("source")).agg(count(lit(1)).as("uniq_types"))
    val g = src.agg(sum(col("tok")).as("gt"), sum(col("n_docs")).as("gn"))
      .crossJoin(broadcast(
        typeSrc.select(col("w")).distinct().agg(count(lit(1)).as("gv"))))
    src.join(soleTypes, Seq("source"), "left")
      .withColumn("uniq_types", coalesce(col("uniq_types"), lit(0L)))
      .crossJoin(broadcast(g))
      .select(col("source"), col("n_docs"), col("tok"), col("uniq_types"),
        expr("case when gn = n_docs then null else " +
          "(1000000L * (gt - tok)) div (gn - n_docs) end").as("loo_mean_tok_ppm"),
        expr("(1000000L * gv) div gt").as("d1_ppm"),
        expr("case when gt = tok then null else " +
          "(1000000L * (gv - uniq_types)) div (gt - tok) end").as("loo_d1_ppm"),
        expr("case when gt = tok then null else " +
          "(1000000L * (gv - uniq_types)) div (gt - tok) - (1000000L * gv) div gt end")
          .as("delta_d1_ppm"))
      .orderBy(col("source"))
  }

  def q330LooSourceStats(spark: SparkSession, dir: String): DataFrame =
    looSourceStats(Tables.documents(spark, dir))

  val q330Sql: String = {
    val toks = TextOps.toksSqlD
    s"""WITH tk AS (
       |  SELECT source, UNNEST(t) AS w
       |  FROM (SELECT source, $toks AS t FROM documents)),
       |src AS (
       |  SELECT source, COUNT(*) AS tok FROM tk GROUP BY 1),
       |nd AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
       |ts AS (SELECT DISTINCT source, w FROM tk),
       |sole AS (
       |  SELECT source, COUNT(*) AS uniq_types FROM (
       |    SELECT source, w, COUNT(*) OVER (PARTITION BY w) AS nsrc FROM ts)
       |  WHERE nsrc = 1 GROUP BY 1),
       |g AS (
       |  SELECT (SELECT SUM(tok) FROM src) AS gt,
       |    (SELECT SUM(n_docs) FROM nd) AS gn,
       |    (SELECT COUNT(DISTINCT w) FROM ts) AS gv)
       |SELECT src.source, CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(tok AS BIGINT) AS tok,
       |  CAST(COALESCE(uniq_types, 0) AS BIGINT) AS uniq_types,
       |  CASE WHEN gn = n_docs THEN NULL
       |    ELSE CAST((1000000 * (gt - tok)) // (gn - n_docs) AS BIGINT)
       |  END AS loo_mean_tok_ppm,
       |  CAST((1000000 * gv) // gt AS BIGINT) AS d1_ppm,
       |  CASE WHEN gt = tok THEN NULL
       |    ELSE CAST((1000000 * (gv - COALESCE(uniq_types, 0))) // (gt - tok)
       |      AS BIGINT) END AS loo_d1_ppm,
       |  CASE WHEN gt = tok THEN NULL
       |    ELSE CAST((1000000 * (gv - COALESCE(uniq_types, 0))) // (gt - tok)
       |      - (1000000 * gv) // gt AS BIGINT) END AS delta_d1_ppm
       |FROM src JOIN nd USING (source)
       |LEFT JOIN sole USING (source)
       |CROSS JOIN g
       |ORDER BY source""".stripMargin
  }

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q329_mixture_reweight", q329MixtureReweight _, Some(q329Sql)),
    ("q330_loo_source_stats", q330LooSourceStats _, Some(q330Sql)))
}
