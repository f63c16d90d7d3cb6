package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 fifteenth operator batch: the n-gram novelty curve and
  * Zipf vocabulary-coverage sizing — LM-data memorization and tokenizer
  * planning readouts on the §8.4 exact-integer discipline.
  */
object Round8oOps {

  private def gramCol(n: Int): org.apache.spark.sql.Column =
    if (n == 1) explode(col("t"))
    else explode(expr(
      s"transform(sequence(1, size(t) - ${n - 1}), i -> " +
        (1 to n).map(j => s"element_at(t, cast(i as int) + ${j - 1})")
          .mkString("concat_ws(' ', ", ", ", ")") + ")"))

  private def gramSql(n: Int): String =
    if (n == 1) "UNNEST(t)"
    else (1 to n).map(j => s"t[i+${j - 1}]").mkString(" || ' ' || ")

  // --------------------------------------------------------------------------
  // q335 — N-GRAM NOVELTY CURVE: for the held-out eval slice
  // (doc_id % 50 == 0), the fraction of n-gram OCCURRENCES (n = 1..5)
  // absent from the train split's n-gram vocabulary — the "% novel
  // n-grams" curve LM data papers publish to bound surface-level
  // memorization. q327 reads the per-doc 3-gram distribution; this is
  // the aggregate curve across n. All counts and novel_ppm exact.
  //
  // Scale: per n, one explode on each side and one vocabulary semi-join
  // keyed by gram — five linear passes; at 100 TB the train vocabulary
  // side takes a bloom/stop-gram cap (q194/q176's guards).
  def noveltyCurve(docs: DataFrame, maxN: Int): DataFrame = {
    val t = docs.select(col("doc_id"), TextOps.toks.as("t"))
    val perN = (1 to maxN).map { n =>
      val grams = t.filter(size(col("t")) >= n)
        .select(col("doc_id"), gramCol(n).as("g"))
      val tv = grams.filter(col("doc_id") % 50 =!= 0).select(col("g")).distinct()
      grams.filter(col("doc_id") % 50 === 0)
        .join(tv.withColumn("hit", lit(1L)), Seq("g"), "left")
        .agg(lit(n.toLong).as("n"), count(lit(1)).as("eval_grams"),
          coalesce(sum(coalesce(col("hit"), lit(0L))), lit(0L)).as("covered"))
    }
    perN.reduce(_ unionByName _)
      .select(col("n"), col("eval_grams"), col("covered"),
        expr("case when eval_grams = 0L then null " +
          "else 1000000L - (1000000L * covered) div eval_grams end").as("novel_ppm"))
      .orderBy(col("n"))
  }

  def q335NoveltyCurve(spark: SparkSession, dir: String): DataFrame =
    noveltyCurve(Tables.documents(spark, dir), maxN = 5)

  val q335Sql: String = {
    val toks = TextOps.toksSqlD
    def one(n: Int): String = {
      val from =
        if (n == 1) s"SELECT doc_id, UNNEST(t) AS g FROM tt WHERE len(t) >= 1"
        else s"""SELECT doc_id, ${gramSql(n)} AS g
                |        FROM tt, UNNEST(generate_series(1, len(t) - ${n - 1})) AS s(i)
                |        WHERE len(t) >= $n""".stripMargin
      s"""SELECT $n AS n, COUNT(*) AS eval_grams,
         |  SUM(CASE WHEN g IN (
         |    SELECT g FROM ($from) WHERE doc_id % 50 <> 0)
         |    THEN 1 ELSE 0 END) AS covered
         |FROM ($from) WHERE doc_id % 50 = 0""".stripMargin
    }
    s"""WITH tt AS (SELECT doc_id, $toks AS t FROM documents),
       |u AS (${(1 to 5).map(one).mkString("\n|UNION ALL\n|")})
       |SELECT CAST(n AS BIGINT) AS n, eval_grams,
       |  CAST(COALESCE(covered, 0) AS BIGINT) AS covered,
       |  CASE WHEN eval_grams = 0 THEN NULL
       |    ELSE CAST(1000000 - (1000000 * COALESCE(covered, 0)) // eval_grams
       |      AS BIGINT) END AS novel_ppm
       |FROM u ORDER BY n""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q336 — VOCABULARY COVERAGE SIZING: the minimal vocabulary (types
  // taken in frequency-descending order) covering 90/95/99% of token
  // occurrences — the tokenizer-capacity readout. Runs on the
  // COUNT-OF-COUNTS grid (q302's shape): within a frequency class types
  // are interchangeable, so the minimal size is the previous classes'
  // vocab plus an exact ceil-div of the remaining need — every cell an
  // exact integer.
  //
  // Scale: one token count pass → count-of-counts aggregate; cum sums
  // are windows over the distinct-frequency grid (bounded far below the
  // corpus, q302's argument); targets are a broadcast 3-row grid.
  def vocabCoverage(docs: DataFrame): DataFrame = {
    val freq = docs.select(explode(TextOps.toks).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    val coc = freq.groupBy(col("f")).agg(count(lit(1)).as("n_types"))
    val wDesc = Window.orderBy(col("f").desc)
    val grid = coc
      .withColumn("cum_cov", sum(col("f") * col("n_types"))
        .over(wDesc.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cum_vocab", sum(col("n_types"))
        .over(wDesc.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("prev_cov", coalesce(sum(col("f") * col("n_types"))
        .over(wDesc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("prev_vocab", coalesce(sum(col("n_types"))
        .over(wDesc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val tot = freq.agg(sum(col("f")).as("tt"))
    val targets = tot.select(explode(expr(
      "transform(array(90L, 95L, 99L), p -> named_struct('pct', p, 'need', p * tt))"))
      .as("g"), col("tt"))
      .select(col("g.pct").as("pct"), col("g.need").as("need"), col("tt"))
    grid.crossJoin(broadcast(targets))
      .filter(col("cum_cov") * 100 >= col("need") &&
        col("prev_cov") * 100 < col("need"))
      .select(col("pct").as("target_pct"), col("f").as("crossing_freq"),
        (col("prev_vocab") +
          expr("(need - 100L * prev_cov + 100L * f - 1L) div (100L * f)"))
          .as("vocab_size"),
        expr("(1000000L * (prev_cov + " +
          "((need - 100L * prev_cov + 100L * f - 1L) div (100L * f)) * f)) div tt")
          .as("achieved_cov_ppm"))
      .orderBy(col("target_pct"))
  }

  def q336VocabCoverage(spark: SparkSession, dir: String): DataFrame =
    vocabCoverage(Tables.documents(spark, dir))

  val q336Sql: String = {
    val toks = TextOps.toksSqlD
    s"""WITH w AS (
       |  SELECT UNNEST(t) AS w FROM (SELECT $toks AS t FROM documents)),
       |freq AS (SELECT w, COUNT(*) AS f FROM w GROUP BY 1),
       |coc AS (SELECT f, COUNT(*) AS n_types FROM freq GROUP BY 1),
       |grid AS (
       |  SELECT f, n_types,
       |    SUM(f * n_types) OVER (ORDER BY f DESC ROWS UNBOUNDED PRECEDING)
       |      AS cum_cov,
       |    COALESCE(SUM(f * n_types) OVER (ORDER BY f DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_cov,
       |    COALESCE(SUM(n_types) OVER (ORDER BY f DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_vocab
       |  FROM coc),
       |t AS (SELECT SUM(f) AS tt FROM freq),
       |tg AS (
       |  SELECT p AS pct, p * tt AS need, tt
       |  FROM t, UNNEST([90, 95, 99]) AS u(p))
       |SELECT CAST(pct AS BIGINT) AS target_pct, CAST(f AS BIGINT) AS crossing_freq,
       |  CAST(prev_vocab + (need - 100 * prev_cov + 100 * f - 1) // (100 * f)
       |    AS BIGINT) AS vocab_size,
       |  CAST((1000000 * (prev_cov +
       |    ((need - 100 * prev_cov + 100 * f - 1) // (100 * f)) * f)) // tt
       |    AS BIGINT) AS achieved_cov_ppm
       |FROM grid CROSS JOIN tg
       |WHERE cum_cov * 100 >= need AND prev_cov * 100 < need
       |ORDER BY target_pct""".stripMargin
  }

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q335_novelty_curve", q335NoveltyCurve _, Some(q335Sql)),
    ("q336_vocab_coverage", q336VocabCoverage _, Some(q336Sql)))
}
