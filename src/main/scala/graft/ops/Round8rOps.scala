package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 eighteenth operator batch: Kruskal–Wallis rank test and
  * McNemar's paired-filter test — nonparametric k-sample and paired
  * significance surface on the §8.4 exact-integer discipline.
  */
object Round8rOps {

  // --------------------------------------------------------------------------
  // q341 — KRUSKAL–WALLIS H: do account balances differ across market
  // segments? The nonparametric k-sample complement to q295's ANOVA
  // (and the k>2 generalization of the Mann–Whitney machinery): ranks
  // instead of means, so heavy tails and outliers cannot fake a
  // difference. Doubled tie-averaged ranks (q316's trick) keep every
  // rank an exact integer: for a cent value v with cnt_v ties after
  // cumbefore_v smaller rows, dr_v = 2·cumbefore_v + cnt_v + 1. Per-
  // segment doubled rank sums s_dr ship exactly; H folds the ≤5
  // per-segment S²/n terms in segment order (PSI's fixed-order fold)
  // through the tie-corrected formula
  //   H = (3·A/(N(N+1)) − 3(N+1)) / (1 − ΣT/(N³−N)),  A = Σ S²/n
  // in doubled-rank units — a fixed double-op dag over exact integers,
  // engine-identical; h6 = pround (§8.4).
  //
  // Scale: NO corpus-wide sort — ranks come from the VALUE HISTOGRAM
  // (q169/q328's two-pass shape): per-(cent, segment) counts, one
  // exclusive-prefix window over the bounded distinct-cents grid, then
  // hash joins back. The fold sees k=5 rows.
  def kruskalWallis(rows: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val cents = rows.select(
      expr(s"cast(floor($valueCol * 100 + 0.5d) as bigint)").as("v"),
      col(groupCol).as("g"))
    val vg = cents.groupBy(col("v"), col("g")).agg(count(lit(1)).as("cvg"))
    val hist = vg.groupBy(col("v")).agg(sum(col("cvg")).as("cv"))
      .withColumn("cumbefore", coalesce(sum(col("cv")).over(
        Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("v"), col("cv"),
        (lit(2L) * col("cumbefore") + col("cv") + lit(1L)).as("dr"))
    val ties = hist.agg(sum(expr("cv * cv * cv - cv")).as("tt"))
    val grp = vg.join(hist.select(col("v"), col("dr")), Seq("v"))
      .groupBy(col("g"))
      .agg(sum(col("cvg")).as("n_g"), sum(col("cvg") * col("dr")).as("s_dr"))
    val su = grp.groupBy(lit(1).as("one"))
      .agg(sort_array(collect_list(struct(col("g"), col("n_g"), col("s_dr")))).as("gs"),
        sum(col("n_g")).as("n"))
      .crossJoin(broadcast(ties))
      // doubled ranks: r̄ = S/(2n) so Σ n·r̄² = Σ S²/(4n); H picks up a
      // /4 → the 3· coefficient below instead of 12.
      .withColumn("a4", expr(
        "aggregate(gs, 0.0d, (a, x) -> a + (cast(x.s_dr as double) * x.s_dr) / x.n_g)"))
      .withColumn("h", expr(
        """((3.0d * a4 / (cast(n as double) * (n + 1L)) - 3.0d * (n + 1L))
          |  / (1.0d - cast(tt as double) / (cast(n as double) * n * n - n)))""".stripMargin))
      .select(col("gs"), col("n").as("n_total"),
        col("tt").as("tie_term"),
        Num.pround(col("h"), 6).as("h6"),
        Num.pround(col("h") / (col("n") - lit(1L)), 6).as("epsilon_sq6"))
    su.select(explode(col("gs")).as("x"), col("n_total"), col("tie_term"),
        col("h6"), col("epsilon_sq6"))
      .select(col("x.g").as("segment"), col("x.n_g").as("n_g"),
        col("x.s_dr").as("s_dr"), col("n_total"), col("tie_term"),
        col("h6"), col("epsilon_sq6"))
      .orderBy(col("segment"))
  }

  def q341KruskalWallis(spark: SparkSession, dir: String): DataFrame =
    kruskalWallis(Tables.customer(spark, dir), "c_acctbal", "c_mktsegment")

  val q341Sql: String =
    """WITH cents AS (
      |  SELECT CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS v,
      |    c_mktsegment AS g
      |  FROM customer),
      |vg AS (SELECT v, g, COUNT(*) AS cvg FROM cents GROUP BY 1, 2),
      |hist AS (
      |  SELECT v, SUM(cvg) AS cv,
      |    COALESCE(SUM(SUM(cvg)) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumbefore
      |  FROM vg GROUP BY v),
      |dr AS (SELECT v, cv, 2 * cumbefore + cv + 1 AS dr FROM hist),
      |ties AS (SELECT SUM(cv * cv * cv - cv) AS tt FROM dr),
      |grp AS (
      |  SELECT g, SUM(cvg) AS n_g, SUM(cvg * dr) AS s_dr
      |  FROM vg JOIN dr USING (v) GROUP BY g),
      |su AS (
      |  SELECT SUM(n_g) AS n, tt,
      |    list_reduce(list_prepend(0.0, list(
      |      (CAST(s_dr AS DOUBLE) * s_dr) / n_g ORDER BY g)),
      |      (a, b) -> a + b) AS a4
      |  FROM grp CROSS JOIN ties GROUP BY tt),
      |h AS (
      |  SELECT n, tt,
      |    ((3.0 * a4 / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1))
      |     / (1.0 - CAST(tt AS DOUBLE) / (CAST(n AS DOUBLE) * n * n - n))) AS hv
      |  FROM su)
      |SELECT g AS segment, CAST(n_g AS BIGINT) AS n_g,
      |  CAST(s_dr AS BIGINT) AS s_dr, CAST(n AS BIGINT) AS n_total,
      |  CAST(tt AS BIGINT) AS tie_term,
      |  FLOOR((hv) * 1e6 + 0.5) / 1e6 AS h6,
      |  FLOOR((hv / (n - 1)) * 1e6 + 0.5) / 1e6 AS epsilon_sq6
      |FROM grp CROSS JOIN h ORDER BY segment""".stripMargin

  // --------------------------------------------------------------------------
  // q342 — McNEMAR'S PAIRED-FILTER TEST: when two document-quality
  // filters run on the SAME corpus, do they disagree more than chance?
  // Filter A = Gopher word-count floor (≥ 50 tokens), filter B =
  // Gopher mean-word-length band (3..10 chars, compared as the exact
  // integer cross-multiplication 3·wc ≤ sumlen ≤ 10·wc — no division).
  // The b/c discordant cells drive χ² = (b−c)²/(b+c), shipped as the
  // exact integer ppm (10⁶·(b−c)²) div (b+c) — every hashed cell a
  // BIGINT (§8.4). The filter-governance readout every curation
  // pipeline needs before swapping one gate for another (q87/q179
  // built the gates; this tests whether they measure the same thing).
  //
  // Scale: one row-local token pass per doc, one global 4-cell
  // aggregate. Nothing shuffles but the 4 counters.
  def mcNemar(docs: DataFrame): DataFrame =
    docs
      .select(expr("filter(split(lower(text), ' '), t -> t != '')").as("t"))
      .select(size(col("t")).cast("long").as("wc"),
        expr("aggregate(t, 0L, (a, x) -> a + length(x))").as("sumlen"))
      .select((col("wc") >= 50L).as("pa"),
        (col("sumlen") >= lit(3L) * col("wc") &&
          col("sumlen") <= lit(10L) * col("wc")).as("pb"))
      .agg(count(lit(1)).as("n_docs"),
        count_if(col("pa") && col("pb")).as("both_pass"),
        count_if(col("pa") && !col("pb")).as("only_a"),
        count_if(!col("pa") && col("pb")).as("only_b"),
        count_if(!col("pa") && !col("pb")).as("neither"))
      .select(col("n_docs"), col("both_pass"), col("only_a"), col("only_b"),
        col("neither"),
        when(col("only_a") + col("only_b") === 0L, lit(null))
          .otherwise(expr(
            """(1000000L * (only_a - only_b) * (only_a - only_b))
              | div (only_a + only_b)""".stripMargin)).as("chi2_ppm"),
        expr("(1000000L * (only_a + only_b)) div n_docs").as("discordant_ppm"))

  def q342McNemar(spark: SparkSession, dir: String): DataFrame =
    mcNemar(Tables.documents(spark, dir))

  val q342Sql: String =
    s"""WITH f AS (
       |  SELECT len(t) AS wc,
       |    COALESCE(list_sum(list_transform(t, x -> length(x))), 0) AS sumlen
       |  FROM (SELECT ${TextOps.toksSqlD} AS t FROM documents)),
       |p AS (
       |  SELECT wc >= 50 AS pa,
       |    sumlen >= 3 * wc AND sumlen <= 10 * wc AS pb
       |  FROM f)
       |SELECT COUNT(*) AS n_docs,
       |  COUNT(*) FILTER (pa AND pb) AS both_pass,
       |  COUNT(*) FILTER (pa AND NOT pb) AS only_a,
       |  COUNT(*) FILTER (NOT pa AND pb) AS only_b,
       |  COUNT(*) FILTER (NOT pa AND NOT pb) AS neither,
       |  CASE WHEN COUNT(*) FILTER (pa != pb) = 0 THEN NULL
       |    ELSE CAST((1000000 * (COUNT(*) FILTER (pa AND NOT pb)
       |                          - COUNT(*) FILTER (NOT pa AND pb))
       |                        * (COUNT(*) FILTER (pa AND NOT pb)
       |                          - COUNT(*) FILTER (NOT pa AND pb)))
       |      // (COUNT(*) FILTER (pa != pb)) AS BIGINT) END AS chi2_ppm,
       |  CAST((1000000 * COUNT(*) FILTER (pa != pb)) // COUNT(*) AS BIGINT)
       |    AS discordant_ppm
       |FROM p""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q341_kruskal_wallis", q341KruskalWallis _, Some(q341Sql)),
    ("q342_mcnemar", q342McNemar _, Some(q342Sql)))
}
