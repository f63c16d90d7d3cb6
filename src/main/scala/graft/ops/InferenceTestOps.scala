package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact-integer hypothesis tests of difference and agreement — Kruskal-Wallis, McNemar, Welch t, Friedman, energy distance, Fano dispersion, ICC, median CI, runs test, Cochran Q, Page L, Krippendorff alpha, Cramér V, Hodges-Lehmann, Cramér-von Mises, regression-to-mean — plus their batch riders (ROUGE-2 pairs, source divergence, lexical diversity, FD discovery).
  *
  * Consolidated from the round-8 per-batch files (Round8rOps, Round8tOps, Round8uOps, Round8xOps, Round8yOps, Round8aaOps, Round8abOps, Round8adOps, Round8afOps, Round8ahOps)
  * per the round-8 verdict's maintainability task: same operators,
  * same catalog entries, same oracles, byte-identical results —
  * only the file layout changed. Section markers preserve the
  * original batch scaladocs and boundaries.
  */
object InferenceTestOps {
  // ═════════════════ formerly Round8rOps ═════════════════
  /** Round-8 eighteenth operator batch: Kruskal–Wallis rank test and
    * McNemar's paired-filter test — nonparametric k-sample and paired
    * significance surface on the §8.4 exact-integer discipline.
    */

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

  private val catalogR: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q341_kruskal_wallis", q341KruskalWallis _, Some(q341Sql)),
    ("q342_mcnemar", q342McNemar _, Some(q342Sql)))

  // ═════════════════ formerly Round8tOps ═════════════════
  /** Round-8 twentieth operator batch: ROUGE-2 clipped-overlap audit of
    * near-dup pairs and Welch's unequal-variance t-test — dup-pair
    * alignment and two-sample inference on the §8.4 discipline.
    */

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
  def rouge2Pairs(docs: DataFrame, pairs0: DataFrame): DataFrame = {
    // lazy checkpoint (§8.22): the pair set — itself a full near-dup
    // pipeline (shingle + inverted-index join) — feeds FOUR consumers
    // (both id sides, the clipped-overlap join, the final assembly);
    // unflattened it recomputes q31 per consumer
    val pairs = pairs0.localCheckpoint(false)
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
      .localCheckpoint(false)
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

  private val catalogT: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q345_rouge2_pairs", q345Rouge2Pairs _, Some(q345Sql)),
    ("q346_welch_t", q346WelchT _, Some(q346Sql)))

  // ═════════════════ formerly Round8uOps ═════════════════
  /** Round-8 twenty-first operator batch: Friedman's within-block rank
    * test and the pairwise source-divergence matrix — repeated-measures
    * inference and corpus-mixture drift on the §8.4 exact-integer
    * discipline.
    */

  // --------------------------------------------------------------------------
  // q347 — FRIEDMAN TEST (tie-corrected, Conover's T1): does the
  // relative ACTIVITY RANKING of the five event types hold steady
  // day over day, or do types genuinely trade places? Blocks = days,
  // treatments = event types, response = daily event count; each
  // day ranks its own five counts, so volume trends cancel — the
  // repeated-measures complement to q341 (which pools all rows).
  // Doubled tie-averaged ranks keep every cell an exact integer, and
  // in doubled units the whole statistic is integer-exact:
  //   T1 = (k−1)·(Σ_j R2_j² − n²k(k+1)²) / (Σ dr² − nk(k+1)²)
  // — ONE division + pround at the very end (§8.4). Missing
  // (day, type) cells are zero-filled off the bounded day×type grid so
  // every block is complete, as Friedman requires.
  //
  // Scale: the corpus collapses to the day×type grid; the only window
  // ranks k=5 rows per day partition.
  def friedman(events: DataFrame): DataFrame = {
    val cnt = events.groupBy(
        to_date(col("ts")).as("d"), col("event_type").as("t"))
      .agg(count(lit(1)).as("c"))
    val grid = cnt.select(col("d")).distinct()
      .crossJoin(broadcast(cnt.select(col("t")).distinct()))
      .join(cnt, Seq("d", "t"), "left")
      .na.fill(0L, Seq("c"))
    val ranked = grid
      .withColumn("rmin", rank().over(
        Window.partitionBy(col("d")).orderBy(col("c"))))
      .withColumn("ties", count(lit(1)).over(
        Window.partitionBy(col("d"), col("c"))))
      .withColumn("dr", lit(2L) * (col("rmin") - 1L) + col("ties") + 1L)
    val perType = ranked.groupBy(col("t"))
      .agg(sum(col("dr")).as("r2_sum"))
    val su = ranked.agg(
        sum(col("dr") * col("dr")).as("a2"),
        countDistinct(col("d")).as("n"),
        countDistinct(col("t")).as("k"))
    val num = perType.agg(sum(col("r2_sum") * col("r2_sum")).as("rr"))
    perType.crossJoin(broadcast(su)).crossJoin(broadcast(num))
      .withColumn("t1", expr(
        """cast((k - 1L) * (rr - n * n * k * (k + 1L) * (k + 1L)) as double)
          |  / (a2 - n * k * (k + 1L) * (k + 1L))""".stripMargin))
      .select(col("t").as("event_type"), col("r2_sum"), col("n").as("n_days"),
        col("k"), Num.pround(col("t1"), 6).as("t1_6"))
      .orderBy(col("event_type"))
  }

  def q347Friedman(spark: SparkSession, dir: String): DataFrame =
    friedman(Tables.events(spark, dir))

  val q347Sql: String =
    """WITH cnt AS (
      |  SELECT CAST(ts AS DATE) AS d, event_type AS t, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT dd.d, tt.t, COALESCE(c, 0) AS c
      |  FROM (SELECT DISTINCT d FROM cnt) dd
      |  CROSS JOIN (SELECT DISTINCT t FROM cnt) tt
      |  LEFT JOIN cnt ON cnt.d = dd.d AND cnt.t = tt.t),
      |rk AS (
      |  SELECT d, t, c,
      |    RANK() OVER (PARTITION BY d ORDER BY c) AS rmin,
      |    COUNT(*) OVER (PARTITION BY d, c) AS ties
      |  FROM grid),
      |dr AS (SELECT d, t, 2 * (rmin - 1) + ties + 1 AS dr FROM rk),
      |pt AS (SELECT t, SUM(dr) AS r2_sum FROM dr GROUP BY t),
      |su AS (
      |  SELECT SUM(dr * dr) AS a2, COUNT(DISTINCT d) AS n,
      |    COUNT(DISTINCT t) AS k
      |  FROM dr),
      |num AS (SELECT SUM(r2_sum * r2_sum) AS rr FROM pt)
      |SELECT t AS event_type, CAST(r2_sum AS BIGINT) AS r2_sum,
      |  CAST(n AS BIGINT) AS n_days, CAST(k AS BIGINT) AS k,
      |  FLOOR((CAST((k - 1) * (rr - n * n * k * (k + 1) * (k + 1)) AS DOUBLE)
      |    / (a2 - n * k * (k + 1) * (k + 1))) * 1e6 + 0.5) / 1e6 AS t1_6
      |FROM pt CROSS JOIN su CROSS JOIN num
      |ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------------------
  // q348 — SOURCE-DIVERGENCE MATRIX: pairwise triangular discrimination
  //   Δ(P,Q) = Σ_w (p_w − q_w)² / (p_w + q_w)  ∈ [0, 2]
  // between the unigram distributions of every source pair — the
  // mixture-drift readout behind "which corpus sources are
  // interchangeable". Δ is the f-divergence that is EXACTLY computable
  // in integers (¼Δ ≤ JSD/ln2 ≤ Δ orders pairs the same way in
  // practice): with word counts a_w (total A) and b_w (total B),
  // per-word cross-scaled masses x = a_w·B, y = b_w·A give
  //   Δ·AB = Σ_shared (x−y)²/(x+y) + (A−Σa_sh)·B + (B−Σb_sh)·A
  // — per-term exact floors (DECIMAL(38,0) squares), order-free BIGINT
  // sums, one final ppm floor-div. Not a float anywhere (§8.4).
  //
  // Scale: one token pass → (source, word) counts; the pair expansion
  // is an equi-join on the WORD (each word meets ≤ 20² source pairs),
  // never a corpus cross; the 20-row totals cross is broadcast.
  def sourceDivergence(docs: DataFrame): DataFrame = {
    val cnt = docs
      .select(col("source").as("s"),
        explode(expr("filter(split(lower(text), ' '), t -> t != '')")).as("w"))
      .groupBy(col("s"), col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val tot = cnt.groupBy(col("s")).agg(sum(col("c")).as("tt"))
    val pairs = tot.select(col("s").as("s1"), col("tt").as("ta"))
      .crossJoin(broadcast(tot.select(col("s").as("s2"), col("tt").as("tb"))))
      .filter(col("s1") < col("s2"))
    val shared = cnt.select(col("s").as("s1"), col("w"), col("c").as("a"))
      .join(cnt.select(col("s").as("s2"), col("w"), col("c").as("b")), Seq("w"))
      .filter(col("s1") < col("s2"))
      .join(pairs, Seq("s1", "s2"))
      .withColumn("x", col("a") * col("tb"))
      .withColumn("y", col("b") * col("ta"))
      .groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).as("shared_words"),
        sum(expr(
          "cast((cast(x as decimal(38,0)) - y) * (cast(x as decimal(38,0)) - y)" +
            " div (x + y) as bigint)")).as("tsh"),
        sum(col("a")).as("ash"), sum(col("b")).as("bsh"))
    pairs.join(shared, Seq("s1", "s2"), "left")
      .na.fill(0L, Seq("shared_words", "tsh", "ash", "bsh"))
      .withColumn("sigma", col("tsh")
        + (col("ta") - col("ash")) * col("tb")
        + (col("tb") - col("bsh")) * col("ta"))
      .select(col("s1"), col("s2"), col("shared_words"),
        expr("cast((cast(1000000 as decimal(38,0)) * sigma) div (ta * tb) as bigint)")
          .as("delta_ppm"))
      .orderBy(col("s1"), col("s2"))
  }

  def q348SourceDivergence(spark: SparkSession, dir: String): DataFrame =
    sourceDivergence(Tables.documents(spark, dir))

  val q348Sql: String =
    s"""WITH cnt AS (
       |  SELECT source AS s, w, COUNT(*) AS c
       |  FROM (SELECT source, UNNEST(${TextOps.toksSqlD}) AS w FROM documents)
       |  GROUP BY 1, 2),
       |tot AS (SELECT s, SUM(c) AS tt FROM cnt GROUP BY 1),
       |pairs AS (
       |  SELECT a.s AS s1, b.s AS s2, a.tt AS ta, b.tt AS tb
       |  FROM tot a JOIN tot b ON a.s < b.s),
       |shared AS (
       |  SELECT s1, s2, COUNT(*) AS shared_words,
       |    SUM(CAST((CAST(a.c AS HUGEINT) * tb - CAST(b.c AS HUGEINT) * ta)
       |          * (CAST(a.c AS HUGEINT) * tb - CAST(b.c AS HUGEINT) * ta)
       |        // (a.c * tb + b.c * ta) AS BIGINT)) AS tsh,
       |    SUM(a.c) AS ash, SUM(b.c) AS bsh
       |  FROM cnt a
       |  JOIN cnt b ON a.w = b.w AND a.s < b.s
       |  JOIN pairs ON pairs.s1 = a.s AND pairs.s2 = b.s
       |  GROUP BY 1, 2)
       |SELECT s1, s2, COALESCE(shared_words, 0) AS shared_words,
       |  CAST((1000000::HUGEINT * (COALESCE(tsh, 0)
       |      + (ta - COALESCE(ash, 0)) * tb
       |      + (tb - COALESCE(bsh, 0)) * ta))
       |    // (ta * tb) AS BIGINT) AS delta_ppm
       |FROM pairs LEFT JOIN shared USING (s1, s2)
       |ORDER BY s1, s2""".stripMargin

  private val catalogU: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q347_friedman", q347Friedman _, Some(q347Sql)),
    ("q348_source_divergence", q348SourceDivergence _, Some(q348Sql)))

  // ═════════════════ formerly Round8xOps ═════════════════
  /** Round-8 twenty-fourth operator batch: exact two-sample energy
    * distance and the Fano overdispersion index — full-distribution
    * testing and count-process diagnostics on the §8.4 exact-integer
    * discipline.
    */

  // --------------------------------------------------------------------------
  // q353 — TWO-SAMPLE ENERGY DISTANCE (Székely–Rizzo), EXACTLY:
  //   E = 2·E|X−Y| − E|X−X'| − E|Y−Y'|
  // between BUILDING and MACHINERY balances — the full-distribution
  // complement to q346's mean test and q341's rank test (E = 0 iff the
  // distributions are equal; catches variance/shape differences a
  // t-test can't). The naive computation is three quadratic pair sums;
  // on the sorted VALUE HISTOGRAM each collapses to prefix-sum algebra:
  //   Σ_pairs |u−v| = Σ_v cnt_v·(v·cum_lt − cumS_lt + (S − cumS_le)
  //                              − v·(N − cum_le))
  // so T_xy/T_xx/T_yy are exact BIGINTs off ONE window pass over the
  // distinct-cents grid, and E·n²m² cross-multiplies exactly in
  // DECIMAL(38,0). Ships E in exact micro-cents plus the permutation-
  // scale statistic nm/(n+m)·E via pround.
  //
  // Scale: q341's two-pass value-histogram shape — the only window
  // runs over the bounded distinct-cents grid; everything else is hash
  // aggregates.
  def energyDistance(rows: DataFrame, valueCol: String, groupCol: String,
                     gA: String, gB: String): DataFrame = {
    val hist = rows
      .filter(col(groupCol).isin(gA, gB))
      .select(expr(s"cast(floor($valueCol * 100 + 0.5d) as bigint)").as("v"),
        (col(groupCol) === gA).as("isa"))
      .groupBy(col("v"))
      .agg(count_if(col("isa")).as("a"), count_if(!col("isa")).as("b"))
    val w = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, -1)
    val pre = hist
      .withColumn("ca", coalesce(sum(col("a")).over(w), lit(0L)))
      .withColumn("cb", coalesce(sum(col("b")).over(w), lit(0L)))
      .withColumn("sa", coalesce(sum(col("a") * col("v")).over(w), lit(0L)))
      .withColumn("sb", coalesce(sum(col("b") * col("v")).over(w), lit(0L)))
    val tot = hist.agg(sum(col("a")).as("na"), sum(col("b")).as("nb"),
      sum(col("a") * col("v")).as("ta"), sum(col("b") * col("v")).as("tb"))
    def pairSum(cnt: String, cLt: String, sLt: String, n: String, s: String,
                selfCnt: String): String =
      // Σ over ordered pairs: cnt_v · (v·cum_lt − cumS_lt + (S − cumS_le) − v·(N − cum_le))
      s"""sum($cnt * (v * $cLt - $sLt + ($s - ($sLt + $selfCnt * v))
         |  - v * ($n - ($cLt + $selfCnt))))""".stripMargin
    pre.crossJoin(broadcast(tot))
      .agg(
        expr(pairSum("a", "cb", "sb", "nb", "tb", "b")).as("txy_half"),
        expr(pairSum("a", "ca", "sa", "na", "ta", "a")).as("txx"),
        expr(pairSum("b", "cb", "sb", "nb", "tb", "b")).as("tyy"),
        first(col("na")).as("n_x"), first(col("nb")).as("n_y"))
      .select(col("n_x"), col("n_y"), col("txy_half").as("t_xy"),
        col("txx").as("t_xx"), col("tyy").as("t_yy"))
      .withColumn("e_ucents", expr(
        """cast((cast(1000000 as decimal(38,0)) *
          |  (2L * cast(t_xy as decimal(38,0)) * n_x * n_y
          |   - cast(t_xx as decimal(38,0)) * n_y * n_y
          |   - cast(t_yy as decimal(38,0)) * n_x * n_x))
          | div (cast(n_x as decimal(38,0)) * n_x * n_y * n_y) as bigint)""".stripMargin))
      .withColumn("stat6", Num.pround(
        expr("(cast(n_x as double) * n_y / (n_x + n_y)) * (e_ucents / 1e6) / 100.0d"), 6))
      .select(col("n_x"), col("n_y"), col("t_xy"), col("t_xx"), col("t_yy"),
        col("e_ucents"), col("stat6"))
  }

  def q353EnergyDistance(spark: SparkSession, dir: String): DataFrame =
    energyDistance(Tables.customer(spark, dir), "c_acctbal", "c_mktsegment",
      "BUILDING", "MACHINERY")

  val q353Sql: String =
    """WITH hist AS (
      |  SELECT CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS v,
      |    COUNT(*) FILTER (c_mktsegment = 'BUILDING') AS a,
      |    COUNT(*) FILTER (c_mktsegment = 'MACHINERY') AS b
      |  FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      |  GROUP BY 1),
      |pre AS (
      |  SELECT v, a, b,
      |    COALESCE(SUM(a) OVER pw, 0) AS ca, COALESCE(SUM(b) OVER pw, 0) AS cb,
      |    COALESCE(SUM(a * v) OVER pw, 0) AS sa,
      |    COALESCE(SUM(b * v) OVER pw, 0) AS sb
      |  FROM hist
      |  WINDOW pw AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |tot AS (
      |  SELECT SUM(a) AS na, SUM(b) AS nb, SUM(a * v) AS ta, SUM(b * v) AS tb
      |  FROM hist),
      |su AS (
      |  SELECT
      |    SUM(a * (v * cb - sb + (tb - (sb + b * v)) - v * (nb - (cb + b)))) AS t_xy,
      |    SUM(a * (v * ca - sa + (ta - (sa + a * v)) - v * (na - (ca + a)))) AS t_xx,
      |    SUM(b * (v * cb - sb + (tb - (sb + b * v)) - v * (nb - (cb + b)))) AS t_yy,
      |    ANY_VALUE(na) AS n_x, ANY_VALUE(nb) AS n_y
      |  FROM pre CROSS JOIN tot),
      |fin AS (
      |  SELECT n_x, n_y, t_xy, t_xx, t_yy,
      |    CAST((1000000::HUGEINT *
      |      (2 * t_xy::HUGEINT * n_x * n_y
      |       - t_xx::HUGEINT * n_y * n_y - t_yy::HUGEINT * n_x * n_x))
      |     // (n_x::HUGEINT * n_x * n_y * n_y) AS BIGINT) AS e_ucents
      |  FROM su)
      |SELECT CAST(n_x AS BIGINT) AS n_x, CAST(n_y AS BIGINT) AS n_y,
      |  CAST(t_xy AS BIGINT) AS t_xy, CAST(t_xx AS BIGINT) AS t_xx,
      |  CAST(t_yy AS BIGINT) AS t_yy, e_ucents,
      |  FLOOR(((CAST(n_x AS DOUBLE) * n_y / (n_x + n_y)) * (e_ucents / 1e6)
      |    / 100.0) * 1e6 + 0.5) / 1e6 AS stat6
      |FROM fin""".stripMargin

  // --------------------------------------------------------------------------
  // q354 — FANO OVERDISPERSION INDEX per event type: D = Var/Mean of
  // the daily count series — 1 for a Poisson process, > 1 for bursty
  // (clumped) traffic, < 1 for throttled/regular traffic. The
  // bot-vs-organic / rate-limit diagnostic on count data, fully
  // cross-multiplied to the exact integer ppm
  //   D_ppm = (10⁶·(n·Σc² − (Σc)²)) div ((n−1)·Σc)
  // (DECIMAL(38,0) product guard). Days with zero events count as
  // zeros via the day×type grid (q347's densification), as the
  // dispersion of a count PROCESS must.
  //
  // Scale: the corpus collapses to the day×type grid; two hash
  // aggregates.
  def fanoDispersion(events: DataFrame): DataFrame = {
    val cnt = events.groupBy(
        to_date(col("ts")).as("d"), col("event_type").as("t"))
      .agg(count(lit(1)).as("c"))
    val grid = cnt.select(col("d")).distinct()
      .crossJoin(broadcast(cnt.select(col("t")).distinct()))
      .join(cnt, Seq("d", "t"), "left")
      .na.fill(0L, Seq("c"))
    grid.groupBy(col("t"))
      .agg(count(lit(1)).as("n_days"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("q"))
      .filter(col("s") > 0L && col("n_days") > 1L)
      .select(col("t").as("event_type"), col("n_days"), col("s").as("total"),
        expr("""cast((cast(1000000 as decimal(38,0)) * (n_days * q - s * s))
                | div ((n_days - 1L) * s) as bigint)""".stripMargin).as("fano_ppm"))
      .withColumn("verdict",
        when(col("fano_ppm") > 1100000L, lit("overdispersed"))
          .when(col("fano_ppm") < 900000L, lit("underdispersed"))
          .otherwise(lit("poisson-like")))
      .orderBy(col("event_type"))
  }

  def q354FanoDispersion(spark: SparkSession, dir: String): DataFrame =
    fanoDispersion(Tables.events(spark, dir))

  val q354Sql: String =
    """WITH cnt AS (
      |  SELECT CAST(ts AS DATE) AS d, event_type AS t, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT dd.d, tt.t, COALESCE(c, 0) AS c
      |  FROM (SELECT DISTINCT d FROM cnt) dd
      |  CROSS JOIN (SELECT DISTINCT t FROM cnt) tt
      |  LEFT JOIN cnt ON cnt.d = dd.d AND cnt.t = tt.t),
      |st AS (
      |  SELECT t, COUNT(*) AS n_days, SUM(c) AS s, SUM(c * c) AS q
      |  FROM grid GROUP BY t)
      |SELECT t AS event_type, CAST(n_days AS BIGINT) AS n_days,
      |  CAST(s AS BIGINT) AS total,
      |  CAST((1000000::HUGEINT * (n_days * q - s * s))
      |    // ((n_days - 1) * s) AS BIGINT) AS fano_ppm,
      |  CASE WHEN (1000000::HUGEINT * (n_days * q - s * s))
      |         // ((n_days - 1) * s) > 1100000 THEN 'overdispersed'
      |       WHEN (1000000::HUGEINT * (n_days * q - s * s))
      |         // ((n_days - 1) * s) < 900000 THEN 'underdispersed'
      |       ELSE 'poisson-like' END AS verdict
      |FROM st WHERE s > 0 AND n_days > 1 ORDER BY event_type""".stripMargin

  private val catalogX: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q353_energy_distance", q353EnergyDistance _, Some(q353Sql)),
    ("q354_fano_dispersion", q354FanoDispersion _, Some(q354Sql)))

  // ═════════════════ formerly Round8yOps ═════════════════
  /** Round-8 twenty-fifth operator batch: intraclass correlation with the
    * cluster-sampling design effect, and the distribution-free median
    * confidence interval — survey-design and robust-inference surface on
    * the §8.4 exact-integer discipline.
    */

  // --------------------------------------------------------------------------
  // q355 — INTRACLASS CORRELATION + DESIGN EFFECT: how much do line
  // prices cluster WITHIN orders, and what does that clustering cost a
  // cluster sample? One-way random-effects ICC from exact sufficient
  // statistics — per-order (n_g, Σx, Σx²) in cents — with the two
  // sums of squares shipped as deterministic integer floors
  // (SSW = Σq_g − Σ(s_g² div n_g): per-group exact floor, error < #groups,
  // identical in every engine), then ICC, Kish's n₀ and
  // DEFF = 1 + (m̄−1)·ICC as a fixed double-op dag + pround. The number
  // every two-stage eval-sampling plan needs before trusting its SE.
  //
  // Scale: one partial-aggregated pass to per-order rows, one global
  // aggregate. Nothing else moves.
  def iccDeff(lineitem: DataFrame): DataFrame = {
    val g = lineitem
      .select(col("l_orderkey").as("gk"),
        expr("cast(floor(l_extendedprice * 100 + 0.5d) as bigint)").as("v"))
      .groupBy(col("gk"))
      .agg(count(lit(1)).as("ng"), sum(col("v")).as("sg"),
        expr("sum(v * v)").as("qg"))
    // global Σv² and Σ(s²divn) exceed BIGINT at the 10× probe (cents²
    // over the whole fact table) → DECIMAL(38,0) accumulators; the SS
    // readouts ship floor-divided to whole dollars² so the hashed cells
    // stay BIGINT-exact
    g.agg(sum(col("ng")).as("n"), count(lit(1)).as("k"),
        sum(col("sg")).as("s"),
        sum(expr("cast(qg as decimal(38,0))")).as("q"),
        sum(expr("cast((sg * sg) div ng as decimal(38,0))")).as("between_floor"),
        sum(col("ng") * col("ng")).as("n2"))
      .withColumn("ssq", expr("(cast(s as decimal(38,0)) * s) div n"))
      .withColumn("ssw_floor", expr("q - between_floor"))
      .withColumn("ssb_floor", expr("between_floor - ssq"))
      .withColumn("msb", expr("cast(ssb_floor as double) / (k - 1L)"))
      .withColumn("msw", expr("cast(ssw_floor as double) / (n - k)"))
      .withColumn("n0", expr(
        "(cast(n as double) - cast(n2 as double) / n) / (k - 1L)"))
      .withColumn("icc", expr("(msb - msw) / (msb + (n0 - 1.0d) * msw)"))
      .select(col("n"), col("k"),
        expr("cast(ssw_floor div 10000 as bigint)").as("ssw_dollars2"),
        expr("cast(ssb_floor div 10000 as bigint)").as("ssb_dollars2"),
        Num.pround(col("n0"), 4).as("n0_4"),
        Num.pround(col("icc"), 6).as("icc6"),
        Num.pround(expr("1.0d + (cast(n as double) / k - 1.0d) * icc"), 6)
          .as("deff6"))
  }

  def q355IccDeff(spark: SparkSession, dir: String): DataFrame =
    iccDeff(Tables.lineitem(spark, dir))

  val q355Sql: String =
    """WITH g AS (
      |  SELECT l_orderkey AS gk, COUNT(*) AS ng,
      |    SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS sg,
      |    SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
      |      * CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS qg
      |  FROM lineitem GROUP BY 1),
      |su AS (
      |  SELECT SUM(ng) AS n, COUNT(*) AS k, SUM(sg) AS s,
      |    SUM(qg::HUGEINT) AS q,
      |    SUM(((sg * sg) // ng)::HUGEINT) AS between_floor, SUM(ng * ng) AS n2
      |  FROM g),
      |d AS (
      |  SELECT n, k,
      |    q - between_floor AS ssw_floor,
      |    between_floor - (s::HUGEINT * s) // n AS ssb_floor,
      |    CAST(between_floor - (s::HUGEINT * s) // n AS DOUBLE) / (k - 1) AS msb,
      |    CAST(q - between_floor AS DOUBLE) / (n - k) AS msw,
      |    (CAST(n AS DOUBLE) - CAST(n2 AS DOUBLE) / n) / (k - 1) AS n0
      |  FROM su),
      |e AS (
      |  SELECT *, (msb - msw) / (msb + (n0 - 1.0) * msw) AS icc FROM d)
      |SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
      |  CAST(ssw_floor // 10000 AS BIGINT) AS ssw_dollars2,
      |  CAST(ssb_floor // 10000 AS BIGINT) AS ssb_dollars2,
      |  FLOOR((n0) * 1e4 + 0.5) / 1e4 AS n0_4,
      |  FLOOR((icc) * 1e6 + 0.5) / 1e6 AS icc6,
      |  FLOOR((1.0 + (CAST(n AS DOUBLE) / k - 1.0) * icc) * 1e6 + 0.5) / 1e6
      |    AS deff6
      |FROM e""".stripMargin

  // --------------------------------------------------------------------------
  // q356 — DISTRIBUTION-FREE MEDIAN CI: the exact-rank 95% confidence
  // interval for the median balance — order statistics at
  // k = (n ∓ 1.959964·√n)/2, no normality assumption, no resampling
  // (the binomial-rank construction; q239's bootstrap is the moment
  // cousin). Ranks come from a fixed double-op dag over n (one sqrt),
  // then every value lookup is exact: the q169 VALUE-HISTOGRAM
  // cumulative grid answers "value at rank r" with an equi-bounded
  // range probe. Ships the median (both middle order statistics, exact
  // cents) and the CI endpoints.
  //
  // Scale: q341's histogram shape — one bounded-grid window; the rank
  // probes join a broadcast 4-row rank list against the grid.
  def medianCi(rows: DataFrame, valueCol: String): DataFrame = {
    val hist = rows
      .select(expr(s"cast(floor($valueCol * 100 + 0.5d) as bigint)").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)))
      .localCheckpoint()
    val n = hist.agg(sum(col("c")).as("n"))
    val ranks = n.select(col("n"), explode(array(
        struct(lit("ci_lo").as("which"),
          expr("cast(floor((n - 1.959964d * sqrt(cast(n as double))) / 2.0d) as long)").as("r")),
        struct(lit("med_lo").as("which"), expr("(n + 1L) div 2L").as("r")),
        struct(lit("med_hi").as("which"), expr("(n + 2L) div 2L").as("r")),
        struct(lit("ci_hi").as("which"),
          expr("cast(ceil(1.0d + (n + 1.959964d * sqrt(cast(n as double))) / 2.0d) as long)").as("r"))))
        .as("x"))
      .select(col("n"), col("x.which").as("which"),
        greatest(least(col("x.r"), col("n")), lit(1L)).as("r"))
    ranks.join(hist, col("cum") >= col("r") &&
        (col("cum") - col("c")) < col("r"))
      .groupBy(lit(1).as("one"))
      .agg(first(col("n")).as("n"),
        min(when(col("which") === "ci_lo", col("v"))).as("ci_lo_cents"),
        min(when(col("which") === "med_lo", col("v"))).as("med_lo_cents"),
        min(when(col("which") === "med_hi", col("v"))).as("med_hi_cents"),
        min(when(col("which") === "ci_hi", col("v"))).as("ci_hi_cents"))
      .drop("one")
  }

  def q356MedianCi(spark: SparkSession, dir: String): DataFrame =
    medianCi(Tables.customer(spark, dir), "c_acctbal")

  val q356Sql: String =
    """WITH hist AS (
      |  SELECT CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS v, COUNT(*) AS c
      |  FROM customer GROUP BY 1),
      |cumh AS (
      |  SELECT v, c, SUM(c) OVER (ORDER BY v
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM hist),
      |nn AS (SELECT SUM(c) AS n FROM hist),
      |rraw AS (
      |  SELECT n, 'ci_lo' AS which,
      |    CAST(FLOOR((n - 1.959964 * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT) AS r
      |  FROM nn
      |  UNION ALL SELECT n, 'med_lo', (n + 1) // 2 FROM nn
      |  UNION ALL SELECT n, 'med_hi', (n + 2) // 2 FROM nn
      |  UNION ALL SELECT n, 'ci_hi',
      |    CAST(CEIL(1.0 + (n + 1.959964 * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT)
      |  FROM nn),
      |ranks AS (SELECT n, which, GREATEST(LEAST(r, n), 1) AS r FROM rraw)
      |SELECT CAST(ANY_VALUE(n) AS BIGINT) AS n,
      |  MIN(v) FILTER (which = 'ci_lo') AS ci_lo_cents,
      |  MIN(v) FILTER (which = 'med_lo') AS med_lo_cents,
      |  MIN(v) FILTER (which = 'med_hi') AS med_hi_cents,
      |  MIN(v) FILTER (which = 'ci_hi') AS ci_hi_cents
      |FROM ranks JOIN cumh ON cum >= r AND (cum - c) < r""".stripMargin

  private val catalogY: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q355_icc_deff", q355IccDeff _, Some(q355Sql)),
    ("q356_median_ci", q356MedianCi _, Some(q356Sql)))

  // ═════════════════ formerly Round8aaOps ═════════════════
  /** Round-8 twenty-seventh operator batch: Wald–Wolfowitz runs test on
    * the daily-revenue series and a per-source lexical-diversity panel —
    * sequence-randomness and corpus-vocabulary diagnostics on the §8.4
    * exact-integer discipline.
    */

  // --------------------------------------------------------------------------
  // q359 — RUNS TEST (Wald–Wolfowitz): is the daily revenue series
  // random around its median, or does it clump (momentum/regime) or
  // oscillate (over-correction)? Days dichotomize against the exact
  // low-median of daily cents (median-equal days drop, the classical
  // convention); R = 1 + #(sign changes) via one lag over the calendar
  // grid. n_above/n_below/runs/median ship as exact BIGINTs; the
  // normal-approximation moments are exact rational floors —
  // E[R]·1e6 = (1e6·(n+2·n1·n2)) div n and Var[R] via a DECIMAL(38,0)
  // cross-multiply — and z is ONE fixed double dag + pround(6).
  // Complements q167 (CUSUM locates level shifts; this tests the
  // whole-series randomness hypothesis) and q311 (Mann–Kendall tests
  // monotone trend; runs react to any serial dependence).
  //
  // Scale: orders collapse to the bounded per-day grid in ONE shuffle
  // (q167's argument); the rank/lag windows run on that ~2.4k-row grid,
  // never on orders.
  def runsTest(orders: DataFrame): DataFrame = {
    val byDay = orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg((sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
        .cast("long").as("rev_cents"))
      .localCheckpoint()
    val n = byDay.agg(count(lit(1)).as("nd"))
    val med = byDay.crossJoin(broadcast(n))
      .withColumn("rn",
        row_number().over(Window.orderBy(col("rev_cents"), col("day"))))
      .filter(col("rn") === expr("(nd + 1L) div 2L"))
      .select(col("rev_cents").as("med"))
    byDay.crossJoin(broadcast(med))
      .filter(col("rev_cents") =!= col("med"))
      .withColumn("s", when(col("rev_cents") > col("med"), 1L).otherwise(0L))
      .withColumn("prev", lag(col("s"), 1).over(Window.orderBy(col("day"))))
      .agg(count_if(col("s") === 1L).as("n_above"),
        count_if(col("s") === 0L).as("n_below"),
        (count_if(col("prev").isNotNull && col("s") =!= col("prev")) + 1L)
          .as("runs"),
        min(col("med")).as("median_cents"))
      .withColumn("n", col("n_above") + col("n_below"))
      .select(col("n_above"), col("n_below"), col("runs"), col("median_cents"),
        col("n"),
        expr("(1000000L * (n + 2L * n_above * n_below)) div n")
          .as("e_runs_ppm"),
        expr("""cast((cast(1000000 as decimal(38,0))
               |  * (2L * n_above * n_below)
               |  * (2L * n_above * n_below - n))
               | div (cast(n as decimal(38,0)) * n * (n - 1L)) as bigint)"""
          .stripMargin).as("var_ppm"),
        Num.pround(
          (col("runs").cast("double")
            - expr("cast(n + 2L * n_above * n_below as double)")
              / col("n").cast("double"))
          / sqrt(expr("cast(2L * n_above * n_below as double)")
              * expr("cast(2L * n_above * n_below - n as double)")
              / (col("n").cast("double") * col("n") * (col("n") - lit(1L)))),
          6).as("z6"))
  }

  def q359RunsTest(spark: SparkSession, dir: String): DataFrame =
    runsTest(Tables.orders(spark, dir))

  val q359Sql: String =
    """WITH byday AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_cents
      |  FROM orders GROUP BY 1),
      |nn AS (SELECT COUNT(*) AS nd FROM byday),
      |med AS (
      |  SELECT rev_cents AS med FROM (
      |    SELECT rev_cents, ROW_NUMBER() OVER (ORDER BY rev_cents, day) AS rn
      |    FROM byday), nn
      |  WHERE rn = (nd + 1) // 2),
      |lagged AS (
      |  SELECT s, med, LAG(s) OVER (ORDER BY day) AS prev FROM (
      |    SELECT day, CASE WHEN rev_cents > med THEN 1 ELSE 0 END AS s, med
      |    FROM byday, med WHERE rev_cents <> med)),
      |agg AS (
      |  SELECT COUNT(*) FILTER (s = 1) AS n_above,
      |    COUNT(*) FILTER (s = 0) AS n_below,
      |    COUNT(*) FILTER (prev IS NOT NULL AND s <> prev) + 1 AS runs,
      |    ANY_VALUE(med) AS median_cents
      |  FROM lagged),
      |d AS (SELECT *, n_above + n_below AS n FROM agg)
      |SELECT CAST(n_above AS BIGINT) AS n_above,
      |  CAST(n_below AS BIGINT) AS n_below,
      |  CAST(runs AS BIGINT) AS runs, median_cents, CAST(n AS BIGINT) AS n,
      |  CAST((1000000 * (n + 2 * n_above * n_below)) // n AS BIGINT) AS e_runs_ppm,
      |  CAST((1000000::HUGEINT * (2 * n_above * n_below)
      |      * (2 * n_above * n_below - n))
      |    // (n::HUGEINT * n * (n - 1)) AS BIGINT) AS var_ppm,
      |  FLOOR(((CAST(runs AS DOUBLE)
      |      - CAST(n + 2 * n_above * n_below AS DOUBLE) / CAST(n AS DOUBLE))
      |    / sqrt(CAST(2 * n_above * n_below AS DOUBLE)
      |      * CAST(2 * n_above * n_below - n AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * n * (n - 1)))) * 1e6 + 0.5) / 1e6 AS z6
      |FROM d""".stripMargin

  // --------------------------------------------------------------------------
  // q360 — LEXICAL DIVERSITY PANEL per source: type-token ratio, hapax
  // share, and Yule's characteristic K — the corpus-health readouts
  // that expose template/boilerplate sources (low TTR, low hapax,
  // high K) before they skew a training mix. All three are exact
  // integer floors off the per-source (type, freq) table: K =
  // 1e4·(Σf² − N)/N² ships as K·1000 via a DECIMAL(38,0)
  // cross-multiply (Σf² exceeds BIGINT once a hot token passes ~3e9
  // occurrences). Complements q336 (vocab sizing) and q335 (novelty
  // curve) with the scale-free diversity constants.
  //
  // Scale: one (source, token) count shuffle, then a per-source
  // aggregate — same shape as q336's freq pass, nothing quadratic.
  def lexicalDiversity(docs: DataFrame): DataFrame = {
    docs.select(col("source"), explode(TextOps.toks).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("f"))
      .groupBy(col("source"))
      .agg(sum(col("f")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        count_if(col("f") === 1L).as("hapax"),
        sum(expr("cast(f as decimal(38,0)) * f")).as("s2"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("hapax"),
        expr("(1000000L * n_types) div n_tokens").as("ttr_ppm"),
        expr("(1000000L * hapax) div n_types").as("hapax_ppm"),
        expr("""cast((cast(10000000 as decimal(38,0)) * (s2 - n_tokens))
               | div (cast(n_tokens as decimal(38,0)) * n_tokens) as bigint)"""
          .stripMargin).as("yule_k_e3"))
      .orderBy(col("source"))
  }

  def q360LexicalDiversity(spark: SparkSession, dir: String): DataFrame =
    lexicalDiversity(Tables.documents(spark, dir))

  val q360Sql: String = {
    val toks = TextOps.toksSqlD
    s"""WITH tok AS (
       |  SELECT source, UNNEST(t) AS w
       |  FROM (SELECT source, $toks AS t FROM documents)),
       |freq AS (SELECT source, w, COUNT(*) AS f FROM tok GROUP BY 1, 2),
       |agg AS (
       |  SELECT source, SUM(f) AS n_tokens, COUNT(*) AS n_types,
       |    COUNT(*) FILTER (f = 1) AS hapax,
       |    SUM(f::HUGEINT * f) AS s2
       |  FROM freq GROUP BY 1)
       |SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens, n_types,
       |  CAST(hapax AS BIGINT) AS hapax,
       |  CAST((1000000 * n_types) // n_tokens AS BIGINT) AS ttr_ppm,
       |  CAST((1000000 * hapax) // n_types AS BIGINT) AS hapax_ppm,
       |  CAST((10000000::HUGEINT * (s2 - n_tokens))
       |    // (n_tokens::HUGEINT * n_tokens) AS BIGINT) AS yule_k_e3
       |FROM agg ORDER BY source""".stripMargin
  }

  private val catalogAa: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q359_runs_test", q359RunsTest _, Some(q359Sql)),
    ("q360_lexical_diversity", q360LexicalDiversity _, Some(q360Sql)))

  // ═════════════════ formerly Round8abOps ═════════════════
  /** Round-8 twenty-eighth operator batch: Cochran's Q over k paired
    * binary gates and functional-dependency discovery — filter governance
    * and schema profiling on the §8.4 exact-integer discipline.
    */

  // --------------------------------------------------------------------------
  // q361 — COCHRAN'S Q TEST: q342's McNemar generalized from 2 paired
  // gates to k = 3 — do the word-count floor, the mean-word-length
  // band, and the max-token-length cap (Gopher's three cheapest gates)
  // pass the SAME documents, or do they measure different things?
  // Blocks = docs, treatments = gates;
  //   Q = (k−1)·(k·ΣG_j² − T²) / (k·T − ΣL_i²)
  // with column totals G_j, row totals L_i, T = ΣL — every term an
  // exact integer, numerator in DECIMAL(38,0) (G² crosses 10¹³ at
  // warehouse scale ×2e6 scaling), shipped as q_ppm with a NULL guard
  // for the all-concordant degenerate corpus.
  //
  // Scale: one row-local token pass, one 6-counter global aggregate —
  // q342's shape exactly; nothing shuffles but the counters.
  def cochranQ(docs: DataFrame): DataFrame =
    docs
      .select(expr("filter(split(lower(text), ' '), t -> t != '')").as("t"))
      .select(size(col("t")).cast("long").as("wc"),
        expr("aggregate(t, 0L, (a, x) -> a + length(x))").as("sumlen"),
        expr("aggregate(t, 0L, (a, x) -> greatest(a, length(x)))").as("maxlen"))
      .select(when(col("wc") >= 50L, 1L).otherwise(0L).as("x1"),
        when(col("sumlen") >= lit(3L) * col("wc") &&
          col("sumlen") <= lit(10L) * col("wc"), 1L).otherwise(0L).as("x2"),
        when(col("maxlen") >= 1L && col("maxlen") <= 20L, 1L).otherwise(0L)
          .as("x3"))
      .withColumn("l", col("x1") + col("x2") + col("x3"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("x1")).as("g1"), sum(col("x2")).as("g2"),
        sum(col("x3")).as("g3"),
        sum(col("l")).as("t_total"),
        sum(col("l") * col("l")).as("sum_l2"))
      .select(col("n_docs"), col("g1"), col("g2"), col("g3"),
        col("t_total"), col("sum_l2"),
        when(lit(3L) * col("t_total") - col("sum_l2") === 0L, lit(null))
          .otherwise(expr(
            """cast((cast(1000000 as decimal(38,0)) * 2L
              |  * (3L * (g1 * g1 + g2 * g2 + g3 * g3) - t_total * t_total))
              | div (3L * t_total - sum_l2) as bigint)""".stripMargin))
          .as("q_ppm"))

  def q361CochranQ(spark: SparkSession, dir: String): DataFrame =
    cochranQ(Tables.documents(spark, dir))

  val q361Sql: String =
    s"""WITH f AS (
       |  SELECT len(t) AS wc,
       |    COALESCE(list_sum(list_transform(t, x -> length(x))), 0) AS sumlen,
       |    COALESCE(list_max(list_transform(t, x -> length(x))), 0) AS maxlen
       |  FROM (SELECT ${TextOps.toksSqlD} AS t FROM documents)),
       |p AS (
       |  SELECT CASE WHEN wc >= 50 THEN 1 ELSE 0 END AS x1,
       |    CASE WHEN sumlen >= 3 * wc AND sumlen <= 10 * wc THEN 1 ELSE 0 END AS x2,
       |    CASE WHEN maxlen >= 1 AND maxlen <= 20 THEN 1 ELSE 0 END AS x3
       |  FROM f),
       |a AS (
       |  SELECT COUNT(*) AS n_docs, SUM(x1) AS g1, SUM(x2) AS g2,
       |    SUM(x3) AS g3, SUM(x1 + x2 + x3) AS t_total,
       |    SUM((x1 + x2 + x3) * (x1 + x2 + x3)) AS sum_l2
       |  FROM p)
       |SELECT n_docs, CAST(g1 AS BIGINT) AS g1, CAST(g2 AS BIGINT) AS g2,
       |  CAST(g3 AS BIGINT) AS g3, CAST(t_total AS BIGINT) AS t_total,
       |  CAST(sum_l2 AS BIGINT) AS sum_l2,
       |  CASE WHEN 3 * t_total - sum_l2 = 0 THEN NULL
       |    ELSE CAST((1000000::HUGEINT * 2
       |        * (3 * (g1 * g1 + g2 * g2 + g3 * g3) - t_total * t_total))
       |      // (3 * t_total - sum_l2) AS BIGINT) END AS q_ppm
       |FROM a""".stripMargin

  // --------------------------------------------------------------------------
  // q362 — FUNCTIONAL-DEPENDENCY DISCOVERY: for each declared candidate
  // A→B, the minimal-repair violation count Σ_a (n_a − max_b n_ab) —
  // rows that must change for the dependency to hold exactly — plus the
  // determinant-group census. The schema-profiling readout q291's
  // per-column profile can't see (it needs the PAIR distribution);
  // feeds normalization, dictionary-encoding (q293), and data-quality
  // gates. The panel mixes near-keys (p_name→p_brand), conditional
  // FDs (returnflag→linestatus), and independent pairs, so every
  // verdict path is exercised.
  //
  // Scale: per pair, one (A,B) hash aggregate then an A-grouped
  // reduction — both bounded by the pair's distinct count, never wider
  // than the scan; pairs union trivially (independent stages).
  def fdAudit(df: DataFrame, fdName: String, det: String, dep: String)
  : DataFrame =
    df.groupBy(col(det).as("a"), col(dep).as("b"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("a"))
      .agg(sum(col("c")).as("na"), max(col("c")).as("maxc"),
        count(lit(1)).as("nb"))
      .agg(sum(col("na")).as("n_rows"),
        count(lit(1)).as("n_det_groups"),
        count_if(col("nb") > 1L).as("violating_groups"),
        sum(col("na") - col("maxc")).as("violating_rows"))
      .select(lit(fdName).as("fd"), col("n_rows"), col("n_det_groups"),
        col("violating_groups"), col("violating_rows"),
        expr("(1000000L * violating_rows) div n_rows").as("violation_ppm"),
        (col("violating_rows") === 0L).as("holds"))

  def q362FdDiscovery(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
    fdAudit(part, "part.p_name->p_brand", "p_name", "p_brand")
      .unionByName(fdAudit(part, "part.p_brand->p_size", "p_brand", "p_size"))
      .unionByName(fdAudit(li, "lineitem.l_returnflag->l_linestatus",
        "l_returnflag", "l_linestatus"))
      .unionByName(fdAudit(cust, "customer.c_mktsegment->c_nationkey",
        "c_mktsegment", "c_nationkey"))
      .unionByName(fdAudit(ord, "orders.o_orderpriority->o_orderstatus",
        "o_orderpriority", "o_orderstatus"))
      .orderBy(col("fd"))
  }

  private def fdSql(fdName: String, table: String, det: String, dep: String)
  : String =
    s"""SELECT '$fdName' AS fd, CAST(SUM(na) AS BIGINT) AS n_rows,
       |  COUNT(*) AS n_det_groups,
       |  COUNT(*) FILTER (nb > 1) AS violating_groups,
       |  CAST(SUM(na - maxc) AS BIGINT) AS violating_rows,
       |  CAST((1000000 * SUM(na - maxc)) // SUM(na) AS BIGINT) AS violation_ppm,
       |  SUM(na - maxc) = 0 AS holds
       |FROM (
       |  SELECT a, SUM(c) AS na, MAX(c) AS maxc, COUNT(*) AS nb
       |  FROM (SELECT $det AS a, $dep AS b, COUNT(*) AS c
       |        FROM $table GROUP BY 1, 2)
       |  GROUP BY 1)""".stripMargin

  val q362Sql: String = Seq(
    fdSql("part.p_name->p_brand", "part", "p_name", "p_brand"),
    fdSql("part.p_brand->p_size", "part", "p_brand", "p_size"),
    fdSql("lineitem.l_returnflag->l_linestatus", "lineitem",
      "l_returnflag", "l_linestatus"),
    fdSql("customer.c_mktsegment->c_nationkey", "customer",
      "c_mktsegment", "c_nationkey"),
    fdSql("orders.o_orderpriority->o_orderstatus", "orders",
      "o_orderpriority", "o_orderstatus"))
    .mkString("", "\nUNION ALL\n", "\nORDER BY fd")

  private val catalogAb: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q361_cochran_q", q361CochranQ _, Some(q361Sql)),
    ("q362_fd_discovery", q362FdDiscovery _, Some(q362Sql)))

  // ═════════════════ formerly Round8adOps ═════════════════
  /** Round-8 thirtieth operator batch: Krippendorff's alpha for n-rater
    * agreement and Page's L ordered trend over week blocks — annotation
    * governance and blocked ordered-alternative testing on the §8.4
    * exact-integer discipline.
    */

  // --------------------------------------------------------------------------
  // q365 — KRIPPENDORFF'S ALPHA: q324's Cohen κ handles exactly 2
  // raters; the label-ops standard for n raters with missing ratings
  // is Krippendorff. Units = docs, raters = the three Gopher gates
  // (q361's panel) emitting binary labels, rater 2 and 3 abstaining on
  // empty docs (genuine missingness). For nominal binary data the
  // whole statistic is an exact rational:
  //   O  = Σ_u 2·n_u0·n_u1/(m_u−1)   (integer for m_u ∈ {2,3})
  //   α  = 1 − O·(n−1)/(2·n_0·n_1)
  // shipped as alpha_ppm = 1e6 − (1e6·O·(n−1)) div (2·n_0·n_1), with
  // units of m_u < 2 dropped per the estimator's definition.
  //
  // Scale: one row-local gate pass, one global aggregate — no rater
  // cross-join; the coincidence algebra collapses to per-unit counts.
  def krippendorff(docs: DataFrame): DataFrame =
    docs
      .select(expr("filter(split(lower(text), ' '), t -> t != '')").as("t"))
      .select(size(col("t")).cast("long").as("wc"),
        expr("aggregate(t, 0L, (a, x) -> a + length(x))").as("sumlen"),
        expr("aggregate(t, 0L, (a, x) -> greatest(a, length(x)))").as("maxlen"))
      .select(
        when(col("wc") >= 50L, 1L).otherwise(0L).as("r1"),
        when(col("wc") === 0L, lit(null))
          .otherwise(when(col("sumlen") >= lit(3L) * col("wc") &&
            col("sumlen") <= lit(10L) * col("wc"), 1L).otherwise(0L)).as("r2"),
        when(col("wc") === 0L, lit(null))
          .otherwise(when(col("maxlen") <= 20L, 1L).otherwise(0L)).as("r3"))
      .select(
        (coalesce(col("r1"), lit(0L)) + coalesce(col("r2"), lit(0L)) +
          coalesce(col("r3"), lit(0L))).as("ones"),
        (when(col("r1").isNotNull, 1L).otherwise(0L) +
          when(col("r2").isNotNull, 1L).otherwise(0L) +
          when(col("r3").isNotNull, 1L).otherwise(0L)).as("m"))
      .filter(col("m") >= 2L)
      .agg(count(lit(1)).as("n_units"),
        sum(col("m")).as("n_ratings"),
        sum(col("ones")).as("n_1"),
        sum(col("m") - col("ones")).as("n_0"),
        sum(expr("(2L * ones * (m - ones)) div (m - 1L)")).as("o2"))
      .select(col("n_units"), col("n_ratings"), col("n_0"), col("n_1"),
        col("o2"),
        when(col("n_0") === 0L || col("n_1") === 0L, lit(null))
          .otherwise(expr(
            """1000000L - cast((cast(1000000 as decimal(38,0)) * o2
              |  * (n_ratings - 1L))
              | div (2L * (cast(n_0 as decimal(38,0)) * n_1)) as bigint)"""
            .stripMargin)).as("alpha_ppm"))

  def q365Krippendorff(spark: SparkSession, dir: String): DataFrame =
    krippendorff(Tables.documents(spark, dir))

  val q365Sql: String =
    s"""WITH f AS (
       |  SELECT len(t) AS wc,
       |    COALESCE(list_sum(list_transform(t, x -> length(x))), 0) AS sumlen,
       |    COALESCE(list_max(list_transform(t, x -> length(x))), 0) AS maxlen
       |  FROM (SELECT ${TextOps.toksSqlD} AS t FROM documents)),
       |r AS (
       |  SELECT CASE WHEN wc >= 50 THEN 1 ELSE 0 END AS r1,
       |    CASE WHEN wc = 0 THEN NULL
       |      WHEN sumlen >= 3 * wc AND sumlen <= 10 * wc THEN 1 ELSE 0 END AS r2,
       |    CASE WHEN wc = 0 THEN NULL
       |      WHEN maxlen <= 20 THEN 1 ELSE 0 END AS r3
       |  FROM f),
       |u AS (
       |  SELECT COALESCE(r1, 0) + COALESCE(r2, 0) + COALESCE(r3, 0) AS ones,
       |    (CASE WHEN r1 IS NOT NULL THEN 1 ELSE 0 END
       |     + CASE WHEN r2 IS NOT NULL THEN 1 ELSE 0 END
       |     + CASE WHEN r3 IS NOT NULL THEN 1 ELSE 0 END) AS m
       |  FROM r),
       |a AS (
       |  SELECT COUNT(*) AS n_units, SUM(m) AS n_ratings, SUM(ones) AS n_1,
       |    SUM(m - ones) AS n_0,
       |    SUM((2 * ones * (m - ones)) // (m - 1)) AS o2
       |  FROM u WHERE m >= 2)
       |SELECT n_units, CAST(n_ratings AS BIGINT) AS n_ratings,
       |  CAST(n_0 AS BIGINT) AS n_0, CAST(n_1 AS BIGINT) AS n_1,
       |  CAST(o2 AS BIGINT) AS o2,
       |  CASE WHEN n_0 = 0 OR n_1 = 0 THEN NULL
       |    ELSE 1000000 - CAST((1000000::HUGEINT * o2 * (n_ratings - 1))
       |      // (2 * (n_0::HUGEINT * n_1)) AS BIGINT) END AS alpha_ppm
       |FROM a""".stripMargin

  // --------------------------------------------------------------------------
  // q366 — PAGE'S L ORDERED TREND over week blocks: does order volume
  // trend MONOTONICALLY across the week (Mon→Sun)? Blocks = complete
  // Monday-aligned weeks (integer arithmetic off epoch Monday
  // 1970-01-05 — no engine dow function), treatments = the 7 weekday
  // positions, values = daily order counts ranked within each block
  // with doubled midranks (tie group spanning ranks a..b gets a+b —
  // always integer). L2 = Σ j·R2 ships exactly; E[L2] = 224·b for
  // k = 7; the TIE-EXACT conditional permutation variance is
  // Var = (14/3)·Σ_b Σ_i (2r_i − 8)² — an exact integer T — and z is
  // one fixed dag + pround. q347's Friedman asks ANY weekday
  // difference; this asks the ordered question, the right test for
  // "does the week ramp".
  //
  // Scale: orders collapse to the bounded day grid; ranking windows
  // partition per 7-row block.
  def pageL(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("x"))
      .withColumn("dd", datediff(col("d"), lit("1970-01-05")).cast("long"))
      .withColumn("wk", expr("dd div 7L"))
      .withColumn("j", expr("dd % 7L + 1L"))
    val complete = daily.groupBy(col("wk")).agg(count(lit(1)).as("ndays"))
      .filter(col("ndays") === 7L).select(col("wk"))
    val ranked = daily.join(broadcast(complete), Seq("wk"))
      .withColumn("a", rank().over(
        Window.partitionBy(col("wk")).orderBy(col("x"))))
      .withColumn("tc", count(lit(1)).over(
        Window.partitionBy(col("wk"), col("x"))))
      .withColumn("r2", lit(2L) * col("a") + col("tc") - 1L)
    ranked
      .agg((countDistinct(col("wk"))).as("b"),
        sum(col("j") * col("r2")).as("l2"),
        sum((col("r2") - lit(8L)) * (col("r2") - lit(8L))).as("t_comp"))
      .select(col("b"), col("l2"), (lit(224L) * col("b")).as("e_l2"),
        col("t_comp"),
        Num.pround((col("l2") - lit(224L) * col("b")).cast("double")
          / sqrt(lit(14.0) * col("t_comp").cast("double") / lit(3.0)), 6)
          .as("z6"))
  }

  def q366PageL(spark: SparkSession, dir: String): DataFrame =
    pageL(Tables.orders(spark, dir))

  val q366Sql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS x
      |  FROM orders GROUP BY 1),
      |keyed AS (
      |  SELECT x, date_diff('day', DATE '1970-01-05', d) // 7 AS wk,
      |    date_diff('day', DATE '1970-01-05', d) % 7 + 1 AS j
      |  FROM daily),
      |complete AS (
      |  SELECT wk FROM keyed GROUP BY wk HAVING COUNT(*) = 7),
      |ranked AS (
      |  SELECT j,
      |    2 * RANK() OVER (PARTITION BY wk ORDER BY x)
      |      + COUNT(*) OVER (PARTITION BY wk, x) - 1 AS r2
      |  FROM keyed JOIN complete USING (wk)),
      |a AS (
      |  SELECT COUNT(*) // 7 AS b, SUM(j * r2) AS l2,
      |    SUM((r2 - 8) * (r2 - 8)) AS t_comp
      |  FROM ranked)
      |SELECT CAST(b AS BIGINT) AS b, CAST(l2 AS BIGINT) AS l2,
      |  CAST(224 * b AS BIGINT) AS e_l2, CAST(t_comp AS BIGINT) AS t_comp,
      |  FLOOR((CAST(l2 - 224 * b AS DOUBLE)
      |    / sqrt(14.0 * CAST(t_comp AS DOUBLE) / 3.0)) * 1e6 + 0.5) / 1e6 AS z6
      |FROM a""".stripMargin

  private val catalogAd: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q365_krippendorff", q365Krippendorff _, Some(q365Sql)),
    ("q366_page_trend", q366PageL _, Some(q366Sql)))

  // ═════════════════ formerly Round8afOps ═════════════════
  /** Round-8 thirty-second operator batch: Hodges–Lehmann shift estimator
    * and a Cramér's V association panel — robust effect size and
    * categorical dependence strength on the §8.4 exact-integer
    * discipline.
    */

  // --------------------------------------------------------------------------
  // q369 — HODGES–LEHMANN SHIFT: q363 tests WHETHER priority orders the
  // latencies; this estimates BY HOW MANY DAYS — the median of all
  // n_A·n_B pairwise differences (LOW minus URGENT), the robust
  // location-shift estimator paired with Mann–Whitney (q261). On the
  // bounded latency grid the difference distribution is exact: the
  // 122×122 histogram cross collapses to per-difference pair mass
  // c_A(u)·c_B(v), and the low-median difference is a rank probe into
  // its cumulative — every cell an exact BIGINT, the estimate an exact
  // integer day count. Also ships the gt/eq/lt pair masses (the
  // U-statistic decomposition).
  //
  // Scale: q363's orderkey join collapses to two ≤122-cell histograms;
  // the cross and rank probe are grid-local.
  def hlShift(rows: DataFrame): DataFrame = {
    val hist = rows.groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val a = hist.filter(col("g") === "A").select(col("v").as("va"),
      col("c").as("ca"))
    val b = hist.filter(col("g") === "B").select(col("v").as("vb"),
      col("c").as("cb"))
    val diff = broadcast(a).crossJoin(broadcast(b))
      .groupBy((col("vb") - col("va")).as("d"))
      .agg(sum(col("ca") * col("cb")).as("m"))
      .withColumn("cum", sum(col("m")).over(
        Window.orderBy(col("d")).rowsBetween(Window.unboundedPreceding, 0)))
      .localCheckpoint()
    val tot = diff.agg(sum(col("m")).as("t"),
      sum(when(col("d") > 0L, col("m")).otherwise(0L)).as("gt_pairs"),
      sum(when(col("d") === 0L, col("m")).otherwise(0L)).as("eq_pairs"),
      sum(when(col("d") < 0L, col("m")).otherwise(0L)).as("lt_pairs"))
    val na = a.agg(sum(col("ca")).as("n_a"))
    val nb = b.agg(sum(col("cb")).as("n_b"))
    diff.crossJoin(broadcast(tot))
      .filter(col("cum") >= expr("(t + 1L) div 2L") &&
        col("cum") - col("m") < expr("(t + 1L) div 2L"))
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(col("n_a"), col("n_b"), col("t").as("pairs"),
        col("gt_pairs"), col("eq_pairs"), col("lt_pairs"),
        col("d").as("hl_shift_days"))
  }

  def q369HlShift(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority").startsWith("1") ||
        col("o_orderpriority").startsWith("5"))
      .select(col("o_orderkey").as("ok"), col("o_orderdate"),
        when(col("o_orderpriority").startsWith("1"), "A").otherwise("B")
          .as("g"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_shipdate"))
    hlShift(li.join(o, Seq("ok"))
      .select(col("g"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("v")))
  }

  val q369Sql: String =
    """WITH rows_ AS (
      |  SELECT CASE WHEN o_orderpriority LIKE '1%' THEN 'A' ELSE 'B' END AS g,
      |    date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS v
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderpriority LIKE '1%' OR o_orderpriority LIKE '5%'),
      |hist AS (SELECT g, v, COUNT(*) AS c FROM rows_ GROUP BY 1, 2),
      |a AS (SELECT v AS va, c AS ca FROM hist WHERE g = 'A'),
      |b AS (SELECT v AS vb, c AS cb FROM hist WHERE g = 'B'),
      |diff AS (
      |  SELECT vb - va AS d, SUM(ca * cb) AS m
      |  FROM a CROSS JOIN b GROUP BY 1),
      |cumd AS (
      |  SELECT d, m, SUM(m) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM diff),
      |tot AS (
      |  SELECT SUM(m) AS t,
      |    SUM(CASE WHEN d > 0 THEN m ELSE 0 END) AS gt_pairs,
      |    SUM(CASE WHEN d = 0 THEN m ELSE 0 END) AS eq_pairs,
      |    SUM(CASE WHEN d < 0 THEN m ELSE 0 END) AS lt_pairs
      |  FROM diff),
      |na AS (SELECT SUM(ca) AS n_a FROM a),
      |nb AS (SELECT SUM(cb) AS n_b FROM b)
      |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |  CAST(t AS BIGINT) AS pairs, CAST(gt_pairs AS BIGINT) AS gt_pairs,
      |  CAST(eq_pairs AS BIGINT) AS eq_pairs,
      |  CAST(lt_pairs AS BIGINT) AS lt_pairs,
      |  CAST(d AS BIGINT) AS hl_shift_days
      |FROM cumd, tot, na, nb
      |WHERE cum >= (t + 1) // 2 AND cum - m < (t + 1) // 2""".stripMargin

  // --------------------------------------------------------------------------
  // q370 — CRAMÉR'S V ASSOCIATION PANEL: q362 asks whether A DETERMINES
  // B (exact dependency); this measures how strongly A and B are
  // statistically ASSOCIATED — the normalized χ² effect size on the
  // same kind of column pairs. χ² uses the observed-cells-only identity
  // χ² = Σ obs²·N/(n_r·n_c) − N (zero cells contribute exactly their
  // n_r·n_c/N mass to the −N term), accumulated as NON-NEGATIVE exact
  // floors term_ppm = (10⁶·obs²·N) div (n_r·n_c) — sign-safe across
  // div/floor-div engines; V = √(χ²/(N·(min(r,c)−1))) is ONE pround'd
  // dag.
  // Together the two queries split "schema constraint" from
  // "distributional signal" — the profiling pair.
  //
  // Scale: per pair one (A,B) hash aggregate plus broadcast margins —
  // bounded by the pair's distinct grid, never wider than the scan.
  def cramersV(df: DataFrame, pairName: String, colA: String, colB: String)
  : DataFrame = {
    val cell = df.groupBy(col(colA).cast("string").as("a"),
        col(colB).cast("string").as("b"))
      .agg(count(lit(1)).as("obs")).localCheckpoint()
    val ra = cell.groupBy(col("a")).agg(sum(col("obs")).as("nr"))
    val rb = cell.groupBy(col("b")).agg(sum(col("obs")).as("nc"))
    val dims = cell.agg(countDistinct(col("a")).as("r"),
      countDistinct(col("b")).as("c"), sum(col("obs")).as("nn"))
    cell.join(broadcast(ra), Seq("a")).join(broadcast(rb), Seq("b"))
      .crossJoin(broadcast(dims))
      .agg(first(col("nn")).as("n"), first(col("r")).as("r"),
        first(col("c")).as("c"),
        sum(expr(
          """(cast(1000000 as decimal(38,0)) * obs * obs * nn)
            | div (cast(nr as decimal(38,0)) * nc)""".stripMargin))
          .as("sum_term"))
      .withColumn("chi2_ppm_d",
        col("sum_term") - expr("cast(1000000 as decimal(38,0)) * n"))
      .select(lit(pairName).as("pair"), col("n"), col("r"), col("c"),
        col("chi2_ppm_d").cast("long").as("chi2_ppm"),
        Num.pround(sqrt(
          greatest(col("chi2_ppm_d").cast("double") / lit(1e6), lit(0.0))
            / (col("n").cast("double")
              * (least(col("r"), col("c")) - lit(1L)).cast("double"))), 6)
          .as("v6"))
  }

  def q370CramersV(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val docs = Tables.documents(spark, dir)
    cramersV(cust, "customer.c_mktsegment~c_nationkey",
        "c_mktsegment", "c_nationkey")
      .unionByName(cramersV(ord, "orders.o_orderpriority~o_orderstatus",
        "o_orderpriority", "o_orderstatus"))
      .unionByName(cramersV(li, "lineitem.l_returnflag~l_linestatus",
        "l_returnflag", "l_linestatus"))
      .unionByName(cramersV(docs, "documents.source~lang", "source", "lang"))
      .orderBy(col("pair"))
  }

  private def vSql(pairName: String, table: String, a: String, b: String)
  : String =
    s"""SELECT '$pairName' AS pair, CAST(ANY_VALUE(nn) AS BIGINT) AS n,
       |  CAST(ANY_VALUE(r) AS BIGINT) AS r, CAST(ANY_VALUE(c) AS BIGINT) AS c,
       |  CAST(SUM((1000000::HUGEINT * obs * obs * nn)
       |      // (nr::HUGEINT * nc)) - 1000000::HUGEINT * ANY_VALUE(nn)
       |    AS BIGINT) AS chi2_ppm,
       |  FLOOR(sqrt(GREATEST(CAST(SUM((1000000::HUGEINT * obs * obs * nn)
       |        // (nr::HUGEINT * nc)) - 1000000::HUGEINT * ANY_VALUE(nn)
       |      AS DOUBLE) / 1e6, 0.0)
       |    / (CAST(ANY_VALUE(nn) AS DOUBLE)
       |      * CAST(LEAST(ANY_VALUE(r), ANY_VALUE(c)) - 1 AS DOUBLE)))
       |    * 1e6 + 0.5) / 1e6 AS v6
       |FROM (
       |  SELECT obs, nr, nc, nn, r, c FROM (
       |    SELECT CAST($a AS VARCHAR) AS a, CAST($b AS VARCHAR) AS b,
       |      COUNT(*) AS obs
       |    FROM $table GROUP BY 1, 2) cell
       |  JOIN (SELECT a2 AS a, SUM(obs2) AS nr FROM (
       |      SELECT CAST($a AS VARCHAR) AS a2, COUNT(*) AS obs2
       |      FROM $table GROUP BY 1) GROUP BY 1) ra USING (a)
       |  JOIN (SELECT b2 AS b, SUM(obs2) AS nc FROM (
       |      SELECT CAST($b AS VARCHAR) AS b2, COUNT(*) AS obs2
       |      FROM $table GROUP BY 1) GROUP BY 1) rb USING (b)
       |  CROSS JOIN (SELECT COUNT(DISTINCT CAST($a AS VARCHAR)) AS r,
       |    COUNT(DISTINCT CAST($b AS VARCHAR)) AS c, COUNT(*) AS nn
       |    FROM $table) dims)""".stripMargin

  val q370Sql: String = Seq(
    vSql("customer.c_mktsegment~c_nationkey", "customer",
      "c_mktsegment", "c_nationkey"),
    vSql("orders.o_orderpriority~o_orderstatus", "orders",
      "o_orderpriority", "o_orderstatus"),
    vSql("lineitem.l_returnflag~l_linestatus", "lineitem",
      "l_returnflag", "l_linestatus"),
    vSql("documents.source~lang", "documents", "source", "lang"))
    .mkString("", "\nUNION ALL\n", "\nORDER BY pair")

  private val catalogAf: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q369_hl_shift", q369HlShift _, Some(q369Sql)),
    ("q370_cramers_v", q370CramersV _, Some(q370Sql)))

  // ═════════════════ formerly Round8ahOps ═════════════════
  /** Round-8 thirty-fourth operator batch: Cramér–von Mises two-sample
    * test and a regression-to-the-mean audit — integrated-distance
    * distribution comparison and winner's-curse quantification on the
    * §8.4 exact-integer discipline.
    */

  // --------------------------------------------------------------------------
  // q373 — CRAMÉR–VON MISES TWO-SAMPLE: q118/q119's KS statistic is the
  // SUP of |F_A − F_B|; CvM integrates the squared gap over the pooled
  // sample — sensitive to broad shape differences a single crossing
  // hides. On the bounded l_quantity grid the statistic is exact
  // algebra: each pooled value's CDF gap quantizes FIRST to the exact
  // ppm floor g = (10⁶·cumA) div n − (10⁶·cumB) div m (bounded ≤ 10⁶,
  // so every later product stays inside DECIMAL(38,0) even at the
  // decade probe), then T_ppm = (n·m·Σ t_v·g²) div (N²·10⁶) is ONE
  // exact cross-multiplied floor — no float anywhere.
  //
  // Scale: one (group, value) histogram aggregate; everything after is
  // ≤50-row grid algebra.
  def cvmTest(rows: DataFrame): DataFrame = {
    val hist = rows.groupBy(col("v"))
      .agg(count_if(col("g") === "A").as("ca"),
        count_if(col("g") === "B").as("cb"))
      .withColumn("cuma", sum(col("ca")).over(
        Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cumb", sum(col("cb")).over(
        Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)))
    val tot = hist.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
      count(lit(1)).as("n_values"))
    hist.crossJoin(broadcast(tot))
      .withColumn("g",
        expr("(1000000L * cuma) div n_a - (1000000L * cumb) div n_b"))
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        first(col("n_values")).as("n_values"),
        sum(expr("cast(ca + cb as decimal(38,0)) * g * g")).as("s"))
      .select(col("n_a"), col("n_b"), col("n_values"),
        expr("""cast(((cast(n_a as decimal(38,0)) * n_b) * s)
               | div ((cast(n_a + n_b as decimal(38,0)) * (n_a + n_b))
               |   * 1000000L) as bigint)""".stripMargin).as("t_ppm"))
  }

  def q373Cvm(spark: SparkSession, dir: String): DataFrame =
    cvmTest(Tables.lineitem(spark, dir)
      .filter(col("l_returnflag").isin("R", "N"))
      .select(when(col("l_returnflag") === "R", "A").otherwise("B").as("g"),
        col("l_quantity").cast("long").as("v")))

  val q373Sql: String =
    """WITH rows_ AS (
      |  SELECT CASE WHEN l_returnflag = 'R' THEN 'A' ELSE 'B' END AS g,
      |    CAST(l_quantity AS BIGINT) AS v
      |  FROM lineitem WHERE l_returnflag IN ('R', 'N')),
      |hist AS (
      |  SELECT v, COUNT(*) FILTER (g = 'A') AS ca,
      |    COUNT(*) FILTER (g = 'B') AS cb
      |  FROM rows_ GROUP BY 1),
      |cum AS (
      |  SELECT v, ca, cb,
      |    SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
      |    SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb
      |  FROM hist),
      |tot AS (SELECT SUM(ca) AS n_a, SUM(cb) AS n_b, COUNT(*) AS n_values
      |  FROM hist),
      |gap AS (
      |  SELECT ca, cb,
      |    (1000000 * cuma) // n_a - (1000000 * cumb) // n_b AS g,
      |    n_a, n_b, n_values
      |  FROM cum, tot)
      |SELECT CAST(ANY_VALUE(n_a) AS BIGINT) AS n_a,
      |  CAST(ANY_VALUE(n_b) AS BIGINT) AS n_b,
      |  CAST(ANY_VALUE(n_values) AS BIGINT) AS n_values,
      |  CAST(((ANY_VALUE(n_a)::HUGEINT * ANY_VALUE(n_b))
      |      * SUM((ca + cb)::HUGEINT * g * g))
      |    // ((ANY_VALUE(n_a + n_b)::HUGEINT * ANY_VALUE(n_a + n_b))
      |      * 1000000) AS BIGINT) AS t_ppm
      |FROM gap""".stripMargin

  // --------------------------------------------------------------------------
  // q374 — REGRESSION-TO-THE-MEAN AUDIT: pick the top-20 customers by
  // first-half revenue and measure how their second-half revenue
  // shrinks relative to the whole population's ratio — the winner's
  // curse every leaderboard, A/B winner, and "best supplier" report
  // suffers. The period split is the data's own midpoint date
  // (min + span div 2 — deterministic, no literal calendar
  // assumption); all revenue in exact cents, ratios as exact ppm
  // floors. q325 tracks identity churn of a top-k; this quantifies the
  // VALUE shrinkage of the winners.
  //
  // Scale: two hash aggregates over orders (per-customer × period),
  // a broadcast 1-row midpoint/population join, a top-20 selection.
  def regressionToMean(orders: DataFrame): DataFrame = {
    val dated = orders.select(col("o_custkey").cast("long").as("ck"),
      to_date(col("o_orderdate")).as("d"),
      expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").as("cents"))
    val mid = dated.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(expr("date_add(d0, cast(datediff(d1, d0) div 2L as int))")
        .as("dm"))
    val per = dated.crossJoin(broadcast(mid))
      .groupBy(col("ck"))
      .agg(sum(when(col("d") < col("dm"), col("cents")).otherwise(0L))
          .as("rev1"),
        sum(when(col("d") >= col("dm"), col("cents")).otherwise(0L))
          .as("rev2"))
      .localCheckpoint()
    val pop = per.agg(sum(col("rev1")).as("p1"), sum(col("rev2")).as("p2"))
      .select(expr("(1000000L * p2) div greatest(p1, 1L)")
        .as("pop_ratio_ppm"))
    per.orderBy(col("rev1").desc, col("ck")).limit(20)
      .crossJoin(broadcast(pop))
      .select(col("ck").as("custkey"), col("rev1").as("rev1_cents"),
        col("rev2").as("rev2_cents"),
        expr("(1000000L * rev2) div greatest(rev1, 1L)").as("ratio_ppm"),
        col("pop_ratio_ppm"))
      .orderBy(col("rev1_cents").desc, col("custkey"))
  }

  def q374RegressionToMean(spark: SparkSession, dir: String): DataFrame =
    regressionToMean(Tables.orders(spark, dir))

  val q374Sql: String =
    """WITH dated AS (
      |  SELECT CAST(o_custkey AS BIGINT) AS ck, CAST(o_orderdate AS DATE) AS d,
      |    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders),
      |mid AS (
      |  SELECT MIN(d) + CAST(date_diff('day', MIN(d), MAX(d)) // 2 AS INT) AS dm
      |  FROM dated),
      |per AS (
      |  SELECT ck,
      |    SUM(CASE WHEN d < dm THEN cents ELSE 0 END) AS rev1,
      |    SUM(CASE WHEN d >= dm THEN cents ELSE 0 END) AS rev2
      |  FROM dated, mid GROUP BY 1),
      |pop AS (
      |  SELECT (1000000 * SUM(rev2)) // GREATEST(SUM(rev1), 1) AS pop_ratio_ppm
      |  FROM per),
      |top AS (
      |  SELECT * FROM per ORDER BY rev1 DESC, ck LIMIT 20)
      |SELECT ck AS custkey, CAST(rev1 AS BIGINT) AS rev1_cents,
      |  CAST(rev2 AS BIGINT) AS rev2_cents,
      |  CAST((1000000 * rev2) // GREATEST(rev1, 1) AS BIGINT) AS ratio_ppm,
      |  CAST(pop_ratio_ppm AS BIGINT) AS pop_ratio_ppm
      |FROM top, pop ORDER BY rev1_cents DESC, custkey""".stripMargin

  private val catalogAh: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q373_cvm_test", q373Cvm _, Some(q373Sql)),
    ("q374_regression_to_mean", q374RegressionToMean _, Some(q374Sql)))

  // ═════════════════ formerly Round8bOps (consolidated round 10) ═════════════════

  // --------------------------------------------------------------------------
  // q287 — GROUP-SEQUENTIAL EXPERIMENT MONITOR: split users into A/B by
  // user_id parity, accumulate conversions (purchase events) and trials
  // (all events) day by day, and emit the running two-proportion z with
  // a |z| ≥ 2.5 crossing flag — the daily peeking readout an
  // experimentation platform renders (the fixed 2.5 boundary is the
  // O'Brien-Fleming-flavored guard against peeking inflation).
  //
  // Scale: one hash aggregate to the (day, variant) grid; all cumulative
  // windows run over the BOUNDED calendar-day grid (q167's allowlisted
  // class). Determinism: counts are exact; z is one sqrt + divides on
  // them, floor-quantized to a 1e-6 grid before output.
  def q287SequentialTest(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), pmod(col("user_id"), lit(2)).as("v"),
        (col("event_type") === "purchase").as("conv"))
      .groupBy(col("day"), col("v"))
      .agg(count(lit(1)).as("n"), count_if(col("conv")).as("x"))
    val wc = Window.partitionBy(col("v")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = daily
      .withColumn("cn", sum(col("n")).over(wc))
      .withColumn("cx", sum(col("x")).over(wc))
      .groupBy(col("day"))
      .agg(max(when(col("v") === 0, col("cn"))).as("na"),
        max(when(col("v") === 0, col("cx"))).as("xa"),
        max(when(col("v") === 1, col("cn"))).as("nb"),
        max(when(col("v") === 1, col("cx"))).as("xb"))
      .filter(col("na").isNotNull && col("nb").isNotNull)
    val z = cum
      .withColumn("p", (col("xa") + col("xb")).cast("double") / (col("na") + col("nb")))
      .withColumn("se", sqrt(col("p") * (lit(1.0) - col("p")) *
        (lit(1.0) / col("na") + lit(1.0) / col("nb"))))
      .withColumn("z_e6", when(col("se") > 0,
        floor((col("xa").cast("double") / col("na") - col("xb").cast("double") / col("nb"))
          / col("se") * 1e6 + 0.5)))
      .withColumn("crossed", coalesce(abs(col("z_e6")) >= 2500000L, lit(false)))
    z.select(col("day"), col("na"), col("xa"), col("nb"), col("xb"),
        col("z_e6"), col("crossed"))
      .orderBy(col("day"))
  }

  val q287Sql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, user_id % 2 AS v,
      |    COUNT(*) AS n,
      |    COUNT(*) FILTER (event_type = 'purchase') AS x
      |  FROM events GROUP BY 1, 2),
      |cum AS (
      |  SELECT day, v,
      |    SUM(n) OVER (PARTITION BY v ORDER BY day
      |      ROWS UNBOUNDED PRECEDING) AS cn,
      |    SUM(x) OVER (PARTITION BY v ORDER BY day
      |      ROWS UNBOUNDED PRECEDING) AS cx
      |  FROM daily),
      |piv AS (
      |  SELECT day,
      |    MAX(CASE WHEN v = 0 THEN cn END) AS na,
      |    MAX(CASE WHEN v = 0 THEN cx END) AS xa,
      |    MAX(CASE WHEN v = 1 THEN cn END) AS nb,
      |    MAX(CASE WHEN v = 1 THEN cx END) AS xb
      |  FROM cum GROUP BY day),
      |z AS (
      |  SELECT day, na, xa, nb, xb,
      |    CAST(xa + xb AS DOUBLE) / (na + nb) AS p,
      |    sqrt((CAST(xa + xb AS DOUBLE) / (na + nb))
      |      * (1.0 - CAST(xa + xb AS DOUBLE) / (na + nb))
      |      * (1.0 / na + 1.0 / nb)) AS se
      |  FROM piv WHERE na IS NOT NULL AND nb IS NOT NULL)
      |SELECT day, CAST(na AS BIGINT) AS na, CAST(xa AS BIGINT) AS xa,
      |  CAST(nb AS BIGINT) AS nb, CAST(xb AS BIGINT) AS xb,
      |  CASE WHEN se > 0 THEN CAST(FLOOR((CAST(xa AS DOUBLE) / na
      |    - CAST(xb AS DOUBLE) / nb) / se * 1e6 + 0.5) AS BIGINT) END AS z_e6,
      |  COALESCE(ABS(CASE WHEN se > 0 THEN CAST(FLOOR((CAST(xa AS DOUBLE) / na
      |    - CAST(xb AS DOUBLE) / nb) / se * 1e6 + 0.5) AS BIGINT) END)
      |    >= 2500000, FALSE) AS crossed
      |FROM z ORDER BY day""".stripMargin


  // ═════════════════ formerly Round8cOps (consolidated round 10) ═════════════════

  // --------------------------------------------------------------------------
  // q295 — ONE-WAY ANOVA F-TEST across order priorities: does mean order
  // value differ by priority class? F = (SSB/(k−1)) / (SSW/(N−k)) from
  // exact sufficient statistics — completes the q118 (KS) / q261
  // (Mann-Whitney) / q175 (moments) hypothesis-testing family with the
  // k-group parametric test.
  //
  // Determinism (§8.4): per-group Σx rides as exact cent LONGs and Σx²
  // as exact DECIMAL(38,0) cents² (money-grid inputs); each group's
  // s²/n term is ONE double expression, summed in PINNED group order
  // via the q273 sorted-fold rule; F ships floor-quantized at 1e-6.
  //
  // Scale: one hash aggregate to k rows, one broadcast total — nothing
  // else touches the corpus.
  def q295Anova(spark: SparkSession, dir: String): DataFrame = {
    val dec0 = org.apache.spark.sql.types.DecimalType(38, 0)
    val g = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("grp"),
        expr("cast(floor(o_totalprice * 100 + 0.5d) as bigint)").as("c"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
        sum((col("c").cast(dec0) * col("c"))).as("qc"))
      .withColumn("term", (col("sc").cast("double") * col("sc").cast("double"))
        / col("n"))
    val tot = g.agg(sum(col("n")).as("nn"), sum(col("sc")).as("ssc"),
      sum(col("qc")).cast(dec0).as("qqc"), count(lit(1)).as("k"),
      expr("aggregate(sort_array(collect_list(struct(grp, term))), " +
        "cast(0 as double), (a, x) -> a + x.term)").as("sb"))
    tot
      .withColumn("ssb", col("sb")
        - col("ssc").cast("double") * col("ssc").cast("double") / col("nn"))
      .withColumn("ssw", col("qqc").cast("double") - col("sb"))
      .withColumn("f_e6", floor(
        (col("ssb") / (col("k") - 1)) / (col("ssw") / (col("nn") - col("k")))
          * 1e6 + 0.5))
      .select(col("k").cast("int").as("k_groups"), col("nn").as("n_rows"),
        col("f_e6").cast("long").as("f_e6"))
  }

  val q295Sql: String =
    """WITH g AS (
      |  SELECT o_orderpriority AS grp, COUNT(*) AS n,
      |    SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS sc,
      |    SUM(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS DECIMAL(38,0))
      |      * CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS qc
      |  FROM orders GROUP BY 1),
      |t AS (
      |  SELECT grp, n, sc, qc,
      |    CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / n AS term
      |  FROM g),
      |tot AS (
      |  SELECT SUM(n) AS nn, SUM(sc) AS ssc,
      |    CAST(SUM(qc) AS DECIMAL(38,0)) AS qqc, COUNT(*) AS k,
      |    list_reduce(list(term ORDER BY grp), (a, b) -> a + b) AS sb
      |  FROM t)
      |SELECT CAST(k AS INT) AS k_groups, CAST(nn AS BIGINT) AS n_rows,
      |  CAST(FLOOR(((sb - CAST(ssc AS DOUBLE) * CAST(ssc AS DOUBLE) / nn) / (k - 1))
      |    / ((CAST(qqc AS DOUBLE) - sb) / (nn - k))
      |    * 1e6 + 0.5) AS BIGINT) AS f_e6
      |FROM tot""".stripMargin


  private val catalogR8: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q287_sequential_test", q287SequentialTest _, Some(q287Sql)),
    ("q295_anova", q295Anova _, Some(q295Sql)))

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    catalogR ++ catalogT ++ catalogU ++ catalogX ++ catalogY ++ catalogAa ++ catalogAb ++ catalogAd ++ catalogAf ++ catalogAh ++ catalogR8
}
