package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fourth wave of training-data pipeline operators: PII redaction,
  * corpus-boilerplate detection (C4-style "remove lines seen everywhere"),
  * sliding-window chunking for training-example packing, plus the
  * remaining aggregate surface (bitwise / boolean aggregates,
  * percent_rank / cume_dist windows).
  *
  * No reference counterpart (the reference is an ingest ETL — see
  * reference/src/main); these are SURVEY §2.2 [EXT] categories a corpus
  * pipeline needs at 100 TB.
  */
object CorpusOps {

  // --------------------------------------------------------------------------
  // q85 — PII redaction. The synthetic corpus has no natural PII, so the
  // query deterministically injects an email on every 7th doc (identical
  // construction in the oracle) and then runs the real redaction pass:
  // regexp_replace to a placeholder + a redaction count. The regex stays in
  // the RE2 ∩ java.util.regex common subset so both engines agree.
  // Scale: row-local (regex over each doc) — embarrassingly parallel, no
  // shuffle; stays in whole-stage codegen (regexp_replace is codegen'd).
  private val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  def q85PiiRedact(spark: SparkSession, dir: String): DataFrame = {
    val aug = when(
      col("doc_id") % 7 === 0,
      concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com now"))).otherwise(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), aug.as("aug"))
      .select(
        col("doc_id"),
        md5(regexp_replace(col("aug"), emailRe, "<EMAIL>")).as("red_md5"),
        size(regexp_extract_all(col("aug"), lit(emailRe), lit(0))).as("n_pii"))
      .orderBy(col("doc_id"))
  }

  val q85Sql: String =
    s"""SELECT doc_id,
       |  md5(regexp_replace(aug, '$emailRe', '<EMAIL>', 'g')) AS red_md5,
       |  len(regexp_extract_all(aug, '$emailRe')) AS n_pii
       |FROM (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 7 = 0
       |              THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
       |              ELSE text END AS aug
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------------
  // q86 — bitwise and boolean aggregates: bit_and/bit_or/bit_xor over the
  // key space per priority class (the bitmap/flag-fold surface), plus
  // bool_and/bool_or and count_if. All are single-pass hash aggregates
  // with map-side partials — one shuffle on the group key.
  def q86BitwiseAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("bit_and(o_orderkey)").as("key_and"),
        expr("bit_or(o_orderkey)").as("key_or"),
        expr("bit_xor(o_orderkey)").as("key_xor"),
        expr("bool_and(o_totalprice > 1000)").as("all_over_1k"),
        expr("bool_or(o_totalprice > 400000)").as("any_over_400k"),
        expr("count_if(o_totalprice > 100000)").as("n_over_100k"))
      .orderBy(col("o_orderpriority"))

  val q86Sql: String =
    """SELECT o_orderpriority,
      |  bit_and(o_orderkey) AS key_and,
      |  bit_or(o_orderkey) AS key_or,
      |  bit_xor(o_orderkey) AS key_xor,
      |  bool_and(o_totalprice > 1000) AS all_over_1k,
      |  bool_or(o_totalprice > 400000) AS any_over_400k,
      |  CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_over_100k
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // --------------------------------------------------------------------------
  // q87 — corpus boilerplate share (C4/RefinedWeb-style): a word-3-gram is
  // "boilerplate" when it appears in ≥3 distinct documents; each doc
  // reports what fraction of its distinct 3-grams are boilerplate (docs
  // dominated by corpus-frequent spans are template/spam candidates).
  // Scale: one explode, then gram-df as a COUNT window over the single
  // (doc_id, s) lineage — measured 2.3× faster at sf0.1 than building a
  // separate df aggregate and joining back, because the join shape scans
  // and shingles the corpus twice (no common-subplan reuse in Catalyst);
  // same one-shuffle-on-s distribution either way.
  def q87Boilerplate(spark: SparkSession, dir: String): DataFrame = {
    val sh = TextOps.shingleEdges(Tables.documents(spark, dir))
    sh.withColumn("df", count(lit(1)).over(Window.partitionBy(col("s"))))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("df") >= 3, 1L).otherwise(0L)).as("n_boiler"))
      .select(
        col("doc_id"), col("n_grams"), col("n_boiler"),
        Num.pround(col("n_boiler").cast("double") / col("n_grams"), 6).as("boiler_share"))
      .orderBy(col("doc_id"))
  }

  val q87Sql: String =
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       |    FROM (SELECT doc_id, ${TextOps.toksSqlD} AS t FROM documents),
       |         UNNEST(generate_series(1, len(t) - 2)) AS u(i))),
       |gdf AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s)
       |SELECT sh.doc_id, COUNT(*) AS n_grams,
       |  CAST(SUM(CASE WHEN gdf.df >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       |  FLOOR((CAST(SUM(CASE WHEN gdf.df >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
       |        / COUNT(*)) * 1e6 + 0.5) / 1e6 AS boiler_share
       |FROM sh JOIN gdf USING (s)
       |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin

  // --------------------------------------------------------------------------
  // q88 — sliding-window chunking: split each doc's token stream into
  // windows of 32 tokens with stride 16 (the training-example packing
  // shape: every token lands in ≤2 chunks, overlap preserves context
  // across boundaries). Chunk content is carried as md5 so the result
  // stays narrow.
  // Scale: sequence()+explode is row-local fan-out — no shuffle at all
  // until a downstream consumer groups; chunk count is ~n_tokens/stride
  // per doc, so output size is linear in corpus size.
  def q88Chunk(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), greatest(size(col("toks")), lit(1)), lit(16)))
          .as("start"))
      .select(
        col("doc_id"), col("start"),
        size(slice(col("toks"), col("start"), lit(32))).as("n_tok"),
        md5(concat_ws(" ", slice(col("toks"), col("start"), lit(32)))).as("chunk_md5"))
      .orderBy(col("doc_id"), col("start"))

  val q88Sql: String =
    s"""SELECT doc_id, start,
       |  len(t[start : start + 31]) AS n_tok,
       |  md5(array_to_string(t[start : start + 31], ' ')) AS chunk_md5
       |FROM (SELECT doc_id, ${TextOps.toksSqlD} AS t FROM documents),
       |     UNNEST(generate_series(1, greatest(len(t), 1), 16)) AS u(start)
       |ORDER BY doc_id, start""".stripMargin

  // --------------------------------------------------------------------------
  // q89 — percent_rank / cume_dist: relative standing of each order within
  // its priority class. The window order is made a total order (price,
  // then key) so rank-based outputs are deterministic cross-engine; the
  // ratios are rounded at 6dp (they are exact k/n rationals — rounding
  // only normalizes repr). Scale: one shuffle on the partition key, one
  // sort within partitions; skewed priority classes would use the
  // pre-aggregated-CDF reformulation instead.
  def q89PercentRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 10 === 0) // keep the verified output small
      .select(
        col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        Num.pround(percent_rank().over(w), 6).as("pct_rank"),
        Num.pround(cume_dist().over(w), 6).as("cume"))
      .orderBy(col("o_orderkey"))
  }

  val q89Sql: String =
    """SELECT o_orderkey, o_orderpriority, o_totalprice,
      |  FLOOR((percent_rank() OVER w) * 1e6 + 0.5) / 1e6 AS pct_rank,
      |  FLOOR((cume_dist() OVER w) * 1e6 + 0.5) / 1e6 AS cume
      |FROM orders WHERE o_orderkey % 10 = 0
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  // --------------------------------------------------------------------------
  // q90 — deterministic train/val/test split: the split label is a pure
  // function of the CONTENT hash (md5 hex prefix vs fixed thresholds:
  // <'e6' = 230/256 ≈ 90% train, <'f3' = 13/256 ≈ 5% val, rest test), so
  // exact duplicates always land in the same split (no train/test leakage
  // through dups), reruns are stable, and both engines agree. Row-local —
  // no shuffle, streams through map-side at any corpus size.
  def q90Split(spark: SparkSession, dir: String): DataFrame = {
    val prefix = substring(md5(col("text")), 1, 2)
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        when(prefix < "e6", "train")
          .when(prefix < "f3", "val")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  val q90Sql: String =
    """SELECT doc_id,
      |  CASE WHEN substring(md5(text), 1, 2) < 'e6' THEN 'train'
      |       WHEN substring(md5(text), 1, 2) < 'f3' THEN 'val'
      |       ELSE 'test' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------------
  // q95 — sequence packing (GPT-style concat-and-chunk): within each source
  // shard, documents are concatenated in doc_id order and cut into
  // fixed-capacity (2048-token) training sequences; each doc reports the
  // bin it starts in, the bin it ends in (docs straddle cuts), and its
  // offset — pure integer window arithmetic, exact in both engines.
  // Scale: the running sum partitions by the shard key, so it's an
  // ordinary partitioned window (one shuffle + sort per shard), not a
  // single-partition global cumsum.
  def q95Pack(spark: SparkSession, dir: String): DataFrame = {
    val cap = 2048
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), size(TextOps.toks).cast("long").as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .select(
        col("doc_id"), col("source"), col("n_tok"),
        floor((col("cum") - col("n_tok")) / cap).cast("long").as("bin_start"),
        floor((col("cum") - 1) / cap).cast("long").as("bin_end"),
        ((col("cum") - col("n_tok")) % cap).as("off_in_bin"))
      .orderBy(col("doc_id"))
  }

  val q95Sql: String =
    s"""SELECT doc_id, source, n_tok,
       |  CAST(FLOOR((cum - n_tok) / 2048) AS BIGINT) AS bin_start,
       |  CAST(FLOOR((cum - 1) / 2048) AS BIGINT) AS bin_end,
       |  CAST((cum - n_tok) % 2048 AS BIGINT) AS off_in_bin
       |FROM (
       |  SELECT doc_id, source, n_tok,
       |         SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
       |                          ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM (SELECT doc_id, source, len(${TextOps.toksSqlD}) AS n_tok
       |        FROM documents))
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------------
  // q97 — unigram LM scoring (perplexity-style quality filter): fit a
  // corpus unigram model (count(w)/total), then score each doc by its
  // tokens' mean log-probability — the cheap first-pass LM filter before
  // an expensive neural scorer. avg-of-logs is order-dependent in the
  // last ulps → round(4) per SURVEY §8.4.
  // Scale: token counts come from ONE explode — the unigram count is a
  // window over the token stream itself (Catalyst does not reuse common
  // subplans, so a model-aggregate joined back would scan + explode the
  // corpus twice; q87 lesson, §8.5); the corpus-total is a no-explode
  // row-local size() sum, broadcast as one row.
  def q97UnigramLm(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val tok = docs.select(col("doc_id"), explode(TextOps.toks).as("w"))
    val total = docs.agg(sum(size(TextOps.toks)).as("n"))
    tok.withColumn("c", count(lit(1)).over(Window.partitionBy(col("w"))))
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tok"),
        Num.pround(avg(log(col("c").cast("double") / col("n"))), 4).as("avg_logprob"))
      .orderBy(col("doc_id"))
  }

  val q97Sql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, UNNEST(t) AS w
       |  FROM (SELECT doc_id, ${TextOps.toksSqlD} AS t FROM documents)),
       |tot AS (SELECT COUNT(*) AS n FROM tok),
       |model AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w)
       |SELECT doc_id, COUNT(*) AS n_tok,
       |       FLOOR((AVG(LN(CAST(c AS DOUBLE) / n))) * 1e4 + 0.5) / 1e4 AS avg_logprob
       |FROM tok JOIN model USING (w), tot
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------------
  // q98 — percentile-band length filter: keep documents whose length sits
  // inside the corpus [P5, P95] band (the standard outlier-trim before
  // training). The two thresholds are ONE 1-row aggregate broadcast onto a
  // row-local filter — no sort of the corpus, no second aggregation pass.
  // Filtering compares raw (unrounded) thresholds; rounding only cosmetic
  // output columns. Spark percentile() and DuckDB quantile_cont share the
  // (n-1)*p linear-interpolation definition (proven by q28).
  def q98LengthBand(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bounds = docs.agg(
      expr("percentile(n_chars, 0.05)").as("lo"),
      expr("percentile(n_chars, 0.95)").as("hi"))
    docs.crossJoin(broadcast(bounds))
      .filter(col("n_chars") >= col("lo") && col("n_chars") <= col("hi"))
      .select(col("doc_id"), col("n_chars"),
        Num.pround(col("lo"), 2).as("p05"), Num.pround(col("hi"), 2).as("p95"))
      .orderBy(col("doc_id"))
  }

  val q98Sql: String =
    """WITH b AS (
      |  SELECT quantile_cont(n_chars, 0.05) AS lo, quantile_cont(n_chars, 0.95) AS hi
      |  FROM documents)
      |SELECT doc_id, n_chars, FLOOR((lo) * 1e2 + 0.5) / 1e2 AS p05, FLOOR((hi) * 1e2 + 0.5) / 1e2 AS p95
      |FROM documents, b
      |WHERE n_chars >= lo AND n_chars <= hi
      |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------------
  // q100 — the training-data pipeline end-to-end as ONE lazy plan:
  // canonicalize (q84) → exact-dedup on the canonical hash (q30) → quality
  // filter (length + type-token ratio) → content-hash split (q90) →
  // per-(split, lang) corpus accounting. Integration proof that the
  // operators compose without materialization barriers: Catalyst sees the
  // whole pipeline (two shuffles total — dedup window on the hash, final
  // aggregate), and the wide text column dies right after canonicalization.
  def q100Pipeline(spark: SparkSession, dir: String): DataFrame = {
    val clean = regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " ")
    val canon = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), clean.as("clean"))
      .select(col("doc_id"), col("lang"), md5(col("clean")).as("h"),
        expr("filter(split(clean, ' '), t -> t != '')").as("toks"))
    val kept = canon
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("h")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1) // exact dedup: lowest doc_id survives
      .withColumn("n_tok", size(col("toks")))
      .filter(col("n_tok") >= 20)
      .withColumn("ttr",
        size(array_distinct(col("toks"))).cast("double") / col("n_tok"))
      .filter(col("ttr") >= 0.3)
    val prefix = substring(col("h"), 1, 2)
    kept
      .withColumn("split",
        when(prefix < "e6", "train").when(prefix < "f3", "val").otherwise("test"))
      .groupBy(col("split"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tokens"),
        Num.pround(avg(col("ttr")), 4).as("avg_ttr"))
      .orderBy(col("split"), col("lang"))
  }

  val q100Sql: String =
    """WITH c AS (
      |  SELECT doc_id, lang,
      |         regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g') AS clean
      |  FROM documents),
      |canon AS (
      |  SELECT doc_id, lang, md5(clean) AS h,
      |         list_filter(string_split(clean, ' '), t -> t != '') AS toks
      |  FROM c),
      |kept AS (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
      |    FROM canon) WHERE rn = 1),
      |m AS (
      |  SELECT doc_id, lang, h, len(toks) AS n_tok,
      |         CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
      |  FROM kept WHERE len(toks) >= 20)
      |SELECT
      |  CASE WHEN substring(h, 1, 2) < 'e6' THEN 'train'
      |       WHEN substring(h, 1, 2) < 'f3' THEN 'val'
      |       ELSE 'test' END AS split,
      |  lang, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
      |  FLOOR((AVG(ttr)) * 1e4 + 0.5) / 1e4 AS avg_ttr
      |FROM m WHERE ttr >= 0.3
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --------------------------------------------------------------------------
  // q103 — token-entropy quality score: Shannon entropy of each doc's
  // unigram distribution (H = -Σ p·log2 p). Low entropy = repetitive/
  // template docs — the information-theoretic twin of q73's top-share
  // filter. One explode → per-(doc,w) counts → per-doc window total →
  // row-local p·log2 p → one hash aggregate; single lineage throughout
  // (§8.5 lesson). Entropy rounded at 4dp over the log-accumulation noise.
  def q103TokenEntropy(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextOps.toks).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    counts
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("doc_id"))))
      .withColumn("p", col("c").cast("double") / col("n"))
      .groupBy(col("doc_id"))
      .agg(
        Num.pround(-sum(col("p") * log(2.0, col("p"))), 4).as("entropy"),
        count(lit(1)).as("n_distinct"),
        max(col("n")).as("n_tok"))
      .orderBy(col("doc_id"))
  }

  val q103Sql: String =
    s"""WITH counts AS (
       |  SELECT doc_id, w, COUNT(*) AS c FROM (
       |    SELECT doc_id, UNNEST(t) AS w
       |    FROM (SELECT doc_id, ${TextOps.toksSqlD} AS t FROM documents))
       |  GROUP BY doc_id, w),
       |probs AS (
       |  SELECT doc_id, c,
       |         SUM(c) OVER (PARTITION BY doc_id) AS n,
       |         CAST(c AS DOUBLE) / SUM(c) OVER (PARTITION BY doc_id) AS p
       |  FROM counts)
       |SELECT doc_id, FLOOR((-SUM(p * log2(p))) * 1e4 + 0.5) / 1e4 AS entropy,
       |       COUNT(*) AS n_distinct, CAST(MAX(n) AS BIGINT) AS n_tok
       |FROM probs GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------------
  // q129 — relational DIVISION (containment join): docs whose token set
  // contains EVERY term of a query set — the classic "for all" operator
  // (suppliers-supplying-all-parts) in its corpus form (boolean AND
  // retrieval). No division primitive exists in Spark or SQL; the
  // standard reduction is: match tokens against the term set, count
  // DISTINCT matched terms per doc, keep docs hitting |terms|.
  //
  // Scale shape: the term set is tiny and becomes a row-local IN filter
  // (pushed into the scan projection — no join for the match), the
  // distinct-count is one hash aggregate on doc_id, and the |terms|
  // comparison is a 1-row broadcast-free literal. Nothing scans the
  // corpus twice; fan-out is matched tokens only.
  private val divisionTerms = Seq("scan", "join", "hash")

  def q129Division(spark: SparkSession, dir: String): DataFrame = {
    val terms = divisionTerms.map(lit)
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextOps.toks).as("w"))
      .filter(col("w").isin(divisionTerms: _*))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("w")).as("n_terms"))
      .filter(col("n_terms") === terms.length)
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }

  val q129Sql: String = {
    val inList = divisionTerms.map(t => s"'$t'").mkString(", ")
    s"""SELECT doc_id FROM (
       |  SELECT doc_id, COUNT(DISTINCT w) AS c
       |  FROM (SELECT doc_id, unnest(${TextOps.toksSqlD}) AS w FROM documents)
       |  WHERE w IN ($inList) GROUP BY doc_id)
       |WHERE c = ${divisionTerms.length} ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q133 — population stability index (PSI) drift: has the document-length
  // distribution shifted between the established crawl sources (src0–src9,
  // the "reference" population) and the newly onboarded ones (src10–src19,
  // "current")? The standard pre-training data-quality gate before mixing
  // a new source into the corpus: PSI = Σ_bins (p_cur − p_ref)·ln(p_cur/
  // p_ref) with the conventional <0.1 / <0.25 / ≥0.25 bands.
  //
  // Determinism: bin counts are exact longs from ONE conditional hash
  // aggregate (count_if per side — a single corpus scan, no per-side
  // re-scan); proportions use a fixed continuity correction (+0.5 per
  // bin, +0.5·|bins| per total) so empty bins never hit ln(0); the
  // 12-term double sum folds in bin order via sort_array + aggregate()
  // (q119's pattern) — bit-equal cross-engine before the final rounding.
  //
  // Scale: the corpus collapses to a 12-row grid in the first aggregate;
  // the spine join and the fold are constant-size. One scan, one shuffle.
  def q133PsiDrift(spark: SparkSession, dir: String): DataFrame = {
    val binned = Tables.documents(spark, dir)
      .select(
        expr("cast(least(n_chars div 50, 11) as bigint)").as("bin"),
        (regexp_extract(col("source"), "([0-9]+)$", 1).cast("int") < 10).as("is_ref"))
      .groupBy(col("bin"))
      .agg(count_if(col("is_ref")).as("ref_n"), count_if(!col("is_ref")).as("cur_n"))
    spark.range(0, 12).select(col("id").as("bin"))
      .join(binned, Seq("bin"), "left")
      .na.fill(0L, Seq("ref_n", "cur_n"))
      .groupBy(lit(1).as("g"))
      .agg(
        sort_array(collect_list(struct(col("bin"), col("ref_n"), col("cur_n")))).as("cs"),
        sum(col("ref_n")).as("n_ref"), sum(col("cur_n")).as("n_cur"))
      .withColumn("psi", expr(
        """aggregate(cs, 0.0d, (a, x) ->
          |  a + (((x.cur_n + 0.5d) / (n_cur + 6.0d)) - ((x.ref_n + 0.5d) / (n_ref + 6.0d)))
          |      * ln(((x.cur_n + 0.5d) / (n_cur + 6.0d))
          |           / ((x.ref_n + 0.5d) / (n_ref + 6.0d))))""".stripMargin))
      .select(col("n_ref"), col("n_cur"), Num.pround(col("psi"), 6).as("psi"),
        when(Num.pround(col("psi"), 6) < 0.1, lit("stable"))
          .when(Num.pround(col("psi"), 6) < 0.25, lit("moderate"))
          .otherwise(lit("major")).as("drift_band"))
  }

  val q133Sql: String =
    """WITH binned AS (
      |  SELECT LEAST(n_chars // 50, 11) AS bin,
      |         CAST(regexp_extract(source, '([0-9]+)$', 1) AS INT) < 10 AS is_ref
      |  FROM documents),
      |cnt AS (
      |  SELECT bin,
      |    COUNT(*) FILTER (is_ref) AS ref_n,
      |    COUNT(*) FILTER (NOT is_ref) AS cur_n
      |  FROM binned GROUP BY bin),
      |grid AS (
      |  SELECT s.bin, COALESCE(ref_n, 0) AS ref_n, COALESCE(cur_n, 0) AS cur_n
      |  FROM (SELECT UNNEST(generate_series(0, 11)) AS bin) s
      |  LEFT JOIN cnt ON cnt.bin = s.bin),
      |tot AS (SELECT SUM(ref_n) AS n_ref, SUM(cur_n) AS n_cur FROM grid),
      |agg AS (
      |  SELECT n_ref, n_cur,
      |    list_reduce(list_prepend(0.0, list(
      |      (((cur_n + 0.5) / (n_cur + 6.0)) - ((ref_n + 0.5) / (n_ref + 6.0)))
      |      * LN(((cur_n + 0.5) / (n_cur + 6.0)) / ((ref_n + 0.5) / (n_ref + 6.0)))
      |      ORDER BY bin)), (a, b) -> a + b) AS psi
      |  FROM grid CROSS JOIN tot GROUP BY n_ref, n_cur)
      |SELECT CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
      |  FLOOR((psi) * 1e6 + 0.5) / 1e6 AS psi,
      |  CASE WHEN FLOOR((psi) * 1e6 + 0.5) / 1e6 < 0.1 THEN 'stable'
      |       WHEN FLOOR((psi) * 1e6 + 0.5) / 1e6 < 0.25 THEN 'moderate'
      |       ELSE 'major' END AS drift_band
      |FROM agg""".stripMargin

  // --------------------------------------------------------------------------
  // q134 — token co-occurrence mining (pointwise mutual information): the
  // top associated token pairs over the corpus, the classic collocation /
  // phrase-discovery statistic. PMI(a,b) = ln(N·c_ab / (df_a·df_b)) over
  // DOC-level co-occurrence, restricted to the top-100 document-frequency
  // vocabulary with a minimum pair support of 5 docs.
  //
  // Scale shape: the unbounded "all token pairs" blowup is capped by the
  // vocabulary gate — the vocab is a 100-row `orderBy(...).limit(100)`
  // top-K cut (TakeOrderedAndProject: per-partition heaps, no full-table
  // rank window through one task — q107's pattern) that rides along as a
  // BROADCAST df-lookup map; each
  // doc then intersects row-locally and fans out at most C(100,2) pairs.
  // df_a/df_b come from element_at on the broadcast map AT EXPLODE TIME
  // (they ride the groupBy keys), so the pair aggregate needs NO join
  // back onto the vocabulary — the q65/q81 one-lineage lesson. Two text
  // scans total (vocab build + pair pass) and a column-pruned count.
  // Determinism: all PMI inputs are exact longs; one fixed double
  // expression, rounded; top-20 order totally tie-broken by (t1, t2).
  def q134PmiPairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val docTokens = "array_distinct(filter(split(lower(text), ' '), t -> t != ''))"
    val dt = docs.select(col("doc_id"), explode(expr(docTokens)).as("w"))
    // (df DESC, w) is a total order, so limit(100) ≡ rk<=100 distributed.
    val vocab = dt.groupBy(col("w")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("w")).limit(100)
    val vocabMap = vocab
      .agg(map_from_entries(sort_array(collect_list(struct(col("w"), col("df"))))).as("vm"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    docs.crossJoin(broadcast(vocabMap))
      .select(
        expr(s"sort_array(filter($docTokens, t -> element_at(vm, t) is not null))")
          .as("dv"),
        col("vm"))
      .select(explode(col("dv")).as("t1"), col("dv"), col("vm"))
      .select(col("t1"), explode(col("dv")).as("t2"), col("vm"))
      .filter(col("t1") < col("t2"))
      .groupBy(col("t1"), col("t2"),
        element_at(col("vm"), col("t1")).as("df_a"),
        element_at(col("vm"), col("t2")).as("df_b"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 5)
      .crossJoin(broadcast(nDocs))
      .withColumn("pmi", Num.pround(
        log(col("c_ab").cast("double") * col("n_docs") /
          (col("df_a").cast("double") * col("df_b"))), 6))
      .select(col("t1"), col("t2"), col("c_ab"), col("pmi"))
      .orderBy(col("pmi").desc, col("t1"), col("t2"))
      .limit(20)
  }

  val q134Sql: String =
    s"""WITH dt AS (
       |  SELECT doc_id, UNNEST(list_distinct(${TextOps.toksSqlD})) AS w FROM documents),
       |vocab AS (
       |  SELECT w, df FROM (
       |    SELECT w, COUNT(*) AS df,
       |           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, w) AS rk
       |    FROM dt GROUP BY w) WHERE rk <= 100),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |pairs AS (
       |  SELECT a.w AS t1, b.w AS t2, COUNT(*) AS c_ab
       |  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.w < b.w
       |  JOIN vocab va ON va.w = a.w
       |  JOIN vocab vb ON vb.w = b.w
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 5)
       |SELECT t1, t2, c_ab,
       |  FLOOR((LN(CAST(c_ab AS DOUBLE) * n_docs / (CAST(va.df AS DOUBLE) * vb.df))) * 1e6 + 0.5) / 1e6 AS pmi
       |FROM pairs
       |JOIN vocab va ON va.w = t1
       |JOIN vocab vb ON vb.w = t2
       |CROSS JOIN n
       |ORDER BY pmi DESC, t1, t2 LIMIT 20""".stripMargin

  // --------------------------------------------------------------------------
  // q153 — readability scoring (Flesch reading ease), the classic
  // text-difficulty quality feature: 206.835 − 1.015·(words/sentences) −
  // 84.6·(syllables/words), with syllables approximated as vowel-group
  // runs. ENTIRELY in integer arithmetic: the score is emitted in
  // truncated millis via one integral division — flesch_milli =
  // (206835·s·w − 1015·w² − 84600·y·s + OFF·s·w) div (s·w) − OFF with
  // OFF = 1e7 keeping the numerator positive (floor ≡ truncation in both
  // engines only for non-negative operands; q136's rounding-boundary
  // lesson applied). Row-local regex counting → whole-stage codegen; no
  // shuffle at all before the output sort.
  def q153Readability(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(TextOps.toks).as("w"),
        expr("greatest(1, size(regexp_extract_all(text, '[.!?]+', 0)))").as("s"),
        expr("size(regexp_extract_all(lower(text), '[aeiouy]+', 0))").as("y"))
      .filter(col("w") > 0)
    docs.select(
        col("doc_id"), col("w").as("n_words"), col("s").as("n_sentences"),
        col("y").as("n_syllables"),
        expr("cast(1000 * w as bigint) div s").as("wps_milli"),
        expr("cast(1000 * y as bigint) div w").as("spw_milli"),
        expr("""(cast(206835 as bigint) * s * w - 1015 * w * w - 84600 * y * s
               | + 10000000 * s * w) div (cast(s as bigint) * w) - 10000000"""
          .stripMargin.replace("\n", " ")).as("flesch_milli"))
      .orderBy(col("doc_id"))
  }

  val q153Sql: String =
    s"""WITH c AS (
       |  SELECT doc_id,
       |    len(${TextOps.toksSqlD}) AS w,
       |    GREATEST(1, len(regexp_extract_all(text, '[.!?]+'))) AS s,
       |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y
       |  FROM documents)
       |SELECT doc_id, CAST(w AS BIGINT) AS n_words, CAST(s AS BIGINT) AS n_sentences,
       |  CAST(y AS BIGINT) AS n_syllables,
       |  CAST(1000 AS BIGINT) * w // s AS wps_milli,
       |  CAST(1000 AS BIGINT) * y // w AS spw_milli,
       |  (CAST(206835 AS BIGINT) * s * w - 1015 * w * w - 84600 * y * s
       |   + 10000000 * s * w) // (CAST(s AS BIGINT) * w) - 10000000 AS flesch_milli
       |FROM c WHERE w > 0 ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------------
  // q238 — POSITIONAL PHRASE SEARCH over an inverted index: the retrieval
  // primitive BM25 (q81) cannot express — "these words ADJACENT, in this
  // order". Build the positional postings once (posexplode → (doc, pos,
  // tok)), derive bigram postings with ONE self-equi-join on (doc_id,
  // pos+1) — co-partitioned, no fan-out beyond true bigram count — pick
  // the corpus's top bigram (count desc, lexical tie-break), and return
  // every document containing that phrase with its occurrence count and
  // first hit position.
  //
  // Scale: postings are linear in token count and shuffle on doc_id, so
  // the bigram join is a partition-local zip; the phrase lookup is an
  // equi-join against a broadcast 1-row phrase. This is exactly how
  // phrase queries run in a distributed search index: postings joined on
  // (doc, pos+k), never a regex rescan of the corpus.
  def q238PhraseSearch(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
    val bigrams = toks.as("a")
      .join(toks.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("b.pos") === col("a.pos") + 1)
      .select(col("a.doc_id").as("doc_id"), col("a.pos").as("pos"),
        concat(col("a.tok"), lit(" "), col("b.tok")).as("bigram"))
    val top = bigrams.groupBy(col("bigram")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram")).limit(1)
      .select(col("bigram").as("phrase"))
    bigrams.join(broadcast(top), col("bigram") === col("phrase"))
      .groupBy(col("doc_id"), col("phrase"))
      .agg(count(lit(1)).as("n_occ"), min(col("pos")).as("first_pos"))
      .orderBy(col("doc_id"))
  }

  val q238Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, pos - 1 AS pos, arr[pos] AS tok FROM (
      |    SELECT doc_id, string_split(text, ' ') AS arr,
      |      unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
      |    FROM documents)
      |  WHERE arr[pos] <> ''),
      |bigrams AS (
      |  SELECT a.doc_id, a.pos, a.tok || ' ' || b.tok AS bigram
      |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
      |top AS (
      |  SELECT bigram AS phrase FROM bigrams GROUP BY 1
      |  ORDER BY COUNT(*) DESC, bigram LIMIT 1)
      |SELECT doc_id, phrase, COUNT(*) AS n_occ,
      |  CAST(MIN(pos) AS INT) AS first_pos
      |FROM bigrams JOIN top ON bigram = phrase
      |GROUP BY 1, 2 ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------------
  // q257 — SPLIT LEAKAGE AUDIT: near-duplicate pairs (q31's exact
  // inverted-index Jaccard) that STRADDLE the q90 content-hash split are
  // train→eval leaks — the eval doc has a ≥0.5-Jaccard twin in training,
  // so the metric is contaminated even though no document is shared
  // verbatim (the failure q106's exact decontamination cannot see). The
  // audit reports, per (split_a, split_b) ordered pair class, how many
  // near-dup pairs land there — anything off the diagonal is leakage,
  // and the cross-split rate is the number a dedup-aware splitter (group
  // split on cluster id, q159's shape) must drive to zero.
  //
  // Scale: reuses the near-dup join (banded/inverted, never all-pairs)
  // plus two slim equi-joins to attach split labels.
  def q257SplitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val prefix = substring(md5(col("text")), 1, 2)
    val splits = Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(prefix < "e6", "train").when(prefix < "f3", "val")
          .otherwise("test").as("split"))
    val pairs = TextOps.q31NgramJaccard(spark, dir)
      .select(col("id_a"), col("id_b"))
    val labeled = pairs
      .join(splits.select(col("doc_id").as("id_a"), col("split").as("sa")), Seq("id_a"))
      .join(splits.select(col("doc_id").as("id_b"), col("split").as("sb")), Seq("id_b"))
      .withColumn("split_a", least(col("sa"), col("sb")))
      .withColumn("split_b", greatest(col("sa"), col("sb")))
      // lazy checkpoint (§8.22): the labeled pair set — a full near-dup
      // pipeline upstream — feeds the total aggregate AND the cell counts
      .localCheckpoint(false)
    val total = labeled.agg(count(lit(1)).as("tot"))
    labeled.groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .crossJoin(broadcast(total))
      .withColumn("leak", col("split_a") =!= col("split_b"))
      .withColumn("pct_of_pairs",
        Num.pround(col("n_pairs").cast("double") * 100 / col("tot"), 6))
      .select(col("split_a"), col("split_b"), col("n_pairs"), col("leak"),
        col("pct_of_pairs"))
      .orderBy(col("split_a"), col("split_b"))
  }

  val q257Sql: String =
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       |    FROM (SELECT doc_id, ${TextOps.toksSqlD} AS t FROM documents),
       |         UNNEST(generate_series(1, len(t) - 2)) AS u(i))),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
       |shc AS (
       |  SELECT sh.doc_id, sh.s FROM sh
       |  JOIN (SELECT s FROM sh GROUP BY s
       |        HAVING COUNT(*) <= ${TextOps.StopShingleDf}) ok
       |    USING (s)),
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
       |  FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT id_a, id_b FROM inter
       |  JOIN sizes sa ON sa.doc_id = id_a
       |  JOIN sizes sb ON sb.doc_id = id_b
       |  WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.5),
       |sp AS (
       |  SELECT doc_id,
       |    CASE WHEN substring(md5(text), 1, 2) < 'e6' THEN 'train'
       |         WHEN substring(md5(text), 1, 2) < 'f3' THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents),
       |lab AS (
       |  SELECT LEAST(a.split, b.split) AS split_a,
       |    GREATEST(a.split, b.split) AS split_b
       |  FROM pairs JOIN sp a ON id_a = a.doc_id JOIN sp b ON id_b = b.doc_id)
       |SELECT split_a, split_b, COUNT(*) AS n_pairs,
       |  split_a <> split_b AS leak,
       |  FLOOR((CAST(COUNT(*) AS DOUBLE) * 100 / (SELECT COUNT(*) FROM lab)) * 1e6 + 0.5) / 1e6
       |    AS pct_of_pairs
       |FROM lab GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ═════════════════ formerly Round8bOps (consolidated round 10) ═════════════════

  // --------------------------------------------------------------------------
  // q285 — PACKED-BLOCK MANIFEST WITH LOSS-MASK ACCOUNTING: concatenate
  // the corpus token stream in doc_id order, slice it into fixed
  // 512-token training blocks, and account per block: how many documents
  // touch it, how many tokens are loss-bearing (per instruction-tuning
  // convention, the first ceil(len/4) tokens of each doc are "prompt" and
  // masked out of the loss), and how much tail padding the final block
  // carries. This is the manifest a packed-pretraining dataloader
  // consumes — block boundaries NEVER re-tokenize; they come from pure
  // integer interval arithmetic on the global offsets.
  //
  // Scale: the global token offset is q169's two-pass bucketed prefix
  // (range-bucket doc_id → bounded-grid exclusive prefix sum → broadcast
  // offsets back); each doc then explodes to the ≤ (len div 512 + 2)
  // blocks it overlaps — linear, no corpus-sized window.
  //
  // Determinism: every cell is exact integer interval arithmetic.
  def q285PackedBlocks(spark: SparkSession, dir: String): DataFrame = {
    val block = 512L
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(expr("filter(split(lower(text), ' '), t -> t != '')")).cast("long").as("len"))
      .filter(col("len") > 0)
    val mx = docs.agg(max(col("doc_id")).as("mx"))
    val bucketed = docs.crossJoin(broadcast(mx))
      .withColumn("bucket", expr("doc_id div (mx div 256 + 1)")).drop("mx")
    val offsets = bucketed.groupBy(col("bucket")).agg(sum(col("len")).as("btoks"))
      .withColumn("boff",
        coalesce(sum(col("btoks")).over(
          Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("boff"))
    val wIn = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val spans = bucketed.join(broadcast(offsets), Seq("bucket"))
      .withColumn("start", col("boff") + coalesce(sum(col("len")).over(wIn), lit(0L)))
      // loss applies to tokens [start + ceil(len/4), start + len)
      .withColumn("loss_start", col("start") + expr("(len + 3) div 4"))
      .select(col("doc_id"), col("start"), (col("start") + col("len")).as("end"),
        col("loss_start"))
    val blocks = spans
      .select(col("doc_id"), col("start"), col("end"), col("loss_start"),
        explode(expr(s"sequence(start div $block, (end - 1) div $block)")).as("blk"))
      .withColumn("blo", col("blk") * block)
      .withColumn("bhi", col("blo") + block)
      .withColumn("n_toks",
        least(col("end"), col("bhi")) - greatest(col("start"), col("blo")))
      .withColumn("n_loss",
        greatest(least(col("end"), col("bhi")) - greatest(col("loss_start"), col("blo")),
          lit(0L)))
    blocks.groupBy(col("blk"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"),
        sum(col("n_loss")).as("n_loss_tokens"))
      .withColumn("n_pad", lit(block) - col("n_tokens"))
      .orderBy(col("blk"))
  }

  val q285Sql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    len(list_filter(string_split(lower(text), ' '), x -> x != ''))::BIGINT AS len
      |  FROM documents),
      |d2 AS (SELECT * FROM d WHERE len > 0),
      |s AS (
      |  SELECT doc_id, len,
      |    COALESCE(SUM(len) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
      |  FROM d2),
      |sp AS (
      |  SELECT doc_id, start, start + len AS "end",
      |    start + (len + 3) // 4 AS loss_start
      |  FROM s),
      |b AS (
      |  SELECT doc_id, start, "end", loss_start, blk,
      |    blk * 512 AS blo, blk * 512 + 512 AS bhi
      |  FROM sp, UNNEST(generate_series(CAST(start // 512 AS BIGINT),
      |    CAST(("end" - 1) // 512 AS BIGINT))) AS u(blk))
      |SELECT blk, COUNT(*) AS n_docs,
      |  CAST(SUM(LEAST("end", bhi) - GREATEST(start, blo)) AS BIGINT) AS n_tokens,
      |  CAST(SUM(GREATEST(LEAST("end", bhi) - GREATEST(loss_start, blo), 0)) AS BIGINT)
      |    AS n_loss_tokens,
      |  CAST(512 - SUM(LEAST("end", bhi) - GREATEST(start, blo)) AS BIGINT) AS n_pad
      |FROM b GROUP BY blk ORDER BY blk""".stripMargin


  // --------------------------------------------------------------------------
  // Global prefix sum WITHOUT a single-partition window — q169's two-pass
  // bucketed shape, factored for the round-11 dataloader audits: bucket
  // rows by the first byte of the md5 order key (256-cell grid in key
  // order), take per-bucket totals, run the EXCLUSIVE prefix sum over the
  // bounded grid only, broadcast the offsets back, and finish with a
  // PARTITIONED in-bucket running sum. `cum` is the inclusive global
  // prefix sum of `v` over ORDER BY `ord` — bit-identical to the
  // single-partition window the oracle uses, at any scale.
  private def globalCumsum(df: DataFrame, ord: String, v: String,
      out: String): DataFrame = {
    val b = df.withColumn("_b", conv(substring(col(ord), 1, 2), 16, 10).cast("long"))
    val offsets = b.groupBy(col("_b")).agg(sum(col(v)).as("_t"))
      .withColumn("_off", coalesce(sum(col("_t")).over(
        Window.orderBy(col("_b")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_b"), col("_off"))
    b.join(broadcast(offsets), Seq("_b"))
      .withColumn(out, col("_off") + sum(col(v)).over(
        Window.partitionBy(col("_b")).orderBy(col(ord))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_b", "_off")
  }

  // --------------------------------------------------------------------------
  // q429 — DATALOADER INTERLEAVING AUDIT (round 11): in the canonical
  // training order (global md5(doc_id) shuffle — the same content-hash
  // convention as q90's splits), how well are sources interleaved? Long
  // same-source RUNS are what a bad shard layout or a skewed mixture
  // sampler produce, and they show up as loss spikes mid-epoch. Per
  // source: docs, number of runs, the longest run, and runs-per-doc ppm
  // (1e6 = perfectly interleaved, small = clumped).
  //
  // Scale: the global order is materialized as a rank WITHOUT a global
  // sort — two chained [[globalCumsum]] passes (rank, then run ids from
  // run-start flags) plus one rank-shifted equi-join for the
  // previous-row source; every window is partitioned by the 256-cell
  // hash bucket and the only unpartitioned window runs over that bounded
  // grid. The oracle replays with plain global windows.
  def q429InterleaveAudit(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        md5(col("doc_id").cast("string")).as("h"), lit(1L).as("one"))
    val ranked = globalCumsum(d, "h", "one", "rn")
      .select(col("source"), col("h"), col("rn"))
      .localCheckpoint(false) // feeds both sides of the prev-row join
    val prev = ranked.select((col("rn") + 1).as("rn"), col("source").as("prev_src"))
    val flagged = ranked.join(prev, Seq("rn"), "left")
      .withColumn("st",
        when(col("prev_src").isNull || col("prev_src") =!= col("source"), 1L)
          .otherwise(0L))
    val runs = globalCumsum(flagged, "h", "st", "run_id")
      .groupBy(col("run_id"), col("source")).agg(count(lit(1)).as("len"))
    runs.groupBy(col("source"))
      .agg(sum(col("len")).as("n_docs"), count(lit(1)).as("n_runs"),
        max(col("len")).as("max_run"))
      .withColumn("runs_ppm", expr("(1000000L * n_runs) div n_docs"))
      .orderBy(col("source"))
  }

  val q429Sql: String =
    """WITH d AS (
      |  SELECT doc_id, source, md5(doc_id::VARCHAR) AS h FROM documents),
      |s AS (
      |  SELECT source, h,
      |    CASE WHEN LAG(source) OVER (ORDER BY h) IS DISTINCT FROM source
      |      THEN 1 ELSE 0 END AS st
      |  FROM d),
      |r AS (
      |  SELECT source,
      |    SUM(st) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS run_id
      |  FROM s),
      |runs AS (SELECT source, run_id, COUNT(*) AS len FROM r GROUP BY 1, 2)
      |SELECT source, CAST(SUM(len) AS BIGINT) AS n_docs,
      |  COUNT(*) AS n_runs, CAST(MAX(len) AS BIGINT) AS max_run,
      |  CAST((1000000 * COUNT(*)) // SUM(len) AS BIGINT) AS runs_ppm
      |FROM runs GROUP BY source ORDER BY source""".stripMargin

  // --------------------------------------------------------------------------
  // q430 — PACK-PURITY CENSUS (round 11): pack the md5-shuffled global
  // order into 2048-token training blocks (q95's arithmetic, but over the
  // DATALOADER order, not per-source) and count blocks whose documents
  // mix sources or languages — the cross-document-attention contamination
  // a packer without boundary masking feeds the model, and the number
  // that decides whether attention masking / bin-per-source packing is
  // worth its throughput cost.
  //
  // Scale: one [[globalCumsum]] for the token offsets, a row-local
  // sequence() explode of each doc's touched-block range (bounded by
  // ntok/2048 + 1 per doc), and a two-level hash aggregate. No sorts
  // beyond the bucketed cumsum.
  def q430PackPurity(spark: SparkSession, dir: String): DataFrame = {
    val cap = 2048L
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"),
        size(TextOps.toks).cast("long").as("ntok"),
        md5(col("doc_id").cast("string")).as("h"))
      .filter(col("ntok") > 0)
    val bins = globalCumsum(d, "h", "ntok", "cum")
      .select(col("source"), col("lang"),
        explode(expr(s"sequence((cum - ntok) div $cap, (cum - 1) div $cap)")).as("bin"))
    val perBin = bins.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("ns"),
        countDistinct(col("lang")).as("nl"))
    perBin.agg(count(lit(1)).as("blocks"),
        count_if(col("ns") === 1).as("pure_source_blocks"),
        count_if(col("ns") > 1).as("multi_source_blocks"),
        count_if(col("nl") > 1).as("multi_lang_blocks"),
        max(col("n_docs")).as("max_docs_per_block"))
      .withColumn("multi_source_ppm",
        expr("(1000000L * multi_source_blocks) div blocks"))
  }

  val q430Sql: String =
    s"""WITH d AS (
       |  SELECT source, lang, CAST(len(${TextOps.toksSqlD}) AS BIGINT) AS ntok,
       |    md5(doc_id::VARCHAR) AS h
       |  FROM documents),
       |c AS (
       |  SELECT source, lang, ntok,
       |    SUM(ntok) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM d WHERE ntok > 0),
       |b AS (
       |  SELECT source, lang,
       |    UNNEST(generate_series(CAST((cum - ntok) // 2048 AS BIGINT),
       |                           CAST((cum - 1) // 2048 AS BIGINT))) AS bin
       |  FROM c),
       |g AS (
       |  SELECT bin, COUNT(*) AS n_docs, COUNT(DISTINCT source) AS ns,
       |    COUNT(DISTINCT lang) AS nl
       |  FROM b GROUP BY 1)
       |SELECT COUNT(*) AS blocks,
       |  CAST(COUNT(*) FILTER (ns = 1) AS BIGINT) AS pure_source_blocks,
       |  CAST(COUNT(*) FILTER (ns > 1) AS BIGINT) AS multi_source_blocks,
       |  CAST(COUNT(*) FILTER (nl > 1) AS BIGINT) AS multi_lang_blocks,
       |  CAST(MAX(n_docs) AS BIGINT) AS max_docs_per_block,
       |  CAST((1000000 * COUNT(*) FILTER (ns > 1)) // COUNT(*) AS BIGINT)
       |    AS multi_source_ppm
       |FROM g""".stripMargin

  // --------------------------------------------------------------------------
  // q433 — BLOCK-SIZE SWEEP (round 11): q430 prices ONE packing block size
  // (2048); this sweeps B ∈ {512, 1024, 2048, 4096} from the SAME single
  // token-offset cumsum — per B: block count, docs split across a block
  // boundary (their loss sees a mid-document truncation at train time),
  // total boundary crossings, and docs-per-block density. The
  // context-length tradeoff table: bigger blocks cut the split rate but
  // raise per-block source mixing (q430's axis) and attention cost.
  //
  // Scale: one [[globalCumsum]] pass; the 4× explode is row-local
  // arithmetic on (cum, ntok) only — text never leaves the scan — and the
  // final aggregate has exactly 4 groups.
  def q433BlockSizeSweep(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), size(TextOps.toks).cast("long").as("ntok"),
        md5(col("doc_id").cast("string")).as("h"))
      .filter(col("ntok") > 0)
    globalCumsum(d, "h", "ntok", "cum")
      .select(col("ntok"), col("cum"),
        explode(expr("array(512L, 1024L, 2048L, 4096L)")).as("block_tokens"))
      .groupBy(col("block_tokens"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("tokens"),
        max(col("cum")).as("tot"),
        count_if(expr("(cum - ntok) div block_tokens < (cum - 1) div block_tokens"))
          .as("split_docs"),
        sum(expr("(cum - 1) div block_tokens - (cum - ntok) div block_tokens"))
          .as("boundary_crossings"))
      .withColumn("n_blocks", expr("(tot - 1) div block_tokens + 1"))
      .select(col("block_tokens"), col("n_blocks"), col("n_docs"),
        col("split_docs"),
        expr("(1000000L * split_docs) div n_docs").as("split_ppm"),
        col("boundary_crossings"),
        expr("(1000000L * n_docs) div n_blocks").as("docs_per_block_ppm"))
      .orderBy(col("block_tokens"))
  }

  val q433Sql: String =
    s"""WITH d AS (
       |  SELECT CAST(len(${TextOps.toksSqlD}) AS BIGINT) AS ntok,
       |    md5(doc_id::VARCHAR) AS h
       |  FROM documents),
       |c AS (
       |  SELECT ntok,
       |    SUM(ntok) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM d WHERE ntok > 0),
       |e AS (
       |  SELECT ntok, cum, bsz FROM c
       |  CROSS JOIN (SELECT UNNEST([512, 1024, 2048, 4096]) AS bsz)),
       |g AS (
       |  SELECT bsz AS block_tokens, COUNT(*) AS n_docs, MAX(cum) AS tot,
       |    COUNT(*) FILTER ((cum - ntok) // bsz < (cum - 1) // bsz) AS split_docs,
       |    SUM((cum - 1) // bsz - (cum - ntok) // bsz) AS boundary_crossings
       |  FROM e GROUP BY 1)
       |SELECT CAST(block_tokens AS BIGINT) AS block_tokens,
       |  CAST((tot - 1) // block_tokens + 1 AS BIGINT) AS n_blocks,
       |  CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(split_docs AS BIGINT) AS split_docs,
       |  CAST((1000000 * split_docs) // n_docs AS BIGINT) AS split_ppm,
       |  CAST(boundary_crossings AS BIGINT) AS boundary_crossings,
       |  CAST((1000000 * n_docs) // ((tot - 1) // block_tokens + 1) AS BIGINT)
       |    AS docs_per_block_ppm
       |FROM g ORDER BY block_tokens""".stripMargin

  // --------------------------------------------------------------------------
  // q439 — ATTENTION-CONTAMINATION MASS (round 11): q430 counts blocks
  // whose docs mix; this weighs HOW MUCH cross-document attention a
  // packer without boundary masking feeds the model. Per 2048-token
  // block with in-block segment lengths s_i: cross pair mass =
  // (T² − Σ s_i²)/2 (T = Σ s_i) — zero for a pure block, maximal for
  // many small segments. Reports the block census plus the mass-weighted
  // cross fraction (ppm of Σ T²) and the worst block — the numbers that
  // decide whether per-sequence attention masking is worth its
  // throughput cost (a 2-doc block split 2047/1 is 0.1% contaminated;
  // the census alone cannot tell it from 1024/1024 at 50%).
  //
  // Scale: the same [[globalCumsum]] + bounded touched-block explode as
  // q430; segments are row-local min/max arithmetic; the block aggregate
  // is two integer sums and the rollup is one row.
  def q439AttentionContamination(spark: SparkSession, dir: String): DataFrame = {
    val cap = 2048L
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), size(TextOps.toks).cast("long").as("ntok"),
        md5(col("doc_id").cast("string")).as("h"))
      .filter(col("ntok") > 0)
    val segs = globalCumsum(d, "h", "ntok", "cum")
      .select((col("cum") - col("ntok")).as("st"), (col("cum") - 1).as("en"))
      .select(col("st"), col("en"),
        explode(expr(s"sequence(st div $cap, en div $cap)")).as("bin"))
      .select(col("bin"), expr(
        s"least(en, (bin + 1) * $cap - 1) - greatest(st, bin * $cap) + 1").as("seg"))
    val perBin = segs.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_segs"), sum(col("seg")).as("t"),
        sum(col("seg") * col("seg")).as("sumsq"))
    perBin.agg(count(lit(1)).as("blocks"),
        count_if(col("n_segs") > 1).as("multi_doc_blocks"),
        sum(col("t")).as("tokens"),
        sum(expr("(t * t - sumsq) div 2")).as("cross_pair_mass"),
        sum(expr("t * t")).as("tsq_mass"),
        max(expr("(1000000L * (t * t - sumsq)) div (t * t)")).as("max_block_cross_ppm"))
      .select(col("blocks"), col("multi_doc_blocks"), col("tokens"),
        col("cross_pair_mass"),
        expr("(1000000L * (2L * cross_pair_mass)) div tsq_mass").as("cross_ppm"),
        col("max_block_cross_ppm"))
  }

  val q439Sql: String =
    s"""WITH d AS (
       |  SELECT CAST(len(${TextOps.toksSqlD}) AS BIGINT) AS ntok,
       |    md5(doc_id::VARCHAR) AS h
       |  FROM documents),
       |c AS (
       |  SELECT ntok,
       |    SUM(ntok) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM d WHERE ntok > 0),
       |s AS (
       |  SELECT bin,
       |    LEAST(cum - 1, (bin + 1) * 2048 - 1)
       |      - GREATEST(cum - ntok, bin * 2048) + 1 AS seg
       |  FROM (SELECT ntok, cum,
       |          UNNEST(generate_series(CAST((cum - ntok) // 2048 AS BIGINT),
       |                                 CAST((cum - 1) // 2048 AS BIGINT))) AS bin
       |        FROM c)),
       |g AS (
       |  SELECT bin, COUNT(*) AS n_segs, SUM(seg) AS t,
       |    SUM(seg * seg) AS sumsq
       |  FROM s GROUP BY 1)
       |SELECT COUNT(*) AS blocks,
       |  CAST(COUNT(*) FILTER (n_segs > 1) AS BIGINT) AS multi_doc_blocks,
       |  CAST(SUM(t) AS BIGINT) AS tokens,
       |  CAST(SUM((t * t - sumsq) // 2) AS BIGINT) AS cross_pair_mass,
       |  CAST((1000000 * (2 * SUM((t * t - sumsq) // 2))) // SUM(t * t)
       |    AS BIGINT) AS cross_ppm,
       |  CAST(MAX((1000000 * (t * t - sumsq)) // (t * t)) AS BIGINT)
       |    AS max_block_cross_ppm
       |FROM g""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q429_interleave_audit", q429InterleaveAudit _, Some(q429Sql)),
    ("q430_pack_purity", q430PackPurity _, Some(q430Sql)),
    ("q433_block_size_sweep", q433BlockSizeSweep _, Some(q433Sql)),
    ("q439_attention_contamination", q439AttentionContamination _, Some(q439Sql)),
    ("q238_phrase_search", q238PhraseSearch _, Some(q238Sql)),
    ("q257_split_leakage", q257SplitLeakage _, Some(q257Sql)),
    ("q129_division", q129Division _, Some(q129Sql)),
    ("q133_psi_drift", q133PsiDrift _, Some(q133Sql)),
    ("q134_pmi_pairs", q134PmiPairs _, Some(q134Sql)),
    ("q153_readability", q153Readability _, Some(q153Sql)),
    ("q85_pii_redact", q85PiiRedact _, Some(q85Sql)),
    ("q86_bitwise_agg", q86BitwiseAgg _, Some(q86Sql)),
    ("q87_boilerplate", q87Boilerplate _, Some(q87Sql)),
    ("q88_chunk", q88Chunk _, Some(q88Sql)),
    ("q89_percent_rank", q89PercentRank _, Some(q89Sql)),
    ("q90_split", q90Split _, Some(q90Sql)),
    ("q95_pack", q95Pack _, Some(q95Sql)),
    ("q97_unigram_lm", q97UnigramLm _, Some(q97Sql)),
    ("q98_length_band", q98LengthBand _, Some(q98Sql)),
    ("q100_pipeline", q100Pipeline _, Some(q100Sql)),
    ("q103_token_entropy", q103TokenEntropy _, Some(q103Sql)),
    // formerly Round8bOps
    ("q285_packed_blocks", q285PackedBlocks _, Some(q285Sql)))
}
