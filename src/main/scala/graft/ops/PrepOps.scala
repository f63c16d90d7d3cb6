package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data-prep / governance operator batch: sub-document containment dedup,
  * small-file compaction planning, Spark-4 Variant semi-structured access,
  * CCNet-style reference-LM quality filtering, a k-anonymity audit, a
  * one-pass data-quality rule engine, and mutual-information feature
  * relevance — [EXT] north-star surface (the reference has nothing
  * comparable; its only "governance" is an idempotency anti-join,
  * /root/reference/src/main/scala/.../Proof.scala:160-175, covered by R21).
  */
object PrepOps {

  // --------------------------------------------------------------------------
  // q176 — sub-document CONTAINMENT dedup: directed pairs where ≥ 80% of
  // the contained doc's 3-gram shingles appear in the container,
  // |A∩B|/|A| ≥ τ — the asymmetric cousin of q31's Jaccard that catches
  // quote-expansions and excerpt duplicates symmetric measures miss
  // (a 100-word excerpt inside a 10k-word page has Jaccard ≈ 0.01 but
  // containment 1.0).
  //
  // Scale: q31's inverted-index shape — explode shingles, equi-join on the
  // shingle, count intersections per pair; shingle-set sizes are row-local
  // so both direction ratios are computed in the aggregate with NO
  // join-back. Unlike Jaccard there is no size-ratio candidate prune
  // (containment is size-asymmetric by design). Ratios are integer-ratio
  // doubles (bit-identical cross-engine); filter on the RAW ratio, round
  // only for display.
  //
  // Degenerate-corpus guard (round-8 probe findings, SURVEY §8.18): the
  // real documents table has a 31-token vocabulary, so the 3-gram space
  // (31³ ≈ 30k types) SATURATES — df then grows ∝ n and the exact
  // inverted-index pair mass ∝ n² (measured: 5.2 s at 5×, 21.6 s at 10×
  // on the saturated-vocab decade probe; the true intersecting-pair SET
  // is itself quadratic there, so no exact index shape can beat it —
  // PPJoin prefix filtering was measured at 300k directed candidates
  // vs ~1.27M pair events at sf0.1, no pair-level pruning). The
  // production guard is `stopShingleDf`: drop shingles with df > cap
  // from the index — pair mass ≤ cap·|postings|, linear at any scale. At
  // cap = TextOps.StopShingleDf (= the measured max df at sf0.1) the cap
  // drops NOTHING at every driver SF, so the shipped query stays EXACT
  // (PrepOpsSpec pins capped ≡ exact); on saturated corpora it is the
  // standard stop-shingle approximation (capped twin measured linear on
  // the same decade probe). The CAPPED form IS the catalog entry since
  // round 9 (round-8 verdict task 8) — the one documented n² is off the
  // shipped surface entirely; the exact form stays as the spec-only twin
  // below. Since round 11 the SQL oracle expresses the SAME cap (shared
  // constant), so capped-corpus runs cannot silently diverge from it.
  def q176Containment(spark: SparkSession, dir: String): DataFrame =
    containmentPairs(spark, Tables.documents(spark, dir),
      stopShingleDf = Some(TextOps.StopShingleDf))

  /** The exact (uncapped) twin — spec-only since round 9: proves the
    * shipped cap drops nothing at driver SFs, and remains the reference
    * semantics on corpora where the full quadratic pair set is wanted.
    */
  private[graft] def q176ContainmentExact(spark: SparkSession, dir: String): DataFrame =
    containmentPairs(spark, Tables.documents(spark, dir), stopShingleDf = None)

  /** q176's library surface. `stopShingleDf` = the inverted-index
    * stop-shingle guard (None = exact).
    */
  private[graft] def containmentPairs(spark: SparkSession, docs: DataFrame,
      stopShingleDf: Option[Int]): DataFrame = {
    val withN0 = TextOps.shingleArrays(docs)
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_sh"),
        explode(col("sh")).as("s"))
      .filter(col("n_sh") > 0)
    // pair events: q31's round-11 shape — capped lists expand pairs
    // row-locally from ONE groupBy(s) (2 exchanges total); the exact twin
    // keeps the inverted-index self-join (unbounded lists can't collect).
    // No band prune here: containment has no length-ratio bound.
    val pairEvents = stopShingleDf match {
      case Some(cap) =>
        // row_number prefix BEFORE collect_list — see ngramJaccardPairs:
        // bounds the aggregation buffer at cap+1 postings on hot shingles
        // (spill-safe sort), then the size filter drops capped lists whole
        val wS = Window.partitionBy(col("s")).orderBy(col("doc_id"))
        val posts = withN0
          .withColumn("rn", row_number().over(wS))
          .filter(col("rn") <= cap + 1)
          .groupBy(col("s"))
          .agg(collect_list(struct(col("doc_id").as("d"), col("n_sh").as("n"))).as("ps"))
          .filter(size(col("ps")) >= 2 && size(col("ps")) <= cap)
        posts.select(explode(expr(
          """flatten(transform(ps, (x, i) ->
            |  transform(slice(ps, i + 2, size(ps)), y ->
            |    if(x.d < y.d,
            |       named_struct('ia', x.d, 'ib', y.d, 'na', x.n, 'nb', y.n),
            |       named_struct('ia', y.d, 'ib', x.d, 'na', y.n, 'nb', x.n)))))""".stripMargin)).as("p"))
          .select(col("p.ia").as("ia"), col("p.ib").as("ib"),
            col("p.na").as("na"), col("p.nb").as("nb"))
      case None =>
        val a = withN0.as("a"); val b = withN0.as("b")
        a.join(b, col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
            col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
    }
    pairEvents
      .groupBy(col("ia"), col("ib"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .select(explode(array(
        struct(col("ia").as("id_sub"), col("ib").as("id_super"),
          (col("inter").cast("double") / col("na")).as("cont")),
        struct(col("ib").as("id_sub"), col("ia").as("id_super"),
          (col("inter").cast("double") / col("nb")).as("cont")))).as("d"))
      .filter(col("d.cont") >= 0.8)
      .select(col("d.id_sub").as("id_sub"), col("d.id_super").as("id_super"),
        Num.pround(col("d.cont"), 6).as("containment"))
      .orderBy(col("id_sub"), col("id_super"))
  }

  val q176Sql: String =
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
       |  SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS c
       |  FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |dirs AS (
       |  SELECT ia AS id_sub, ib AS id_super, CAST(c AS DOUBLE) / sa.n_sh AS cont
       |  FROM inter JOIN sizes sa ON sa.doc_id = ia
       |  UNION ALL
       |  SELECT ib, ia, CAST(c AS DOUBLE) / sb.n_sh
       |  FROM inter JOIN sizes sb ON sb.doc_id = ib)
       |SELECT id_sub, id_super, FLOOR((cont) * 1e6 + 0.5) / 1e6 AS containment
       |FROM dirs WHERE cont >= 0.8 ORDER BY id_sub, id_super""".stripMargin

  // --------------------------------------------------------------------------
  // q177 — small-file COMPACTION PLANNER: assign key-ordered files to
  // target-size output bins by cumulative byte offset (bin = floor(bytes
  // before this file / target)) — exactly Spark's own
  // files.maxPartitionBytes split semantics, applied as a layout-
  // maintenance plan (the "compact 10k small files into N big ones without
  // breaking sort order" operation every 100 TB table needs periodically).
  //
  // Scale: a global EXCLUSIVE cumsum without a global sort through one
  // task — q169's two-pass bucket shape: range-bucket the key from a
  // broadcast max (257 buckets in key order), per-bucket byte totals →
  // exclusive prefix sum over the BOUNDED bucket grid only (allowlisted),
  // broadcast offsets back, finish with a PARTITIONED in-bucket cumsum.
  def q177CompactionPlan(spark: SparkSession, dir: String): DataFrame = {
    val target = 32768L // 32 KiB output bins
    val files = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars").as("bytes"))
    val mx = files.agg(max(col("doc_id")).as("mx"))
    val bucketed = files.crossJoin(broadcast(mx))
      .withColumn("bucket", expr("doc_id div (mx div 256 + 1)"))
      .drop("mx")
    val offsets = bucketed.groupBy(col("bucket")).agg(sum(col("bytes")).as("bb"))
      .withColumn("boff", coalesce(sum(col("bb")).over(
        Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("boff"))
    bucketed.join(broadcast(offsets), Seq("bucket"))
      .withColumn("cum_before", col("boff") + coalesce(sum(col("bytes")).over(
        Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin", expr(s"cum_before div $target"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bytes"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("bin"))
  }

  val q177Sql: String =
    """WITH c AS (
      |  SELECT doc_id, n_chars AS bytes,
      |    COALESCE(SUM(n_chars) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      |  FROM documents)
      |SELECT CAST(cum_before // 32768 AS BIGINT) AS bin, COUNT(*) AS n_files,
      |  CAST(SUM(bytes) AS BIGINT) AS bytes,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM c GROUP BY 1 ORDER BY bin""".stripMargin

  // --------------------------------------------------------------------------
  // q178 — Spark 4 VARIANT semi-structured access: parse the events.props
  // JSON into VariantType once and extract typed fields with variant_get —
  // the engine-native path for open-schema columns (vs q17's
  // get_json_object string re-parsing: Variant parses once into a binary
  // form; repeated field extraction is then structural, not textual).
  //
  // Scale: row-local parse + extract inside whole-stage codegen, then one
  // map-side-partial aggregate — no schema inference pass over the corpus,
  // which is the point of Variant for 100 TB of heterogeneous JSON.
  def q178VariantJson(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'int')").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
        max(col("k")).as("max_k"), sum(col("k")).cast("long").as("sum_k"))
      .orderBy(col("event_type"))

  val q178Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  MIN(json_extract_string(props, '$.k')::INTEGER) AS min_k,
      |  MAX(json_extract_string(props, '$.k')::INTEGER) AS max_k,
      |  CAST(SUM(json_extract_string(props, '$.k')::INTEGER) AS BIGINT) AS sum_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------------------
  // q179 — CCNet-style quality filter: fit an add-k bigram LM on a trusted
  // reference slice (sources src0-src2 stand in for "wikipedia"), score
  // EVERY document by mean bigram log-probability under that reference
  // model, and keep the top half by score — the cross-entropy filtering
  // step of CCNet/ccnet-like pipelines (documents that look like the
  // reference corpus score high; token soup and boilerplate score low).
  // Differs from q173, which trains on the whole corpus (self-perplexity):
  // here the model is fit on the trusted slice only and applied out-of-
  // domain, with add-k mass covering unseen bigrams.
  //
  // Scale: the q97/q173 one-lineage rule — reference counts are
  // FILTERED count windows over the single exploded token stream
  // (count_if(is_ref) partitioned by the bigram / by w1): no reference-
  // model join-back, no second corpus scan. V and the median cutoff ride
  // broadcast 1-row aggregates. The median is Spark's exact interpolated
  // percentile — identical arithmetic to DuckDB quantile_cont, computed
  // over scores already rounded to the 1e-4 grid (§8.4).
  def q179CcnetFilter(spark: SparkSession, dir: String): DataFrame = {
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bigrams = Tables.documents(spark, dir)
      .select(col("doc_id"),
        col("source").isin("src0", "src1", "src2").as("is_ref"),
        posexplode(TextOps.toks))
      .toDF("doc_id", "is_ref", "pos", "w1")
      .withColumn("w2", lead(col("w1"), 1).over(byPos))
      .filter(col("w2").isNotNull)
    val v = bigrams.filter(col("is_ref")).agg(countDistinct(col("w2")).as("v"))
    val scored = bigrams
      .withColumn("c2", count_if(col("is_ref"))
        .over(Window.partitionBy(col("w1"), col("w2"))))
      .withColumn("c1", count_if(col("is_ref"))
        .over(Window.partitionBy(col("w1"))))
      .crossJoin(broadcast(v))
      .groupBy(col("doc_id"))
      .agg(Num.pround(avg(log((col("c2") + 0.5) / (col("c1") + lit(0.5) * col("v")))), 4)
        .as("lp"))
    // exact-median domain (q125 contract note): lp is pround(·, 4) — an
    // explicit 1e-4 quantization of a log-prob in a few-units range, so
    // the percentile buffer is bounded (~10⁵ cells) regardless of corpus
    val med = scored.agg(expr("percentile(lp, 0.5)").as("med"))
    scored.crossJoin(broadcast(med))
      .filter(col("lp") >= col("med"))
      .select(col("doc_id"), col("lp"))
      .orderBy(col("doc_id"))
  }

  val q179Sql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, is_ref, t[i] AS w1, t[i+1] AS w2
       |  FROM (SELECT doc_id, source IN ('src0','src1','src2') AS is_ref,
       |          ${TextOps.toksSqlD} AS t FROM documents),
       |       UNNEST(generate_series(1, len(t) - 1)) AS u(i)),
       |v AS (SELECT COUNT(DISTINCT w2) AS v FROM tok WHERE is_ref),
       |cnt AS (
       |  SELECT doc_id,
       |    COUNT(*) FILTER (is_ref) OVER (PARTITION BY w1, w2) AS c2,
       |    COUNT(*) FILTER (is_ref) OVER (PARTITION BY w1) AS c1
       |  FROM tok),
       |scored AS (
       |  SELECT doc_id, FLOOR((AVG(LN((c2 + 0.5e0) / (c1 + 0.5e0 * v)))) * 1e4 + 0.5) / 1e4 AS lp
       |  FROM cnt, v GROUP BY doc_id),
       |med AS (SELECT quantile_cont(lp, 0.5) AS med FROM scored)
       |SELECT doc_id, lp FROM scored, med WHERE lp >= med ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------------
  // q180 — K-ANONYMITY audit: group the table by its quasi-identifier
  // tuple (market segment, nation, account-balance band) and report how
  // many equivalence classes — and rows — fall below k=5, the re-
  // identification risk screen run before any demographic slice of a
  // training corpus ships.
  //
  // Scale: one hash groupBy on the QI tuple + a 1-row re-aggregate; the
  // balance band goes through exact cents (×100 as long) so the band
  // boundary is integer arithmetic in both engines, then floor-div — no
  // float banding at the boundary.
  def q180KAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val k = 5
    Tables.customer(spark, dir)
      .select(col("c_mktsegment"), col("c_nationkey"),
        floor((col("c_acctbal").cast(DecimalType(18, 2)) * 100).cast("long")
          / 100000.0).cast("long").as("bal_band"))
      .groupBy(col("c_mktsegment"), col("c_nationkey"), col("bal_band"))
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_groups"),
        count_if(col("n") < k).as("n_risky_groups"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).as("n_risky_rows"),
        min(col("n")).as("min_group"))
  }

  val q180Sql: String =
    """WITH g AS (
      |  SELECT c_mktsegment, c_nationkey,
      |    CAST(FLOOR(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      / 100000.0) AS BIGINT) AS bal_band,
      |    COUNT(*) AS n
      |  FROM customer GROUP BY 1, 2, 3)
      |SELECT COUNT(*) AS n_groups,
      |  COUNT(*) FILTER (n < 5) AS n_risky_groups,
      |  CAST(COALESCE(SUM(n) FILTER (n < 5), 0) AS BIGINT) AS n_risky_rows,
      |  MIN(n) AS min_group
      |FROM g""".stripMargin

  // --------------------------------------------------------------------------
  // q181 — one-pass DATA-QUALITY rule engine: N declarative screens
  // evaluated as conditional aggregates in a SINGLE scan per table, then
  // unpivoted to one row per rule — the dbt-test / Deequ pattern where
  // rule count must not multiply scan count (at 100 TB, 20 rules × full
  // scan each is the difference between a nightly check and an impossible
  // one).
  //
  // Scale: count_if collapses each rule to a counter inside one map-side-
  // partial aggregate; stack() is a row-local unpivot of the 1-row result.
  def q181DqRules(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).agg(
      count(lit(1)).as("n"),
      count_if(col("l_quantity") > 45).as("v_qty"),
      count_if(col("l_tax") > 0.06).as("v_tax"),
      count_if(col("l_discount") > 0.08).as("v_disc"))
    val ord = Tables.orders(spark, dir).agg(
      count(lit(1)).as("n"),
      count_if(col("o_totalprice") > 400000.0).as("v_price"),
      count_if(!col("o_orderstatus").isin("O", "F", "P")).as("v_status"))
    li.selectExpr(
      """stack(3,
        |  'li_qty_gt_45', n, v_qty,
        |  'li_tax_gt_6pct', n, v_tax,
        |  'li_discount_gt_8pct', n, v_disc) as (rule, n_checked, n_violations)"""
        .stripMargin)
      .union(ord.selectExpr(
        """stack(2,
          |  'ord_price_gt_400k', n, v_price,
          |  'ord_status_invalid', n, v_status) as (rule, n_checked, n_violations)"""
          .stripMargin))
      .orderBy(col("rule"))
  }

  val q181Sql: String =
    """WITH li AS (
      |  SELECT COUNT(*) AS n,
      |    COUNT(*) FILTER (l_quantity > 45) AS v_qty,
      |    COUNT(*) FILTER (l_tax > 0.06) AS v_tax,
      |    COUNT(*) FILTER (l_discount > 0.08) AS v_disc
      |  FROM lineitem),
      |ord AS (
      |  SELECT COUNT(*) AS n,
      |    COUNT(*) FILTER (o_totalprice > 400000.0) AS v_price,
      |    COUNT(*) FILTER (o_orderstatus NOT IN ('O','F','P')) AS v_status
      |  FROM orders)
      |SELECT rule, n_checked, n_violations FROM (
      |  SELECT 'li_qty_gt_45' AS rule, n AS n_checked, v_qty AS n_violations FROM li
      |  UNION ALL SELECT 'li_tax_gt_6pct', n, v_tax FROM li
      |  UNION ALL SELECT 'li_discount_gt_8pct', n, v_disc FROM li
      |  UNION ALL SELECT 'ord_price_gt_400k', n, v_price FROM ord
      |  UNION ALL SELECT 'ord_status_invalid', n, v_status FROM ord)
      |ORDER BY rule""".stripMargin

  // --------------------------------------------------------------------------
  // q182 — MUTUAL INFORMATION feature relevance: I(X;Y) in nats between
  // event type and day-of-week, Σ p(x,y)·ln(p(x,y)/(p(x)p(y))) — the
  // model-free "is this feature worth keeping" screen (q134's PMI ranks
  // individual PAIRS; MI integrates the whole contingency table into one
  // relevance score). Day-of-week numbering differs across engines
  // (Spark 1=Sun, DuckDB 0=Sun) but MI is invariant under relabeling, so
  // only the statistic — not the labels — crosses the oracle boundary.
  //
  // Scale: one groupBy on the joint cell, marginals re-aggregated FROM the
  // joint table (bounded |X|·|Y| rows, never a second corpus scan) and
  // broadcast back. ~35 double terms summed then rounded at 4 — the
  // q118/q119 accepted determinism class (§8.4).
  def q182MutualInfo(spark: SparkSession, dir: String): DataFrame = {
    val joint = Tables.events(spark, dir)
      .select(col("event_type").as("x"), dayofweek(col("ts")).as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("nxy"))
    val mx = joint.groupBy(col("x")).agg(sum(col("nxy")).as("nx"))
    val my = joint.groupBy(col("y")).agg(sum(col("nxy")).as("ny"))
    val tot = joint.agg(sum(col("nxy")).as("n"))
    joint.join(broadcast(mx), Seq("x")).join(broadcast(my), Seq("y"))
      .crossJoin(broadcast(tot))
      .agg(count(lit(1)).as("n_cells"),
        Num.pround(sum(col("nxy").cast("double") / col("n") *
          log(col("nxy").cast("double") * col("n") / (col("nx") * col("ny")))), 4)
          .as("mi_nats"))
  }

  val q182Sql: String =
    """WITH joint AS (
      |  SELECT event_type AS x, dayofweek(ts) AS y, COUNT(*) AS nxy
      |  FROM events GROUP BY 1, 2),
      |mx AS (SELECT x, SUM(nxy) AS nx FROM joint GROUP BY x),
      |my AS (SELECT y, SUM(nxy) AS ny FROM joint GROUP BY y),
      |tot AS (SELECT SUM(nxy) AS n FROM joint)
      |SELECT COUNT(*) AS n_cells,
      |  FLOOR((SUM(CAST(nxy AS DOUBLE) / n *
      |    LN(CAST(nxy AS DOUBLE) * n / (nx * ny)))) * 1e4 + 0.5) / 1e4 AS mi_nats
      |FROM joint JOIN mx USING (x) JOIN my USING (y), tot""".stripMargin

  // --------------------------------------------------------------------------
  // q192 — rendezvous (highest-random-weight) shard planner: assign every
  // doc to argmax_s h(doc, s) over the shard set, then audit what an
  // 8 → 9 shard expansion moves. HRW's defining property — ONLY docs whose
  // new argmax IS the added shard relocate (expected n/9 of the corpus;
  // mod-hash resharding, q127's shape, moves ~8/9) — is what makes
  // rebalancing a 100 TB corpus an append, not a rewrite. The result
  // carries BOTH n_moved and n_moved_to_new so the oracle hash pins the
  // invariant n_moved = n_moved_to_new, not just the counts.
  //
  // Scale: completely row-local — the candidate set is a literal array of
  // n (hash, shard) structs folded with greatest(); no shard table, no
  // join, no shuffle before the final 8-row aggregate. Hash is the
  // md5-prefix portability idiom (file header of EncodeOps).
  private def hrwShard(id: Column, shards: Int): Column = {
    val cands = (0 until shards).map { s =>
      struct(
        conv(substring(md5(concat(id.cast("string"), lit(":" + s))), 1, 8), 16, 10)
          .cast("long").as("h"),
        lit(s).as("s"))
    }
    greatest(cands: _*).getField("s")
  }

  def q192RendezvousShard(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        hrwShard(col("doc_id"), 8).as("shard8"),
        hrwShard(col("doc_id"), 9).as("shard9"))
      .groupBy(col("shard8"))
      .agg(count(lit(1)).as("n_docs"),
        count_if(col("shard9") =!= col("shard8")).as("n_moved"),
        count_if(col("shard9") =!= col("shard8") && col("shard9") === 8)
          .as("n_moved_to_new"))
      .orderBy(col("shard8"))

  val q192Sql: String =
    """WITH s8 AS (
      |  SELECT doc_id, arg_max(s, h) AS shard8 FROM (
      |    SELECT doc_id, r.range AS s,
      |      ('0x' || substr(md5(doc_id::VARCHAR || ':' || r.range::VARCHAR), 1, 8))::BIGINT AS h
      |    FROM documents, range(0, 8) r) GROUP BY doc_id),
      |s9 AS (
      |  SELECT doc_id, arg_max(s, h) AS shard9 FROM (
      |    SELECT doc_id, r.range AS s,
      |      ('0x' || substr(md5(doc_id::VARCHAR || ':' || r.range::VARCHAR), 1, 8))::BIGINT AS h
      |    FROM documents, range(0, 9) r) GROUP BY doc_id)
      |SELECT shard8, COUNT(*) AS n_docs,
      |  CAST(COUNT(*) FILTER (shard9 <> shard8) AS BIGINT) AS n_moved,
      |  CAST(COUNT(*) FILTER (shard9 <> shard8 AND shard9 = 8) AS BIGINT) AS n_moved_to_new
      |FROM s8 JOIN s9 USING (doc_id)
      |GROUP BY shard8 ORDER BY shard8""".stripMargin

  // --------------------------------------------------------------------------
  // q216 — DIFFERENTIALLY-PRIVATE histogram release (Laplace mechanism):
  // per-(event_type, weekday) event counts released with Laplace(1/ε)
  // noise, ε = 1 split over nothing (each event contributes to exactly one
  // cell, so per-cell sensitivity is 1 and the release is ε-DP under
  // event-level adjacency). Completes the privacy family: q180 k-anonymity
  // suppresses small groups, q202 l-diversity audits attribute disclosure,
  // this releases AGGREGATES with a formal guarantee.
  //
  // Determinism (the testable-DP trick): the Laplace draw uses the q115
  // portable md5 uniform over the CELL KEY + a release tag as the
  // inverse-CDF input — a fixed released noise per cell, reproducible in
  // both engines, exactly what a production "publish once" release pins
  // anyway (re-drawing noise per query would leak ε per read). u is a
  // dyadic rational, so 1−2|u−½| is exact; ln() is the only correctly-
  // rounded-risk op and the result is rounded to 6dp (q204's ln
  // precedent). Scale: one hash aggregate over the corpus; noise is
  // row-local on the |cells| rows.
  def q216DpCounts(spark: SparkSession, dir: String): DataFrame = {
    val eps = 1.0
    val cells = Tables.events(spark, dir)
      .groupBy(col("event_type"), dayofweek(col("ts")).as("dow"))
      .agg(count(lit(1)).as("n"))
    val v = conv(substring(md5(concat_ws(":", col("event_type"), col("dow"),
      lit("dp-release-1"))), 1, 13), 16, 10).cast("long")
    val u = (v.cast("double") + 0.5) / lit(4503599627370496.0)
    val uc = u - 0.5
    val noise = -signum(uc) * log(lit(1.0) - lit(2.0) * abs(uc)) / eps
    cells.select(col("event_type"), col("dow"),
      Num.pround(col("n") + noise, 6).as("noisy_n"), lit(eps).as("epsilon"))
      .orderBy(col("event_type"), col("dow"))
  }

  val q216Sql: String =
    """WITH cells AS (
      |  SELECT event_type, dayofweek(ts) + 1 AS dow, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |noise AS (
      |  SELECT event_type, dow, n,
      |    (('0x' || substr(md5(event_type || ':' || dow::VARCHAR || ':dp-release-1'), 1, 13))::BIGINT
      |      + 0.5) / 4503599627370496.0 - 0.5 AS uc
      |  FROM cells)
      |SELECT event_type, dow,
      |  FLOOR((n + (CASE WHEN uc >= 0 THEN -1.0 ELSE 1.0 END) * ln(1.0 - 2.0 * abs(uc))) * 1e6 + 0.5) / 1e6
      |    AS noisy_n,
      |  CAST(1.0 AS DOUBLE) AS epsilon
      |FROM noise ORDER BY event_type, dow""".stripMargin

  // --------------------------------------------------------------------------
  // q223 — t-CLOSENESS AUDIT (Li, Li, Venkatasubramanian): for each
  // quasi-identifier group (nation, segment), the Earth Mover's Distance
  // between the group's distribution of the ordered sensitive attribute
  // (account balance, 10 global equi-width bins) and the global
  // distribution; a group "breaches" when EMD > t. Completes the privacy
  // triad: q180 k-anonymity (group size), q202 l-diversity (distinct
  // sensitive values), q223 distribution closeness (the attack l-diversity
  // misses — skewed-but-diverse groups).
  //
  // For an ordered attribute, EMD = (1/(B−1)) Σᵢ |Σ_{j≤i} (qⱼ − pⱼ)|.
  // Exactness: bins are integer-division buckets on exact cents; the
  // cumulative difference is kept as the EXACT integer numerator
  // |cumqᵢ·N − cumpᵢ·n_g| (one bigint product each) over denominator
  // n_g·N — summed as exact longs, ONE double division at output, round
  // 6 dp. Bit-identical cross-engine, no float accumulation anywhere.
  //
  // Scale: two hash aggregates over the corpus (per-group-bin, per-bin),
  // a dense groups×10 grid built by exploding a bounded literal (no
  // join), the global 10-row bin table broadcast-joined in, and a
  // 10-row-per-group window partitioned by group. No all-pairs, no
  // unpartitioned window.
  def q223TCloseness(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cust = Tables.customer(spark, dir).select(
      col("c_nationkey"), col("c_mktsegment").as("seg"),
      (col("c_acctbal").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
    val rng = cust.agg(min(col("cents")).as("minc"), max(col("cents")).as("maxc"),
      count(lit(1)).as("nTot"))
    val binned = cust.crossJoin(broadcast(rng))
      .withColumn("bin", expr("((cents - minc) * 10) div (maxc - minc + 1)"))
      .select(col("c_nationkey"), col("seg"), col("bin"))
    val gbin = binned.groupBy(col("c_nationkey"), col("seg"), col("bin"))
      .agg(count(lit(1)).as("ng_b"))
    val glob = binned.groupBy(col("bin")).agg(count(lit(1)).as("n_b"))
    val grid = binned.groupBy(col("c_nationkey"), col("seg"))
      .agg(count(lit(1)).as("n_g"))
      .withColumn("bin", explode(array((0 until 10).map(b => lit(b.toLong)): _*)))
    val w = Window.partitionBy(col("c_nationkey"), col("seg")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val t = 0.15
    grid
      .join(gbin, Seq("c_nationkey", "seg", "bin"), "left")
      .join(broadcast(glob), Seq("bin"), "left")
      .crossJoin(broadcast(rng.select(col("nTot"))))
      .withColumn("cumq", sum(coalesce(col("ng_b"), lit(0L))).over(w))
      .withColumn("cump", sum(coalesce(col("n_b"), lit(0L))).over(w))
      .withColumn("d", abs(col("cumq") * col("nTot") - col("cump") * col("n_g")))
      .groupBy(col("c_nationkey"), col("seg"))
      .agg(max(col("n_g")).as("n_g"),
        Num.pround(sum(col("d")).cast("double") /
          (lit(9.0) * max(col("n_g")) * max(col("nTot"))), 6).as("emd"))
      .withColumn("breach", col("emd") > t)
      .orderBy(col("c_nationkey"), col("seg"))
  }

  val q223Sql: String =
    """WITH cust AS (
      |  SELECT c_nationkey, c_mktsegment AS seg,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM customer),
      |rng AS (SELECT MIN(cents) AS minc, MAX(cents) AS maxc,
      |  COUNT(*) AS nTot FROM cust),
      |binned AS (
      |  SELECT c_nationkey, seg, ((cents - minc) * 10) // (maxc - minc + 1) AS bin
      |  FROM cust CROSS JOIN rng),
      |gbin AS (SELECT c_nationkey, seg, bin, COUNT(*) AS ng_b
      |  FROM binned GROUP BY 1, 2, 3),
      |gtot AS (SELECT bin, COUNT(*) AS n_b FROM binned GROUP BY bin),
      |grid AS (
      |  SELECT c_nationkey, seg, n_g, CAST(r.range AS BIGINT) AS bin
      |  FROM (SELECT c_nationkey, seg, COUNT(*) AS n_g FROM binned GROUP BY 1, 2)
      |  CROSS JOIN range(0, 10) r),
      |cum AS (
      |  SELECT g.c_nationkey, g.seg, g.bin, g.n_g, nTot,
      |    SUM(COALESCE(ng_b, 0)) OVER (PARTITION BY g.c_nationkey, g.seg
      |      ORDER BY g.bin ROWS UNBOUNDED PRECEDING) AS cumq,
      |    SUM(COALESCE(n_b, 0)) OVER (PARTITION BY g.c_nationkey, g.seg
      |      ORDER BY g.bin ROWS UNBOUNDED PRECEDING) AS cump
      |  FROM grid g
      |  LEFT JOIN gbin ON g.c_nationkey = gbin.c_nationkey
      |    AND g.seg = gbin.seg AND g.bin = gbin.bin
      |  LEFT JOIN gtot ON g.bin = gtot.bin
      |  CROSS JOIN (SELECT nTot FROM rng))
      |SELECT c_nationkey, seg, MAX(n_g) AS n_g,
      |  FLOOR((CAST(SUM(ABS(cumq * nTot - cump * n_g)) AS DOUBLE)
      |    / (9.0 * MAX(n_g) * MAX(nTot))) * 1e6 + 0.5) / 1e6 AS emd,
      |  FLOOR((CAST(SUM(ABS(cumq * nTot - cump * n_g)) AS DOUBLE)
      |    / (9.0 * MAX(n_g) * MAX(nTot))) * 1e6 + 0.5) / 1e6 > 0.15 AS breach
      |FROM cum GROUP BY c_nationkey, seg
      |ORDER BY c_nationkey, seg""".stripMargin

  // --------------------------------------------------------------------------
  // q249 — CROSS-SOURCE QUANTILE NORMALIZATION (distribution matching):
  // map each source's document-length distribution onto the GLOBAL
  // distribution — the standardization step that makes per-source quality
  // thresholds comparable when sources have wildly different length
  // profiles. For each source decile i: source value = the smallest
  // length whose within-source cumulative count reaches ⌈i·n_s/10⌉, and
  // its normalized image = the global value at the SAME fractional rank
  // ⌈(r/n_s)·N⌉. Every rank is computed with integer ceil-division
  // ((a+b−1) div b) — the entire operator is integer-exact, no float
  // boundary anywhere.
  //
  // Scale: the corpus collapses to per-(source, length) counts in ONE
  // shuffle; cumulative windows run per source (partitioned) and over the
  // bounded distinct-length grid; the decile lookups are bounded-grid
  // range joins (|sources|·9 probe rows × |lengths|), corpus-independent.
  def q249QuantileNormalize(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val srcGrid = docs.groupBy(col("source"), col("n_chars"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col("source")).orderBy(col("n_chars"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val srcN = srcGrid.groupBy(col("source")).agg(sum(col("c")).as("n_s"))
    val gGrid = docs.groupBy(col("n_chars")).agg(count(lit(1)).as("c"))
      .withColumn("gcum", sum(col("c")).over(
        Window.orderBy(col("n_chars"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("n_chars").as("g_val"), col("c").as("g_c"), col("gcum"))
    val probes = srcN
      .withColumn("decile", explode(sequence(lit(1), lit(9))))
      .withColumn("r", expr("(decile * n_s + 9) div 10"))
    val srcVal = probes.join(srcGrid, Seq("source"))
      .filter(col("cum") >= col("r"))
      .groupBy(col("source"), col("decile"), col("r"), col("n_s"))
      .agg(min(col("n_chars")).as("src_value"))
    val gTot = gGrid.agg(sum(col("g_c")).cast("long").as("n_g"))
    val mapped = srcVal.crossJoin(broadcast(gTot))
      .withColumn("rg", expr("(r * n_g + n_s - 1) div n_s"))
      .join(gGrid, col("gcum") >= col("rg"))
      .groupBy(col("source"), col("decile"), col("src_value"))
      .agg(min(col("g_val")).as("mapped_value"))
    mapped.orderBy(col("source"), col("decile"))
  }

  val q249Sql: String =
    """WITH sg AS (
      |  SELECT source, n_chars, COUNT(*) AS c,
      |    SUM(COUNT(*)) OVER (PARTITION BY source ORDER BY n_chars
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM documents GROUP BY 1, 2),
      |sn AS (SELECT source, SUM(c) AS n_s FROM sg GROUP BY 1),
      |gg AS (
      |  SELECT n_chars, COUNT(*) AS c,
      |    SUM(COUNT(*)) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS gcum
      |  FROM documents GROUP BY 1),
      |gt AS (SELECT SUM(c) AS n_g FROM gg),
      |probes AS (
      |  SELECT source, n_s, decile, (decile * n_s + 9) // 10 AS r
      |  FROM sn, LATERAL (SELECT unnest(range(1, 10)) AS decile) d),
      |sv AS (
      |  SELECT p.source, p.decile, p.r, p.n_s, MIN(sg.n_chars) AS src_value
      |  FROM probes p JOIN sg ON p.source = sg.source AND sg.cum >= p.r
      |  GROUP BY 1, 2, 3, 4),
      |mp AS (
      |  SELECT sv.source, sv.decile, sv.src_value, MIN(gg.n_chars) AS mapped_value
      |  FROM sv, gt, gg
      |  WHERE gg.gcum >= (sv.r * gt.n_g + sv.n_s - 1) // sv.n_s
      |  GROUP BY 1, 2, 3)
      |SELECT source, CAST(decile AS INT) AS decile, src_value, mapped_value
      |FROM mp ORDER BY source, decile""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q223_t_closeness", q223TCloseness _, Some(q223Sql)),
    ("q249_quantile_normalize", q249QuantileNormalize _, Some(q249Sql)),
    ("q216_dp_counts", q216DpCounts _, Some(q216Sql)),
    ("q176_containment", q176Containment _, Some(q176Sql)),
    ("q177_compaction_plan", q177CompactionPlan _, Some(q177Sql)),
    ("q178_variant_json", q178VariantJson _, Some(q178Sql)),
    ("q179_ccnet_filter", q179CcnetFilter _, Some(q179Sql)),
    ("q180_k_anonymity", q180KAnonymity _, Some(q180Sql)),
    ("q181_dq_rules", q181DqRules _, Some(q181Sql)),
    ("q182_mutual_info", q182MutualInfo _, Some(q182Sql)),
    ("q192_rendezvous_shard", q192RendezvousShard _, Some(q192Sql)))
}
