package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-side decade-scale probe (SURVEY §8.5): re-runs the near-duplicate
  * family (q31/q32/q104/q113/q121) and the round-5 window fixes
  * (q107/q134/q164) on synthetic documents/embeddings/orders tables at
  * 1×/2×/5×/10× the sf0.1 row counts — one decade PAST the driver's
  * largest sweep, where candidate-pair growth and band-recall boundaries
  * show up first (round 3's q104 boundary was only visible at sf0.1).
  *
  * The generator is hash-derived (xxhash64 → tokens/vector components), so
  * it is deterministic, fully distributed (no driver-side materialization
  * — the same shape a 100 TB generator would take), and plants the
  * structures the operators hunt: exact duplicates (~2%), near-duplicate
  * token edits (~3%), and near-identical embedding pairs (~2.5%) on top
  * of 10 Gaussian-ish label clusters.
  *
  * Output: one JSON line per (scale, query) with wall seconds + result
  * rows, and a per-scale candidate-count line (LSH band-bucket pairs),
  * consumed by SURVEY §8.5. Not part of the driver contract.
  */
object ScaleProbe {

  private val vocab = Seq("batch", "part", "spark", "line", "column", "order",
    "small", "sort", "fast", "value", "scan", "query", "agg", "table", "hash",
    "join", "group", "filter", "read", "write", "plan", "stage", "task",
    "shuffle", "merge", "index", "cache", "disk", "row", "wide", "vector")

  /** documents: 5000·m rows, 8–90 tokens; id%53==2 copies id-2 verbatim
    * (exact dup), id%37==1 copies id-1 with one appended token (near dup).
    * Same five columns as the driver table.
    *
    * Token = base-word + a hash class of cardinality 31·m, so the DISTINCT
    * vocabulary grows with the corpus (~961·m types — Heaps-law-ish). A
    * fixed tiny vocab makes shingle posting lists grow linearly with
    * corpus size and candidate pairs quadratically — a property of
    * degenerate text, not of the operators; the first probe run measured
    * exactly that artifact (q31 went super-linear against a 31-type vocab).
    */
  private def genDocuments(spark: SparkSession, dir: String, m: Int): Unit = {
    val n = 5000L * m
    val vocabCol = array(vocab.map(lit): _*)
    val base = when(col("id") % 53 === 2 && col("id") >= 2, col("id") - 2)
      .when(col("id") % 37 === 1 && col("id") >= 1, col("id") - 1)
      .otherwise(col("id"))
    val nTok = (pmod(xxhash64(base, lit(17)), lit(83)) + 8).cast("int")
    def tokAt(seed: org.apache.spark.sql.Column) = concat(
      element_at(vocabCol, (pmod(xxhash64(seed), lit(31)) + 1).cast("int")),
      pmod(xxhash64(seed, lit(7)), lit(31L * m)))
    val toks = transform(sequence(lit(1), nTok), i => tokAt(xxhash64(base, i)))
    val nearDup = col("id") % 37 === 1 && col("id") % 53 =!= 2 && col("id") >= 1
    val text = concat_ws(" ",
      when(nearDup, concat(toks, array(tokAt(xxhash64(col("id"), lit(99))))))
        .otherwise(toks))
    spark.range(n).select(
      col("id").as("doc_id"),
      text.as("text"),
      element_at(array(Seq("en", "en", "de", "fr", "es", "zh").map(lit): _*),
        (pmod(xxhash64(col("id"), lit(5)), lit(6)) + 1).cast("int")).as("lang"),
      concat(lit("src"), pmod(xxhash64(col("id"), lit(11)), lit(20))).as("source"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  /** Degenerate-axis twin of genDocuments: the token vocabulary does NOT
    * grow with the corpus — 31 hash classes at every scale, the REAL
    * sf0.1 documents table's shape (measured: 31-token vocab, 3-gram
    * space 31³ ≈ 30k SATURATED at 27k types, max df 25). On this axis
    * shingle df grows ∝ n and inverted-index pair mass ∝ n² — a property
    * of the corpus (the true intersecting-pair set is itself quadratic),
    * not of the join shape; the probe measures how q176/q183 degrade
    * when the gram space saturates.
    */
  private def genDocumentsDegenerate(spark: SparkSession, dir: String, m: Int): Unit = {
    val n = 5000L * m
    val vocabCol = array(vocab.map(lit): _*)
    val base = when(col("id") % 53 === 2 && col("id") >= 2, col("id") - 2)
      .when(col("id") % 37 === 1 && col("id") >= 1, col("id") - 1)
      .otherwise(col("id"))
    val nTok = (pmod(xxhash64(base, lit(17)), lit(83)) + 8).cast("int")
    // bare 31-word tokens — the REAL table's measured vocabulary (31
    // types, no suffix classes), so 31³ ≈ 30k 3-gram space saturates
    def tokAt(seed: org.apache.spark.sql.Column) =
      element_at(vocabCol, (pmod(xxhash64(seed), lit(31)) + 1).cast("int"))
    val toks = transform(sequence(lit(1), nTok), i => tokAt(xxhash64(base, i)))
    val nearDup = col("id") % 37 === 1 && col("id") % 53 =!= 2 && col("id") >= 1
    val text = concat_ws(" ",
      when(nearDup, concat(toks, array(tokAt(xxhash64(col("id"), lit(99))))))
        .otherwise(toks))
    spark.range(n).select(
      col("id").as("doc_id"),
      text.as("text"),
      element_at(array(Seq("en", "en", "de", "fr", "es", "zh").map(lit): _*),
        (pmod(xxhash64(col("id"), lit(5)), lit(6)) + 1).cast("int")).as("lang"),
      concat(lit("src"), pmod(xxhash64(col("id"), lit(11)), lit(20))).as("source"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  /** embeddings: 2000·m rows, 64-dim float vectors with a mild 10-cluster
    * structure (label = id%10); id%41==3 repeats id-1's vector with ~1%
    * noise — the near-identical pair q104/q49 hunt.
    *
    * Calibration: spread dominates centroid (1.0 vs 0.3), so within-cluster
    * cosine sits ≈ 0.08 and cross-pair cosine concentrates at 0 with
    * σ ≈ 1/√64 = 0.125. At q104's catalog threshold 0.4 (3.2σ) chance
    * pairs therefore still grow ~quadratically — that is the THRESHOLD's
    * semantics on 64-dim data, measured deliberately; at the realistic 0.9
    * probe threshold (6.6σ) chance pairs are ~1e-11/pair and only the
    * planted jitter copies (cosine ≈ 0.99996) survive. The first-run
    * generator weighted centroids 1.0/0.3 the other way, which pushed
    * within-cluster cosine to ≈ 0.92 and flooded the 0.4 threshold with
    * entire clusters — a generator artifact, not an operator behavior.
    */
  private def genEmbeddings(spark: SparkSession, dir: String, m: Int): Unit = {
    val n = 2000L * m
    val base = when(col("id") % 41 === 3 && col("id") >= 1, col("id") - 1)
      .otherwise(col("id"))
    def unit(seedA: org.apache.spark.sql.Column, seedB: org.apache.spark.sql.Column) =
      pmod(xxhash64(seedA, seedB), lit(2001)).cast("double") / 1000.0 - 1.0
    val label = pmod(base, lit(10))
    val vec = transform(sequence(lit(0), lit(63)), d =>
      (unit(label * 1000, d) * 0.3 + // mild centroid component
        unit(base, d + 64) + // dominant per-vector spread
        when(col("id") % 41 === 3, unit(col("id"), d + 128) * 0.01)
          .otherwise(lit(0.0)) // near-dup jitter
        ).cast("float"))
    spark.range(n).select(
      col("id").as("vec_id"),
      vec.as("embedding"),
      label.cast("int").as("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  /** customer: 15000·m rows with TPC-H-shaped names — q121's input (the
    * linkage operator derives its dirty side in-query by deleting one
    * name character, so only the clean table is generated).
    */
  private def genCustomer(spark: SparkSession, dir: String, m: Int): Unit = {
    val n = 15000L * m
    spark.range(n).select(
      (col("id") + 1).as("c_custkey"),
      format_string("Customer#%09d", col("id") + 1).as("c_name"),
      pmod(xxhash64(col("id"), lit(29)), lit(25)).cast("int").as("c_nationkey"),
      round(pmod(xxhash64(col("id"), lit(31)), lit(1099999)).cast("double") / 100.0 - 999.99, 2)
        .as("c_acctbal"),
      element_at(array(Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY").map(lit): _*),
        (pmod(xxhash64(col("id"), lit(37)), lit(5)) + 1).cast("int")).as("c_mktsegment"))
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
  }

  /** orders: 150000·m rows over 15000·m customers (TPC-H-ish 10 orders per
    * customer, hash-spread so per-customer frequency varies) — q164's input.
    */
  private def genOrders(spark: SparkSession, dir: String, m: Int): Unit = {
    val n = 150000L * m
    val nCust = 15000L * m
    spark.range(n).select(
      (col("id") + 1).as("o_orderkey"),
      (pmod(xxhash64(col("id"), lit(3)), lit(nCust)) + 1).as("o_custkey"),
      element_at(array(lit("O"), lit("F"), lit("P")),
        (pmod(xxhash64(col("id"), lit(7)), lit(3)) + 1).cast("int")).as("o_orderstatus"),
      round(pmod(xxhash64(col("id"), lit(13)), lit(19900001)).cast("double") / 100.0 + 1000.0, 2)
        .as("o_totalprice"),
      to_timestamp(date_add(lit(java.sql.Date.valueOf("2023-01-01")),
        pmod(xxhash64(col("id"), lit(19)), lit(730)).cast("int"))).as("o_orderdate"),
      element_at(array(Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW").map(lit): _*),
        (pmod(xxhash64(col("id"), lit(23)), lit(5)) + 1).cast("int")).as("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
  }

  /** lineitem: 600000·m rows, 4 items per order over a parts domain that
    * scales with m (2000·m) — q198/q206's input. Scaling the domain with
    * the corpus keeps pair-collision density constant (a FIXED parts
    * domain would make co-purchase pair counts grow quadratically — the
    * q31 degenerate-vocab lesson applied to baskets). Round-7 additions:
    * l_suppkey over a 1000·m supplier domain (q221's bipartite edges),
    * l_linenumber/l_quantity/l_extendedprice (q232's residuals).
    */
  private def genLineitem(spark: SparkSession, dir: String, m: Int): Unit = {
    val n = 600000L * m
    spark.range(n).select(
      (col("id") / 4 + 1).cast("long").as("l_orderkey"),
      (pmod(xxhash64(col("id"), lit(43)), lit(2000L * m)) + 1).as("l_partkey"),
      (pmod(xxhash64(col("id"), lit(47)), lit(1000L * m)) + 1).as("l_suppkey"),
      (pmod(col("id"), lit(4)) + 1).cast("int").as("l_linenumber"),
      (pmod(xxhash64(col("id"), lit(53)), lit(50)) + 1).cast("double").as("l_quantity"),
      round((pmod(xxhash64(col("id"), lit(53)), lit(50)) + 1).cast("double") *
        (pmod(xxhash64(col("id"), lit(59)), lit(500001)).cast("double") / 100.0 + 100.0), 2)
        .as("l_extendedprice"),
      // hash-dated shipdate on the same 2-year axis as o_orderdate so the
      // priority/latency probes (q363/q369) see a bounded ±730-day grid
      to_timestamp(date_add(lit(java.sql.Date.valueOf("2023-01-01")),
        pmod(xxhash64(col("id"), lit(71)), lit(760)).cast("int"))).as("l_shipdate"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  /** part: 2000·m rows with 5-token color names over a vocabulary that
    * SCALES with m (92·m colors — the q31 Heaps-law lesson: a fixed color
    * vocab would grow (brand, first-token) block density linearly and
    * blocked-pair counts quadratically as a generator artifact; real
    * catalogs grow their naming vocabulary with size) — q235's input.
    */
  private def genPart(spark: SparkSession, dir: String, m: Int): Unit = {
    val n = 2000L * m
    def colorAt(seed: org.apache.spark.sql.Column) =
      concat(lit("color"), pmod(xxhash64(seed), lit(92L * m)))
    spark.range(n).select(
      (col("id") + 1).as("p_partkey"),
      concat_ws(" ", (1 to 5).map(i => colorAt(xxhash64(col("id"), lit(i)))): _*)
        .as("p_name"),
      concat(lit("Brand#"), (pmod(xxhash64(col("id"), lit(71)), lit(25)) + 1))
        .as("p_brand"))
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
  }

  /** supplier: 1000·m rows (sf0.1's customer:supplier ratio) — q225's
    * station side and q221's supplier nodes.
    */
  /** nation: the fixed 25-row dimension (scale-independent, like the real
    * table) — q304's grouping side.
    */
  private def genNation(spark: SparkSession, dir: String, m: Int): Unit =
    spark.range(25).select(
      col("id").cast("int").as("n_nationkey"),
      format_string("NATION_%02d", col("id")).as("n_name"),
      (col("id") % 5).cast("int").as("n_regionkey"))
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")

  /** events: 100_000·m rows over the real table's fixed 30-day span —
    * the decade axis is rows PER DAY (days don't grow with a corpus;
    * volume does), exactly the load q313's per-user windows and q319's
    * two-level (day, hour) sweep-line scan must absorb.
    */
  private def genEvents(spark: SparkSession, dir: String, m: Int): Unit = {
    val n = 100000L * m
    val dayUs = 86400000000L
    spark.range(n).select(
      col("id").as("event_id"),
      timestamp_micros(lit(19723L * dayUs) +
        pmod(xxhash64(col("id"), lit(23)), lit(30L * dayUs))).as("ts"),
      pmod(xxhash64(col("id"), lit(29)), lit(1000L * m)).as("user_id"),
      // 5-type Zipf-ish mix so the transition-chain probes (q340) see a
      // realistic non-uniform matrix on the same rows-per-day axis
      element_at(
        array(lit("view"), lit("view"), lit("click"), lit("cart"), lit("buy")),
        (pmod(xxhash64(col("id"), lit(31)), lit(5)) + 1).cast("int")).as("event_type"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def genSupplier(spark: SparkSession, dir: String, m: Int): Unit =
    spark.range(1000L * m).select(
      (col("id") + 1).as("s_suppkey"),
      format_string("Supplier#%09d", col("id") + 1).as("s_name"),
      pmod(xxhash64(col("id"), lit(61)), lit(25)).cast("int").as("s_nationkey"),
      round(pmod(xxhash64(col("id"), lit(67)), lit(1099999)).cast("double") / 100.0 - 999.99, 2)
        .as("s_acctbal"))
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")

  private val probeQueries = Seq(
    "q31_ngram_jaccard", "q32_minhash_lsh", "q104_cosine_neardup_lsh",
    "q113_span_dedup", "q121_record_linkage",
    "q107_vocab_encode", "q134_pmi_pairs", "q164_skyline",
    // round-5 additions on the same generated tables: the containment
    // inverted-index join (q31's family, no size prune), the one-window
    // novelty attribution, and BPE training over the Heaps-bounded vocab
    "q176_containment", "q185_novelty", "q183_bpe_train",
    // round-6 additions: the banded-hamming phash join (decode + LSH),
    // basket pair fan-out and its triangle closure, the bounded-histogram
    // quantile scaler, the one-plan curation funnel, per-subspace PQ fit,
    // and row-local chunking
    "q197_phash_dedup", "q198_market_basket", "q206_triangle_count",
    "q199_robust_scale", "q203_curation_funnel", "q205_pq_encode",
    "q209_chunk_overlap",
    // round-7 additions: frontier BFS over the bipartite purchase graph,
    // bounded-candidate MMR (corpus scan + O(k²) greedy), t-closeness
    // dense-grid EMD, the 3×3-cell spatial equi-join, prefix-dim recall
    // eval, and the two-pass conformal order statistic
    "q221_bfs_distance", "q222_mmr_rerank", "q223_t_closeness",
    "q225_grid_eps_join", "q229_matryoshka_eval", "q232_conformal",
    // round-7b additions: blocked Jaro-Winkler matching (native expr over
    // (brand, token) blocks), positional bigram join, the PPJoin prefix
    // filter vs its full-index twin, merkle-bucket diff (two digest
    // passes + dirty-bucket row diff), per-doc audio decode + VAD
    // islands, and the bounded-grid EWMA convolution
    "q235_jaro_winkler_match", "q238_phrase_search",
    "q242_prefix_filter_join", "q243_merkle_diff", "q244_vad_segments",
    "q245_ewma_forecast",
    // round-7b tail: leakage audit (near-dup join + split labels),
    // quantile-normalization bounded grids, v-optimal DP, two-hop
    // graph aggregation, scene-cut dHash stream
    "q257_split_leakage", "q249_quantile_normalize", "q266_voptimal_hist",
    "q268_graph_aggregation", "q256_scene_cuts",
    // round-8 addition: semantic dedup with scaled seed count + planner
    // banding — the one dedup operator the round-7 verdict found unprobed
    "q172_semantic_dedup",
    // round-12 addition: multi-vector MaxSim — one corpus-linear scoring
    // pass against the bounded query side, so wall time must track the
    // embedding row count
    "q443_maxsim_retrieval",
    // round-8 batch: DSIR selection, packed-block manifest, TextTiling
    // segmentation, weighted reservoir (documents); item CF and trending
    // decay (lineitem/orders); profiler + encoding advisor + binseg
    // (orders) — all claimed linear/bounded; the curves check the claims
    "q279_dsir_weighting", "q285_packed_blocks", "q286_topic_segments",
    "q283_weighted_reservoir", "q288_item_cf", "q289_trending_decay",
    "q291_data_profile", "q293_encoding_advisor", "q292_changepoint_binseg",
    // round-8d batch: bounded-round k-core peel (per-round degree aggs +
    // equi-joins over the purchase graph), the bounded-probe kNN label
    // audit (cost ∝ corpus × 400), Good–Turing counts-of-counts, and the
    // per-(nation, supplier) HHI rollup — all claimed linear; q303/q305
    // collapse to the calendar grid and are flat by construction
    "q300_kcore_peel", "q301_knn_label_audit", "q302_good_turing",
    "q304_hhi",
    // round-8g/8h batch: 3-round bipartite LPA (q300's join/agg family),
    // histogram-ranked Spearman, Apriori triple fan-out (C(basket,3)-
    // bounded, downward-closure pruned), interval union and the two-level
    // sweep-line peak — the last two on the generated events table whose
    // decade axis is rows PER DAY
    "q315_lpa_communities", "q316_spearman", "q317_apriori_triples",
    "q313_interval_union", "q319_peak_concurrency",
    // round-8i batch: the q169-two-pass systematic PPS prefix (suppliers
    // via the lineitem fact scan) and the three explode+distinct
    // diversity passes — both claimed linear
    "q322_systematic_pps", "q323_distinct_n",
    // round-8j batch: the row-local kappa labeling pass and the k-bounded
    // rank-churn joins — both claimed linear-to-flat
    "q324_cohen_kappa", "q325_topk_churn",
    // round-8k..8o text/planning batches: contamination semi-joins,
    // histogram-rank sharding, grid-math reweighting, LOO subtraction,
    // saturation thresholds, row-local set keys, the 5-pass novelty
    // curve and the count-of-counts coverage crossing — all claimed
    // linear or better
    "q327_eval_contamination", "q328_serpentine_shards",
    "q329_mixture_reweight", "q330_loo_source_stats",
    "q331_dedup_saturation", "q332_token_set_groups",
    "q335_novelty_curve", "q336_vocab_coverage",
    // round-8q..8u batches: the user-chain stationary mix (one lead
    // window + k-grid power iterations), Adamic–Adar wedge fan-out
    // (deg²-bounded by the 256 connector cap), the clipped-bigram
    // pair audit (cost ∝ true pair set), the 190-pair per-word
    // divergence equi-join, and the value-histogram rank test — all
    // claimed linear; the rest of the new batches collapse to
    // calendar/bounded grids
    "q340_stationary_mix", "q343_adamic_adar", "q345_rouge2_pairs",
    "q348_source_divergence", "q341_kruskal_wallis",
    // round-8aa..8ag batches: the (source, token) lexical panel, the
    // priority-latency histogram join (JT), the per-order pair build
    // feeding Bradley–Terry (fan-out bounded by lines/order), the
    // multi-probe stitch join (7 keys/doc, df ≤ 1000 cap), and the
    // count-of-counts extrapolation — the five non-grid shapes of the
    // session; the rest collapse to calendar/QI/bin grids
    "q360_lexical_diversity", "q363_jonckheere", "q368_bradley_terry",
    "q371_stitch_census", "q372_good_toulmin",
    // round-8ah..8au batches: the vocabulary-keyed OOV/CMS/template
    // shapes (token-count passes + bounded grids) and the q363 prefix-sum
    // rewrite re-probed after the 24k-cell bench regression fix; the
    // rest are single aggregates over bounded grids
    "q386_oov_audit", "q394_cms_audit", "q399_template_census",
    "q397_tail_amplification",
    // round-9 corpus-hygiene batch: non-distinct bigram expansion (q407),
    // 5-gram distinct + semi-join contamination (q409), md5 dedup ledger
    // (q410) — all claimed corpus-linear
    "q407_repetition_audit", "q409_ngram_contamination", "q410_token_yield",
    // second round-9 trio: broadcast-centroid assignment (q411, q212's
    // class), q82-component census (q412), 3-row cut grid (q413)
    "q411_label_margin", "q412_cluster_census", "q413_truncation_audit",
    // dedup-stack pair: threshold grid over the q31 pair set (q414) and
    // the incoming×existing restricted inverted-index join (q415)
    "q414_threshold_sensitivity", "q415_incremental_dedup",
    // round-10 planning quartet: the (hash, source)-combinatorics matrix
    // + guarded-pair join (q417) and the pair-pipeline + component-loop
    // transitivity audit (q418) — the two non-grid shapes; q419/q420
    // are one token explode / row-local arithmetic over broadcast grids
    "q417_source_copy_matrix", "q418_chain_audit",
    "q419_vocab_growth", "q420_padding_audit",
    "q421_cap_pricing", "q422_length_drift",
    // round-9 additions (verdict task 5): the two top-5 bench queries
    // without their own curves — HITS (8 bounded rounds of join+agg over
    // the once-materialized supplier↔part edge list; per-round cost is
    // claimed edge-linear) and Siegel repeated medians (calendar-grid
    // pair expansion, ≤730² pairs at ANY corpus size; claimed flat by
    // construction after the daily collapse)
    "q350_hits", "q334_siegel_slope",
    // round-11 planner/audit batch: two new consumers of the guarded
    // pair pipeline (q423 conflict census, q426 survivor retention — the
    // pipeline itself is probed, these check the label joins stay slim),
    // the broadcast-codebook nprobe curve (q424, |queries|-bounded GT),
    // the row-local gate census (q425), the source-pair type join (q427,
    // postings bounded by |sources|), and the portable 4-hash MinHash
    // band census (q428, claimed shingle-linear)
    "q423_label_conflict", "q424_nprobe_curve", "q425_filter_overlap",
    "q426_survivor_retention", "q427_source_type_overlap",
    "q428_lsh_bucket_forecast",
    // round-11 dataloader audits: both ride the 256-bucket two-pass
    // global cumsum (claimed linear; the only unpartitioned window is
    // the bounded bucket grid)
    "q429_interleave_audit", "q430_pack_purity",
    // round-11 sweep-governance batch: three more consumers of the
    // guarded pair pipeline (q431 rule swing, q432 gap histogram, q437
    // scope split — slim joins/aggregates on top of the probed pairs),
    // the cumsum-riding block-size sweep (q433), the bounded-grid shard
    // forecast (q434), the |S|-row epoch planner (q435), and the 16-hash
    // minhash audit (q436 — one shingle explode × 16 md5s, pair-bounded
    // joins; claimed shingle-linear)
    "q431_survivor_rule_sensitivity", "q432_dup_ingest_gap",
    "q433_block_size_sweep", "q434_shard_count_forecast",
    "q435_epoch_budget", "q436_minhash_width_audit",
    "q437_dedup_scope_planner",
    // the contamination worklist (q438: gram explode + semi-join, claimed
    // corpus-linear) and the packed attention-pair mass (q439: cumsum +
    // bounded block explode, q430's shape)
    "q438_contamination_attribution", "q439_attention_contamination",
    // the cap cost/recall frontier: ONE cap-50 pair-expansion pass with
    // per-event df, smaller caps as conditional sums (q421's recall twin)
    "q440_cap_recall_frontier",
    // the edit-locus census: capped pairs + two token-array joins, the
    // prefix/suffix scan row-local and doc-length-bounded
    "q441_edit_locus")

  def main(args: Array[String]): Unit = {
    val scales = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 2, 5, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.localBuilder(cpus.toInt).appName("graft-scaleprobe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String, m: Int)(run: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows =
        try run
        catch { case e: Throwable =>
          System.err.println(s"[probe] x$m $name FAILED: ${e.getMessage}"); -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$name","scale_x":$m,"sec":$sec%.2f,"rows":$rows}""")
    }

    scales.foreach { m =>
      val dir =
        if (m == 1) "/root/testdata/sf0.1"
        else {
          val d = java.nio.file.Paths.get("target", "tmp", s"scaleprobe_x$m")
            .toAbsolutePath.toString
          genDocuments(spark, d, m); genEmbeddings(spark, d, m)
          genOrders(spark, d, m); genCustomer(spark, d, m)
          genLineitem(spark, d, m); genSupplier(spark, d, m)
          genPart(spark, d, m); genNation(spark, d, m)
          genEvents(spark, d, m)
          d
        }
      val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
        .map(_.split(",").toSet).getOrElse(probeQueries.toSet)
      probeQueries.filter(only).foreach { name =>
        timed(name, m)(SparkEntry.queries(name)(spark, dir).count()) }
      // fixed extras: individually selectable through the same PROBE_ONLY
      // filter (an unfiltered run executes all of them)
      val filtered = sys.env.contains("SPARK_GRAFT_PROBE_ONLY")
      def extra(name: String)(run: => Long): Unit =
        if (!filtered || only(name)) timed(name, m)(run)
      lazy val emb = Tables.embeddings(spark, dir)
      // the parameterized near-dup surface at a REALISTIC threshold: 0.9
      // with (16 bands × 8 planes) — per-pair miss ≈ 0.4%; only planted
      // jitter copies survive, so rows should track n/41 linearly while
      // the catalog's worst-case 0.4/(64×4) setting above grows with the
      // chance-pair quadratic
      extra("neardup_t0.9_b16r8")(
        ops.VectorOps.cosineNearDup(spark, emb, 0.9, 16, 8).count())
      // pre-threshold LSH candidate fan-out — the capacity-plan curve
      extra("candidates_b64r4")(
        ops.VectorOps.bandCandidatePairs(spark, emb, 64, 4).count())
      extra("candidates_b16r8")(
        ops.VectorOps.bandCandidatePairs(spark, emb, 16, 8).count())
      // q172's within-cluster candidate mass — must stay ~linear now that
      // seed count scales with the corpus (clusters ~256-bounded)
      extra("semdedup_candidates")(
        ops.VectorOps.semanticDedupCandidatePairs(spark, emb).count())
      // the DEGENERATE corpus axis (round-8 verdict task): q176/q183 on a
      // scaled corpus whose token vocab does NOT grow — the real sf0.1
      // table's saturated-gram-space shape, where inverted-index pair
      // mass is inherently ∝ n² (corpus semantics, not join shape)
      val degNames = Seq("q176_degenerate", "q176_degenerate_capped",
        "q183_degenerate", "q31_degenerate", "q31_degenerate_capped",
        "q415_degenerate_capped")
      if (!filtered || degNames.exists(only)) {
        val dDeg = java.nio.file.Paths.get("target", "tmp", s"scaleprobe_deg_x$m")
          .toAbsolutePath.toString
        genDocumentsDegenerate(spark, dDeg, m)
        // the EXACT (uncapped) twin — spec-only since the round-9
        // promotion of the capped form to the catalog; this row keeps
        // measuring the documented n² pair-set curve
        extra("q176_degenerate")(
          ops.PrepOps.q176ContainmentExact(spark, dDeg).count())
        // the stop-shingle guard (the CATALOG shape since round 9):
        // pair mass ≤ 25·postings — must be the linear curve the exact
        // twin above cannot have here
        extra("q176_degenerate_capped")(
          SparkEntry.queries("q176_containment")(spark, dDeg).count())
        extra("q183_degenerate")(
          SparkEntry.queries("q183_bpe_train")(spark, dDeg).count())
        // round-10 (verdict task 1): q31 inherits q176's guard — measure
        // the same exact-vs-capped twin pair on the saturated axis, plus
        // the incremental-ingest consumer that rides the same index
        extra("q31_degenerate")(
          ops.TextOps.q31NgramJaccardExact(spark, dDeg).count())
        extra("q31_degenerate_capped")(
          SparkEntry.queries("q31_ngram_jaccard")(spark, dDeg).count())
        extra("q415_degenerate_capped")(
          SparkEntry.queries("q415_incremental_dedup")(spark, dDeg).count())
      }
    }
    spark.stop()
  }
}
