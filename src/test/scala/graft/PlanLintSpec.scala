package graft

import org.apache.spark.sql.catalyst.expressions.{Divide, EqualNullSafe, EqualTo, Expression, Round}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Window}
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Catalog-wide plan lint: the whole-suite regression net for the class of
  * scale cliff the round-4 verdict flagged (q164/q107/q134 ran a global
  * rank window through ONE task). Every catalog query's OPTIMIZED plan is
  * swept for:
  *
  *   1. a Window with an empty partitionSpec (single-partition execution)
  *      whose input is NOT provably bounded (child.maxRows — a top-K limit
  *      bounds it; a full-table aggregate does not);
  *   2. a Join with no equi-key (Cartesian / broadcast-nested-loop
  *      territory) where NEITHER side is provably bounded.
  *
  * Documented bounded-grid cases are allowlisted BY NAME with the reason a
  * human can re-check; everything else is a hard failure, so a future
  * query re-introducing an unbounded single-partition window breaks the
  * build instead of surfacing in a judge round.
  *
  * Building a DataFrame only triggers analysis/optimization (no jobs) for
  * lazy queries; eager builders (streaming e2e, bucketed staging, the
  * iterative fixpoints) do their small sf0.001 work once here.
  */
class PlanLintSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** maxRows ≤ this counts as "bounded" (all catalog top-K cuts are ≤10k). */
  private val boundedRows = 10000L

  /** name → reason an empty-partitionSpec Window over a not-provably-
    * bounded input is still scale-safe there.
    */
  private val windowAllow: Map[String, String] = Map(
    "q429_interleave_audit" ->
      "q169's two-pass shape ×2: the exclusive prefix sums run over the 256-row md5-bucket total grids only; the per-row rank and run-id windows are partitioned by bucket",
    "q430_pack_purity" ->
      "q169's two-pass shape: the exclusive prefix sum runs over the 256-row md5-bucket token-total grid only; the per-row cumsum window is partitioned by bucket",
    "q432_dup_ingest_gap" ->
      "cumulative window runs over the log2 gap-bucket histogram — the CASE chain caps it at 41 rows, corpus-size-independent",
    "q433_block_size_sweep" ->
      "q169's two-pass shape: the exclusive prefix sum runs over the 256-row md5-bucket token-total grid only; the per-row cumsum window is partitioned by bucket",
    "q439_attention_contamination" ->
      "q169's two-pass shape: the exclusive prefix sum runs over the 256-row md5-bucket token-total grid only; the per-row cumsum window is partitioned by bucket",
    "q425_filter_overlap" ->
      "share denominator runs over the ≤ 8-row gate-combination census (2³ boolean cells) — domain-bounded, corpus-size-independent",
    "q164_skyline" ->
      "window runs over the per-frequency max grid — bounded by |distinct order counts|, not customers",
    "q112_budget_select" ->
      "prefix sum over the score-bucket histogram — floor(score*100) with score in [0,1] caps it at 101 rows",
    "q118_ks_test" ->
      "prefix sum over the price-bucket histogram (floor(v/50000)) — bounded by the price domain, not row count",
    "q167_cusum" ->
      "running sum/rank over the per-day revenue grid — bounded by the order-date calendar span, not orders",
    "q233_stl_decompose" ->
      "q167's case: the ±3-day moving-average window runs over the bounded per-day revenue grid, not orders",
    "q169_global_index" ->
      "exclusive prefix sum over the 257-row bucket-count grid (bucket = key div width, width = maxkey/256) — domain-bounded; the per-row rank window is partitioned by bucket",
    "q177_compaction_plan" ->
      "q169's two-pass shape: exclusive prefix sum over the 257-row bucket byte-total grid only; the per-file cumsum window is partitioned by bucket",
    "q193_exact_auc" ->
      "q169's two-pass shape: exclusive prefix sum over the 257-row score-bucket count grid; the per-row rank window is partitioned by bucket",
    "q232_conformal" ->
      "q169's two-pass shape: exclusive prefix sum over the 257-row residual-bucket count grid; the k-th-order-statistic rank window is partitioned by bucket",
    "q195_sorted_dict" ->
      "q169's two-pass shape on a string domain: exclusive prefix sum over the leading-character bucket grid (bounded by the alphabet); the per-token rank window is partitioned by bucket",
    "q237_kaplan_meier" ->
      "at-risk / survival cum windows run over the distinct-duration DAY grid — bounded by the calendar span of the log, not by users or events",
    "q241_isotonic_calibration" ->
      "prefix sum over the 50-row score-bin grid (floor(p*50), p in [0,1]) — domain-bounded; the minimax running-min window is partitioned by interval start j",
    "q245_ewma_forecast" ->
      "row_number over the per-day revenue grid — bounded by the order-date calendar span (q167/q233's case); the convolution join is equi on the day rank",
    "q249_quantile_normalize" ->
      "prefix sum over the distinct-document-length grid — bounded by the length domain, not the corpus; the per-source cum window is partitioned by source",
    "q258_learning_curve" ->
      "prefix sums over the 10-row hash-decile bucket grid — bounded by construction, not by lineitem",
    "q261_mann_whitney" ->
      "prefix sum over the 50-value quantity grid — bounded by the discrete feature domain, not lineitem",
    "q265_pr_curve" ->
      "suffix/total sums over the 50-row score-bin grid (floor(p*50), p in [0,1]) — domain-bounded, not event-count",
    "q271_gains_chart" ->
      "q169's two-pass shape descending: exclusive prefix sum over the 50-row score-bin grid + cum sums over the 10-row decile grid; the per-row rank window is partitioned by bin",
    "q272_sorted_neighborhood" ->
      "q169's two-pass shape on a string domain: exclusive prefix sum over the name-prefix-12 bucket grid (domain-bounded); the per-name rank window is partitioned by bucket",
    "q277_join_estimate" ->
      "worst-bucket rank over the 256-row key-range bucket grid — bounded by construction, not by either join side",
    "q266_voptimal_hist" ->
      "rank + prefix sums over the distinct-quantity value grid — bounded by the 50-value feature domain, not lineitem",
    "q285_packed_blocks" ->
      "q169's two-pass shape: exclusive prefix sum over the 257-row doc_id-range bucket grid only; the per-doc offset window is partitioned by bucket",
    "q292_changepoint_binseg" ->
      "rank + prefix sum over the per-day revenue grid — bounded by the order-date calendar span (q167/q233's class); all candidate scans are grid-sized",
    "q299_curation_v2" ->
      "q169's two-pass shape (q285's instance): exclusive prefix sum over the 257-row doc_id-range bucket grid only; the per-doc offset window is partitioned by bucket",
    "q303_acf" ->
      "row_number over the per-day order-count grid — bounded by the order-date calendar span (q167/q233's class); the lag expansion is a 14-row broadcast with an equi-join on the day index",
    "q305_sax_motifs" ->
      "ntile over the per-day revenue grid — bounded by the order-date calendar span (q167/q233's class); everything downstream is grid-sized",
    "q307_neyman_allocation" ->
      "largest-remainder rank over the market-segment stratum grid — bounded by the segment domain (5), not customers",
    "q308_rr_debias" ->
      "index rank over the distinct-language domain grid (q119's marginal class) — bounded by |langs|, not the corpus",
    "q310_theil_sen" ->
      "q169's two-pass shape on the slope histogram: exclusive prefix sum over the 1/4096-granular slope-bucket grid (bounded by the slope domain), then an in-bucket rank over the ONE picked bucket (≈ pair-set/|buckets| rows) — the pair set itself is calendar-grid-bounded and corpus-size-independent",
    "q311_mann_kendall" ->
      "row_number over the per-day order-count grid (q303's window in the shared dailyPairs helper) — bounded by the order-date calendar span",
    "q314_segmented_trend" ->
      "rank + prefix sum over the per-day revenue grid — q292's exact class (calendar-bounded); candidate scans are grid-sized",
    "q320_kendall_tau" ->
      "row_number over the per-day (count, avg-cent) grid — q303/q311's calendar-bounded class",
    "q322_systematic_pps" ->
      "q169's two-pass shape: exclusive prefix sum over the 257-row suppkey-range bucket grid only; the per-supplier cumulative window is partitioned by bucket",
    "q328_serpentine_shards" ->
      "q169's two-pass shape on the VALUE histogram: exclusive prefix sum over the distinct-n_chars size grid (domain-bounded); the within-size rank window is partitioned by size",
    "q333_mase_backtest" ->
      "row_number + lag windows over the per-day order-count grid — q167/q303's calendar-bounded class",
    "q336_vocab_coverage" ->
      "cum sums over the count-of-counts frequency grid — bounded far below the corpus (q302's class)",
    "q339_cross_correlation" ->
      "row_number over the per-day (count, revenue) grid — q167/q303's calendar-bounded class; the lag expansion is the grid × a provably-8-row range",
    "q341_kruskal_wallis" ->
      "q169's two-pass shape on the VALUE histogram: exclusive prefix sum over the distinct-balance-cents grid only (q328's class); ranks join back equi on the cent value",
    "q344_ewma_bands" ->
      "row_number over the per-day order-count grid — q167/q303's calendar-bounded class; both EWMA passes are the grid × a provably-23-row broadcast lag range",
    "q349_granger_lite" ->
      "row_number over the per-day (count, revenue) grid — q339's calendar-bounded class; the lag pairing is one equi-join on the shifted index",
    "q353_energy_distance" ->
      "q169's two-pass shape on the VALUE histogram: four prefix sums over the distinct-balance-cents grid only (q341's class); everything else is hash aggregates",
    "q356_median_ci" ->
      "q169's two-pass shape on the VALUE histogram: one cumulative window over the distinct-balance-cents grid only (q341's class); the rank probes are a 4-row broadcast",
    "q334_siegel_slope" ->
      "row_number over the calendar-day grid and the outer median rank over ≤ 730 per-day medians — q310's calendar-bounded class; the inner median rank is partitioned by day",
    "q359_runs_test" ->
      "median rank + sign-change lag over the per-day revenue grid — q167/q303's calendar-bounded class; orders collapse to the day grid before any window",
    "q363_jonckheere" ->
      "per-group strictly-less prefix sums over the pooled latency-day grid — bounded by the calendar-span latency domain, not rows (replaced the histogram pair join after the 24k-cell bench regression)",
    "q364_t_closeness" ->
      "global cum window over the ≤11-row $1000 balance-band grid (cents div 100000 with acctbal in [-1000, 10000]) — domain-bounded; the per-group cum window is partitioned by QI group",
    "q373_cvm_test" ->
      "two prefix sums over the 50-value quantity grid — q261's domain-bounded class; the corpus collapses to the histogram first",
    "q379_rank_stability" ->
      "rank windows over the ≤2k-row union of two LIMIT-k supplier cuts (k = 100 by construction) — corpus-size-independent after the per-supplier aggregate",
    "q380_pot_census" ->
      "p90 rank probe + island lag/cum windows over the per-day order-count grid — q167/q303's calendar-bounded class",
    "q385_hampel_filter" ->
      "±3-day collect_list window over the per-day order-count grid — q167/q303's calendar-bounded class; all scoring is row-local array sorting",
    "q386_oov_audit" ->
      "descending cum window over the count-of-counts frequency grid — bounded far below the corpus (q302/q336's class)",
    "q397_tail_amplification" ->
      "one cum window over the latency-day grid — bounded by the calendar-span latency domain (q363's class); the squaring chain is row-local",
    "q398_km_bands" ->
      "q237's exact allowlisted shape: at-risk/survival/Greenwood cum windows over the distinct-duration DAY grid — calendar-bounded, not user- or event-bounded",
    "q404_growth_accounting" ->
      "one lag over the ~25-row month grid (calendar-bounded, q167's class); all customer-level work is hash joins/aggregates",
    "q405_abc_classification" ->
      "descending cum window over the $100 revenue-band grid — bounded by the price domain (q118's class), not by parts")

  /** name → reason a no-equi-key join is still scale-safe there. */
  private val joinAllow: Map[String, String] = Map(
    "q424_nprobe_curve" ->
      "bounded-grid joins by construction: the probe frame is |queries| (vec_id < 5) × rn ≤ 4 cells crossed with the 3-row nprobe grid — every non-equi side is corpus-size-independent; candidate fan-out rides the equi-join on cell",
    "q428_lsh_bucket_forecast" ->
      "broadcast 4-row minhash-index grid crossed with the shingle stream — the grid is a fixed signature dimension (k = 4), corpus-size-independent",
    "q440_cap_recall_frontier" ->
      "broadcast 1-row reference side by construction: the cap-50 row filtered from the 4-row cap grid aggregate, crossed back onto that same 4-row grid",
    "q436_minhash_width_audit" ->
      "broadcast 16-row minhash-index grid crossed with the shingle stream (q428's shape at k = 16) plus the broadcast 1-row pair total — both non-equi sides are corpus-size-independent",
    "q232_conformal" ->
      "broadcast 1-row sides by construction: the (n_cal, k, max) aggregate, the rank-k bucket row, and the single q-hat order statistic — q169's two-pass rank then joins back equi on bucket",
    "q237_kaplan_meier" ->
      "broadcast 1-row side by construction: the (study-end, total-users) global aggregate joined onto per-user durations",
    "q241_isotonic_calibration" ->
      "50×50 interval-grid self-join of the bounded score-bin table (k >= j range condition) — both sides are 50-row aggregates by construction, corpus-size-independent",
    "q248_silhouette" ->
      "broadcast(8 seed centroids) cross join — k rows by construction (q172's assignment pass); everything downstream is per-vector arithmetic",
    "q249_quantile_normalize" ->
      "bounded-grid range lookups: broadcast 1-row global total, then (|sources|·9 decile probes) × distinct-length grid with cum >= rank — both sides domain-bounded aggregates, corpus-size-independent",
    "q250_incremental_sessions" ->
      "broadcast 1-row side by construction: the (min, max) span aggregate that derives the batch split point",
    "q251_ndcg" ->
      "broadcast(5 query vectors) cross join — k rows by construction (q229's one-pass eval shape); the rank window is partitioned by query",
    "q253_cascade_delete" ->
      "cross joins of 1-row count aggregates by construction (the per-table before/after/orphan stats row)",
    "q254_shapley_attribution" ->
      "16-row subset-lattice joins by construction ((mask & s) = mask closure and the channel-pair grid) — both sides are 2^k-bounded aggregates, corpus-size-independent",
    "q257_split_leakage" ->
      "broadcast 1-row side by construction: the total-pair-count aggregate for the percentage column",
    "q259_acquisition" ->
      "broadcast(8 seed centroids) cross join — k rows by construction (q172's assignment pass); the acquisition rank window is partitioned by cluster",
    "q262_csv_malformed" ->
      "cross join of two 1-row aggregates by construction (the permissive and dropmalformed count rows)",
    "q263_embedding_drift" ->
      "broadcast 1-row side by construction: the max-vec-id aggregate that derives the cohort split",
    "q266_voptimal_hist" ->
      "bounded 50×50 index-grid DP joins (e > s range condition) and broadcast 1-row backtrack rows — all sides are value-domain aggregates, corpus-size-independent",
    "q267_cuped" ->
      "broadcast 1-row side by construction: the (min, max) span aggregate that derives the pre/post midpoint",
    "q271_gains_chart" ->
      "broadcast 1-row side by construction: the (n_all, pos_all) totals joined onto the ranked rows",
    "q273_lsh_planner" ->
      "broadcast 4-row (bands, rows) config grid crossed with the 20-bin similarity histogram — both sides bounded by construction",
    "q276_layout_effectiveness" ->
      "broadcast 1-row bounds and 5-row probe grids by construction (q142's normalize pattern); the probe lookups are equi-joins on the probed value",
    "q277_join_estimate" ->
      "broadcast 1-row max-key aggregate by construction (the range-bucket width); everything else is equi-joined bucket grids",
    "q110_kmeans" ->
      "broadcast(centroids) cross join — k rows by construction (Lloyd assignment pass)",
    "q45_ann_ivf" ->
      "broadcast(IVF centroid list) cross joins — nlist rows by construction (coarse-quantizer probe)",
    "q119_association" ->
      "contingency densification — both sides are distinct-category marginals (|langs| × |sources|), corpus-size-independent",
    "q72_fuzzy_match" ->
      "documented all-pairs BASELINE twin over the distinct-name vocabulary (broadcast side is the vocabulary, not the fact table); q105 is the blocked scale path with the same oracle",
    "q172_semantic_dedup" ->
      "broadcast(k = max(8, n div 256) seed centroids) cross joins — the 1-row count that derives k, then the seed set (~n/256 rows, 256-bounding every cluster); assignment is row-local dot products and pair generation itself is the banded equi-join keyed on (cluster, band, bucket)",
    "q212_embedding_outliers" ->
      "broadcast(8 seed centroids) cross join — k rows by construction (q172's assignment pass); the stats join-back is an equi-join on cluster",
    "q213_ivfpq_search" ->
      "broadcast(8 IVF seed centroids) cross joins — k rows by construction (coarse assignment + query probe, q45's pattern); candidate scoring is an equi-join on the list id and the 48-row broadcast ADC LUT",
    "q217_rvq_encode" ->
      "broadcast(4-codeword codebook) cross joins per RVQ stage — k rows by construction (q110's Lloyd assignment pass); residual join-back is an equi-join on code/vec_id",
    "q220_source_similarity" ->
      "pair expansion joins each source's 64-row KMV sketch against the broadcast distinct-source list (~|sources| rows, q119's marginal pattern) — corpus-size-independent after the one tokenize+distinct pass",
    "q310_theil_sen" ->
      "i<j self-join of the calendar-day grid — ≤ 730²/2 pairs by construction (q266's bounded-grid DP class), corpus-size-independent after the daily aggregate",
    "q311_mann_kendall" ->
      "q310's calendar-grid pair join (shared dailyPairs helper) — ≤ 730²/2 pairs by construction, corpus-size-independent after the daily aggregate",
    "q318_mrr_eval" ->
      "broadcast(20 query vectors) cross join — q251's one-pass eval shape; the rank window is partitioned by query",
    "q320_kendall_tau" ->
      "q310's calendar-grid pair join — ≤ 730²/2 pairs by construction, corpus-size-independent after the daily aggregate",
    "q331_dedup_saturation" ->
      "broadcast 4-row threshold grid by construction (explode of a sequence(1,4) over the 1-row min/max aggregate) crossed onto both count sides",
    "q334_siegel_slope" ->
      "q310's calendar-grid pair join (j ≠ i variant) — ≤ 730² pairs by construction, corpus-size-independent after the daily aggregate",
    "q336_vocab_coverage" ->
      "broadcast 3-row target grid by construction (explode over the 1-row token-total aggregate) crossed onto the count-of-counts grid — q331's class",
    "q347_friedman" ->
      "day×type grid densification — distinct-calendar-days × broadcast distinct-event-types (q119's contingency class); the rank window is partitioned by day over k rows",
    "q348_source_divergence" ->
      "20-row source-totals marginal cross (q220's pattern) — both sides distinct-source aggregates, corpus-size-independent; the per-word pair expansion is an equi-join on the word",
    "q354_fano_dispersion" ->
      "day×type grid densification — distinct-calendar-days × broadcast distinct-event-types (q347's class); two hash aggregates after",
    "q356_median_ci" ->
      "bounded-grid range lookup (q249/q331's class): a 4-row rank list (explode over the 1-row total aggregate) probed against the distinct-cents cumulative grid",
    "q364_t_closeness" ->
      "125-row QI grid × ≤11-row band grid densification (q119's contingency class) plus broadcast 1-row totals — every no-equi side is a domain-bounded aggregate",
    "q367_isotonic" ->
      "a<=b self-join of the ≤101-row score-bin grid and the ≤171k-row minimax range join onto it — all sides bounded by floor(p*100) in [0,100] by construction (q241/q266's bounded-grid DP class)",
    "q379_rank_stability" ->
      "sk<sk self-join of the ≤200-row top-k union grid (two LIMIT-100 cuts by construction) plus a broadcast 1-row midpoint aggregate — corpus-size-independent pair set",
    "q380_pot_census" ->
      "broadcast 1-row sides by construction: the day-count aggregate, the single p90 rank-probe row, and the final census × threshold join — all on the calendar grid",
    "q411_label_margin" ->
      "broadcast(|labels| centroid vectors) cross join — the label domain by construction (q110/q212's assignment class); margins and aggregates are equi-keyed",
    "q413_truncation_audit" ->
      "broadcast 3-row cut grid by construction (explode of a 3-literal array — q331's threshold-grid class) crossed onto row-local token counts",
    "q414_threshold_sensitivity" ->
      "broadcast 5-row threshold grid (explode of a 5-literal array) and the broadcast 1-row base count — q331's threshold-grid class over the once-checkpointed pair set",
    "q419_vocab_growth" ->
      "broadcast 4-row eighths grid (explode of a 4-literal array) × the broadcast 1-row id-bounds aggregate, range-filtered against the token stream — q413's cut-grid class; every no-equi side is ≤ 4 rows by construction",
    "q420_padding_audit" ->
      "broadcast 3-row cap grid (explode of a 3-literal array) against the per-doc token counts — q413's cut-grid class, ≤ 3 rows by construction",
    "q421_cap_pricing" ->
      "broadcast 4-row cap grid (explode of a 4-literal array) against the shingle-df histogram — q413's cut-grid class, ≤ 4 rows by construction",
    "q384_ring_balance" ->
      "clockwise-next range join against the broadcast 128-row vnode ring (8 nodes × 16 vnodes by construction, data-independent) — ×128 candidate rows per key collapsed by the per-key min, linear in keys")

  private def bounded(p: LogicalPlan): Boolean = p.maxRows.exists(_ <= boundedRows)

  private def hasEquiKey(j: Join): Boolean = j.condition.exists { c =>
    def sides(l: org.apache.spark.sql.catalyst.expressions.Expression,
              r: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
      (l.references.subsetOf(j.left.outputSet) && r.references.subsetOf(j.right.outputSet)) ||
        (r.references.subsetOf(j.left.outputSet) && l.references.subsetOf(j.right.outputSet))
    c.collect {
      case EqualTo(l, r) if sides(l, r) => true
      case EqualNullSafe(l, r) if sides(l, r) => true
    }.nonEmpty
  }

  test("no catalog query plans an unbounded single-partition window or an unbounded cross join") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.optimizedPlan
        val badWindows = plan.collect {
          case w: Window if w.partitionSpec.isEmpty && !bounded(w.child) => w
        }.filter(_ => !windowAllow.contains(name))
          .map(w => s"$name: single-partition Window over unbounded input:\n  ${w.simpleString(3)}")
        val badJoins = plan.collect {
          case j: Join if !hasEquiKey(j) && !bounded(j.left) && !bounded(j.right) => j
        }.filter(_ => !joinAllow.contains(name))
          .map(j => s"$name: no-equi-key join with both sides unbounded:\n  ${j.simpleString(3)}")
        badWindows ++ badJoins
      } catch {
        case e: Throwable => Seq(s"$name: failed to build plan: ${e.getMessage}")
      }
    }
    assert(violations.isEmpty, violations.mkString("\n\n"))
  }

  // --------------------------------------------------------------------------
  // SortAggregate-over-raw-scan lint (round-13 promotion of the PlanScan
  // triage tool — the q32 post-mortem cliff, SURVEY §8.26): an aggregate
  // whose buffer is var-length (STRING/STRUCT/ARRAY mins, collect_list)
  // is not UnsafeRow-mutable, so Spark silently plans SortAggregate —
  // a FULL SORT of the aggregate's input stream per partial. Over a
  // bounded frame (a post-aggregate grid, a LIMIT cut) that is a chosen,
  // cheap shape; over a raw-table-sized scan it is a measured multi-
  // second cliff that nothing else reports (results stay correct). The
  // rule: no SortAggregate may consume a file scan with no intervening
  // aggregate/limit boundary. Allowlist BY NAME with a rationale a human
  // can re-check, like the window/join lints above.

  /** name → reason a SortAggregate directly over a raw scan is still
    * scale-safe there. Context for every entry: a SortAggregate is a
    * PER-PARTITION sort by the grouping key feeding a streaming
    * aggregate — O(n log n) partition-local, NO extra shuffle — so it
    * scales near-linearly; what made q32 a 6 s cliff was 32 separate
    * wide-STRING min buffers over a 16×-exploded digest stream. The
    * entries below are single-buffer shapes measured at ≤1.6 s total
    * query time at sf0.1 (BENCH_FULL_r12), each with no cheaper
    * equivalent: a one-pass argmax via min/max(struct) beats both a
    * window (same sort PLUS a full shuffle) and a two-pass self-join.
    */
  private val sortAggAllow: Map[String, String] = Map(
    "q110_kmeans" -> "one-pass nearest-centroid argmax: max(struct(csim, cluster)) per vector — the struct is 2 numerics; alternatives (window/join) cost a full shuffle of the same stream",
    "q116_contrastive_pairs" -> "hard-positive/negative argmax per anchor: two max(struct) buffers over the candidate stream — same one-pass-argmax class as q110",
    "q172_semantic_dedup" -> "nearest-centroid argmax per vector ×4 stages (iterative assignment) — q110's class",
    "q196_cdc_apply" -> "last-writer-wins via max_by(struct(op, price), seq) per key — CDC apply is one pass by construction; the buffer is one op string + a decimal",
    "q205_pq_encode" -> "per-(vector, subspace) nearest-codeword argmin via min(struct(d2, code)) — q110's class on the PQ grid",
    "q212_embedding_outliers" -> "nearest-centroid argmax ×2 stages — q110's class",
    "q213_ivfpq_search" -> "IVF cell argmin + per-subspace codeword argmin — q110's class; probing already cut the stream to the nprobe fraction",
    "q259_acquisition" -> "nearest-centroid argmax — q110's class",
    "q319_peak_concurrency" -> "argmax-of-cumsum via max(struct(cum, -t)) over the per-day delta stream — one pass over a calendar-keyed frame",
    "q37_fingerprint" -> "ONE md5 min per doc where the hex digest IS the output fingerprint (contract with the oracle) — 0.27 s at sf0.1; q32's cliff was 32 such buffers over a 16×-wider stream",
    "q384_ring_balance" -> "ring successor argmin via min(struct(pos, node)) per key position — one pass over the hash-ring grid",
    "q38_profile" -> "column profiler: min/max over STRING columns is the operator's semantics (profiling l_linestatus etc.); one pass, no alternative without losing the string stats",
    "q428_lsh_bucket_forecast" -> "4 minhash STRING mins whose hex values feed downstream md5 band signatures (oracle contract keeps them strings) — 0.36 s at sf0.1, 1/8 of q32's pre-fix buffer width",
    "q45_ann_ivf" -> "nearest-cell argmax over the probe stream — q110's class",
    "q63_stream_dedup" -> "first-value dedup semantics per event_id: first(event_type)/first(value) buffers — FIRST is the operator's contract (keep the earliest row), one pass",
    "q68_argmax" -> "max_by/min_by(priority STRING, packed bigint) per customer — the argmax target is a string by contract; the packed-int ordering key already avoids a struct comparison",
    "q93_scd2" -> "first(priority) per (customer, island) — SCD2 island collapse takes the first row's attributes by contract, one pass",
    "q291_data_profile" -> "generic data profiler: min/max over every column INCLUDING strings is the semantics — q38's class")

  test("no catalog query plans a SortAggregate directly over a raw file scan (the q32 buffer cliff)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.execution.{FileSourceScanExec, GlobalLimitExec, LocalLimitExec, TakeOrderedAndProjectExec}
    // walk down from a SortAggregate; an aggregate or limit boundary
    // bounds the stream (its output is groups/k rows, not the raw data)
    def rawScanReachable(p: SparkPlan): Boolean = p match {
      case _: HashAggregateExec | _: ObjectHashAggregateExec | _: SortAggregateExec => false
      case _: GlobalLimitExec | _: LocalLimitExec | _: TakeOrderedAndProjectExec => false
      case _: FileSourceScanExec | _: BatchScanExec => true
      case other => other.children.exists(rawScanReachable)
    }
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        plan.collectWithSubqueries {
          case s: SortAggregateExec if s.children.exists(rawScanReachable) => s
        }.filter(_ => !sortAggAllow.contains(name))
          .map(s => s"$name: SortAggregate consumes a raw file scan (var-length buffer demoted the HashAggregate):\n  ${s.simpleString(3)}")
      } catch {
        case e: Throwable => Seq(s"$name: failed to build plan: ${e.getMessage}")
      } finally ops.Checkpoints.releaseAll(spark)
    }
    assert(violations.isEmpty, violations.mkString("\n\n"))
  }

  // --------------------------------------------------------------------------
  // Forced-array-broadcast lint (round-13 promotion of the q32 advice
  // item to a catalog-wide rule): an EXPLICIT broadcast() hint on a
  // frame that carries ARRAY columns (shingle sets, embeddings) AND is
  // fed by a raw-table stream pins the build side regardless of runtime
  // size — the frame that OOMs the driver exactly when an upstream
  // pruning assumption degrades. A PLANNER-chosen broadcast is exempt:
  // it adapts to statistics and simply stops broadcasting at scale.
  // Healthy hinted plans broadcast slim keys (q32/q447/q448's pair-key
  // discipline) or frames k-bounded by construction — the latter are
  // allowlisted by name with the bound written down.

  /** name → the construction bound that keeps a hinted array broadcast
    * k-sized at any corpus size.
    */
  private val arrayBroadcastAllow: Map[String, String] = Map(
    "q40_cosine_topk" -> "query side = vec_id < 5 (fixed 5-vector query set) — broadcasting the query set IS the brute-force-baseline design",
    "q44_cosine_topk_native" -> "q40's query set (vec_id < 5) through the native expression path",
    "q42_ann_lsh" -> "query side = vec_id < 5 exploded onto its multi-probe buckets — ≤ 5 × probes rows",
    "q45_ann_ivf" -> "query side = vec_id < 5 with their nprobe cell probes",
    "q104_cosine_neardup_lsh" -> "bucketed candidate key frame + the fixed (bands × planes) hyperplane matrix — both bounded by the LSH config, not the corpus",
    "q116_contrastive_pairs" -> "anchor side = vec_id < 8 fixed anchor set",
    "q172_semantic_dedup" -> "centroid frame = k seed/updated centroids (k fixed by the operator config)",
    "q212_embedding_outliers" -> "centroid frame = k centroids",
    "q213_ivfpq_search" -> "IVF cell centroids + PQ codebooks — (ncells + subspaces × 256) rows by config",
    "q229_matryoshka_eval" -> "query side = vec_id < 5 at each prefix width",
    "q248_silhouette" -> "per-label centroid frame — |labels|-bounded",
    "q251_ndcg" -> "query side = vec_id < 5",
    "q259_acquisition" -> "centroid frame = k centroids",
    "q280_int8_quant" -> "query vector + quantization bounds frames — 1-row/k-row by construction",
    "q318_mrr_eval" -> "query side = vec_id < 5",
    "q443_maxsim_retrieval" -> "query side = 4 fixed multi-vector queries (doc_id < 4), each a bounded token matrix",
    "q444_ann_maxsim_rerank" -> "q443's fixed query side through the two-stage path")

  test("no catalog query FORCE-broadcasts an array-carrying raw-table stream (the q32 advice class)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LocalLimit, LogicalPlan}
    import org.apache.spark.sql.types.ArrayType
    def rawScanReachable(p: LogicalPlan): Boolean = p match {
      case _: Aggregate | _: GlobalLimit | _: LocalLimit => false
      case l if l.children.isEmpty =>
        // file relations only — checkpointed LogicalRDDs are operator
        // intermediates whose bounds the producing operator owns
        l.getClass.getSimpleName.contains("Relation")
      case other => other.children.exists(rawScanReachable)
    }
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.optimizedPlan
        plan.collect {
          case j: Join =>
            val sides = Seq(
              (j.hint.leftHint, j.left), (j.hint.rightHint, j.right))
            sides.collect {
              case (Some(h), side)
                if h.strategy.exists(_.toString.contains("broadcast")) &&
                  side.output.exists(_.dataType.isInstanceOf[ArrayType]) &&
                  rawScanReachable(side) => side
            }
        }.flatten
          .filter(_ => !arrayBroadcastAllow.contains(name))
          .map(s => s"$name: broadcast HINT on an array-carrying raw-table stream " +
            s"(${s.output.filter(_.dataType.isInstanceOf[ArrayType]).map(_.name).mkString(",")}):\n  ${s.simpleString(3)}")
      } catch {
        case e: Throwable => Seq(s"$name: failed to build plan: ${e.getMessage}")
      } finally ops.Checkpoints.releaseAll(spark)
    }
    assert(violations.isEmpty, violations.mkString("\n\n"))
  }

  // --------------------------------------------------------------------------
  // Round-of-double lint (§8.4 portability policy). ROUND(x, n) of a
  // DOUBLE is NOT portable across engines: Spark routes the double
  // through BigDecimal HALF_UP while C-library engines round the scaled
  // double, so when the true value sits within an ulp of a 10^-n·(k+½)
  // boundary the two disagree on the last digit and the driver's hash
  // flips. This class failed q136/q249/q263 in earlier rounds and
  // q265/q266 in round 7 — four separate fixes later it becomes a
  // compile gate: every hashed decimal-truncation must go through
  // Num.pround (floor(x·10ⁿ+0.5)/10ⁿ — pure IEEE ops + floor, identical
  // in every engine) or exact integer/decimal arithmetic. Round over
  // DECIMAL input is exact decimal arithmetic and stays legal. The
  // allowlist is EMPTY by design; a new entry needs a written proof that
  // the rounded value grid is provably far from every boundary.

  /** name → reason a Round-over-double output is still hash-stable. */
  private val roundDoubleAllow: Map[String, String] = Map()

  private def roundOfDouble(e: Expression): Boolean = e match {
    case r: Round =>
      r.child.dataType == DoubleType || r.child.dataType == FloatType
    case _ => false
  }

  test("no catalog query ROUNDs a double into its output — Num.pround or exact arithmetic only (§8.4)") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.analyzed
        plan.flatMap(node => node.expressions.flatMap(_.collect {
          case e if roundOfDouble(e) => e
        })).filter(_ => !roundDoubleAllow.contains(name))
          .map(e => s"$name: ROUND of a double (engine-dependent last digit — use Num.pround):\n  ${e.sql}")
      } catch {
        case e: Throwable => Seq(s"$name: failed to build plan: ${e.getMessage}")
      }
    }
    assert(violations.isEmpty, violations.mkString("\n\n"))
  }
}
