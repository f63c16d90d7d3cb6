package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan assertions: the scale properties claimed in the operator
  * Scaladocs must actually appear in the plans (predicate pushdown, column
  * pruning, broadcast choices, TakeOrderedAndProject, partial aggregation,
  * whole-stage codegen).
  */
class PlanSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q02: filters and projection push into the parquet scan") {
    val p = plan(Relational.q02Filter(spark, dir))
    assert(p.contains("PushedFilters"), p)
    assert(p.matches("(?s).*PushedFilters: \\[.*GreaterThan\\(l_quantity.*"), p)
    // pruned read schema: only the 5 referenced columns, not all 11
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("l_orderkey") && !readSchema.contains("l_shipdate"), readSchema)
  }

  test("q03: nation joins via BroadcastHashJoin") {
    val p = plan(Relational.q03Join(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q10: global top-k plans TakeOrderedAndProject, not a full sort") {
    val p = plan(Relational.q10GlobalTopk(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q01: hash aggregation is two-phase (map-side partial before the shuffle)") {
    val p = plan(Relational.q01Agg(spark, dir))
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_"), p) // partial aggregate functions upstream of Exchange
  }

  test("q05/q06: semi and anti joins plan as such") {
    assert(plan(Relational.q05SemiJoin(spark, dir)).contains("LeftSemi"))
    assert(plan(Relational.q06AntiJoin(spark, dir)).contains("LeftAnti"))
  }

  test("q20: tiny band table joins as broadcast nested loop (range predicate)") {
    val p = plan(Relational.q20RangeJoin(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q21 as-of join: single shuffle on the union timeline, no nested-loop join") {
    val p = plan(Relational.q21AsofJoin(spark, dir))
    assert(!p.contains("NestedLoop"), p)
    assert(p.contains("Window"), p)
    // exactly one exchange feeding the window (hashpartitioning on uid)
    val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 2, s"expected <=2 exchanges (window + final sort), got $exchanges\n$p")
  }

  // (formatted mode hides WholeStageCodegen under AdaptiveSparkPlan before
  // execution — codegen mode prints the actual generated subtrees.)
  private def codegenPlan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("codegen"))

  test("whole-stage codegen covers the q01 aggregation pipeline") {
    val p = codegenPlan(Relational.q01Agg(spark, dir))
    assert(p.contains("WholeStageCodegen"), p.take(500))
  }

  test("q44 native cosine expression compiles into a whole-stage codegen subtree") {
    val df = RelationalExt.q44CosineTopkNative(spark, dir)
    df.collect() // materialize THIS queryExecution so AQE finalizes it
    val executed = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan tree; the
    // projection computing cosine_sim must carry one
    val cosLine = executed.linesIterator.find(_.contains("cosine_sim")).getOrElse("")
    assert(cosLine.contains("*("), s"cosine projection not codegen'd: $cosLine")
    // and the expression never degrades to interpreted fallback
    assert(!classOf[org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]
      .isAssignableFrom(classOf[graft.functions.CosineSimilarity]))
  }

  test("events scan reads nanos as long exactly once (no double-apply of the conversion)") {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType.typeName === "timestamp")
  }

  test("q68 argmax plans as a single-pass hash aggregate — no Window, no self-join") {
    val p = plan(RelationalMore.q68ArgMax(spark, dir))
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_"), p) // map-side partial max_by/min_by
  }

  test("q53 date spine joins broadcast (spine side is aggregate-bounded)") {
    val p = plan(RelationalMore.q53DateSpine(spark, dir))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q67 merge anti-join shuffles/broadcasts on the merge key only") {
    val p = plan(RelationalMore.q67MergeUpsert(spark, dir))
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("Union"), p)
  }

  test("join strategy hints are honored: shuffle_hash and merge override the planner") {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_totalprice")
    val hashed = li.join(ord.hint("shuffle_hash"),
      li("l_orderkey") === ord("o_orderkey"))
    assert(plan(hashed).contains("ShuffledHashJoin"), plan(hashed))
    val merged = li.join(ord.hint("merge"),
      li("l_orderkey") === ord("o_orderkey"))
    assert(plan(merged).contains("SortMergeJoin"), plan(merged))
  }

  test("q72 fuzzy match pairs the vocabulary, not the fact table") {
    val df = TextOps.q72FuzzyMatch(spark, dir)
    val p = plan(df)
    // the pair join input is the DISTINCT-projected name vocabulary: both
    // sides aggregate before the nested-loop pairing
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.split("BroadcastNestedLoopJoin")(0).contains("HashAggregate") ||
      p.contains("HashAggregate"), p)
  }

  test("q93 SCD2: windows and island aggregate reuse one hashpartitioning(custkey) shuffle") {
    val p = plan(RelationalMore.q93Scd2(spark, dir))
    // formatted mode prints each Exchange's partitioning in its Arguments
    // detail line; the only non-range exchange must be the custkey one
    val hashEx = "hashpartitioning\\(".r.findAllIn(p).size
    assert(hashEx === 1, s"expected one data shuffle, got $hashEx:\n$p")
  }

  test("q100 pipeline composes into one plan with two data shuffles (dedup window + final agg)") {
    val p = plan(CorpusOps.q100Pipeline(spark, dir))
    val hashEx = "hashpartitioning\\(".r.findAllIn(p).size
    assert(hashEx <= 2, s"expected <=2 data shuffles, got $hashEx:\n$p")
  }

  test("single-lineage corpus queries scan the corpus once (no join-back re-scan)") {
    // guards the §8.5 lesson: a derived aggregate joined back re-scans the
    // corpus because Catalyst does not reuse common subplans
    val expected = Seq(
      // df via window, one explode + a doc_id-pruned scalar-count scan
      // (corpus size folded into the lazy plan; was an eager driver
      // count() job, i.e. the same scan as a separate job)
      (TextOps.q65TfIdf(spark, dir), 2),
      (CorpusOps.q87Boilerplate(spark, dir), 1),  // gram df via window
      (CorpusOps.q97UnigramLm(spark, dir), 2))    // one explode + no-explode total
    for ((df, maxScans) <- expected) {
      val p = plan(df)
      // formatted mode lists every node twice (tree + numbered details);
      // count only the "(n) Scan parquet" detail headers
      val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
      assert(scans <= maxScans, s"expected <=$maxScans scans, got $scans:\n$p")
    }
  }

  test("q104 bucketed near-dup plans only equi-joins — no all-pairs nested loop") {
    val p = plan(VectorOps.q104CosineNearDupLsh(spark, dir))
    // the baseline twin q49 is a BroadcastNestedLoopJoin by construction;
    // the scale path must never be — candidates come from a (band, bucket)
    // equi-join and vectors from id-keyed equi-joins
    assert(!p.contains("NestedLoop"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Join"), p)
  }

  test("q105 blocked fuzzy match plans only equi-joins — no all-pairs nested loop") {
    val p = plan(TextOps.q105FuzzyBlocked(spark, dir))
    // q72 is the nested-loop baseline twin; the blocked path's candidate
    // joins are equi (gram+occurrence inverted index / probed length pair)
    assert(!p.contains("NestedLoop"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("row-local corpus ops (redact/chunk/split) shuffle only for the output sort") {
    for (df <- Seq(CorpusOps.q85PiiRedact(spark, dir),
                   CorpusOps.q88Chunk(spark, dir),
                   CorpusOps.q90Split(spark, dir))) {
      val p = plan(df)
      // the operator itself is map-side; the only exchange allowed is the
      // rangepartitioning that implements the deterministic ORDER BY
      assert(!p.contains("hashpartitioning"), p)
    }
  }

  test("q109 weighted sample plans TakeOrderedAndProject — key assignment is map-side") {
    val p = plan(PipelineOps.q109WeightedSample(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p)
    // no shuffle before the top-k: keys are row-local over the scan
    assert(!p.contains("hashpartitioning"), p)
  }

  test("q106 decontamination broadcasts the eval-gram side") {
    val p = plan(PipelineOps.q106Decontaminate(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
  }

  test("q110 k-means assignment joins broadcast centroids — base table never shuffles for assignment") {
    val p = plan(PipelineOps.q110KMeans(spark, dir))
    // centroid sides are k-row aggregates → BroadcastNestedLoopJoin on the
    // hinted crossJoin is fine (k rows), but the base side must not be the
    // build side of any shuffle join
    assert(p.contains("BroadcastExchange"), p)
  }

  test("q111 incremental dedup plans only equi-joins — batch×corpus, never corpus²") {
    val p = plan(PipelineOps.q111IncrementalDedup(spark, dir))
    assert(!p.contains("NestedLoop"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q113 span dedup counts gram occurrences in one lineage — no join-back re-scan") {
    val p = plan(PipelineOps.q113SpanDedup(spark, dir))
    // one scan feeds the positional-gram explode + occurrence window; the
    // second is the per-doc n_tok base the coverage joins back onto
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans <= 2, s"expected <=2 scans, got $scans:\n$p")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
  }

  test("q121 neighborhood linkage plans only equi-joins — no block-local cross product") {
    val (clean, dirty) = PipelineOps.linkageTables(spark, dir)
    val p = plan(PipelineOps.neighborhoodCandidates(clean, dirty))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
    // the join key includes the deletion-neighborhood key, not just the
    // 125-value (nk, seg) pair — the round-4 scale fix (at this SF the
    // planner broadcasts the small side, so check the join's key list)
    val keyLine = p.linesIterator.find(l => l.contains("keys") && l.contains("k#"))
    assert(keyLine.isDefined, p)
  }

  test("q123 salted join: the salted fact side shuffles on (key, salt)") {
    val p = plan(Skew.q123SaltedJoin(spark, dir))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
    assert(p.contains("__salt"), p)
  }

  test("q125 winsorize broadcasts the 3-row percentile table onto the clip pass") {
    val p = plan(RelationalMore.q125Winsorize(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q128 binned range join plans an equi-join — the scale contrast to q20's BNLJ") {
    val p = plan(RelationalMore.q128BinnedRangeJoin(spark, dir))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
    val keyLine = p.linesIterator.find(l => l.contains("keys") && l.contains("bin#"))
    assert(keyLine.isDefined, p)
  }

  test("q131/q132 event analytics collapse the log without any join") {
    assert(!plan(EventOps.q131CohortRetention(spark, dir)).contains("Join"))
    assert(!plan(EventOps.q132EventTransitions(spark, dir)).contains("Join"))
  }

  test("q134 PMI: vocabulary and totals ride broadcasts — no shuffle join anywhere") {
    val p = plan(CorpusOps.q134PmiPairs(spark, dir))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("q137 sessionize: both windows and the session aggregate share ONE user_id exchange") {
    val p = plan(EventOps.q137Sessionize(spark, dir))
    val hashExchanges = p.linesIterator.count(l =>
      l.trim.startsWith("Arguments: hashpartitioning"))
    assert(hashExchanges === 1, p)
    assert(!p.contains("Join"), p)
  }

  test("q139 rolling-active: replicate-to-window plans no shuffle join (1-row bound broadcast only)") {
    val p = plan(EventOps.q139RollingActive(spark, dir))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    assert(p.contains("Generate"), p) // the row-local ×7 fan-out
  }

  test("q140 interval-overlap joins on the day bin — no nested-loop pair blowup") {
    val p = plan(EventOps.q140IntervalOverlap(spark, dir))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
    val keyLine = p.linesIterator.find(l => l.contains("keys") && l.contains("bin#"))
    assert(keyLine.isDefined, p)
  }
}
