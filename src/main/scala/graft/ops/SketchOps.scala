package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable quantile sketches (Greenwald-Khanna, the same summary Spark's
  * `approx_percentile` uses internally) exposed as first-class values, so
  * quantiles can be ROLLED UP hierarchically: leaf groups each build a
  * sketch once, coarser grains merge the serialized sketches without
  * re-reading the fact table. That is the 100 TB pattern — per-partition /
  * per-day sketches computed at ingest, every later grain (week, region,
  * global) is a cheap sketch-merge, never a re-scan.
  *
  * Built-in `approx_percentile` merges partials across PARTITIONS but its
  * sketch is consumed at the group boundary; these Aggregators keep it
  * alive across grouping levels. No reference counterpart (SURVEY §2.2
  * gap: the reference has no approximate aggregates at all).
  */
object SketchOps {

  private val Eps = 0.01 // relative rank error

  private def ser(qs: QuantileSummaries): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new ObjectOutputStream(bos)
    out.writeObject(qs.compress()); out.close(); bos.toByteArray
  }
  private def deser(b: Array[Byte]): QuantileSummaries = {
    val in = new ObjectInputStream(new ByteArrayInputStream(b))
    in.readObject().asInstanceOf[QuantileSummaries]
  }
  private def empty: QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, Eps)

  /** Leaf level: doubles in, serialized sketch out. */
  object SketchAgg extends Aggregator[Double, QuantileSummaries, Array[Byte]] {
    def zero: QuantileSummaries = empty
    def reduce(b: QuantileSummaries, v: Double): QuantileSummaries = b.insert(v)
    def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
      a.compress().merge(b.compress())
    def finish(b: QuantileSummaries): Array[Byte] = ser(b)
    def bufferEncoder: Encoder[QuantileSummaries] = Encoders.javaSerialization
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  case class Quantiles(p10: Double, p50: Double, p90: Double)

  /** Rollup level: serialized sketches in, merged quantiles out. */
  object SketchMergeAgg extends Aggregator[Array[Byte], QuantileSummaries, Quantiles] {
    def zero: QuantileSummaries = empty
    def reduce(b: QuantileSummaries, bytes: Array[Byte]): QuantileSummaries =
      b.compress().merge(deser(bytes))
    def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
      a.compress().merge(b.compress())
    def finish(b: QuantileSummaries): Quantiles = {
      val q = b.compress().query(Seq(0.1, 0.5, 0.9)).get
      Quantiles(q.head.asInstanceOf[Double], q(1).asInstanceOf[Double], q(2).asInstanceOf[Double])
    }
    def bufferEncoder: Encoder[QuantileSummaries] = Encoders.javaSerialization
    def outputEncoder: Encoder[Quantiles] = Encoders.product[Quantiles]
  }

  // --------------------------------------------------------------------------
  // q74 — hierarchical quantile rollup: per-nation account-balance sketches
  // (leaf pass over customer), merged per region WITHOUT touching customer
  // again. Sketch values are engine-specific, so (q55 pattern) the
  // oracle-checked output carries the exact region median plus rank-band
  // flags the oracle pins to TRUE: each merged sketch percentile must land
  // inside the exact [q−0.05, q+0.05] value band (GK rank error ≤ 0.01,
  // so the band is generous by construction). The exact twin is
  // verification-only — the demonstrated operator is still the
  // merge-without-rescan rollup. SketchOpsSpec bounds the raw estimates.
  private[ops] def q74Raw(spark: SparkSession, dir: String): DataFrame = {
    val sketch = udaf(SketchAgg, Encoders.scalaDouble)
    val mergeQ = udaf(SketchMergeAgg, Encoders.BINARY)
    val perNation = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"))
      .agg(sketch(col("c_acctbal")).as("sk"), count(lit(1)).as("n"))
    val nations = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_regionkey"))
    perNation
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey"))
      .agg(mergeQ(col("sk")).as("q"), sum(col("n")).as("n_customers"))
      .select(
        col("n_regionkey"),
        Num.pround(col("q.p10"), 2).as("p10"),
        Num.pround(col("q.p50"), 2).as("p50"),
        Num.pround(col("q.p90"), 2).as("p90"),
        col("n_customers"))
      .orderBy(col("n_regionkey"))
  }

  def q74SketchRollup(spark: SparkSession, dir: String): DataFrame = {
    val approx = q74Raw(spark, dir)
    val nations = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_regionkey"))
    val exact = Tables.customer(spark, dir)
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey"))
      // exact percentile buffers O(distinct values): bounded here because
      // c_acctbal is a 2-decimal value on [-1000, 10000] — ≤ 1.1M cents
      // cells at ANY customer count (the q125 contract note)
      .agg(expr(
        "percentile(c_acctbal, array(0.05, 0.15, 0.45, 0.5, 0.55, 0.85, 0.95))").as("ep"))
      .select(col("n_regionkey"),
        element_at(col("ep"), 1).as("e05"), element_at(col("ep"), 2).as("e15"),
        element_at(col("ep"), 3).as("e45"), element_at(col("ep"), 4).as("e50"),
        element_at(col("ep"), 5).as("e55"),
        element_at(col("ep"), 6).as("e85"), element_at(col("ep"), 7).as("e95"))
    approx.join(broadcast(exact), "n_regionkey")
      .select(
        col("n_regionkey"),
        Num.pround(col("e50"), 4).as("exact_p50"),
        (col("p10") >= col("e05") && col("p10") <= col("e15")).as("p10_in_band"),
        (col("p50") >= col("e45") && col("p50") <= col("e55")).as("p50_in_band"),
        (col("p90") >= col("e85") && col("p90") <= col("e95")).as("p90_in_band"),
        col("n_customers"))
      .orderBy(col("n_regionkey"))
  }

  val q74Sql: String =
    """SELECT n.n_regionkey,
      |  FLOOR((quantile_cont(c.c_acctbal, 0.5)) * 1e4 + 0.5) / 1e4 AS exact_p50,
      |  TRUE AS p10_in_band, TRUE AS p50_in_band, TRUE AS p90_in_band,
      |  COUNT(*) AS n_customers
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY n.n_regionkey ORDER BY n.n_regionkey""".stripMargin

  // --------------------------------------------------------------------------
  // Misra-Gries frequent-items summary: bounded memory (k counters),
  // mergeable (sum counters, then subtract the (k+1)-th largest and drop
  // non-positive — Agarwal et al., "Mergeable Summaries", PODS'12).
  // Guarantee: every item with true frequency > N/k survives.
  class MisraGriesAgg(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], w: String): Map[String, Long] =
      b.get(w) match {
        case Some(c) => b.updated(w, c + 1L)
        case None if b.size < k => b.updated(w, 1L)
        case None => b.flatMap { case (kw, c) => if (c > 1L) Some(kw -> (c - 1L)) else None }
      }
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val summed = b.foldLeft(a) { case (m, (w, c)) => m.updated(w, m.getOrElse(w, 0L) + c) }
      if (summed.size <= k) summed
      else {
        val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
        summed.flatMap { case (w, c) => if (c - cut > 0L) Some(w -> (c - cut)) else None }
      }
    }
    def finish(b: Map[String, Long]): Map[String, Long] = b
    // buffer crosses executors opaquely (kryo); the OUTPUT must be a real
    // MapType so downstream exprs (map_keys) can consume it
    def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  // --------------------------------------------------------------------------
  // q77 — heavy hitters, two-pass: (1) a Misra-Gries sketch over the token
  // stream nominates ≤k candidate words in bounded memory — at 100 TB this
  // replaces a full-vocabulary groupBy with a k-entry summary per
  // partition; (2) exact counts for the tiny candidate set via a
  // semi-joined re-aggregation. Output is therefore EXACT for every word
  // the sketch retains (k=128 exceeds this corpus's vocabulary, so the
  // top-10 is provably complete — with real Zipfian skew a k ≪ |vocab|
  // still guarantees every word with freq > N/k survives pass 1).
  def q77HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val mg = udaf(new MisraGriesAgg(128), Encoders.STRING)
    val tokens = Tables.documents(spark, dir)
      .select(explode(expr("filter(split(lower(text), ' '), t -> t != '')")).as("w"))
    val candidates = tokens.agg(mg(col("w")).as("summary"))
      .select(explode(map_keys(col("summary"))).as("w"))
    tokens.join(broadcast(candidates), Seq("w"), "left_semi")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(10)
  }

  val q77Sql: String =
    """SELECT w, COUNT(*) AS n
      |FROM (SELECT UNNEST(list_filter(string_split(lower(text), ' '), t -> t != '')) AS w
      |      FROM documents)
      |GROUP BY w ORDER BY n DESC, w ASC LIMIT 10""".stripMargin

  // --------------------------------------------------------------------------
  // q99 — mergeable HLL distinct rollup (the approx-distinct analog of
  // q74): per-nation DataSketches HLL of the customer keys, unioned per
  // region WITHOUT rescanning customer — the hierarchy pattern (day→month,
  // shard→global) that makes approximate distincts cheap at 100 TB: leaves
  // aggregate once, every rollup level is a tiny sketch merge.
  // Sketch estimates are engine-specific, so (q55 pattern) the
  // oracle-checked output carries the exact per-region distinct (custkey
  // is unique, so the summed leaf counts ARE the exact distinct) plus a
  // 5%-accuracy flag the oracle pins to TRUE. SketchOpsSpec bounds the
  // raw estimate and asserts merged == direct-at-region.
  private[ops] def q99Raw(spark: SparkSession, dir: String): DataFrame = {
    val perNation = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"))
      .agg(expr("hll_sketch_agg(c_custkey)").as("sk"), count(lit(1)).as("n"))
    val nations = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_regionkey"))
    perNation
      .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey"))
      .agg(
        expr("hll_sketch_estimate(hll_union_agg(sk))").cast("long").as("approx_customers"),
        sum(col("n")).as("n_customers"))
      .orderBy(col("n_regionkey"))
  }

  def q99HllRollup(spark: SparkSession, dir: String): DataFrame =
    q99Raw(spark, dir)
      .select(col("n_regionkey"), col("n_customers"),
        (abs(col("approx_customers") - col("n_customers")) <=
          col("n_customers") * 0.05).as("approx_within_5pct"))
      .orderBy(col("n_regionkey"))

  val q99Sql: String =
    """SELECT n.n_regionkey, COUNT(*) AS n_customers, TRUE AS approx_within_5pct
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY n.n_regionkey ORDER BY n.n_regionkey""".stripMargin

  // --------------------------------------------------------------------------
  // q126 — Count-Min Sketch point-frequency estimates: the mergeable
  // frequency-query counterpart of q77's Misra-Gries top-k and q99's HLL
  // distincts (completing the classic sketch triple). One CMS is built
  // over the lineitem supplier-key stream with Spark's codegen'd
  // `count_min_sketch` aggregate (fixed seed → deterministic binary), then
  // the 10 highest-traffic suppliers' frequencies are answered FROM THE
  // SKETCH and checked against the CMS guarantee est ∈ [exact,
  // exact + ε·N]. Per the q24/q55/q99 sketch policy the oracle-checked row
  // carries the exact count plus the bound flag pinned TRUE (estimates
  // are engine-specific; the guarantee is not).
  //
  // Scale shape: the sketch is a fixed (ε, δ)-sized counter grid built
  // with map-side partial merges — one tiny binary per partition, merged
  // once; point queries are O(depth) lookups on the collected sketch (a
  // driver-side probe of a KB-scale summary, not a data scan); the exact
  // side is one hash aggregate + top-k (TakeOrderedAndProject).
  def q126CmsFreq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val eps = 0.0005; val confidence = 0.999
    val li = Tables.lineitem(spark, dir).select(col("l_suppkey").cast("long").as("k"))
    val skBytes = Option(li
      .agg(expr(s"count_min_sketch(k, ${eps}d, ${confidence}d, 42)").as("sk"))
      .head().getAs[Array[Byte]]("sk"))
    // 0-row input: the sketch aggregate returns SQL NULL, and there are no
    // keys to probe — the defined result is the empty top-10 table
    if (skBytes.isEmpty)
      return Seq.empty[(Long, Long, Boolean)]
        .toDF("l_suppkey", "exact_n", "within_eps_bound")
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(skBytes.get))
    val bound = math.ceil(eps * cms.totalCount()).toLong
    val top = li.groupBy(col("k")).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("k"))
      .limit(10).as[(Long, Long)].collect()
    top.map { case (k, exact) =>
      val est = cms.estimateCount(k)
      (k, exact, est >= exact && est <= exact + bound)
    }.toSeq.toDF("l_suppkey", "exact_n", "within_eps_bound")
  }

  val q126Sql: String =
    """SELECT CAST(l_suppkey AS BIGINT) AS l_suppkey, COUNT(*) AS exact_n,
      |  TRUE AS within_eps_bound
      |FROM lineitem GROUP BY l_suppkey
      |ORDER BY exact_n DESC, l_suppkey LIMIT 10""".stripMargin

  // --------------------------------------------------------------------------
  // q191 — HLL SET ALGEBRA: estimate the audience overlap |click ∩
  // purchase| by inclusion-exclusion over three sketches, est(A) + est(B)
  // − est(A∪B) — the segment-overlap question every audience/cohort
  // system answers from sketches because exact distinct-intersections
  // need a full shuffle of both sides. Per the q24/q55/q99 sketch policy
  // the oracle-checked row carries the EXACT counts (from the same
  // per-user pass) plus a 5%-accuracy flag pinned TRUE; SketchOpsSpec
  // bounds the raw estimate.
  //
  // Scale: one per-user aggregate (the same shuffle the exact twin needs
  // here anyway, since membership is per-user), then three sketches built
  // over its |users| rows merge to ONE summary row — at 100 TB the
  // sketches are built per shard/day once and the intersection is
  // answered from KB-sized state, which is the point.
  private[ops] def q191Raw(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "click", 1).otherwise(0)).as("a"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("b"))
    perUser.agg(
      count_if(col("a") === 1).as("n_click"),
      count_if(col("b") === 1).as("n_purchase"),
      count_if(col("a") === 1 && col("b") === 1).as("n_both"),
      expr("hll_sketch_estimate(hll_sketch_agg(CASE WHEN a = 1 THEN user_id END))")
        .as("ea"),
      expr("hll_sketch_estimate(hll_sketch_agg(CASE WHEN b = 1 THEN user_id END))")
        .as("eb"),
      expr("hll_sketch_estimate(hll_sketch_agg(CASE WHEN a = 1 OR b = 1 THEN user_id END))")
        .as("eu"))
      .withColumn("approx_both", (col("ea") + col("eb") - col("eu")).cast("long"))
  }

  def q191HllIntersect(spark: SparkSession, dir: String): DataFrame =
    q191Raw(spark, dir)
      .select(col("n_click"), col("n_purchase"), col("n_both"),
        (abs(col("approx_both") - col("n_both")) <= col("n_both") * 0.05)
          .as("approx_within_5pct"))

  val q191Sql: String =
    """WITH u AS (
      |  SELECT user_id,
      |    MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
      |  FROM events GROUP BY user_id)
      |SELECT COUNT(*) FILTER (a = 1) AS n_click,
      |  COUNT(*) FILTER (b = 1) AS n_purchase,
      |  COUNT(*) FILTER (a = 1 AND b = 1) AS n_both,
      |  TRUE AS approx_within_5pct
      |FROM u""".stripMargin

  // --------------------------------------------------------------------------
  // q220 — KMV (k-minimum-values) SOURCE-SIMILARITY matrix: one 64-value
  // bottom-k sketch of the token-hash set per source, then pairwise
  // Jaccard ESTIMATES from sketch pairs — the corpus-level dedup triage
  // that says which SOURCES overlap before any doc-level near-dup runs
  // (Beyer et al., "On synopses for distinct-value estimation"). The
  // estimator: merge two sketches, keep the k smallest of the union, and
  // count how many live in both — |∩ bottom-k(∪)| / k.
  //
  // Determinism: the "random" permutation is the q115 portable md5→long
  // hash, so both engines compute the IDENTICAL sketch (no estimate-vs-
  // exact gap to round away — the oracle replays the estimator itself).
  // Scale: after the one tokenize+distinct pass, everything operates on
  // |sources| × k rows; the pair join is sketch×sketch (k-bounded), never
  // corpus×corpus. Sketches are mergeable, so per-shard bottom-k unions
  // compose (the q74/q99 rollup property, for set similarity).
  def q220SourceSimilarity(spark: SparkSession, dir: String): DataFrame = {
    val k = 64
    val hashes = Tables.documents(spark, dir)
      .select(col("source"), explode(TextOps.toks).as("tok"))
      .select(col("source"),
        conv(substring(md5(col("tok")), 1, 13), 16, 10).cast("long").as("h"))
      .distinct()
    val sketch = hashes
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source")).orderBy(col("h"))))
      .filter(col("rn") <= k)
      .select(col("source"), col("h"))
      .localCheckpoint() // consumed by both sides of the pair join
    val a = sketch.select(col("source").as("s1"), col("h"))
    val b = sketch.select(col("source").as("s2"), col("h"))
    val merged = a.join(broadcast(b.select(col("s2")).distinct()), col("s1") < col("s2"))
      .select(col("s1"), col("s2"), col("h"), lit(1).as("in1"))
      .unionByName(
        b.join(broadcast(a.select(col("s1")).distinct()), col("s1") < col("s2"))
          .select(col("s1"), col("s2"), col("h"), lit(0).as("in1")))
    merged
      .groupBy(col("s1"), col("s2"), col("h"))
      .agg(count(lit(1)).as("sides")) // 2 = hash present in both sketches
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("s1"), col("s2")).orderBy(col("h"))))
      .filter(col("rn") <= k)
      .groupBy(col("s1"), col("s2"))
      .agg((sum(when(col("sides") === 2, 1).otherwise(0)).cast("double") / k)
        .as("est_jaccard"))
      .select(col("s1"), col("s2"), Num.pround(col("est_jaccard"), 6).as("est_jaccard"))
      .orderBy(col("s1"), col("s2"))
  }

  val q220Sql: String =
    s"""WITH hashes AS (
       |  SELECT DISTINCT source,
       |    ('0x' || substr(md5(tok), 1, 13))::BIGINT AS h
       |  FROM (SELECT source, unnest(${TextOps.toksSqlD}) AS tok FROM documents)),
       |sketch AS (
       |  SELECT source, h FROM (
       |    SELECT source, h,
       |      ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
       |    FROM hashes) WHERE rn <= 64),
       |pairs AS (
       |  SELECT a.source AS s1, b.source AS s2
       |  FROM (SELECT DISTINCT source FROM sketch) a
       |  JOIN (SELECT DISTINCT source FROM sketch) b ON a.source < b.source),
       |merged AS (
       |  SELECT p.s1, p.s2, s.h,
       |    MAX(CASE WHEN s.source = p.s1 THEN 1 ELSE 0 END)
       |      + MAX(CASE WHEN s.source = p.s2 THEN 1 ELSE 0 END) AS sides
       |  FROM pairs p JOIN sketch s ON s.source IN (p.s1, p.s2)
       |  GROUP BY p.s1, p.s2, s.h),
       |bottomk AS (
       |  SELECT s1, s2, sides FROM (
       |    SELECT s1, s2, sides,
       |      ROW_NUMBER() OVER (PARTITION BY s1, s2 ORDER BY h) AS rn
       |    FROM merged) WHERE rn <= 64)
       |SELECT s1, s2,
       |  FLOOR((CAST(SUM(CASE WHEN sides = 2 THEN 1 ELSE 0 END) AS DOUBLE) / 64) * 1e6 + 0.5) / 1e6
       |    AS est_jaccard
       |FROM bottomk GROUP BY s1, s2 ORDER BY s1, s2""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q220_source_similarity", q220SourceSimilarity _, Some(q220Sql)),
    ("q74_sketch_rollup", q74SketchRollup _, Some(q74Sql)),
    ("q77_heavy_hitters", q77HeavyHitters _, Some(q77Sql)),
    ("q99_hll_rollup", q99HllRollup _, Some(q99Sql)),
    ("q126_cms_freq", q126CmsFreq _, Some(q126Sql)),
    ("q191_hll_intersect", q191HllIntersect _, Some(q191Sql)))
}
