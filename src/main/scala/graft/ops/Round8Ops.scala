package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 operator batch — training-data selection and warehouse-history
  * surfaces: DSIR importance weighting (hashed-n-gram data selection),
  * int8 scalar quantization with a recall readout, SCD2 dimension history,
  * sequence-pattern matching with negation, and A-ES weighted reservoir
  * sampling. [EXT] north-star surface — the reference (471 lines,
  * /root/reference/src/main/scala/.../Proof.scala) has no selection,
  * history, or sampling operators; everything here follows the repo's
  * §8.4 portability contract (integer/fixed-point hashed cells, no
  * double ROUND).
  */
object Round8Ops {

  // --------------------------------------------------------------------------
  // q279 — DSIR IMPORTANCE WEIGHTING (Data Selection via Importance
  // Resampling, Xie et al. 2023): score every document by how much it
  // looks like the TARGET distribution (here: the English slice) under
  // hashed-bigram unigram LMs — log w(doc) = Σ_bigram [log p_tgt(b) −
  // log p_src(b)] with add-1 smoothing over 1024 hash buckets. The
  // standard cheap data-selection pass before pretraining: keep/resample
  // docs with positive importance.
  //
  // Scale: two hash aggregates collapse the corpus to a 1024-row
  // log-ratio table that BROADCASTS back; scoring is one map-side join +
  // one per-doc aggregate — linear, shuffle only on doc_id.
  //
  // Determinism (§8.4): the per-bucket log-ratio is ONE libm ln of an
  // exact-integer rational, quantized to a 1e-9-grid long; per-doc sums
  // are exact BIGINT sums of those longs — order-free, no double output.
  def q279DsirWeighting(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        expr("filter(split(lower(text), ' '), t -> t != '')").as("t"))
      .filter(size(col("t")) >= 2)
    val bigrams = toks.select(col("doc_id"), col("lang"),
      explode(expr("zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1)," +
        " (a, b) -> concat(a, ' ', b))")).as("bg"))
      .withColumn("b",
        expr("cast(conv(substring(md5(bg), 1, 8), 16, 10) as bigint) % 1024"))
    val tgt = bigrams.filter(col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val src = bigrams.groupBy(col("b")).agg(count(lit(1)).as("cs"))
    val tots = bigrams.agg(
      count_if(col("lang") === "en").as("tot_t"), count(lit(1)).as("tot_s"))
    val lr = src.join(tgt, Seq("b"), "left")
      .na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(tots))
      .withColumn("lr_q", expr(
        "cast(floor(ln((ct + 1.0d) * (tot_s + 1024.0d) / ((cs + 1.0d) * (tot_t + 1024.0d)))" +
          " * 1e9 + 0.5d) as long)"))
      .select(col("b"), col("lr_q"))
    bigrams.join(broadcast(lr), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lr_q")).as("logw_e9"))
      .select(col("doc_id"), col("n_bigrams"), col("logw_e9"),
        (col("logw_e9") > 0).as("keep"))
      .orderBy(col("doc_id"))
  }

  val q279Sql: String =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    list_filter(string_split(lower(text), ' '), x -> x != '') AS t
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, lang,
      |    ('0x' || substr(md5(t[i] || ' ' || t[i+1]), 1, 8))::BIGINT % 1024 AS b
      |  FROM t, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
      |  WHERE len(t) >= 2),
      |ct AS (SELECT b, COUNT(*) AS ct FROM bg WHERE lang = 'en' GROUP BY b),
      |cs AS (SELECT b, COUNT(*) AS cs FROM bg GROUP BY b),
      |tot AS (SELECT
      |  (SELECT COUNT(*) FROM bg WHERE lang = 'en') AS tot_t,
      |  (SELECT COUNT(*) FROM bg) AS tot_s),
      |lr AS (
      |  SELECT cs.b,
      |    CAST(FLOOR(ln((COALESCE(ct.ct, 0) + 1.0) * (tot_s + 1024.0)
      |      / ((cs.cs + 1.0) * (tot_t + 1024.0))) * 1e9 + 0.5) AS BIGINT) AS lr_q
      |  FROM cs LEFT JOIN ct ON ct.b = cs.b CROSS JOIN tot)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  CAST(SUM(lr_q) AS BIGINT) AS logw_e9,
      |  SUM(lr_q) > 0 AS keep
      |FROM bg JOIN lr ON lr.b = bg.b
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------------
  // q280 — INT8 SCALAR QUANTIZATION + RECALL READOUT: unit-normalize,
  // then symmetric TENSOR-WIDE int8 codes q = floor(x/amax·127 + 0.5)
  // (the sq8 storage tier every vector store ships — 4× smaller than
  // float32, cheaper than q205's PQ), then recall@10 of the int8×int8
  // integer dot-product ranking against exact float cosine for 4 probe
  // queries. The scale is ONE global amax on purpose: per-dimension
  // affine codes cannot be dot-producted without per-dim dequantization
  // (Σ q·q′ would weight every dimension by 1/scale_d² — a different
  // metric, not a quantization error), while a single scale preserves
  // the inner product up to one constant.
  //
  // Scale: the quantizer is a broadcast 1-row global amax; encoding is
  // map-side; the eval ranks through the q169 two-pass bucketed top-k
  // (per-(query, id mod 32) partial rank, then the ≤320 survivors), so no
  // window ever sees a corpus-sized partition.
  //
  // Determinism: codes are floor-quantized integers from bit-identical
  // doubles; the int8 ranking is exact integer arithmetic; the exact-
  // cosine side ranks the same fixed-order-fold doubles both engines
  // produce (q104's argument), tie-broken by vec_id; the output is an
  // integer overlap count.
  def q280Int8Quant(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val unit = emb
      .withColumn("nrm", expr("sqrt(aggregate(v, 0d, (a, x) -> a + x * x))"))
      .select(col("vec_id"), expr("transform(v, x -> x / nrm)").as("vn"))
    val amax = unit
      .agg(max(expr("aggregate(vn, 0d, (a, x) -> greatest(a, abs(x)))")).as("amax"))
    // codes stay row-local arrays; the int8 score is a per-pair integer
    // zip_with fold (order-free under integer addition — same value the
    // per-dimension join shape computes, at 4n rows instead of 64·4n)
    val codes = unit.crossJoin(broadcast(amax))
      .select(col("vec_id"),
        expr("transform(vn, x -> cast(floor(x / amax * 127.0d + 0.5d) as bigint))")
          .as("qa"))
    val qq = codes.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("qa").as("qb"))
    val s8 = codes.crossJoin(broadcast(qq))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        expr("aggregate(zip_with(qa, qb, (a, b) -> a * b), 0L, (acc, x) -> acc + x)")
          .as("score"))
    val qvec = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("v").as("qvec"))
    val ex = emb.crossJoin(broadcast(qvec))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), expr("cosine_sim(v, qvec)").as("score"))
    def top10(df: DataFrame): DataFrame = {
      val w1 = Window.partitionBy(col("qid"), pmod(col("vec_id"), lit(32)))
        .orderBy(col("score").desc, col("vec_id"))
      val w2 = Window.partitionBy(col("qid"))
        .orderBy(col("score").desc, col("vec_id"))
      df.withColumn("r1", row_number().over(w1)).filter(col("r1") <= 10)
        .withColumn("r", row_number().over(w2)).filter(col("r") <= 10)
        .select(col("qid"), col("vec_id"))
    }
    top10(ex).join(top10(s8), Seq("qid", "vec_id"))
      .groupBy(col("qid")).agg(count(lit(1)).as("n_overlap_at10"))
      .orderBy(col("qid"))
  }

  val q280Sql: String =
    """WITH base AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |    list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
      |      (a, b) -> a + b) AS n2
      |  FROM embeddings),
      |dims AS (
      |  SELECT vec_id, i - 1 AS d, v[i] / sqrt(n2) AS x
      |  FROM base, UNNEST(generate_series(1, len(v))) AS u(i)),
      |am AS (SELECT MAX(ABS(x)) AS amax FROM dims),
      |q8 AS (
      |  SELECT vec_id, d,
      |    CAST(FLOOR(x / amax * 127.0 + 0.5) AS BIGINT) AS q
      |  FROM dims CROSS JOIN am),
      |qq AS (SELECT vec_id AS qid, d, q AS qv FROM q8 WHERE vec_id < 4),
      |s8 AS (
      |  SELECT qid, q8.vec_id, SUM(q8.q * qv) AS score
      |  FROM q8 JOIN qq ON qq.d = q8.d AND q8.vec_id != qid
      |  GROUP BY 1, 2),
      |r8 AS (
      |  SELECT qid, vec_id,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS r
      |  FROM s8),
      |ex AS (
      |  SELECT q.vec_id AS qid, b.vec_id,
      |    list_reduce(list_transform(range(1, 65), i -> b.v[i] * q.v[i]),
      |      (x, y) -> x + y) / sqrt(b.n2 * q.n2) AS score
      |  FROM base b CROSS JOIN (SELECT * FROM base WHERE vec_id < 4) q
      |  WHERE b.vec_id != q.vec_id),
      |rex AS (
      |  SELECT qid, vec_id,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS r
      |  FROM ex)
      |SELECT rex.qid, CAST(COUNT(*) AS BIGINT) AS n_overlap_at10
      |FROM rex JOIN r8 ON r8.qid = rex.qid AND r8.vec_id = rex.vec_id
      |  AND r8.r <= 10
      |WHERE rex.r <= 10
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // q281 — SCD TYPE-2 DIMENSION HISTORY from a change log: collapse each
  // user's event stream to value-CHANGE rows, then version them with
  // [effective_from, effective_to) validity ranges and an is_current
  // flag — the slowly-changing-dimension build every warehouse runs on
  // top of CDC feeds (q200 captures the deltas; this materializes the
  // queryable history).
  //
  // Scale: two windows partitioned by user_id (one shuffle, reused by
  // both via the same partitioning) — no global ordering anywhere.
  // Determinism: money rides as exact cents; ordering is the (ts,
  // event_id) total order; validity bounds are integer epoch-micros.
  def q281Scd2History(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("cast(floor(value * 100 + 0.5d) as bigint)").as("cents"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val changes = ev
      .withColumn("prev", lag(col("cents"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("cents"))
    val wv = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    changes
      .withColumn("version", row_number().over(wv))
      .withColumn("eff_from_us", expr("unix_micros(ts)"))
      .withColumn("eff_to_us", lead(expr("unix_micros(ts)"), 1).over(wv))
      .select(col("user_id"), col("version"), col("cents"),
        col("eff_from_us"), col("eff_to_us"),
        col("eff_to_us").isNull.as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  val q281Sql: String =
    """WITH e AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events),
      |c AS (
      |  SELECT *, LAG(cents) OVER w AS prev FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |f AS (SELECT user_id, ts, event_id, cents FROM c
      |      WHERE prev IS NULL OR prev != cents),
      |v AS (
      |  SELECT user_id, cents,
      |    CAST(ROW_NUMBER() OVER w AS INT) AS version,
      |    epoch_us(ts) AS eff_from_us,
      |    LEAD(epoch_us(ts)) OVER w AS eff_to_us
      |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, version, cents, eff_from_us, eff_to_us,
      |  eff_to_us IS NULL AS is_current
      |FROM v ORDER BY user_id, version""".stripMargin

  // --------------------------------------------------------------------------
  // q282 — SEQUENCE-PATTERN MATCH WITH NEGATION (MATCH_RECOGNIZE-lite):
  // per user, count purchases preceded by a view within 30 minutes with
  // NO error event between that view and the purchase — the "A then B
  // within T, unless C intervenes" shape funnels (q165) and transition
  // counts (q132) cannot express, because the negation needs the
  // BETWEEN-events condition.
  //
  // Scale: two running-max windows partitioned by user_id over the same
  // (ts, event_id) order — one shuffle, row-local predicate after.
  // Determinism: all comparisons on integer epoch-micros; same-instant
  // view/error collisions resolve identically in both engines (strict <).
  def q282PatternFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev
      .withColumn("last_view_us",
        max(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("last_err_us",
        max(when(col("event_type") === "error", col("us"))).over(w))
      .filter(col("event_type") === "purchase" &&
        col("last_view_us").isNotNull &&
        col("last_view_us") >= col("us") - lit(1800000000L) &&
        (col("last_err_us").isNull || col("last_err_us") < col("last_view_us")))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_matches"))
      .orderBy(col("user_id"))
  }

  val q282Sql: String =
    """WITH e AS (
      |  SELECT user_id, ts, event_id, event_type, epoch_us(ts) AS us
      |  FROM events),
      |m AS (
      |  SELECT user_id, event_type, us,
      |    MAX(CASE WHEN event_type = 'view' THEN us END) OVER w AS last_view_us,
      |    MAX(CASE WHEN event_type = 'error' THEN us END) OVER w AS last_err_us
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT user_id, COUNT(*) AS n_matches
      |FROM m
      |WHERE event_type = 'purchase' AND last_view_us IS NOT NULL
      |  AND last_view_us >= us - 1800000000
      |  AND (last_err_us IS NULL OR last_err_us < last_view_us)
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  // --------------------------------------------------------------------------
  // q283 — WEIGHTED RESERVOIR SAMPLE (Efraimidis–Spirakis A-ES): a
  // deterministic 5-doc sample per source weighted by document length —
  // priority ln(u)/w with u a per-doc md5 uniform; the top-5 priorities
  // per group ARE the weighted sample without replacement. The one-pass,
  // merge-friendly sampler a 100 TB curation pipeline uses where q127's
  // stratified sampler needs unweighted strata.
  //
  // Scale: the rank runs through the q169 two-pass bucketed top-k
  // (per-(source, doc_id mod 64) partial rank, then ≤320 survivors per
  // source) — no per-source corpus-sized window task.
  //
  // Determinism: u is the md5-dyadic uniform (exact in both engines); the
  // priority is one ln + one divide on bit-identical doubles; md5
  // distinctness makes ties impossible; output is (source, rank, doc_id)
  // — integers and strings only.
  def q283WeightedReservoir(spark: SparkSession, dir: String): DataFrame = {
    val u = (conv(substring(md5(concat(lit("wr:"), col("doc_id").cast("string"))), 1, 13),
      16, 10).cast("long").cast("double") + 0.5) / lit(4503599627370496.0)
    val pri = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        greatest(col("n_chars").cast("double"), lit(1.0)).as("w"))
      .withColumn("pri", log(u) / col("w"))
    val w1 = Window.partitionBy(col("source"), pmod(col("doc_id"), lit(64)))
      .orderBy(col("pri").desc, col("doc_id"))
    val w2 = Window.partitionBy(col("source"))
      .orderBy(col("pri").desc, col("doc_id"))
    pri.withColumn("r1", row_number().over(w1)).filter(col("r1") <= 5)
      .withColumn("rank", row_number().over(w2)).filter(col("rank") <= 5)
      .select(col("source"), col("rank"), col("doc_id"))
      .orderBy(col("source"), col("rank"))
  }

  val q283Sql: String =
    """WITH p AS (
      |  SELECT doc_id, source,
      |    ln((('0x' || substr(md5('wr:' || doc_id::VARCHAR), 1, 13))::BIGINT + 0.5)
      |        / 4503599627370496.0)
      |      / GREATEST(CAST(n_chars AS DOUBLE), 1.0) AS pri
      |  FROM documents),
      |r AS (
      |  SELECT source, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY pri DESC, doc_id) AS rank
      |  FROM p)
      |SELECT source, CAST(rank AS INT) AS rank, doc_id
      |FROM r WHERE rank <= 5 ORDER BY source, rank""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q279_dsir_weighting", q279DsirWeighting _, Some(q279Sql)),
    ("q280_int8_quant", q280Int8Quant _, Some(q280Sql)),
    ("q281_scd2_history", q281Scd2History _, Some(q281Sql)),
    ("q282_pattern_funnel", q282PatternFunnel _, Some(q282Sql)),
    ("q283_weighted_reservoir", q283WeightedReservoir _, Some(q283Sql)))
}
