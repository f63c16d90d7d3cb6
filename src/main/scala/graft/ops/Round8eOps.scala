package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 fifth operator batch: interpolated Kneser–Ney bigram
  * smoothing, Neyman survey allocation, randomized-response frequency
  * debiasing, and bitmap-index intersection counting — LM/sampling/
  * privacy/storage surface, all with exact-integer hashed cells
  * (§8.4). Hash portability: cross-engine randomness goes through the
  * md5-hex pattern proven by q27/q33/q138.
  */
object Round8eOps {

  // --------------------------------------------------------------------------
  // q306 — INTERPOLATED KNESER–NEY bigram smoothing (D = 3/4) on exact
  // integer arithmetic: for every observed bigram,
  //   P_KN(w2|w1) = (c12 − D)/c1 + (D/c1)·N1+(w1,·)·N1+(·,w2)/T
  // where N1+ are continuation/follower type counts and T the distinct
  // bigram count. With D = 3/4 everything cross-multiplies to the exact
  // integer ppm  (10⁶·((4·c12 − 3)·T + 3·nfol·nctx)) div (4·c1·T)  —
  // observed bigrams always have c12 ≥ 1, so the max(c12 − D, 0) clip
  // never binds and the closed form is exact. Ships the top-20 bigrams
  // by count — the standard smoothed-LM spot readout.
  //
  // Scale: one row-local bigram expansion, hash aggregates on bigram /
  // w1 / w2 keys, a 1-row T broadcast, equi-join-backs, and a global
  // top-20 (TakeOrderedAndProject). Overflow: 10⁶·4·c12·T needs c12·T <
  // 2.3·10¹¹ — c12 ≈ 1.5k and T = 961 at sf0.1, five orders under.
  def knBigrams(docs: DataFrame, topK: Int): DataFrame = {
    val pairs = docs
      .select(expr("filter(split(lower(text), ' '), t -> t != '')").as("t"))
      .select(explode(expr(
        """if(size(t) >= 2,
          |   transform(sequence(0, size(t) - 2),
          |     i -> struct(t[i] as w1, t[i+1] as w2)),
          |   array())""".stripMargin)).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val big = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val left = big.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("nfol"))
    val ctx = big.groupBy(col("w2")).agg(count(lit(1)).as("nctx"))
    val t = big.agg(count(lit(1)).as("bt"))
    big.join(left, Seq("w1")).join(ctx, Seq("w2")).crossJoin(broadcast(t))
      .withColumn("pkn_ppm", expr(
        "(1000000L * ((4L * c12 - 3L) * bt + 3L * nfol * nctx)) div (4L * c1 * bt)"))
      .orderBy(col("c12").desc, col("w1"), col("w2"))
      .limit(topK)
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        col("nfol"), col("nctx"), col("pkn_ppm"))
  }

  def q306KneserNey(spark: SparkSession, dir: String): DataFrame =
    knBigrams(Tables.documents(spark, dir), topK = 20)

  val q306Sql: String =
    s"""WITH pr AS (
       |  SELECT t[i] AS w1, t[i+1] AS w2
       |  FROM (SELECT ${TextOps.toksSqlD} AS t FROM documents),
       |       UNNEST(generate_series(1, len(t) - 1)) AS u(i)),
       |big AS (SELECT w1, w2, COUNT(*) AS c12 FROM pr GROUP BY w1, w2),
       |lft AS (SELECT w1, SUM(c12) AS c1, COUNT(*) AS nfol FROM big GROUP BY w1),
       |ctx AS (SELECT w2, COUNT(*) AS nctx FROM big GROUP BY w2),
       |t AS (SELECT COUNT(*) AS bt FROM big)
       |SELECT w1, w2, c12, CAST(c1 AS BIGINT) AS c1,
       |  CAST(nfol AS BIGINT) AS nfol, CAST(nctx AS BIGINT) AS nctx,
       |  CAST((1000000 * ((4 * c12 - 3) * bt + 3 * nfol * nctx))
       |    // (4 * c1 * bt) AS BIGINT) AS pkn_ppm
       |FROM big JOIN lft USING (w1) JOIN ctx USING (w2) CROSS JOIN t
       |ORDER BY c12 DESC, w1, w2 LIMIT 20""".stripMargin

  // --------------------------------------------------------------------------
  // q307 — NEYMAN ALLOCATION of a fixed sample budget across strata:
  // n_h ∝ N_h·σ_h. The Neyman weight collapses to w_h = √(N_h·Σx² −
  // (Σx)²) — ONE sqrt of an exact integer (sums in exact cents, the
  // variance numerator in DECIMAL(38,0) so (Σx)² cannot overflow at any
  // SF). The weight is then quantized to exact centi-units and the
  // 1000-row budget is split by the LARGEST-REMAINDER method on pure
  // integer arithmetic (base = floor share, remainders compared as exact
  // `mod` integers, ties by segment name) — allocations sum to EXACTLY
  // the budget on every engine.
  //
  // Scale: one aggregate per stratum (5 rows), then grid-sized math.
  def neymanAllocation(customer: DataFrame, budget: Int): DataFrame = {
    val st = customer
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_h"),
        expr("sum(cast(floor(c_acctbal * 100 + 0.5d) as bigint))").as("s1"),
        expr("sum(cast(floor(c_acctbal * 100 + 0.5d) as bigint) * " +
          "cast(floor(c_acctbal * 100 + 0.5d) as bigint))").as("s2"))
      .withColumn("vnum", expr(
        "cast(n_h as decimal(38,0)) * s2 - cast(s1 as decimal(38,0)) * s1"))
      .withColumn("wq", expr(
        // centi-unit quantization: w ≤ ~3.3·10¹⁰ even at the 10× probe,
        // so 10⁶·wq ≤ ~3.3·10¹⁸ stays inside BIGINT for the ppm share
        "cast(floor(sqrt(cast(vnum as double)) * 1e2 + 0.5d) as bigint)"))
    val tot = st.agg(sum(col("wq")).as("wtot"))
    val g = st.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"(${budget}L * wq) div wtot"))
      .withColumn("rem", expr(s"(${budget}L * wq) % wtot"))
    val short = g.agg((lit(budget) - sum(col("base"))).as("short"))
    g.crossJoin(broadcast(short))
      .withColumn("rrank", row_number().over(
        Window.orderBy(col("rem").desc, col("segment"))))
      .withColumn("alloc",
        col("base") + when(col("rrank") <= col("short"), 1L).otherwise(0L))
      .withColumn("share_ppm", expr("(1000000L * wq) div wtot"))
      .select(col("segment"), col("n_h"), col("wq"), col("share_ppm"),
        col("alloc"))
      .orderBy(col("segment"))
  }

  def q307NeymanAllocation(spark: SparkSession, dir: String): DataFrame =
    neymanAllocation(Tables.customer(spark, dir), budget = 1000)

  val q307Sql: String =
    """WITH st AS (
      |  SELECT c_mktsegment AS segment, COUNT(*) AS n_h,
      |    SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS s1,
      |    SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) *
      |        CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS s2
      |  FROM customer GROUP BY 1),
      |w AS (
      |  SELECT segment, n_h,
      |    CAST(FLOOR(sqrt(CAST(n_h * s2 - s1 * s1 AS DOUBLE)) * 1e2 + 0.5)
      |      AS BIGINT) AS wq
      |  FROM st),
      |tot AS (SELECT SUM(wq) AS wtot FROM w),
      |g AS (
      |  SELECT segment, n_h, wq,
      |    CAST((1000 * wq) // wtot AS BIGINT) AS base,
      |    CAST((1000 * wq) % wtot AS BIGINT) AS rem,
      |    CAST((1000000 * wq) // wtot AS BIGINT) AS share_ppm
      |  FROM w CROSS JOIN tot),
      |s AS (SELECT 1000 - SUM(base) AS short FROM g)
      |SELECT segment, n_h, wq, share_ppm,
      |  base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, segment)
      |    <= short THEN 1 ELSE 0 END AS alloc
      |FROM g CROSS JOIN s ORDER BY segment""".stripMargin

  // --------------------------------------------------------------------------
  // q308 — RANDOMIZED-RESPONSE FREQUENCY DEBIASING: each document
  // reports its language truthfully with probability 3/4, else a
  // pseudo-uniform draw over the k-language domain (both choices
  // md5-derived — deterministic, partition-invariant, engine-portable).
  // The unbiased estimator n̂_l = (4k·obs_l − n)/(3k) is exact integer
  // cross-multiplication; the readout compares it to the true counts —
  // the local-DP telemetry pattern for sensitive-attribute histograms.
  //
  // Scale: row-local mechanism + one k-row domain join + hash
  // aggregates; the language-domain rank window is domain-bounded
  // (allowlisted, q119's marginal class).
  def rrDebias(docs: DataFrame): DataFrame = {
    val langs = docs.select(col("lang").as("true_lang")).distinct()
      .withColumn("idx",
        row_number().over(Window.orderBy(col("true_lang"))) - 1)
    val k = langs.agg(count(lit(1)).as("k"))
    // flip ~1/4 of rows; replacement index is an independent md5 draw
    val mech = docs.select(col("doc_id"), col("lang"))
      .withColumn("u", expr(
        "cast(conv(substring(md5(concat('rr', cast(doc_id as string))), 1, 8), 16, 10) as bigint)"))
      .crossJoin(broadcast(k))
      .withColumn("ridx", when(col("u") % 4 === 0, expr("(u div 16) % k")))
    val reported = mech
      .join(broadcast(langs), mech("ridx") === langs("idx"), "left")
      .withColumn("reported", coalesce(col("true_lang"), col("lang")))
    val obs = reported.groupBy(col("reported").as("lang"))
      .agg(count(lit(1)).as("n_obs"))
    val truth = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_true"))
    val tot = docs.agg(count(lit(1)).as("n")).crossJoin(k)
    truth.join(obs, Seq("lang"), "left")
      .na.fill(0L, Seq("n_obs"))
      .crossJoin(broadcast(tot))
      .withColumn("est_e2", expr("(100L * (4L * k * n_obs - n)) div (3L * k)"))
      .withColumn("err_e2", col("est_e2") - lit(100L) * col("n_true"))
      .select(col("lang"), col("n_true"), col("n_obs"), col("est_e2"),
        col("err_e2"))
      .orderBy(col("lang"))
  }

  def q308RrDebias(spark: SparkSession, dir: String): DataFrame =
    rrDebias(Tables.documents(spark, dir))

  val q308Sql: String =
    """WITH langs AS (
      |  SELECT true_lang, ROW_NUMBER() OVER (ORDER BY true_lang) - 1 AS idx
      |  FROM (SELECT DISTINCT lang AS true_lang FROM documents)),
      |k AS (SELECT COUNT(*) AS k FROM langs),
      |mech AS (
      |  SELECT doc_id, lang,
      |    ('0x' || substr(md5('rr' || doc_id::VARCHAR), 1, 8))::BIGINT AS u
      |  FROM documents),
      |rep AS (
      |  SELECT m.doc_id,
      |    CASE WHEN m.u % 4 = 0 THEN l.true_lang ELSE m.lang END AS reported
      |  FROM mech m CROSS JOIN k
      |  LEFT JOIN langs l ON m.u % 4 = 0
      |    AND (m.u // 16) % k.k = l.idx),
      |obs AS (SELECT reported AS lang, COUNT(*) AS n_obs FROM rep GROUP BY 1),
      |tr AS (SELECT lang, COUNT(*) AS n_true FROM documents GROUP BY 1),
      |tot AS (SELECT COUNT(*) AS n FROM documents)
      |SELECT tr.lang, tr.n_true, COALESCE(obs.n_obs, 0) AS n_obs,
      |  CAST((100 * (4 * k.k * COALESCE(obs.n_obs, 0) - tot.n)) // (3 * k.k)
      |    AS BIGINT) AS est_e2,
      |  CAST((100 * (4 * k.k * COALESCE(obs.n_obs, 0) - tot.n)) // (3 * k.k)
      |    - 100 * tr.n_true AS BIGINT) AS err_e2
      |FROM tr LEFT JOIN obs USING (lang) CROSS JOIN tot CROSS JOIN k
      |ORDER BY tr.lang""".stripMargin

  // --------------------------------------------------------------------------
  // q309 — BITMAP-INDEX INTERSECTION: build one compressed-word bitmap
  // per o_orderstatus value and one per o_orderpriority value (62-bit
  // words keyed by o_orderkey div 62 — 62 keeps every set bit positive
  // in signed arithmetic on both engines), then count every
  // (status, priority) co-occurrence by ANDing words and summing
  // popcounts — the classic OLAP bitmap-index evaluation strategy,
  // verified against the plain GROUP BY the oracle runs.
  //
  // Scale: bitmap build is one hash aggregate per (value, word) —
  // |rows|/62 words per value; the intersection is an equi-join on the
  // word id with bounded per-word fan-out (|statuses| × |priorities|).
  // A 100 TB lift keys words by a densified row index (q169) instead of
  // the natural key.
  def bitmapIntersect(orders: DataFrame): DataFrame = {
    val words = orders.select(col("o_orderstatus"), col("o_orderpriority"),
      expr("o_orderkey div 62").as("wid"),
      expr("shiftleft(1L, cast(o_orderkey % 62 as int))").as("bit"))
    val sBm = words.groupBy(col("o_orderstatus"), col("wid"))
      .agg(expr("bit_or(bit)").as("sw"))
    val pBm = words.groupBy(col("o_orderpriority"), col("wid"))
      .agg(expr("bit_or(bit)").as("pw"))
    sBm.join(pBm, Seq("wid"))
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(expr("cast(sum(bit_count(sw & pw)) as bigint)").as("n"))
      .filter(col("n") > 0)
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
  }

  def q309BitmapIntersect(spark: SparkSession, dir: String): DataFrame =
    bitmapIntersect(Tables.orders(spark, dir))

  val q309Sql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      |FROM orders
      |GROUP BY 1, 2
      |HAVING COUNT(*) > 0
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q306_kneser_ney", q306KneserNey _, Some(q306Sql)),
    ("q307_neyman_allocation", q307NeymanAllocation _, Some(q307Sql)),
    ("q308_rr_debias", q308RrDebias _, Some(q308Sql)),
    ("q309_bitmap_intersect", q309BitmapIntersect _, Some(q309Sql)))
}
