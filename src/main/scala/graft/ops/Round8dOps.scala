package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 fourth operator batch: bipartite k-core peeling, a kNN
  * label-noise audit, Good–Turing frequency smoothing, integer-exact
  * autocorrelation, Herfindahl market concentration, and SAX motif
  * counting — graph/eval/LM/time-series surface the reference's [EXT]
  * north star needs but Spark has no built-in for. §8.4-compliant:
  * every hashed cell is an exact integer, a string, or a
  * `Num.pround` of a fixed-order deterministic double chain.
  */
object Round8dOps {

  // --------------------------------------------------------------------------
  // q300 — BIPARTITE K-CORE PEELING: iteratively delete customers with
  // < kc distinct parts and parts with < kp distinct customers from the
  // customer–part purchase graph (synchronous peel: both side filters are
  // computed against the SAME round's edge set, then applied together).
  // The (kc, kp)-core is the standard density backbone extraction before
  // graph embedding / co-occurrence mining; the per-round survivor counts
  // are the peel profile.
  //
  // Scale: each round is two hash aggregates (degree per side) and two
  // equi-joins on the node id — all shuffles on bounded-width keys, rounds
  // capped at 4. Each round's survivor edge set gets a LAZY localCheckpoint
  // (plan flattens to a LogicalRDD, so the e-subtree referenced by the
  // round's two degree aggregates AND the next round's joins computes once
  // via RDD-level stage reuse), and the per-round stats are 1-row
  // aggregates UNIONed into one lazy plan — a single final action instead
  // of rounds+1 eager collect jobs (measured 8.3 s → 2.6 s at sf0.1).
  // The checkpointed RDDs stay MEMORY_AND_DISK-cached until session GC —
  // bounded by rounds × |edges|, same peak as the old persist() chain.
  //
  // Determinism: counts only.
  def kcorePeel(edges: DataFrame, kc: Int, kp: Int, rounds: Int): DataFrame = {
    def stats(e: DataFrame, r: Int): DataFrame =
      e.agg(countDistinct(col("ck")).as("n_cust"),
        countDistinct(col("pk")).as("n_part"),
        count(lit(1)).as("n_edges"))
        .select(lit(r).as("round"), col("n_cust"), col("n_part"), col("n_edges"))
    var e = edges.localCheckpoint(false)
    var out = stats(e, 0)
    for (r <- 1 to rounds) {
      val cOk = e.groupBy(col("ck")).agg(count(lit(1)).as("dc"))
        .filter(col("dc") >= kc).select(col("ck"))
      val pOk = e.groupBy(col("pk")).agg(count(lit(1)).as("dp"))
        .filter(col("dp") >= kp).select(col("pk"))
      e = e.join(cOk, Seq("ck")).join(pOk, Seq("pk"))
        .select(col("ck"), col("pk")).localCheckpoint(false)
      out = out.union(stats(e, r))
    }
    out.orderBy(col("round"))
  }

  def q300KcorePeel(spark: SparkSession, dir: String): DataFrame = {
    val edges = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("ck"), col("l_partkey").as("pk"))
      .distinct()
    kcorePeel(edges, kc = 25, kp = 20, rounds = 4)
  }

  val q300Sql: String = {
    def peel(prev: String, i: Int): String =
      s"""c$i AS (SELECT ck FROM $prev GROUP BY ck HAVING COUNT(*) >= 25),
         |p$i AS (SELECT pk FROM $prev GROUP BY pk HAVING COUNT(*) >= 20),
         |e$i AS (SELECT ck, pk FROM $prev
         |  WHERE ck IN (SELECT ck FROM c$i) AND pk IN (SELECT pk FROM p$i))"""
        .stripMargin
    def st(i: Int): String =
      s"""SELECT $i AS round, COUNT(DISTINCT ck) AS n_cust,
         |  COUNT(DISTINCT pk) AS n_part, COUNT(*) AS n_edges FROM e$i"""
        .stripMargin
    s"""WITH e0 AS (
       |  SELECT DISTINCT o_custkey AS ck, l_partkey AS pk
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |${peel("e0", 1)},
       |${peel("e1", 2)},
       |${peel("e2", 3)},
       |${peel("e3", 4)}
       |${st(0)}
       |UNION ALL ${st(1)}
       |UNION ALL ${st(2)}
       |UNION ALL ${st(3)}
       |UNION ALL ${st(4)}
       |ORDER BY round""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q301 — kNN LABEL-NOISE AUDIT (confident-learning style): for a
  // bounded probe sample, find each probe's 3 nearest neighbours by
  // cosine among the OTHER vectors, take the plurality neighbour label
  // (ties: better best-rank, then smaller label), and report per true
  // label how many probes disagree with their neighbourhood — the
  // standard pre-training label-quality readout.
  //
  // Scale: the probe side is `orderBy(vec_id).limit(400)` — a BOUNDED,
  // deterministic eval sample broadcast against the corpus, so cost is
  // |corpus| × 400, linear in the corpus. At 100 TB the probe set stays a
  // fixed eval sample and candidate generation swaps to q42/q45's banded
  // joins; the vote/report stages are unchanged.
  //
  // Determinism: sims are the q40 fixed-order fold (zip_with + left
  // fold, identical to DuckDB's list_reduce), ranking ties break on
  // vec_id, and only integer vote counts are hashed.
  def knnLabelAudit(embeddings: DataFrame, probeEvery: Int, probeCap: Int,
                    k: Int): DataFrame = {
    val vd = expr("transform(embedding, x -> cast(x as double))")
    val base = embeddings
      .select(col("vec_id"), col("label"), vd.as("v"))
      .withColumn("n2", expr("aggregate(v, 0.0d, (a, x) -> a + x * x)"))
    val probes = base.filter(col("vec_id") % probeEvery === 0)
      .orderBy(col("vec_id")).limit(probeCap)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("v").as("qv"), col("n2").as("qn2"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    val top = base.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("dot",
        expr("aggregate(zip_with(v, qv, (x, y) -> x * y), 0.0d, (a, x) -> a + x)"))
      .withColumn("sim", col("dot") / sqrt(col("n2") * col("qn2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    val votes = top.groupBy(col("qid"), col("qlabel"), col("label").as("nlabel"))
      .agg(count(lit(1)).as("cnt"), min(col("rank")).as("rb"))
    val pred = votes.groupBy(col("qid"), col("qlabel"))
      .agg(min(struct((-col("cnt")).as("nc"), col("rb"), col("nlabel"))).as("m"))
      .select(col("qid"), col("qlabel"), col("m.nlabel").as("pred"))
    pred.groupBy(col("qlabel").as("label"))
      .agg(count(lit(1)).as("n_probes"),
        count_if(col("pred") =!= col("qlabel")).as("n_noisy"))
      .withColumn("noisy_ppm",
        expr("(1000000L * n_noisy) div n_probes"))
      .orderBy(col("label"))
  }

  def q301KnnLabelAudit(spark: SparkSession, dir: String): DataFrame =
    knnLabelAudit(Tables.embeddings(spark, dir), probeEvery = 5,
      probeCap = 400, k = 3)

  val q301Sql: String =
    """WITH base AS (
      |  SELECT vec_id, label, embedding::DOUBLE[] AS v,
      |    list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
      |      (a, b) -> a + b) AS n2
      |  FROM embeddings),
      |probes AS (
      |  SELECT vec_id AS qid, label AS qlabel, v AS qv, n2 AS qn2
      |  FROM base WHERE vec_id % 5 = 0 ORDER BY vec_id LIMIT 400),
      |sims AS (
      |  SELECT qid, qlabel, vec_id, label AS nlabel,
      |    list_reduce(list_transform(range(1, 65), i -> v[i] * qv[i]),
      |      (a, b) -> a + b) / sqrt(n2 * qn2) AS sim
      |  FROM base CROSS JOIN probes WHERE vec_id <> qid),
      |top AS (
      |  SELECT * FROM (
      |    SELECT qid, qlabel, nlabel,
      |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC)
      |        AS rank
      |    FROM sims) WHERE rank <= 3),
      |votes AS (
      |  SELECT qid, qlabel, nlabel, COUNT(*) AS cnt, MIN(rank) AS rb
      |  FROM top GROUP BY qid, qlabel, nlabel),
      |pred AS (
      |  SELECT qid, qlabel, nlabel AS pred FROM (
      |    SELECT qid, qlabel, nlabel,
      |      ROW_NUMBER() OVER (PARTITION BY qid
      |        ORDER BY cnt DESC, rb ASC, nlabel ASC) AS rn
      |    FROM votes) WHERE rn = 1)
      |SELECT qlabel AS label, COUNT(*) AS n_probes,
      |  CAST(COUNT(*) FILTER (pred <> qlabel) AS BIGINT) AS n_noisy,
      |  CAST((1000000 * COUNT(*) FILTER (pred <> qlabel)) // COUNT(*)
      |    AS BIGINT) AS noisy_ppm
      |FROM pred GROUP BY qlabel ORDER BY label""".stripMargin

  // --------------------------------------------------------------------------
  // q302 — GOOD–TURING FREQUENCY SMOOTHING over word-3-gram term
  // frequencies: counts-of-counts N_r, and the GT-adjusted count
  // r* = (r+1)·N_{r+1}/N_r as an exact ppm integer — the classical
  // smoothed LM estimate (and the standard "how much unseen mass is
  // left" readout for corpus coverage: P(unseen) = N_1/G).
  //
  // Scale: one row-local 3-gram expansion, one hash aggregate per gram,
  // one aggregate over the count domain (tiny), one self-join on r+1.
  // Corpus-linear; identical shape at any SF.
  //
  // Determinism: all counts exact BIGINT; r* ships as a floor-div ppm.
  def goodTuring(docs: DataFrame, maxR: Int): DataFrame = {
    // size(t) < 3 guard: Spark's sequence(0, negative) DESCENDS — it does
    // not return empty like DuckDB's generate_series — so short docs must
    // be cut explicitly to keep the two tokenizations identical
    val grams = docs
      .select(expr(
        "filter(split(lower(text), ' '), t -> t != '')").as("t"))
      .select(explode(expr(
        """if(size(t) >= 3,
          |   transform(sequence(0, size(t) - 3),
          |     i -> concat_ws(' ', t[i], t[i+1], t[i+2])),
          |   array())""".stripMargin)).as("g"))
    val m = grams.groupBy(col("g")).agg(count(lit(1)).as("c"))
    val cc = m.groupBy(col("c").as("r")).agg(count(lit(1)).as("n_types"))
    val nxt = cc.select((col("r") - 1).as("r"), col("n_types").as("next_types"))
    cc.join(nxt, Seq("r"), "left")
      .filter(col("r") <= maxR)
      .withColumn("r_star_ppm",
        expr("((r + 1) * next_types * 1000000L) div n_types"))
      .select(col("r").cast("long").as("r"), col("n_types"),
        coalesce(col("next_types"), lit(0L)).as("next_types"),
        col("r_star_ppm"))
      .orderBy(col("r"))
  }

  def q302GoodTuring(spark: SparkSession, dir: String): DataFrame =
    goodTuring(Tables.documents(spark, dir), maxR = 12)

  val q302Sql: String =
    s"""WITH gr AS (
       |  SELECT t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
       |  FROM (SELECT ${TextOps.toksSqlD} AS t FROM documents),
       |       UNNEST(generate_series(1, len(t) - 2)) AS u(i)),
       |m AS (SELECT g, COUNT(*) AS c FROM gr GROUP BY g),
       |cc AS (SELECT c AS r, COUNT(*) AS n_types FROM m GROUP BY c)
       |SELECT CAST(cc.r AS BIGINT) AS r, cc.n_types,
       |  CAST(COALESCE(nx.n_types, 0) AS BIGINT) AS next_types,
       |  CAST(((cc.r + 1) * nx.n_types * 1000000) // cc.n_types AS BIGINT)
       |    AS r_star_ppm
       |FROM cc LEFT JOIN cc nx ON nx.r = cc.r + 1
       |WHERE cc.r <= 12 ORDER BY r""".stripMargin

  // --------------------------------------------------------------------------
  // q303 — AUTOCORRELATION FUNCTION on exact integer sufficient
  // statistics: daily order counts x_t, and for each lag L in 1..14 the
  // Pearson r of (x_t, x_{t+L}) — the seasonality fingerprint (weekly
  // cadence shows as a lag-7 peak). num = n·Σxy − Σx·Σy and the two
  // denominator parts are EXACT BIGINTs (q234's sufficient-stats
  // discipline); only the final r is a double, derived from those exact
  // integers by one fixed IEEE chain.
  //
  // Scale: the corpus collapses to the calendar-day grid in one
  // aggregate; the lag expansion is a 14-row broadcast against that
  // bounded grid with an equi-join on the day index — corpus-size-
  // independent after the first aggregate. Overflow: at the 10× probe
  // daily counts ≈ 2·10³, so n·Σx² ≈ 730·730·4·10⁶ ≈ 2·10¹² « 2⁶³;
  // d1·d2 is computed in doubles (each factor < 2⁵³, exact).
  //
  // Determinism: num/d1/d2 exact; r6 = pround of sqrt/div over exact
  // inputs (correctly-rounded IEEE ops, identical both engines); the
  // degenerate d1·d2 = 0 case ships NULL in both.
  def acf(daily: DataFrame, maxLag: Int): DataFrame = {
    val spark = daily.sparkSession
    val idx = daily
      .withColumn("i", row_number().over(Window.orderBy(col("d"))))
      .select(col("i"), col("x"))
    val lags = spark.range(1, maxLag + 1).select(col("id").cast("int").as("lag"))
    val a = idx.select(col("i").as("ia"), col("x").as("xa"))
    val b = idx.select(col("i").as("ib"), col("x").as("xb"))
    val pairs = a.crossJoin(broadcast(lags))
      .join(b, col("ib") === col("ia") + col("lag"))
    val s = pairs.groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("xa")).as("sx"), sum(col("xb")).as("sy"),
        sum(col("xa") * col("xb")).as("sxy"),
        sum(col("xa") * col("xa")).as("sxx"),
        sum(col("xb") * col("xb")).as("syy"))
      .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("d1", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("d2", col("n") * col("syy") - col("sy") * col("sy"))
    s.select(col("lag"), col("n"), col("num"), col("d1"), col("d2"),
      when(col("d1") * col("d2") === 0, lit(null).cast("double"))
        .otherwise(Num.pround(
          col("num").cast("double") /
            sqrt(col("d1").cast("double") * col("d2").cast("double")), 6))
        .as("r6"))
      .orderBy(col("lag"))
  }

  def q303Acf(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("x"))
    acf(daily, maxLag = 14)
  }

  val q303Sql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS x
      |  FROM orders GROUP BY 1),
      |idx AS (SELECT ROW_NUMBER() OVER (ORDER BY d) AS i, x FROM daily),
      |pairs AS (
      |  SELECT l.lag, a.x AS xa, b.x AS xb
      |  FROM idx a
      |  CROSS JOIN (SELECT UNNEST(generate_series(1, 14)) AS lag) l
      |  JOIN idx b ON b.i = a.i + l.lag),
      |s AS (
      |  SELECT lag, COUNT(*) AS n, SUM(xa) AS sx, SUM(xb) AS sy,
      |    SUM(xa * xb) AS sxy, SUM(xa * xa) AS sxx, SUM(xb * xb) AS syy
      |  FROM pairs GROUP BY lag)
      |SELECT CAST(lag AS INT) AS lag, n,
      |  CAST(n * sxy - sx * sy AS BIGINT) AS num,
      |  CAST(n * sxx - sx * sx AS BIGINT) AS d1,
      |  CAST(n * syy - sy * sy AS BIGINT) AS d2,
      |  CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0 THEN NULL
      |    ELSE FLOOR((CAST(n * sxy - sx * sy AS DOUBLE) /
      |      sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
      |           CAST(n * syy - sy * sy AS DOUBLE))) * 1e6 + 0.5) / 1e6
      |  END AS r6
      |FROM s ORDER BY lag""".stripMargin

  // --------------------------------------------------------------------------
  // q304 — HERFINDAHL–HIRSCHMAN CONCENTRATION per nation: supplier
  // revenue shares (ppm, exact floor-div of exact cent sums), HHI =
  // Σ share², and the effective number of suppliers 1/Σ s² — the
  // standard market-concentration / source-diversity readout (the same
  // arithmetic scores training-data source concentration).
  //
  // Scale: one exact-decimal aggregate per (nation, supplier), one
  // per-nation total equi-joined back, row-local share math, one final
  // per-nation aggregate — two shuffles on bounded-width keys.
  // Overflow: cents ≤ ~2·10¹² per nation at sf0.1 ⇒ 10⁶·rev ≈ 10¹⁷ <
  // 2⁶³ (the 100 TB lift is DECIMAL(38,0) in both engines).
  //
  // Determinism: integers only (share_ppm is quantized BEFORE squaring,
  // so both engines square the same integers).
  def hhi(lineitem: DataFrame, supplier: DataFrame,
          nation: DataFrame): DataFrame = {
    val rev = lineitem
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("s_suppkey"))
      .agg(expr(
        "sum(cast(floor(l_extendedprice * 100 + 0.5d) as bigint))").as("cents"))
    val tot = rev.groupBy(col("n_name"))
      .agg(sum(col("cents")).as("tot"))
    rev.join(tot, Seq("n_name"))
      .withColumn("share_ppm", expr("(1000000L * cents) div tot"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        max(col("share_ppm")).as("top_share_ppm"),
        sum(col("share_ppm") * col("share_ppm")).as("ss"))
      .withColumn("hhi_ppm", expr("ss div 1000000L"))
      .withColumn("enp_e2", expr("100000000000000L div ss"))
      .select(col("n_name"), col("n_suppliers"), col("top_share_ppm"),
        col("hhi_ppm"), col("enp_e2"))
      .orderBy(col("n_name"))
  }

  def q304Hhi(spark: SparkSession, dir: String): DataFrame =
    hhi(Tables.lineitem(spark, dir), Tables.supplier(spark, dir),
      Tables.nation(spark, dir))

  val q304Sql: String =
    """WITH rev AS (
      |  SELECT n_name, s_suppkey,
      |    SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS cents
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  GROUP BY 1, 2),
      |tot AS (SELECT n_name, SUM(cents) AS tot FROM rev GROUP BY 1),
      |sh AS (
      |  SELECT rev.n_name,
      |    CAST((1000000 * cents) // tot AS BIGINT) AS share_ppm
      |  FROM rev JOIN tot USING (n_name))
      |SELECT n_name, COUNT(*) AS n_suppliers,
      |  MAX(share_ppm) AS top_share_ppm,
      |  CAST(SUM(share_ppm * share_ppm) // 1000000 AS BIGINT) AS hhi_ppm,
      |  CAST(100000000000000 // SUM(share_ppm * share_ppm) AS BIGINT) AS enp_e2
      |FROM sh GROUP BY n_name ORDER BY n_name""".stripMargin

  // --------------------------------------------------------------------------
  // q305 — SAX MOTIF COUNTING: symbolize the daily-revenue series into
  // quartile letters a–d (rank-based binning — ntile over the exact cent
  // grid, so no float z-normalization), group the letters into ISO-week
  // words, and count word frequencies — the classic symbolic-aggregate
  // (SAX) motif table for "which weekly shapes recur".
  //
  // Scale: the corpus collapses to the calendar-day grid in one
  // aggregate; everything after (ntile, week grouping, motif counts) is
  // grid-sized. The unpartitioned ntile window is calendar-bounded
  // (q167/q233's class — allowlisted in PlanLintSpec).
  //
  // Determinism: ntile ties are ordered by (cents, d) — total order,
  // identical both engines; outputs are strings and counts.
  def saxMotifs(daily: DataFrame): DataFrame = {
    val lettered = daily
      .withColumn("tile",
        ntile(4).over(Window.orderBy(col("cents"), col("d"))))
      .withColumn("letter", expr("char(tile + 96)"))
      .withColumn("wk", to_date(date_trunc("week", col("d"))))
    lettered.groupBy(col("wk"))
      .agg(array_join(
        expr("transform(array_sort(collect_list(struct(d, letter))), x -> x.letter)"),
        "").as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_weeks"))
      .orderBy(col("word"))
  }

  def q305SaxMotifs(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(expr(
        "sum(cast(floor(o_totalprice * 100 + 0.5d) as bigint))").as("cents"))
    saxMotifs(daily)
  }

  val q305Sql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      |  FROM orders GROUP BY 1),
      |lettered AS (
      |  SELECT d,
      |    chr(CAST(96 + NTILE(4) OVER (ORDER BY cents, d) AS INTEGER)) AS letter,
      |    date_trunc('week', d) AS wk
      |  FROM daily),
      |words AS (
      |  SELECT wk, STRING_AGG(letter, '' ORDER BY d) AS word
      |  FROM lettered GROUP BY wk)
      |SELECT word, COUNT(*) AS n_weeks
      |FROM words GROUP BY word ORDER BY word""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q300_kcore_peel", q300KcorePeel _, Some(q300Sql)),
    ("q301_knn_label_audit", q301KnnLabelAudit _, Some(q301Sql)),
    ("q302_good_turing", q302GoodTuring _, Some(q302Sql)),
    ("q303_acf", q303Acf _, Some(q303Sql)),
    ("q304_hhi", q304Hhi _, Some(q304Sql)),
    ("q305_sax_motifs", q305SaxMotifs _, Some(q305Sql)))
}
