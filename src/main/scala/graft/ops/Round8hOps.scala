package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 eighth operator batch: rank correlation, Apriori candidate
  * pruning, the MRR/recall retrieval readout, and sweep-line peak
  * concurrency — all on the §8.4 exact-integer discipline.
  */
object Round8hOps {

  // --------------------------------------------------------------------------
  // q316 — SPEARMAN RANK CORRELATION per market segment between customer
  // account balance and realized order spend (cents, exact). Ties use
  // average ranks; to stay integer the ranks are DOUBLED: r2 = 2·rank_min
  // + cnt − 1 (= 2× the tied average rank). Pearson-on-ranks sufficient
  // statistics (n, Σr, Σr², Σrxry) are exact BIGINTs; the three
  // cross-multiplied moments num/dx/dy ship as exact integers and ρ =
  // num / (√dx·√dy) is two correctly-rounded sqrts + one division +
  // pround — bit-identical across engines.
  //
  // Scale: the rank windows are partitioned by segment (5 groups — at
  // 100 TB lift the per-segment rank to q169's bucketed two-pass, or
  // for the bounded-cents balance axis q199's value-histogram rank);
  // everything after the ranks is one hash aggregate per segment.
  // Overflow: n·Σr² ≤ 4n⁴ ≈ 3.3e18 at the 10× decade probe — inside
  // BIGINT; the 100 TB lift is DECIMAL(38,0) (q307's pattern).
  def spearmanBySegment(base: DataFrame): DataFrame = {
    def r2(v: String): org.apache.spark.sql.Column =
      lit(2L) * rank().over(Window.partitionBy(col("segment")).orderBy(col(v))) +
        count(lit(1)).over(Window.partitionBy(col("segment"), col(v))) - lit(1L)
    base
      .withColumn("rx", r2("x")).withColumn("ry", r2("y"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n"),
        sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
        sum(col("rx") * col("ry")).as("sxy"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"))
      .withColumn("num", expr("n * sxy - sx * sy"))
      .withColumn("dx", expr("n * sxx - sx * sx"))
      .withColumn("dy", expr("n * syy - sy * sy"))
      .select(col("segment"), col("n"), col("num"), col("dx"), col("dy"),
        when(col("dx") === 0L || col("dy") === 0L, lit(null))
          .otherwise(Num.pround(
            col("num") / (sqrt(col("dx")) * sqrt(col("dy"))), 6))
          .as("rho_spearman"))
      .orderBy(col("segment"))
  }

  def q316Spearman(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select(
      col("c_custkey"), col("c_mktsegment").as("segment"),
      expr("cast(floor(c_acctbal * 100 + 0.5d) as bigint)").as("x"))
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(expr("sum(cast(floor(o_totalprice * 100 + 0.5d) as bigint))").as("y0"))
    val base = cust.join(spend, col("c_custkey") === col("o_custkey"), "left")
      .select(col("segment"), col("x"), coalesce(col("y0"), lit(0L)).as("y"))
    spearmanBySegment(base)
  }

  val q316Sql: String =
    """WITH cust AS (
      |  SELECT c_custkey, c_mktsegment AS segment,
      |    CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS x
      |  FROM customer),
      |sp AS (
      |  SELECT o_custkey,
      |    SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS y0
      |  FROM orders GROUP BY 1),
      |b AS (
      |  SELECT segment, x, COALESCE(y0, 0) AS y
      |  FROM cust LEFT JOIN sp ON c_custkey = o_custkey),
      |r AS (
      |  SELECT segment,
      |    2 * RANK() OVER (PARTITION BY segment ORDER BY x)
      |      + COUNT(*) OVER (PARTITION BY segment, x) - 1 AS rx,
      |    2 * RANK() OVER (PARTITION BY segment ORDER BY y)
      |      + COUNT(*) OVER (PARTITION BY segment, y) - 1 AS ry
      |  FROM b),
      |s AS (
      |  SELECT segment, COUNT(*) AS n, SUM(rx) AS sx, SUM(ry) AS sy,
      |    SUM(rx * ry) AS sxy, SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy
      |  FROM r GROUP BY 1)
      |SELECT segment, n,
      |  CAST(n * sxy - sx * sy AS BIGINT) AS num,
      |  CAST(n * sxx - sx * sx AS BIGINT) AS dx,
      |  CAST(n * syy - sy * sy AS BIGINT) AS dy,
      |  CASE WHEN n * sxx = sx * sx OR n * syy = sy * sy THEN NULL
      |    ELSE FLOOR((CAST(n * sxy - sx * sy AS DOUBLE)
      |      / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
      |         * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))) * 1e6 + 0.5) / 1e6
      |  END AS rho_spearman
      |FROM s ORDER BY segment""".stripMargin

  // --------------------------------------------------------------------------
  // q317 — APRIORI FREQUENT TRIPLES: 3-itemsets co-ordered ≥ 2 times,
  // with the level-wise candidate prune that makes Apriori scale: items
  // are first restricted to parts appearing in some FREQUENT PAIR (the
  // q198 level-2 table) — the downward-closure property guarantees no
  // frequent triple is lost. Readout: exact support_ppm and the
  // 3-way lift vs independence.
  //
  // Scale: triple fan-out is a co-partitioned double self-join on the
  // order key, bounded by basket size (C(7,3) = 35 per order — never
  // O(parts³)); the prune semi-join shrinks the input before the cubic
  // fan-out; per-item counts and the order total are broadcast. At
  // 100 TB raise both minsups proportionally (support is a fraction).
  def aprioriTriples(items0: DataFrame, minsup: Long): DataFrame = {
    // one distinct shuffle feeds five consumers (q198's staging rule)
    val items = items0.select(col("ok"), col("p")).distinct().localCheckpoint()
    val nOrd = items.agg(countDistinct(col("ok")).as("n_orders"))
    val ic = items.groupBy(col("p")).agg(count(lit(1)).as("c"))
    val a = items.select(col("ok"), col("p").as("p1"))
    val b = items.select(col("ok"), col("p").as("p2"))
    val c3 = items.select(col("ok"), col("p").as("p3"))
    val fp = a.join(b, Seq("ok")).filter(col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minsup)
    val fpParts = fp.select(col("p1").as("p"))
      .union(fp.select(col("p2").as("p"))).distinct()
    val pruned = items.join(fpParts, Seq("p"), "left_semi")
    val pa = pruned.select(col("ok"), col("p").as("p1"))
    val pb = pruned.select(col("ok"), col("p").as("p2"))
    val pc = pruned.select(col("ok"), col("p").as("p3"))
    pa.join(pb, Seq("ok")).filter(col("p1") < col("p2"))
      .join(pc, Seq("ok")).filter(col("p2") < col("p3"))
      .groupBy(col("p1"), col("p2"), col("p3")).agg(count(lit(1)).as("c123"))
      .filter(col("c123") >= minsup)
      .join(broadcast(ic.select(col("p").as("p1"), col("c").as("c1"))), Seq("p1"))
      .join(broadcast(ic.select(col("p").as("p2"), col("c").as("c2"))), Seq("p2"))
      .join(broadcast(ic.select(col("p").as("p3"), col("c").as("c3"))), Seq("p3"))
      .crossJoin(broadcast(nOrd))
      .select(col("p1"), col("p2"), col("p3"), col("c123"),
        expr("(1000000L * c123) div n_orders").as("support_ppm"),
        Num.pround(
          col("n_orders").cast("double") * col("n_orders") * col("c123") /
            (col("c1").cast("double") * col("c2") * col("c3")), 6).as("lift"))
      .orderBy(col("p1"), col("p2"), col("p3"))
  }

  def q317AprioriTriples(spark: SparkSession, dir: String): DataFrame =
    aprioriTriples(
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")),
      minsup = 2L)

  val q317Sql: String =
    """WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
      |n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM items),
      |ic AS (SELECT p, COUNT(*) AS c FROM items GROUP BY 1),
      |fp AS (
      |  SELECT a.p AS p1, b.p AS p2
      |  FROM items a JOIN items b ON a.ok = b.ok AND a.p < b.p
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |fpp AS (SELECT p1 AS p FROM fp UNION SELECT p2 FROM fp),
      |pruned AS (SELECT * FROM items WHERE p IN (SELECT p FROM fpp)),
      |tri AS (
      |  SELECT a.p AS p1, b.p AS p2, c.p AS p3, COUNT(*) AS c123
      |  FROM pruned a
      |  JOIN pruned b ON a.ok = b.ok AND a.p < b.p
      |  JOIN pruned c ON a.ok = c.ok AND b.p < c.p
      |  GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2)
      |SELECT p1, p2, p3, c123,
      |  CAST((1000000 * c123) // n_orders AS BIGINT) AS support_ppm,
      |  FLOOR((CAST(n_orders AS DOUBLE) * n_orders * c123
      |    / (CAST(i1.c AS DOUBLE) * i2.c * i3.c)) * 1e6 + 0.5) / 1e6 AS lift
      |FROM tri CROSS JOIN n
      |JOIN ic i1 ON tri.p1 = i1.p
      |JOIN ic i2 ON tri.p2 = i2.p
      |JOIN ic i3 ON tri.p3 = i3.p
      |ORDER BY p1, p2, p3""".stripMargin

  // --------------------------------------------------------------------------
  // q318 — MRR + RECALL@10 retrieval readout: the reciprocal-rank metric
  // that completes the eval family (q193 AUC, q251 nDCG, q229 prefix
  // recall). Per query vector (vec_id < 20): candidates ranked by cosine
  // (pround 6 BEFORE ranking, vec_id tie-break — q229's rule); first
  // relevant rank, rr_ppm = 10⁶ div rank, hits@10 and recall@10 as exact
  // BIGINT ppm — every shipped cell is an integer.
  //
  // Scale: one corpus pass against 20 broadcast queries; the rank window
  // is partitioned by query. At 100 TB the first-relevant rank needs no
  // global sort: argmax the best relevant (sim, id) pair, then COUNT the
  // candidates strictly better — two aggregates and a join.
  def mrrEval(emb: DataFrame, nQueries: Int): DataFrame = {
    val base = emb.select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    val queries = base.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"), col("v").as("qv"))
    val relTot = base.groupBy(col("label")).agg(count(lit(1)).as("n_label"))
    val sim = Num.pround(
      expr("aggregate(zip_with(v, qv, (x, y) -> x * y), 0.0d, (a, x) -> a + x)") /
        sqrt(expr("aggregate(v, 0.0d, (a, x) -> a + x * x)") *
          expr("aggregate(qv, 0.0d, (a, x) -> a + x * x)")), 6)
    base.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("qlabel"), col("vec_id"), col("label"), sim.as("sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))))
      .withColumn("rel", (col("label") === col("qlabel")).cast("long"))
      .groupBy(col("qid"), col("qlabel"))
      .agg(min(when(col("rel") === 1L, col("rk"))).as("first_rel_rank"),
        sum(when(col("rel") === 1L && col("rk") <= 10, 1L).otherwise(0L))
          .as("hits_at_10"))
      .join(broadcast(relTot), col("qlabel") === col("label"))
      .withColumn("n_rel", col("n_label") - 1) // the query itself is excluded
      .select(col("qid"), col("n_rel"), col("first_rel_rank"),
        expr("1000000L div first_rel_rank").as("rr_ppm"),
        col("hits_at_10"),
        expr("(1000000L * hits_at_10) div n_rel").as("recall10_ppm"))
      .orderBy(col("qid"))
  }

  def q318MrrEval(spark: SparkSession, dir: String): DataFrame =
    mrrEval(Tables.embeddings(spark, dir), nQueries = 20)

  val q318Sql: String =
    """WITH base AS (
      |  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
      |  FROM embeddings),
      |q AS (SELECT vec_id AS qid, label AS qlabel, v AS qv FROM base WHERE vec_id < 20),
      |rt AS (SELECT label, COUNT(*) AS n_label FROM base GROUP BY 1),
      |sc AS (
      |  SELECT qid, qlabel, b.vec_id, b.label,
      |    FLOOR((list_reduce(list_transform(range(1, 65), i -> b.v[i] * qv[i]), (a, x) -> a + x)
      |      / sqrt(list_reduce(list_transform(range(1, 65), i -> b.v[i] * b.v[i]), (a, x) -> a + x)
      |        * list_reduce(list_transform(range(1, 65), i -> qv[i] * qv[i]), (a, x) -> a + x))) * 1e6 + 0.5) / 1e6
      |      AS sim
      |  FROM base b CROSS JOIN q WHERE b.vec_id <> qid),
      |rk AS (
      |  SELECT qid, qlabel, label, sim,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
      |  FROM sc),
      |ag AS (
      |  SELECT qid, qlabel,
      |    MIN(CASE WHEN label = qlabel THEN rk END) AS first_rel_rank,
      |    SUM(CASE WHEN label = qlabel AND rk <= 10 THEN 1 ELSE 0 END) AS hits_at_10
      |  FROM rk GROUP BY 1, 2)
      |SELECT qid, rt.n_label - 1 AS n_rel,
      |  CAST(first_rel_rank AS BIGINT) AS first_rel_rank,
      |  CAST(1000000 // first_rel_rank AS BIGINT) AS rr_ppm,
      |  CAST(hits_at_10 AS BIGINT) AS hits_at_10,
      |  CAST((1000000 * hits_at_10) // (rt.n_label - 1) AS BIGINT) AS recall10_ppm
      |FROM ag JOIN rt ON ag.qlabel = rt.label
      |ORDER BY qid""".stripMargin

  // --------------------------------------------------------------------------
  // q319 — PEAK CONCURRENCY sweep line: give every event a 30-minute
  // activity interval (half-open [ts, ts+1800s)) and report, per day,
  // the maximum number of simultaneously-active intervals and the first
  // instant the peak is reached. Intervals crossing midnight are split
  // into day-clipped pieces so days are independent; all arithmetic in
  // exact epoch micros (q313's discipline). Ends sort BEFORE starts at
  // the same instant (delta −1 < +1), so touching intervals don't count
  // as overlapping.
  //
  // Scale: the running sum is the TWO-LEVEL exclusive-scan shape — a
  // within-(day, hour) running sum plus a per-day prefix over the 24
  // hour totals (a 30×24 grid joined back by equi-key) — so no partition
  // ever holds more than an hour of deltas; the oracle's single
  // per-day window is the same math. Peak/first-instant per day is one
  // argmax aggregate (min t at max cum is order-deterministic: the
  // multiset of (t, cum) pairs is invariant to tie order within (t,
  // delta) groups).
  def peakConcurrency(events: DataFrame, lenSec: Long): DataFrame = {
    val DAY = 86400000000L
    val HOUR = 3600000000L
    val base = events.select(col("event_id"), unix_micros(col("ts")).as("s0"))
      .withColumn("e0", col("s0") + lit(lenSec * 1000000L))
      .withColumn("d0", expr(s"s0 div ${DAY}L"))
      .withColumn("dend", expr(s"(s0 div ${DAY}L + 1L) * ${DAY}L"))
    val pieces = base.select(col("event_id"), explode(expr(
      "filter(array(named_struct('d', d0, 't0', s0, 't1', least(e0, dend)), " +
        "named_struct('d', d0 + 1L, 't0', dend, 't1', e0)), p -> p.t1 > p.t0)"))
      .as("p"))
      .select(col("event_id"), col("p.d").as("d"), col("p.t0"), col("p.t1"))
    val deltas = pieces.select(col("event_id"), col("d"), explode(expr(
      "array(named_struct('t', t0, 'delta', 1L), named_struct('t', t1, 'delta', -1L))"))
      .as("x"))
      .select(col("event_id"), col("d"), col("x.t").as("t"), col("x.delta").as("delta"))
      .withColumn("h", least(expr(s"(t - d * ${DAY}L) div ${HOUR}L"), lit(23L)))
    val wh = Window.partitionBy(col("d"), col("h"))
      .orderBy(col("t"), col("delta"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumh = deltas.withColumn("cumh", sum(col("delta")).over(wh))
    val off = deltas.groupBy(col("d"), col("h")).agg(sum(col("delta")).as("ht"))
      .withColumn("off", coalesce(
        sum(col("ht")).over(Window.partitionBy(col("d")).orderBy(col("h"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("d"), col("h"), col("off"))
    cumh.join(broadcast(off), Seq("d", "h"))
      .withColumn("cum", col("off") + col("cumh"))
      .groupBy(col("d"))
      .agg(max(struct(col("cum").as("c"), (-col("t")).as("nt"))).as("m"))
      .select(col("d").as("day"), col("m.c").as("peak"),
        (-col("m.nt")).as("first_peak_us"))
      .orderBy(col("day"))
  }

  def q319PeakConcurrency(spark: SparkSession, dir: String): DataFrame =
    peakConcurrency(Tables.events(spark, dir), lenSec = 1800L)

  val q319Sql: String =
    """WITH ev AS (
      |  SELECT event_id, epoch_us(ts) AS s0, epoch_us(ts) + 1800000000 AS e0,
      |    epoch_us(ts) // 86400000000 AS d0,
      |    (epoch_us(ts) // 86400000000 + 1) * 86400000000 AS dend
      |  FROM events),
      |pieces AS (
      |  SELECT event_id, d0 AS d, s0 AS t0, LEAST(e0, dend) AS t1 FROM ev
      |  UNION ALL
      |  SELECT event_id, d0 + 1, dend, e0 FROM ev WHERE e0 > dend),
      |deltas AS (
      |  SELECT event_id, d, t0 AS t, 1 AS delta FROM pieces
      |  UNION ALL
      |  SELECT event_id, d, t1, -1 FROM pieces),
      |c AS (
      |  SELECT d, t,
      |    SUM(delta) OVER (PARTITION BY d ORDER BY t, delta, event_id
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM deltas),
      |m AS (SELECT d, MAX(cum) AS peak FROM c GROUP BY d)
      |SELECT c.d AS day, CAST(m.peak AS BIGINT) AS peak,
      |  CAST(MIN(t) AS BIGINT) AS first_peak_us
      |FROM c JOIN m ON c.d = m.d AND c.cum = m.peak
      |GROUP BY c.d, m.peak ORDER BY day""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q316_spearman", q316Spearman _, Some(q316Sql)),
    ("q317_apriori_triples", q317AprioriTriples _, Some(q317Sql)),
    ("q318_mrr_eval", q318MrrEval _, Some(q318Sql)),
    ("q319_peak_concurrency", q319PeakConcurrency _, Some(q319Sql)))
}
