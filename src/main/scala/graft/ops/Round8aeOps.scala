package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 thirty-first operator batch: isotonic calibration via the
  * exact PAVA minimax identity and Bradley–Terry preference strengths
  * via fixed-point MM iterations — monotone probability repair and
  * pairwise-preference ranking on the §8.4 exact-integer discipline.
  */
object Round8aeOps {

  // --------------------------------------------------------------------------
  // q367 — ISOTONIC CALIBRATION (PAVA): q224 DIAGNOSES miscalibration;
  // this REPAIRS it — the standard monotone recalibration map. On the
  // bounded 100-bin score grid the pool-adjacent-violators fit has the
  // closed minimax form fit(i) = max_{a≤i} min_{b≥i} avg(a..b), and
  // because floor is monotone, computing every block average as the
  // exact integer floor (10⁶·Δpos) div Δn and taking max-min of those
  // integers yields EXACTLY floor(10⁶·true PAVA value) — no float
  // enters at any point. Score/label = q224's synthetic model
  // (md5-dyadic uniform + class shift), so the two queries form a
  // diagnose→repair pair on identical inputs.
  //
  // Scale: one hash aggregate to ≤100 bins; the O(k²) block table and
  // O(k³) minimax join are grid-sized (≤171k rows), broadcast-local.
  def isotonicFromBinned(binned: DataFrame): DataFrame = {
    val w = Window.orderBy(col("bin")).rowsBetween(Window.unboundedPreceding, 0)
    val pre = binned
      .withColumn("cn", sum(col("n")).over(w))
      .withColumn("cp", sum(col("pos")).over(w))
      .localCheckpoint()
    val pairs = pre.as("x").join(pre.as("y"), col("x.bin") <= col("y.bin"))
      .select(col("x.bin").as("a"), col("y.bin").as("bb"),
        expr("(1000000L * (y.cp - (x.cp - x.pos))) div (y.cn - (x.cn - x.n))")
          .as("r"))
    val fit = pairs
      .join(binned.select(col("bin").as("i")),
        col("a") <= col("i") && col("i") <= col("bb"))
      .groupBy(col("i"), col("a")).agg(min(col("r")).as("mr"))
      .groupBy(col("i")).agg(max(col("mr")).as("iso_ppm"))
    binned.join(fit, col("bin") === col("i"))
      .select(col("bin"), col("n"), col("pos"),
        expr("(1000000L * pos) div n").as("raw_ppm"), col("iso_ppm"))
      .orderBy(col("bin"))
  }

  def q367Isotonic(spark: SparkSession, dir: String): DataFrame = {
    val u = (conv(substring(md5(concat(lit("cal:"),
      col("event_id").cast("string"))), 1, 13), 16, 10)
      .cast("long").cast("double") + 0.5) / lit(4503599627370496.0)
    val binned = Tables.events(spark, dir)
      .select((col("event_type") === "purchase").as("p_lab"),
        (u * 0.8 + when(col("event_type") === "purchase", 0.2).otherwise(0.0))
          .as("p"))
      .withColumn("bin", floor(col("p") * 100).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), count_if(col("p_lab")).as("pos"))
    isotonicFromBinned(binned)
  }

  val q367Sql: String =
    """WITH sc AS (
      |  SELECT event_type = 'purchase' AS pos,
      |    (('0x' || substr(md5('cal:' || event_id::VARCHAR), 1, 13))::BIGINT + 0.5)
      |      / 4503599627370496.0 * 0.8
      |      + CASE WHEN event_type = 'purchase' THEN 0.2 ELSE 0.0 END AS p
      |  FROM events),
      |bn AS (
      |  SELECT CAST(FLOOR(p * 100) AS BIGINT) AS bin, COUNT(*) AS n,
      |    CAST(COUNT(*) FILTER (pos) AS BIGINT) AS pos
      |  FROM sc GROUP BY 1),
      |pre AS (
      |  SELECT bin, n, pos,
      |    SUM(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cn,
      |    SUM(pos) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cp
      |  FROM bn),
      |pairs AS (
      |  SELECT x.bin AS a, y.bin AS bb,
      |    (1000000 * (y.cp - (x.cp - x.pos))) // (y.cn - (x.cn - x.n)) AS r
      |  FROM pre x JOIN pre y ON x.bin <= y.bin),
      |tri AS (
      |  SELECT g.bin AS i, p.a, MIN(p.r) AS mr
      |  FROM pairs p JOIN bn g ON p.a <= g.bin AND g.bin <= p.bb
      |  GROUP BY 1, 2),
      |fit AS (SELECT i, MAX(mr) AS iso_ppm FROM tri GROUP BY 1)
      |SELECT bn.bin, bn.n, bn.pos,
      |  CAST((1000000 * bn.pos) // bn.n AS BIGINT) AS raw_ppm,
      |  CAST(iso_ppm AS BIGINT) AS iso_ppm
      |FROM bn JOIN fit ON bn.bin = fit.i ORDER BY bin""".stripMargin

  // --------------------------------------------------------------------------
  // q368 — BRADLEY–TERRY PREFERENCE STRENGTHS: turn within-order price
  // dominance between supplier nations into pairwise comparisons and
  // fit the BT model — the estimator preference-data pipelines (RLHF
  // reward prep, ranker evals) use to collapse noisy pairwise wins
  // into per-item strengths. Eight MM iterations
  //   p_i ← W_i / Σ_j m_ij/(p_i+p_j)
  // run ENTIRELY in fixed-point ppm (per-term DECIMAL(38,0) floors,
  // floor renorm to k·10⁶ — q340/q350's discipline), so the trajectory
  // is engine-identical; never-winning items converge to strength 0,
  // the true boundary MLE.
  //
  // Scale: the comparison build is one orderkey self-join (bounded
  // per-order fan-out) + a broadcast supplier dim; iterations are
  // 25-row grid joins with localCheckpoint lineage truncation.
  def btFromWins(wins: DataFrame, iters: Int): DataFrame = {
    val wloc = wins.localCheckpoint()
    val m = wloc.select(col("w").as("i"), col("l").as("j"), col("c"))
      .unionByName(wloc.select(col("l").as("i"), col("w").as("j"), col("c")))
      .groupBy(col("i"), col("j")).agg(sum(col("c")).as("m"))
      .localCheckpoint()
    val wtot = wloc.groupBy(col("w").as("i")).agg(sum(col("c")).as("wi"))
    val items = m.select(col("i")).distinct()
    val k = items.agg(count(lit(1)).as("k"))
    var p = items.select(col("i"), lit(1000000L).as("p"))
    for (_ <- 1 to iters) {
      val d = m
        .join(p, Seq("i"))
        .join(p.select(col("i").as("j"), col("p").as("pj")), Seq("j"))
        .groupBy(col("i"))
        .agg(sum(expr(
          """(cast(m as decimal(38,0)) * 1000000000000)
            | div greatest(p + pj, 1L)""".stripMargin)).as("d"))
      val raw = d.join(wtot, Seq("i"), "left")
        .select(col("i"), expr(
          """cast((cast(coalesce(wi, 0L) as decimal(38,0)) * 1000000000000)
            | div d as bigint)""".stripMargin).as("raw"))
        .localCheckpoint()
      val s = raw.agg(sum(col("raw")).as("sraw"))
      p = raw.crossJoin(broadcast(s)).crossJoin(broadcast(k))
        .select(col("i"), expr(
          """cast((cast(raw as decimal(38,0)) * k * 1000000L)
            | div sraw as bigint)""".stripMargin).as("p"))
    }
    p.join(wtot, Seq("i"), "left")
      .join(m.groupBy(col("i")).agg(sum(col("m")).as("mi")), Seq("i"))
      .select(col("i").as("item"), coalesce(col("wi"), lit(0L)).as("wins"),
        col("mi").as("comparisons"), col("p").as("strength_ppm"))
      .orderBy(col("item"))
  }

  def q368BradleyTerry(spark: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(spark, dir)
      .select(col("s_suppkey").as("sk"), col("s_nationkey").cast("long").as("nat"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
        col("l_suppkey").as("sk"),
        expr("cast(floor(l_extendedprice * 100 + 0.5d) as bigint)").as("price"))
      .join(broadcast(sup), Seq("sk"))
    val wins = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.ln") < col("b.ln"))
      .filter(col("a.nat") =!= col("b.nat") && col("a.price") =!= col("b.price"))
      .select(when(col("a.price") > col("b.price"), col("a.nat"))
          .otherwise(col("b.nat")).as("w"),
        when(col("a.price") > col("b.price"), col("b.nat"))
          .otherwise(col("a.nat")).as("l"))
      .groupBy(col("w"), col("l")).agg(count(lit(1)).as("c"))
    btFromWins(wins, iters = 8)
      .withColumnRenamed("item", "nation")
  }

  val q368Sql: String = {
    def step(prev: String, cur: String): String =
      s"""${cur}_d AS (
         |  SELECT m.i, SUM((m.m::HUGEINT * 1000000000000)
         |    // GREATEST(pa.p + pb.p, 1)) AS d
         |  FROM m JOIN $prev pa ON m.i = pa.i JOIN $prev pb ON m.j = pb.i
         |  GROUP BY 1),
         |${cur}_r AS (
         |  SELECT d.i, (COALESCE(wi, 0)::HUGEINT * 1000000000000) // d AS raw
         |  FROM ${cur}_d d LEFT JOIN wt ON d.i = wt.i),
         |${cur}_s AS (SELECT SUM(raw) AS sraw FROM ${cur}_r),
         |$cur AS MATERIALIZED (
         |  SELECT i, (raw * k * 1000000) // sraw AS p
         |  FROM ${cur}_r, ${cur}_s, kk)""".stripMargin
    val steps = (1 to 8).map(i => step(s"it${i - 1}", s"it$i")).mkString(",\n|")
    s"""WITH li AS (
       |  SELECT l_orderkey AS ok, l_linenumber AS ln, s_nationkey AS nat,
       |    CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS price
       |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey),
       |wins AS MATERIALIZED (
       |  SELECT CASE WHEN a.price > b.price THEN a.nat ELSE b.nat END AS w,
       |    CASE WHEN a.price > b.price THEN b.nat ELSE a.nat END AS l,
       |    COUNT(*) AS c
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.ln < b.ln
       |  WHERE a.nat <> b.nat AND a.price <> b.price
       |  GROUP BY 1, 2),
       |m AS MATERIALIZED (
       |  SELECT i, j, SUM(c) AS m FROM (
       |    SELECT w AS i, l AS j, c FROM wins
       |    UNION ALL SELECT l, w, c FROM wins) GROUP BY 1, 2),
       |wt AS (SELECT w AS i, SUM(c) AS wi FROM wins GROUP BY 1),
       |kk AS (SELECT COUNT(DISTINCT i) AS k FROM m),
       |it0 AS MATERIALIZED (SELECT DISTINCT i, 1000000::HUGEINT AS p FROM m),
       |$steps
       |SELECT m.i AS nation, CAST(COALESCE(wt.wi, 0) AS BIGINT) AS wins,
       |  CAST(SUM(m.m) AS BIGINT) AS comparisons,
       |  CAST(ANY_VALUE(it8.p) AS BIGINT) AS strength_ppm
       |FROM m JOIN it8 ON m.i = it8.i LEFT JOIN wt ON m.i = wt.i
       |GROUP BY m.i, wt.wi ORDER BY nation""".stripMargin
  }

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q367_isotonic", q367Isotonic _, Some(q367Sql)),
    ("q368_bradley_terry", q368BradleyTerry _, Some(q368Sql)))
}
