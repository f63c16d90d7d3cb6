package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 twenty-first operator batch: Friedman's within-block rank
  * test and the pairwise source-divergence matrix — repeated-measures
  * inference and corpus-mixture drift on the §8.4 exact-integer
  * discipline.
  */
object Round8uOps {

  // --------------------------------------------------------------------------
  // q347 — FRIEDMAN TEST (tie-corrected, Conover's T1): does the
  // relative ACTIVITY RANKING of the five event types hold steady
  // day over day, or do types genuinely trade places? Blocks = days,
  // treatments = event types, response = daily event count; each
  // day ranks its own five counts, so volume trends cancel — the
  // repeated-measures complement to q341 (which pools all rows).
  // Doubled tie-averaged ranks keep every cell an exact integer, and
  // in doubled units the whole statistic is integer-exact:
  //   T1 = (k−1)·(Σ_j R2_j² − n²k(k+1)²) / (Σ dr² − nk(k+1)²)
  // — ONE division + pround at the very end (§8.4). Missing
  // (day, type) cells are zero-filled off the bounded day×type grid so
  // every block is complete, as Friedman requires.
  //
  // Scale: the corpus collapses to the day×type grid; the only window
  // ranks k=5 rows per day partition.
  def friedman(events: DataFrame): DataFrame = {
    val cnt = events.groupBy(
        to_date(col("ts")).as("d"), col("event_type").as("t"))
      .agg(count(lit(1)).as("c"))
    val grid = cnt.select(col("d")).distinct()
      .crossJoin(broadcast(cnt.select(col("t")).distinct()))
      .join(cnt, Seq("d", "t"), "left")
      .na.fill(0L, Seq("c"))
    val ranked = grid
      .withColumn("rmin", rank().over(
        Window.partitionBy(col("d")).orderBy(col("c"))))
      .withColumn("ties", count(lit(1)).over(
        Window.partitionBy(col("d"), col("c"))))
      .withColumn("dr", lit(2L) * (col("rmin") - 1L) + col("ties") + 1L)
    val perType = ranked.groupBy(col("t"))
      .agg(sum(col("dr")).as("r2_sum"))
    val su = ranked.agg(
        sum(col("dr") * col("dr")).as("a2"),
        countDistinct(col("d")).as("n"),
        countDistinct(col("t")).as("k"))
    val num = perType.agg(sum(col("r2_sum") * col("r2_sum")).as("rr"))
    perType.crossJoin(broadcast(su)).crossJoin(broadcast(num))
      .withColumn("t1", expr(
        """cast((k - 1L) * (rr - n * n * k * (k + 1L) * (k + 1L)) as double)
          |  / (a2 - n * k * (k + 1L) * (k + 1L))""".stripMargin))
      .select(col("t").as("event_type"), col("r2_sum"), col("n").as("n_days"),
        col("k"), Num.pround(col("t1"), 6).as("t1_6"))
      .orderBy(col("event_type"))
  }

  def q347Friedman(spark: SparkSession, dir: String): DataFrame =
    friedman(Tables.events(spark, dir))

  val q347Sql: String =
    """WITH cnt AS (
      |  SELECT CAST(ts AS DATE) AS d, event_type AS t, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT dd.d, tt.t, COALESCE(c, 0) AS c
      |  FROM (SELECT DISTINCT d FROM cnt) dd
      |  CROSS JOIN (SELECT DISTINCT t FROM cnt) tt
      |  LEFT JOIN cnt ON cnt.d = dd.d AND cnt.t = tt.t),
      |rk AS (
      |  SELECT d, t, c,
      |    RANK() OVER (PARTITION BY d ORDER BY c) AS rmin,
      |    COUNT(*) OVER (PARTITION BY d, c) AS ties
      |  FROM grid),
      |dr AS (SELECT d, t, 2 * (rmin - 1) + ties + 1 AS dr FROM rk),
      |pt AS (SELECT t, SUM(dr) AS r2_sum FROM dr GROUP BY t),
      |su AS (
      |  SELECT SUM(dr * dr) AS a2, COUNT(DISTINCT d) AS n,
      |    COUNT(DISTINCT t) AS k
      |  FROM dr),
      |num AS (SELECT SUM(r2_sum * r2_sum) AS rr FROM pt)
      |SELECT t AS event_type, CAST(r2_sum AS BIGINT) AS r2_sum,
      |  CAST(n AS BIGINT) AS n_days, CAST(k AS BIGINT) AS k,
      |  FLOOR((CAST((k - 1) * (rr - n * n * k * (k + 1) * (k + 1)) AS DOUBLE)
      |    / (a2 - n * k * (k + 1) * (k + 1))) * 1e6 + 0.5) / 1e6 AS t1_6
      |FROM pt CROSS JOIN su CROSS JOIN num
      |ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------------------
  // q348 — SOURCE-DIVERGENCE MATRIX: pairwise triangular discrimination
  //   Δ(P,Q) = Σ_w (p_w − q_w)² / (p_w + q_w)  ∈ [0, 2]
  // between the unigram distributions of every source pair — the
  // mixture-drift readout behind "which corpus sources are
  // interchangeable". Δ is the f-divergence that is EXACTLY computable
  // in integers (¼Δ ≤ JSD/ln2 ≤ Δ orders pairs the same way in
  // practice): with word counts a_w (total A) and b_w (total B),
  // per-word cross-scaled masses x = a_w·B, y = b_w·A give
  //   Δ·AB = Σ_shared (x−y)²/(x+y) + (A−Σa_sh)·B + (B−Σb_sh)·A
  // — per-term exact floors (DECIMAL(38,0) squares), order-free BIGINT
  // sums, one final ppm floor-div. Not a float anywhere (§8.4).
  //
  // Scale: one token pass → (source, word) counts; the pair expansion
  // is an equi-join on the WORD (each word meets ≤ 20² source pairs),
  // never a corpus cross; the 20-row totals cross is broadcast.
  def sourceDivergence(docs: DataFrame): DataFrame = {
    val cnt = docs
      .select(col("source").as("s"),
        explode(expr("filter(split(lower(text), ' '), t -> t != '')")).as("w"))
      .groupBy(col("s"), col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val tot = cnt.groupBy(col("s")).agg(sum(col("c")).as("tt"))
    val pairs = tot.select(col("s").as("s1"), col("tt").as("ta"))
      .crossJoin(broadcast(tot.select(col("s").as("s2"), col("tt").as("tb"))))
      .filter(col("s1") < col("s2"))
    val shared = cnt.select(col("s").as("s1"), col("w"), col("c").as("a"))
      .join(cnt.select(col("s").as("s2"), col("w"), col("c").as("b")), Seq("w"))
      .filter(col("s1") < col("s2"))
      .join(pairs, Seq("s1", "s2"))
      .withColumn("x", col("a") * col("tb"))
      .withColumn("y", col("b") * col("ta"))
      .groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).as("shared_words"),
        sum(expr(
          "cast((cast(x as decimal(38,0)) - y) * (cast(x as decimal(38,0)) - y)" +
            " div (x + y) as bigint)")).as("tsh"),
        sum(col("a")).as("ash"), sum(col("b")).as("bsh"))
    pairs.join(shared, Seq("s1", "s2"), "left")
      .na.fill(0L, Seq("shared_words", "tsh", "ash", "bsh"))
      .withColumn("sigma", col("tsh")
        + (col("ta") - col("ash")) * col("tb")
        + (col("tb") - col("bsh")) * col("ta"))
      .select(col("s1"), col("s2"), col("shared_words"),
        expr("cast((cast(1000000 as decimal(38,0)) * sigma) div (ta * tb) as bigint)")
          .as("delta_ppm"))
      .orderBy(col("s1"), col("s2"))
  }

  def q348SourceDivergence(spark: SparkSession, dir: String): DataFrame =
    sourceDivergence(Tables.documents(spark, dir))

  val q348Sql: String =
    s"""WITH cnt AS (
       |  SELECT source AS s, w, COUNT(*) AS c
       |  FROM (SELECT source, UNNEST(${TextOps.toksSqlD}) AS w FROM documents)
       |  GROUP BY 1, 2),
       |tot AS (SELECT s, SUM(c) AS tt FROM cnt GROUP BY 1),
       |pairs AS (
       |  SELECT a.s AS s1, b.s AS s2, a.tt AS ta, b.tt AS tb
       |  FROM tot a JOIN tot b ON a.s < b.s),
       |shared AS (
       |  SELECT s1, s2, COUNT(*) AS shared_words,
       |    SUM(CAST((CAST(a.c AS HUGEINT) * tb - CAST(b.c AS HUGEINT) * ta)
       |          * (CAST(a.c AS HUGEINT) * tb - CAST(b.c AS HUGEINT) * ta)
       |        // (a.c * tb + b.c * ta) AS BIGINT)) AS tsh,
       |    SUM(a.c) AS ash, SUM(b.c) AS bsh
       |  FROM cnt a
       |  JOIN cnt b ON a.w = b.w AND a.s < b.s
       |  JOIN pairs ON pairs.s1 = a.s AND pairs.s2 = b.s
       |  GROUP BY 1, 2)
       |SELECT s1, s2, COALESCE(shared_words, 0) AS shared_words,
       |  CAST((1000000::HUGEINT * (COALESCE(tsh, 0)
       |      + (ta - COALESCE(ash, 0)) * tb
       |      + (tb - COALESCE(bsh, 0)) * ta))
       |    // (ta * tb) AS BIGINT) AS delta_ppm
       |FROM pairs LEFT JOIN shared USING (s1, s2)
       |ORDER BY s1, s2""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q347_friedman", q347Friedman _, Some(q347Sql)),
    ("q348_source_divergence", q348SourceDivergence _, Some(q348Sql)))
}
