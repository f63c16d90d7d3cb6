package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Embedding/similarity operators over the `embeddings` table
  * (vec_id long, embedding array<float> ×64, label int).
  *
  * Numeric portability: cosine similarities are compared to the oracle at
  * FLOOR((...) * 1e4 + 0.5) / 1e4 — per-row double folds are deterministic enough that only
  * sub-1e-12 engine differences exist, far from the 5e-5 rounding boundary.
  * Centroid means use scaled-long integer accumulation (floor(v*1e12+0.5))
  * so the SUM is order-independent and exact in both engines.
  */
object VectorOps {

  /** embedding cast to array<double> (float→double widening is exact). */
  private val vd = expr("transform(embedding, x -> cast(x as double))")

  // --------------------------------------------------------------------------
  // q40 — brute-force cosine top-k: the exact baseline every ANN variant is
  // judged against. Scale: the query side (5 vectors) broadcasts; the base
  // table streams through one pass, no shuffle until the tiny per-query
  // top-k window. At 1000 executors this is embarrassingly parallel;
  // 100 TB of vectors → switch to q42's bucketed path.
  def q40CosineTopk(spark: SparkSession, dir: String): DataFrame =
    cosineTopk(Tables.embeddings(spark, dir))

  /** Factored q40 body — the exact reference the ANN spec fixtures are
    * scored against. */
  def cosineTopk(embeddings: DataFrame): DataFrame = {
    val base = embeddings
      .select(col("vec_id"), vd.as("v"))
      .withColumn("n2", expr("aggregate(v, 0.0d, (a, x) -> a + x * x)"))
    val queries = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("n2").as("qn2"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id").asc)
    base.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("dot", expr("aggregate(zip_with(v, qv, (x, y) -> x * y), 0.0d, (a, x) -> a + x)"))
      .withColumn("sim", col("dot") / sqrt(col("n2") * col("qn2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("qid"), col("rank"), col("vec_id"), Num.pround(col("sim"), 4).as("sim"))
      .orderBy(col("qid"), col("rank"))
  }

  val q40Sql: String =
    """WITH base AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |    list_reduce(list_transform(embedding::DOUBLE[], x -> x * x), (a, b) -> a + b) AS n2
      |  FROM embeddings),
      |q AS (SELECT vec_id AS qid, v AS qv, n2 AS qn2 FROM base WHERE vec_id < 5),
      |sims AS (
      |  SELECT qid, vec_id,
      |    list_reduce(list_transform(range(1, 65),
      |        i -> v[i] * qv[i]), (a, b) -> a + b) / sqrt(n2 * qn2) AS sim
      |  FROM base CROSS JOIN q WHERE vec_id <> qid),
      |ranked AS (
      |  SELECT qid, vec_id, sim,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rank
      |  FROM sims)
      |SELECT qid, CAST(rank AS INT) AS rank, vec_id, FLOOR((sim) * 1e4 + 0.5) / 1e4 AS sim
      |FROM ranked WHERE rank <= 10 ORDER BY qid, rank""".stripMargin

  // --------------------------------------------------------------------------
  // q41 — per-label centroids: posexplode to (label, dim, value), quantize
  // each value to a scaled long (exact in both engines: one double multiply
  // + floor), SUM exactly as integers, divide once at the end.
  def q41Centroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(vd))
      .withColumnRenamed("pos", "dim").withColumnRenamed("col", "v")
      .withColumn("vq", expr("cast(floor(v * 1e12 + 0.5d) as long)"))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("vq")).as("sum_q"))
      .select(col("label"), col("dim"), col("n"),
        Num.pround(col("sum_q").cast("double") / 1e12 / col("n"), 6).as("centroid"))
      .orderBy(col("label"), col("dim"))

  val q41Sql: String =
    """SELECT label, CAST(dim AS INT) AS dim, COUNT(*) AS n,
      |  FLOOR((CAST(SUM(vq) AS DOUBLE) / 1e12 / COUNT(*)) * 1e6 + 0.5) / 1e6 AS centroid
      |FROM (
      |  SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
      |    CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1e12 + 0.5) AS BIGINT) AS vq
      |  FROM embeddings)
      |GROUP BY label, dim ORDER BY label, dim""".stripMargin

  // --------------------------------------------------------------------------
  // q42 — ANN via random-hyperplane LSH: fixed seeded hyperplanes → a
  // bucket id per vector; neighbors are only searched inside the query's
  // bucket. Scale path for 100 TB: bucket is the shuffle/join key (equality
  // join); plane count sets the bucket fan-out (2^planes) and should grow
  // with table size — 6 here for the small test tables; multi-probe
  // (flip one bit) raises recall without another pass.
  // Oracle-checked: the fixed-seed planes are embedded in q42Sql as exact
  // double literals, so DuckDB replays the identical bucketing; recall vs.
  // exact q40 is additionally asserted in VectorOpsSpec.
  private val numPlanes = 6
  /** Deterministic hyperplanes: fixed-seed LCG, 64 dims each, values in
    * [-1, 1). No java.util.Random — reproducible across JVMs by spec.
    */
  private[ops] val hyperplanes: Seq[Seq[Double]] = {
    var state = 42L
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Seq.fill(numPlanes)(Seq.fill(64)(next()))
  }

  def q42AnnLsh(spark: SparkSession, dir: String): DataFrame =
    annLsh(Tables.embeddings(spark, dir))

  /** embeddings (vec_id, embedding) → ANN top-10 per query vector: the q42
    * body, factored so specs can feed synthetic clustered embeddings
    * (recall on the near-random test table caps at ~0.25 and would not
    * discriminate a broken bucketing). */
  def annLsh(embeddings: DataFrame): DataFrame = {
    val planes = typedlit(hyperplanes)
    val base = embeddings
      .select(col("vec_id"), vd.as("v"))
      .withColumn("n2", expr("aggregate(v, 0.0d, (a, x) -> a + x * x)"))
      .withColumn("planes", planes)
      .withColumn("bucket", expr(
        """aggregate(sequence(0, size(planes) - 1), 0,
          |  (acc, i) -> acc * 2 + (CASE WHEN
          |     aggregate(zip_with(v, planes[i], (x, p) -> x * p), 0.0d, (a, x) -> a + x) > 0.0d
          |     THEN 1 ELSE 0 END))""".stripMargin))
      .drop("planes")
    // Multi-probe: each query also searches every bucket at hamming
    // distance 1 from its own (planes+1 probes) — the standard recall
    // lever that costs no extra pass over the base table.
    val queries = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("n2").as("qn2"),
        explode(expr(
          s"""transform(sequence(0, $numPlanes),
             |  i -> CASE WHEN i = 0 THEN bucket ELSE bucket ^ shiftleft(1, i - 1) END)"""
            .stripMargin)).as("bucket"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id").asc)
    base.join(broadcast(queries), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("dot", expr("aggregate(zip_with(v, qv, (x, y) -> x * y), 0.0d, (a, x) -> a + x)"))
      .withColumn("sim", col("dot") / sqrt(col("n2") * col("qn2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("qid"), col("rank"), col("vec_id"), Num.pround(col("sim"), 4).as("sim"))
      .orderBy(col("qid"), col("rank"))
  }

  /** The hyperplane matrix as a DuckDB nested-list literal, printed with
    * Java's shortest-roundtrip Double.toString so the oracle parses back
    * the exact same IEEE doubles. */
  private def planesSqlLit: String =
    hyperplanes.map(_.map(_.toString).mkString("[", ", ", "]"))
      .mkString("[", ",\n       ", "]")

  /** q42 is fully deterministic (fixed-seed planes, sequential left-fold
    * dot products in both engines — DuckDB's list_reduce seeds with the
    * first element, IEEE-identical to Spark's 0.0-seeded fold), so the
    * oracle replays the same LSH: bucket signs, hamming-1 multi-probe,
    * exact in-bucket ranking. */
  val q42Sql: String =
    s"""WITH planes AS (SELECT ${planesSqlLit} AS P),
       |base AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |    list_reduce(list_transform(embedding::DOUBLE[], x -> x * x), (a, b) -> a + b) AS n2
       |  FROM embeddings),
       |sig AS (
       |  SELECT vec_id, v, n2,
       |    list_reduce(
       |      list_transform(range($numPlanes), i -> CASE WHEN
       |        list_reduce(list_transform(range(1, 65), d -> v[d] * P[i + 1][d]),
       |          (a, b) -> a + b) > 0.0
       |        THEN 1 ELSE 0 END),
       |      (acc, bit) -> acc * 2 + bit) AS bucket
       |  FROM base CROSS JOIN planes),
       |q AS (
       |  SELECT qid, qv, qn2, unnest(probes) AS bucket FROM (
       |    SELECT vec_id AS qid, v AS qv, n2 AS qn2,
       |      list_transform(range(0, ${numPlanes + 1}),
       |        i -> CASE WHEN i = 0 THEN bucket ELSE xor(bucket, (1 << (i - 1))) END) AS probes
       |    FROM sig WHERE vec_id < 5)),
       |sims AS (
       |  SELECT qid, s.vec_id AS vec_id,
       |    list_reduce(list_transform(range(1, 65), d -> s.v[d] * qv[d]), (a, b) -> a + b)
       |      / sqrt(s.n2 * qn2) AS sim
       |  FROM sig s JOIN q USING (bucket) WHERE s.vec_id <> qid),
       |ranked AS (
       |  SELECT qid, vec_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rank
       |  FROM sims)
       |SELECT qid, CAST(rank AS INT) AS rank, vec_id, FLOOR((sim) * 1e4 + 0.5) / 1e4 AS sim
       |FROM ranked WHERE rank <= 10 ORDER BY qid, rank""".stripMargin

  // --------------------------------------------------------------------------
  // q43 — typed Aggregator centroid (SURVEY §4.2 item 2: no built-in vector
  // mean). Accumulates scaled longs per dimension — exact, order-free merge.
  type CentroidBuf = (Array[Long], Long)

  class CentroidAgg extends Aggregator[(Int, Array[Double]), CentroidBuf, Array[Double]] {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    override def zero: CentroidBuf = (Array.empty[Long], 0L)
    override def reduce(b: CentroidBuf, row: (Int, Array[Double])): CentroidBuf = {
      val v = row._2
      val acc = if (b._1.isEmpty) new Array[Long](v.length) else b._1
      var i = 0
      while (i < v.length) { acc(i) += math.floor(v(i) * 1e12 + 0.5).toLong; i += 1 }
      (acc, b._2 + 1)
    }
    override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf =
      if (a._1.isEmpty) b else if (b._1.isEmpty) a
      else {
        var i = 0
        while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
        (a._1, a._2 + b._2)
      }
    override def finish(r: CentroidBuf): Array[Double] =
      r._1.map(s => s.toDouble / 1e12 / r._2)
    override def bufferEncoder: Encoder[CentroidBuf] = ExpressionEncoder[CentroidBuf]()
    override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  }

  def q43CentroidAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select(col("label"), vd.as("v"))
      // a NULL embedding contributes nothing to its label's centroid —
      // exactly what the oracle's unnest does (0 rows) — instead of
      // NPE-ing the Aggregator's reduce
      .filter(col("v").isNotNull)
      .as[(Int, Array[Double])]
      .groupByKey(_._1)
      .agg(new CentroidAgg().toColumn.name("centroid"))
      .toDF("label", "centroid")
      // exploded to (label, dim, centroid): the driver's pandas
      // canonicalizer cannot sort a raw array column (r02 q43 err), and
      // the flat shape is oracle-expressible (same SQL family as q41)
      .select(col("label"), posexplode(col("centroid")))
      .select(col("label"), col("pos").cast("int").as("dim"),
        Num.pround(col("col"), 6).as("centroid"))
      .orderBy(col("label"), col("dim"))
  }

  /** Same oracle family as q41 — the Aggregator must agree with the
    * plain scaled-long groupBy mean, column-for-column. */
  val q43Sql: String =
    """SELECT label, CAST(dim AS INT) AS dim,
      |  FLOOR((CAST(SUM(vq) AS DOUBLE) / 1e12 / COUNT(*)) * 1e6 + 0.5) / 1e6 AS centroid
      |FROM (
      |  SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
      |    CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1e12 + 0.5) AS BIGINT) AS vq
      |  FROM embeddings)
      |GROUP BY label, dim ORDER BY label, dim""".stripMargin

  // --------------------------------------------------------------------------
  // q45 — IVF-style ANN: a small coarse codebook (the per-label centroids —
  // 10 cells, no training loop needed on this data), every vector assigned
  // to its nearest cell, queries probe their 2 nearest cells only.
  // Scale path: the codebook broadcasts (it's tiny by construction), cell
  // assignment is one linear pass, and the probe join is an equi-join on
  // cell id — |probed fraction| ≈ nprobe/ncells of the table scanned per
  // query instead of 100% for brute force.
  def q45AnnIvf(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    annIvf(Tables.embeddings(spark, dir))
  }

  /** embeddings (vec_id, label, embedding) → IVF ANN top-10 per query:
    * the q45 body, factored for spec-driven synthetic clusters (label
    * doubles as the coarse cell seed). Caller must have registered
    * cosine_sim. */
  /** Every vector scored against every IVF cell centroid (broadcast
    * codebook). The codebook is the exact per-label mean (same scaled-long
    * arithmetic as q41 — a raw double avg is order-dependent and could
    * flip cell assignments between runs). Shared by q45 (the search) and
    * q424 (the nprobe planner). Caller must have registered cosine_sim.
    */
  private def ivfScored(base: DataFrame): DataFrame = {
    val codebook = base
      .select(col("label").as("cell"), posexplode(col("v")))
      .withColumn("vq", expr("cast(floor(col * 1e12 + 0.5d) as long)"))
      .groupBy(col("cell"), col("pos"))
      .agg((sum(col("vq")).cast("double") / 1e12 / count(lit(1))).as("c"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("cell"), expr("transform(pc, x -> x.c)").as("cv"))
    base.crossJoin(broadcast(codebook))
      .withColumn("csim", expr("cosine_sim(v, cv)"))
  }

  def annIvf(embeddings: DataFrame): DataFrame = {
    val base = embeddings
      .select(col("vec_id"), col("label"), vd.as("v"))
    val scored = ivfScored(base)
    // deterministic argmax: max(struct(sim, cell)) — ties break on cell id
    val assigned = scored
      .groupBy(col("vec_id"), col("label"), col("v"))
      .agg(max(struct(col("csim"), col("cell"))).as("best"))
      .select(col("vec_id"), col("v"), col("best.cell").as("cell"))
    val wCell = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cell").asc)
    val probes = scored.filter(col("vec_id") < 5)
      .withColumn("rn", row_number().over(wCell))
      .filter(col("rn") <= 2) // nprobe = 2
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("cell"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id").asc)
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim", expr("cosine_sim(v, qv)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("qid"), col("rank"), col("vec_id"), Num.pround(col("sim"), 4).as("sim"))
      .orderBy(col("qid"), col("rank"))
  }

  /** q45 oracle: the codebook is exact by construction (scaled-long sums,
    * order-free — the q41 policy), so cell assignment, nprobe=2 probing,
    * and in-cell ranking all replay deterministically. Tie-breaks mirror
    * the Spark side: assignment = max(struct(csim, cell)) ⇒ csim DESC,
    * cell DESC; probes ⇒ csim DESC, cell ASC. */
  val q45Sql: String =
    """WITH base AS (
      |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |cb0 AS (
      |  SELECT label AS cell, dim, CAST(SUM(vq) AS DOUBLE) / 1e12 / COUNT(*) AS c
      |  FROM (
      |    SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
      |      CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1e12 + 0.5) AS BIGINT) AS vq
      |    FROM embeddings)
      |  GROUP BY label, dim),
      |codebook AS (SELECT cell, list(c ORDER BY dim) AS cv FROM cb0 GROUP BY cell),
      |scored AS (
      |  SELECT b.vec_id, b.v, cb.cell,
      |    list_reduce(list_transform(range(1, 65), d -> b.v[d] * cb.cv[d]), (x, y) -> x + y)
      |      / sqrt(list_reduce(list_transform(b.v, x -> x * x), (x, y) -> x + y)
      |           * list_reduce(list_transform(cb.cv, x -> x * x), (x, y) -> x + y)) AS csim
      |  FROM base b CROSS JOIN codebook cb),
      |assigned AS (
      |  SELECT vec_id, v, cell FROM (
      |    SELECT vec_id, v, cell,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell DESC) AS rn
      |    FROM scored) WHERE rn = 1),
      |probes AS (
      |  SELECT vec_id AS qid, v AS qv, cell FROM (
      |    SELECT vec_id, v, cell,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn
      |    FROM scored WHERE vec_id < 5) WHERE rn <= 2),
      |sims AS (
      |  SELECT qid, a.vec_id AS vec_id,
      |    list_reduce(list_transform(range(1, 65), d -> a.v[d] * qv[d]), (x, y) -> x + y)
      |      / sqrt(list_reduce(list_transform(a.v, x -> x * x), (x, y) -> x + y)
      |           * list_reduce(list_transform(qv, x -> x * x), (x, y) -> x + y)) AS sim
      |  FROM assigned a JOIN probes USING (cell) WHERE a.vec_id <> qid),
      |ranked AS (
      |  SELECT qid, vec_id, sim,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rank
      |  FROM sims)
      |SELECT qid, CAST(rank AS INT) AS rank, vec_id, FLOOR((sim) * 1e4 + 0.5) / 1e4 AS sim
      |FROM ranked WHERE rank <= 10 ORDER BY qid, rank""".stripMargin

  // --------------------------------------------------------------------------
  // q424 — IVF NPROBE RECALL CURVE (round 11): before an ANN sweep over
  // 100 TB of embeddings, which nprobe actually buys the recall the
  // pipeline needs? For nprobe ∈ {1, 2, 4}, run the q45 IVF search and
  // measure recall@10 against the exact brute-force top-10 ground truth
  // (same query set, vec_id < 5) — the empirical cost/recall readout that
  // prices the probe width the way q273 prices LSH band/row choices and
  // q414 prices a Jaccard threshold. Candidate volume scales ~linearly
  // with nprobe, so the curve's knee IS the compute decision.
  //
  // Scale: the codebook scoring and cell assignment are the q45 shapes
  // (broadcast codebook, linear scan); ground truth is |queries| × n with
  // a BOUNDED broadcast query set (the planner runs on a probe sample,
  // never the full corpus); per-nprobe candidates ride one broadcast
  // (nprobe, qid, cell) grid join — no re-scan per grid cell.
  //
  // Determinism: recall counts compare vec_id SETS selected by
  // (sim DESC, vec_id ASC) rankings — the q45 contract; both engines run
  // identical IEEE double dot products, so the rankings agree exactly.
  def q424NprobeCurve(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), vd.as("v"))
    val scored = ivfScored(base)
      .localCheckpoint(false) // feeds cell assignment AND probe ranking
    val assigned = scored
      .groupBy(col("vec_id"), col("v"))
      .agg(max(struct(col("csim"), col("cell"))).as("best"))
      .select(col("vec_id"), col("v"), col("best.cell").as("cell"))
    val queries = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val wG = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id").asc)
    val gt = base.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim", expr("cosine_sim(v, qv)"))
      .withColumn("rank", row_number().over(wG)).filter(col("rank") <= 10)
      .select(col("qid"), col("vec_id"))
      .localCheckpoint(false) // feeds the per-nprobe hit join AND the denominator
    val wCell = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cell").asc)
    val probes = scored.filter(col("vec_id") < 5)
      .withColumn("rn", row_number().over(wCell)).filter(col("rn") <= 4)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("cell"), col("rn"))
    val grid = spark.range(1).select(explode(expr("array(1, 2, 4)")).as("nprobe"))
    val pg = probes.crossJoin(broadcast(grid)).filter(col("rn") <= col("nprobe"))
      .select(col("nprobe"), col("qid"), col("qv"), col("cell"))
    val wI = Window.partitionBy(col("nprobe"), col("qid"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    val ivf = assigned.join(broadcast(pg), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim", expr("cosine_sim(v, qv)"))
      .withColumn("rank", row_number().over(wI)).filter(col("rank") <= 10)
      .select(col("nprobe"), col("qid"), col("vec_id"))
    val hits = ivf.join(gt, Seq("qid", "vec_id"))
      .groupBy(col("nprobe")).agg(count(lit(1)).as("hits"))
    val denom = gt.agg(count(lit(1)).as("gt_rows"))
    grid.join(hits, Seq("nprobe"), "left").crossJoin(broadcast(denom))
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .select(col("nprobe"), col("hits"), col("gt_rows"),
        expr("(1000000L * hits) div gt_rows").as("recall_ppm"))
      .orderBy(col("nprobe"))
  }

  /** q424 oracle: the q45 replay (exact codebook, csim assignment/probe
    * tie-breaks) extended with a brute-force ground-truth CTE and the
    * nprobe grid; recall counts are set intersections of deterministic
    * rankings. */
  val q424Sql: String =
    """WITH base AS (
      |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      |cb0 AS (
      |  SELECT label AS cell, dim, CAST(SUM(vq) AS DOUBLE) / 1e12 / COUNT(*) AS c
      |  FROM (
      |    SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
      |      CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1e12 + 0.5) AS BIGINT) AS vq
      |    FROM embeddings)
      |  GROUP BY label, dim),
      |codebook AS (SELECT cell, list(c ORDER BY dim) AS cv FROM cb0 GROUP BY cell),
      |scored AS (
      |  SELECT b.vec_id, b.v, cb.cell,
      |    list_reduce(list_transform(range(1, 65), d -> b.v[d] * cb.cv[d]), (x, y) -> x + y)
      |      / sqrt(list_reduce(list_transform(b.v, x -> x * x), (x, y) -> x + y)
      |           * list_reduce(list_transform(cb.cv, x -> x * x), (x, y) -> x + y)) AS csim
      |  FROM base b CROSS JOIN codebook cb),
      |assigned AS (
      |  SELECT vec_id, v, cell FROM (
      |    SELECT vec_id, v, cell,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell DESC) AS rn
      |    FROM scored) WHERE rn = 1),
      |probes AS (
      |  SELECT vec_id AS qid, v AS qv, cell, rn FROM (
      |    SELECT vec_id, v, cell,
      |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell ASC) AS rn
      |    FROM scored WHERE vec_id < 5) WHERE rn <= 4),
      |g AS (SELECT UNNEST([1, 2, 4]) AS nprobe),
      |pg AS (SELECT nprobe, qid, qv, cell FROM probes CROSS JOIN g WHERE rn <= nprobe),
      |q AS (SELECT vec_id AS qid, v AS qv FROM base WHERE vec_id < 5),
      |gt AS (
      |  SELECT qid, vec_id FROM (
      |    SELECT qid, vec_id,
      |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rank
      |    FROM (
      |      SELECT qid, b.vec_id,
      |        list_reduce(list_transform(range(1, 65), d -> b.v[d] * qv[d]), (x, y) -> x + y)
      |          / sqrt(list_reduce(list_transform(b.v, x -> x * x), (x, y) -> x + y)
      |               * list_reduce(list_transform(qv, x -> x * x), (x, y) -> x + y)) AS sim
      |      FROM base b CROSS JOIN q WHERE b.vec_id <> qid))
      |  WHERE rank <= 10),
      |sims AS (
      |  SELECT nprobe, qid, a.vec_id,
      |    list_reduce(list_transform(range(1, 65), d -> a.v[d] * qv[d]), (x, y) -> x + y)
      |      / sqrt(list_reduce(list_transform(a.v, x -> x * x), (x, y) -> x + y)
      |           * list_reduce(list_transform(qv, x -> x * x), (x, y) -> x + y)) AS sim
      |  FROM assigned a JOIN pg USING (cell) WHERE a.vec_id <> qid),
      |ivf AS (
      |  SELECT nprobe, qid, vec_id FROM (
      |    SELECT nprobe, qid, vec_id,
      |      ROW_NUMBER() OVER (PARTITION BY nprobe, qid ORDER BY sim DESC, vec_id ASC) AS rank
      |    FROM sims) WHERE rank <= 10),
      |hits AS (
      |  SELECT nprobe, COUNT(*) AS hits FROM ivf JOIN gt USING (qid, vec_id)
      |  GROUP BY 1),
      |den AS (SELECT COUNT(*) AS gt_rows FROM gt)
      |SELECT g.nprobe, CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
      |  CAST(gt_rows AS BIGINT) AS gt_rows,
      |  CAST((1000000 * COALESCE(h.hits, 0)) // gt_rows AS BIGINT) AS recall_ppm
      |FROM g LEFT JOIN hits h USING (nprobe) CROSS JOIN den
      |ORDER BY g.nprobe""".stripMargin

  // --------------------------------------------------------------------------
  // q49 — embedding-cosine near-duplicate pairs (the dedup flavor of
  // similarity): all pairs with cosine ≥ 0.4. Exact all-pairs BASELINE
  // TWIN — O(n²) with a full-table broadcast, kept only as the reference
  // q104 is verified against (VectorOpsSpec asserts q104 == q49 exactly).
  // The primary, scale-path implementation is q104CosineNearDupLsh below.
  def q49CosineNearDup(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    val base = Tables.embeddings(spark, dir).select(col("vec_id"), vd.as("v"))
    val b = base.select(col("vec_id").as("vec_id_b"), col("v").as("vb"))
    base.join(broadcast(b), col("vec_id") < col("vec_id_b"))
      .withColumn("sim", expr("cosine_sim(v, vb)"))
      .filter(col("sim") >= 0.4)
      .select(col("vec_id").as("id_a"), col("vec_id_b").as("id_b"),
        Num.pround(col("sim"), 4).as("sim"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val q49Sql: String =
    """WITH base AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |    list_reduce(list_transform(embedding::DOUBLE[], x -> x * x), (a, b) -> a + b) AS n2
      |  FROM embeddings)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  FLOOR((list_reduce(list_transform(range(1, 65),
      |      i -> a.v[i] * b.v[i]), (x, y) -> x + y) / sqrt(a.n2 * b.n2)) * 1e4 + 0.5) / 1e4 AS sim
      |FROM base a JOIN base b ON a.vec_id < b.vec_id
      |WHERE list_reduce(list_transform(range(1, 65),
      |      i -> a.v[i] * b.v[i]), (x, y) -> x + y) / sqrt(a.n2 * b.n2) >= 0.4
      |ORDER BY id_a, id_b""".stripMargin

  // --------------------------------------------------------------------------
  // q104 — bucketed cosine near-dup: the scale-path primary for q49's
  // semantics, shipped at the REALISTIC near-dup setting — threshold 0.9
  // (θ ≤ 26°) with 16 bands × 8 planes. Banded random-hyperplane LSH
  // generates candidate pairs through a plain shuffle EQUI-join on
  // (band, bucket) — no all-pairs nested loop anywhere in the plan
  // (PlanSpec asserts this) — then the exact cosine ≥ 0.9 check runs only
  // on colliding candidates. At r=8 a non-dup pair (cosine ≈ 0, p_plane ≈
  // 0.5) collides in a band with prob 2⁻⁸, so candidate fan-out is ~n·b/256
  // — linear, orders of magnitude below the 0.4/(64×4) stress setting whose
  // OUTPUT itself is O(n²) on 64-dim data (kept as a spec-only equality
  // twin vs the exact baseline, per the q49 precedent; SURVEY §8.7 probe).
  //
  // PLANTED TWINS: the synthetic embeddings are near-orthogonal (max true
  // cosine 0.60 at sf0.1), so a ≥0.9 query over the raw table is vacuously
  // empty. Every 10th vector therefore gets a deterministic twin — id
  // offset +10,000,000, dim 0 scaled by the dyadic 1.25, the same IEEE
  // double op in Spark and DuckDB — with cosine(v, twin) ≥ 0.987 for any
  // v and all cross-pair cosines unchanged (≤ 0.61). The TRUE result is
  // exactly the n/10 planted pairs: linear in corpus size, hash-checkable,
  // and it exercises the LSH match path rather than an empty intersection.
  //
  // Recall: hyperplanes are a fixed-seed constant, so candidate generation
  // is deterministic; at sim ≥ 0.987 the per-pair miss probability is
  // (1 − 0.948⁸)¹⁶ ≈ 4e-8 — VectorOpsSpec asserts q104 equals the exact
  // O(n²) baseline over the same planted corpus (recall 1.0), and the
  // spec-only stress twin re-proves equality at the adversarial 0.4
  // threshold with its generous (64 × 4) banding.
  //
  // Scale shape: 3 linear scans of the base table (signature pass + two
  // id-keyed fetch joins), one equi-join on (band, bucket) whose fan-out
  // is bounded by bucket occupancy (2^r buckets per band) — every shuffle
  // is on a key, nothing is O(n²).
  private[ops] val ndBands = 64
  private[ops] val ndPlanesPerBand = 4
  private val ndRealBands = 16
  private val ndRealPlanesPerBand = 8
  private val ndRealThreshold = 0.9
  /** bands × planesPerBand fixed-seed 64-dim hyperplanes (same LCG family
    * as q42's — reproducible across JVMs by spec, no java.util.Random).
    * The fill order is the plane-matrix contract: (64, 4) must reproduce
    * q104's shipped planes bit-for-bit, so any (b, r) derives from the
    * same state-42 sequence.
    */
  private[graft] def ndPlanesFor(bands: Int, planesPerBand: Int): Seq[Seq[Double]] = {
    var state = 42L
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Seq.fill(bands * planesPerBand)(Seq.fill(64)(next()))
  }
  private[ops] val ndPlanes: Seq[Seq[Double]] = ndPlanesFor(ndBands, ndPlanesPerBand)

  /** Base ∪ deterministic twins of every 10th vector (see q104 comment). */
  private[ops] def plantedTwinCorpus(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(spark, dir).select(col("vec_id"), vd.as("embedding"))
    base.unionAll(base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 10000000L).as("vec_id"),
        expr("concat(array(embedding[0] * 1.25d), slice(embedding, 2, 63))")
          .as("embedding")))
  }

  def q104CosineNearDupLsh(spark: SparkSession, dir: String): DataFrame =
    cosineNearDup(spark, plantedTwinCorpus(spark, dir),
      threshold = ndRealThreshold, bands = ndRealBands,
      planesPerBand = ndRealPlanesPerBand)

  val q104Sql: String =
    """WITH corpus AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 10000000,
      |    list_prepend(v[1] * 1.25, v[2:]) FROM (
      |      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
      |  WHERE vec_id % 10 = 0),
      |base AS (
      |  SELECT vec_id, v,
      |    list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b) AS n2
      |  FROM corpus)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  FLOOR((list_reduce(list_transform(range(1, 65),
      |      i -> a.v[i] * b.v[i]), (x, y) -> x + y) / sqrt(a.n2 * b.n2)) * 1e4 + 0.5) / 1e4 AS sim
      |FROM base a JOIN base b ON a.vec_id < b.vec_id
      |WHERE list_reduce(list_transform(range(1, 65),
      |      i -> a.v[i] * b.v[i]), (x, y) -> x + y) / sqrt(a.n2 * b.n2) >= 0.9
      |ORDER BY id_a, id_b""".stripMargin

  /** Parameterized cosine near-duplicate pairs — the library surface behind
    * q104. `threshold` is the exact cosine cut; (`bands`, `planesPerBand`)
    * are THE scale knobs: per-pair band collision is (1−θ/π)^r, so as the
    * threshold rises toward a realistic near-dup setting (≥ 0.9, θ ≤ 26°)
    * r grows and b shrinks — e.g. (16, 8) at 0.9 keeps per-pair miss
    * ≈ 0.4% while cutting candidate fan-out by orders of magnitude vs the
    * (64, 4) worst-case setting q104 ships for its 0.4 catalog threshold.
    */
  def cosineNearDup(spark: SparkSession, embeddings: DataFrame, threshold: Double,
                    bands: Int, planesPerBand: Int): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    // in-bucket exact check: cosine (codegen'd native expression) and the
    // threshold apply on the join output itself, so only true near-dup
    // pairs reach the dedup shuffle — a pair colliding in k bands costs k
    // cosine evals (k small on average), which is far cheaper than
    // shuffling every candidate pair's vectors through distinct + fetch
    // joins (measured 5× on the bench tables)
    val keyed = bandKeyed(spark, embeddings, bands, planesPerBand)
    keyed.toDF("id_a", "va", "band", "bucket")
      .join(keyed.toDF("id_b", "vb", "band", "bucket"), Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", expr("cosine_sim(va, vb)"))
      .filter(col("sim") >= threshold)
      .groupBy(col("id_a"), col("id_b"))
      .agg(Num.pround(first(col("sim")), 4).as("sim"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Distinct LSH candidate pairs for a (bands, planesPerBand) setting —
    * the pre-threshold fan-out a capacity plan is sized against (the
    * ScaleProbe measures this curve across synthetic decades).
    */
  private[graft] def bandCandidatePairs(spark: SparkSession, embeddings: DataFrame,
                                        bands: Int, planesPerBand: Int): DataFrame = {
    val keyed = bandKeyed(spark, embeddings, bands, planesPerBand)
      .drop("v")
    keyed.toDF("id_a", "band", "bucket")
      .join(keyed.toDF("id_b", "band", "bucket"), Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** One signature pass (native codegen'd expression — the SQL HOF
    * composition it replaces paid planes×dims interpreted lambda evals per
    * row and dominated the query): `bands` band signatures per vector,
    * exploded to (band, bucket) keys, each row carrying its vector so the
    * exact check can run inside the band join.
    */
  private def bandKeyed(spark: SparkSession, embeddings: DataFrame,
                        bands: Int, planesPerBand: Int): DataFrame = {
    val fn = s"lsh_bands_${bands}x$planesPerBand"
    graft.functions.LshBands.register(spark, fn,
      ndPlanesFor(bands, planesPerBand), planesPerBand)
    embeddings.select(col("vec_id"), vd.as("v"))
      .select(col("vec_id"), col("v"), posexplode(expr(s"$fn(v)")))
      .toDF("vec_id", "v", "band", "bucket")
  }

  // --------------------------------------------------------------------------
  // q452 — INCREMENTAL VECTOR INDEX: q447's LSM index discipline applied
  // to the embedding space. The persisted index holds hyperplane-bucket
  // signatures (band, band_sig) per vector — the SAME (doc_id, band,
  // band_sig) key family as the minhash band index, so the storage layer
  // (append-only deltas, tombstones, incremental census, compaction) is
  // BandIndex verbatim via ingestSigs; only the signature function and
  // the exact verification differ. Per ingest batch: signature build is
  // O(batch); candidates = batch × index bucket collisions (an equi-join
  // on (band, band_sig), never all-pairs); exact cosine runs over
  // CANDIDATE ids only (vectors semi-join-fetched from the corpus, the
  // wide arrays never broadcast — only the slim candidate pair keys);
  // the upsert appends an O(batch) delta. Same corpus and (16, 8)/0.9
  // setting as q104, whose oracle-checked exact-equality makes the
  // DuckDB replay exact here too: per planted-twin pair the band-miss
  // probability is (1 − 0.948⁸)¹⁶ ≈ 4e-8 and false candidates never
  // survive the exact cosine, so the oracle can skip LSH and count
  // exact cross-batch cosine ≥ 0.9 partners directly.
  //
  // Readout per batch (same shape as q447): incoming vectors, near-dups
  // vs the index as of the previous generation, novel (= incoming −
  // near-dup), and the incrementally maintained index census.
  private[ops] val viBatchExpr =
    "cast(conv(substring(md5(concat('vbatch:', cast(vec_id as string))), 1, 4), 16, 10) as bigint) % 4"

  /** (vec_id, embedding) → one (doc_id, band, band_sig) row per band:
    * the hyperplane-bucket signature family for [[BandIndex]] roots. */
  private[graft] def vecSignatures(spark: SparkSession, vecs: DataFrame): DataFrame = {
    val fn = s"lsh_bands_${ndRealBands}x$ndRealPlanesPerBand"
    graft.functions.LshBands.register(spark, fn,
      ndPlanesFor(ndRealBands, ndRealPlanesPerBand), ndRealPlanesPerBand)
    vecs.select(col("vec_id"), posexplode(expr(s"$fn(embedding)")))
      .toDF("doc_id", "band", "band_sig")
  }

  /** Exact-cosine verification for [[BandIndex.ingestSigs]] candidate
    * pairs, touching CANDIDATE ids only: vectors are semi-join-fetched
    * from `corpus` (the fetched frame feeds both sides of the pair join —
    * a fanout checkpoint, released by ingestSigs via the pairs plan), and
    * only the slim pair keys broadcast, never arrays. `corpus` must hold
    * (vec_id, embedding) for every id a candidate can name — callers
    * union in-flight batches in (the streaming front door does). Callers
    * register cosine_sim first. */
  private[graft] def cosineVerify(corpus: DataFrame, threshold: Double)(
      cand: DataFrame): DataFrame = {
    val needIds = cand.select(col("doc_id").as("vid"))
      .union(cand.select(col("id_ex").as("vid"))).distinct()
    val vecs = corpus.join(needIds, col("vec_id") === col("vid"), "left_semi")
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(true)
    broadcast(cand)
      .join(vecs.select(col("vec_id").as("doc_id"), col("embedding").as("va")), "doc_id")
      .join(vecs.select(col("vec_id").as("id_ex"), col("embedding").as("vb")), "id_ex")
      .filter(expr("cosine_sim(va, vb)") >= threshold)
  }

  def q452IncrementalVectorIndex(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    val corpus = plantedTwinCorpus(spark, dir).withColumn("batch", expr(viBatchExpr))
    val idxRoot = java.nio.file.Files.createTempDirectory("graft_vecidx").toString
    try {
      var st = BandIndex.seedSigs(spark, idxRoot,
        vecSignatures(spark, corpus.filter(col("batch") === 0)))
      // all three batch sizes in ONE pre-loop aggregate (the q447 fold)
      val incoming = corpus.filter(col("batch") >= 1).groupBy(col("batch"))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
      val out = (1 to 3).map { b =>
        val r = BandIndex.ingestSigs(spark, idxRoot,
          vecSignatures(spark, corpus.filter(col("batch") === b)),
          cosineVerify(corpus, ndRealThreshold), incoming(b.toLong), prev = Some(st))
        st = r.state
        (b.toLong, r.incoming, r.nearDup, r.incoming - r.nearDup, r.indexDocs)
      }
      import spark.implicits._
      out.toDF("batch", "incoming", "near_dup", "novel", "index_docs")
        .orderBy(col("batch"))
    } finally BandIndex.deleteRoot(spark, idxRoot)
  }

  val q452Sql: String =
    """WITH corpus AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 10000000,
      |    list_prepend(v[1] * 1.25, v[2:]) FROM (
      |      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
      |  WHERE vec_id % 10 = 0),
      |b AS (
      |  SELECT vec_id, v,
      |    ('0x' || substr(md5('vbatch:' || vec_id::VARCHAR), 1, 4))::BIGINT % 4
      |      AS batch,
      |    list_reduce(list_transform(v, x -> x * x), (xa, xb) -> xa + xb) AS n2
      |  FROM corpus),
      |nd AS (
      |  SELECT a.batch, a.vec_id
      |  FROM b a JOIN b ex ON ex.batch < a.batch AND a.batch >= 1
      |  WHERE list_reduce(list_transform(range(1, 65),
      |      i -> a.v[i] * ex.v[i]), (x, y) -> x + y) / sqrt(a.n2 * ex.n2) >= 0.9
      |  GROUP BY 1, 2),
      |sizes AS (SELECT batch, COUNT(*) AS n FROM b GROUP BY batch),
      |cum AS (
      |  SELECT batch,
      |    CAST(SUM(n) OVER (ORDER BY batch) AS BIGINT) AS index_docs
      |  FROM sizes),
      |ndc AS (SELECT batch, COUNT(*) AS nd_n FROM nd GROUP BY batch)
      |SELECT s.batch, CAST(s.n AS BIGINT) AS incoming,
      |  CAST(COALESCE(d.nd_n, 0) AS BIGINT) AS near_dup,
      |  CAST(s.n - COALESCE(d.nd_n, 0) AS BIGINT) AS novel,
      |  c.index_docs
      |FROM sizes s JOIN cum c USING (batch) LEFT JOIN ndc d USING (batch)
      |WHERE s.batch >= 1 ORDER BY s.batch""".stripMargin

  // --------------------------------------------------------------------------
  // q116 — contrastive pair mining for embedding training: for each anchor
  // (vec_id < 20), the POSITIVE is its most-similar same-label vector and
  // the HARD NEGATIVE its most-similar different-label vector — the
  // (anchor, positive, hard-negative) triplets that make contrastive /
  // triplet losses converge fastest. Deterministic argmax via
  // max(struct(sim, -vec_id)): ties prefer the LOWER vector id.
  //
  // Scale shape: anchors broadcast (a fixed training-batch-sized set);
  // the base table streams through ONE pass scoring both roles per row
  // (same-label rows compete for positive, different-label for negative),
  // and the per-anchor argmax is a map-side-partial hash aggregate — no
  // window sort, no second scan, nothing anchored on corpus size.
  def q116ContrastivePairs(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    contrastivePairs(Tables.embeddings(spark, dir), nAnchors = 20)
  }

  /** embeddings(vec_id, label, embedding) → one (positive, negative)
    * triplet row per anchor. */
  def contrastivePairs(embeddings: DataFrame, nAnchors: Int): DataFrame = {
    val base = embeddings.select(col("vec_id"), col("label"), vd.as("v"))
    val anchors = base.filter(col("vec_id") < nAnchors)
      .select(col("vec_id").as("aid"), col("label").as("alabel"), col("v").as("av"))
    base.crossJoin(broadcast(anchors))
      .filter(col("vec_id") =!= col("aid"))
      .withColumn("sim", expr("cosine_sim(v, av)"))
      .groupBy(col("aid"))
      .agg(
        max(when(col("label") === col("alabel"),
          struct(col("sim"), (-col("vec_id")).as("nid")))).as("pos"),
        max(when(col("label") =!= col("alabel"),
          struct(col("sim"), (-col("vec_id")).as("nid")))).as("neg"))
      .select(col("aid"),
        (-col("pos.nid")).as("pos_id"), Num.pround(col("pos.sim"), 4).as("pos_sim"),
        (-col("neg.nid")).as("neg_id"), Num.pround(col("neg.sim"), 4).as("neg_sim"))
      .orderBy(col("aid"))
  }

  /** Same dot/norm fold as the q40 oracle; argmax tie-break sim DESC,
    * vec_id ASC mirrors max(struct(sim, -vec_id)). */
  val q116Sql: String =
    """WITH base AS (
      |  SELECT vec_id, label, embedding::DOUBLE[] AS v,
      |    list_reduce(list_transform(embedding::DOUBLE[], x -> x * x), (a, b) -> a + b) AS n2
      |  FROM embeddings),
      |a AS (SELECT vec_id AS aid, label AS alabel, v AS av, n2 AS an2
      |      FROM base WHERE vec_id < 20),
      |sims AS (
      |  SELECT aid, alabel, b.vec_id, b.label,
      |    list_reduce(list_transform(range(1, 65), d -> b.v[d] * av[d]), (x, y) -> x + y)
      |      / sqrt(b.n2 * an2) AS sim
      |  FROM base b CROSS JOIN a WHERE b.vec_id <> aid),
      |pos AS (
      |  SELECT aid, vec_id AS pos_id, sim AS pos_sim FROM (
      |    SELECT aid, vec_id, sim,
      |      ROW_NUMBER() OVER (PARTITION BY aid ORDER BY sim DESC, vec_id ASC) AS rn
      |    FROM sims WHERE label = alabel) WHERE rn = 1),
      |neg AS (
      |  SELECT aid, vec_id AS neg_id, sim AS neg_sim FROM (
      |    SELECT aid, vec_id, sim,
      |      ROW_NUMBER() OVER (PARTITION BY aid ORDER BY sim DESC, vec_id ASC) AS rn
      |    FROM sims WHERE label <> alabel) WHERE rn = 1)
      |SELECT aid, pos_id, FLOOR((pos_sim) * 1e4 + 0.5) / 1e4 AS pos_sim,
      |       neg_id, FLOOR((neg_sim) * 1e4 + 0.5) / 1e4 AS neg_sim
      |FROM pos JOIN neg USING (aid) ORDER BY aid""".stripMargin

  // --------------------------------------------------------------------------
  // q141 — embedding covariance matrix: the d×d sample covariance of the
  // corpus embeddings — the front end of PCA / whitening / drift checks
  // on a learned representation (top eigenvector via power iteration on
  // the d×d result is a driver-side triviality once this table exists;
  // the distributed work is exactly these sums).
  //
  // Determinism (q41's scaled-long policy, pairwise edition): floats are
  // quantized to an exact 1e-6 grid (cast to double first so both engines
  // multiply in double), every Σqᵢqⱼ and Σqᵢ is an EXACT long (bounds:
  // |q| ≤ 1e6, so Σqᵢqⱼ ≤ n·1e12 and Σqᵢ·Σqⱼ ≤ n²·1e12 — fine through
  // n ~ 1e6 rows; beyond that, lower the grid a decimal), and the final
  // covariance is one fixed-order double expression over exact longs.
  //
  // Scale shape: the pair fan-out is ROW-LOCAL (posexplode the quantized
  // array twice, j ≥ i) — d(d+1)/2 cells per row straight into a
  // map-side-partial hash aggregate with d² result groups; no self-join,
  // no shuffle of vector data, ONE shuffle of 2080-cell partials. The
  // marginal sums and n ride a 65-row broadcast and a 1-row broadcast.
  def q141CovMatrix(spark: SparkSession, dir: String): DataFrame = {
    val qArr = expr(
      "transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0 + 0.5) as bigint))")
    val withQ = Tables.embeddings(spark, dir).select(qArr.as("qs"))
    val pairs = withQ
      .select(posexplode(col("qs")).as(Seq("i0", "qi")), col("qs"))
      .select(col("i0"), col("qi"), posexplode(col("qs")).as(Seq("j0", "qj")))
      .filter(col("j0") >= col("i0"))
      .groupBy((col("i0") + 1).as("i"), (col("j0") + 1).as("j"))
      .agg(sum(col("qi") * col("qj")).as("sij"))
    val marg = withQ
      .select(posexplode(col("qs")).as(Seq("i0", "q")))
      .groupBy((col("i0") + 1).as("i")).agg(sum(col("q")).as("s"))
    val n = Tables.embeddings(spark, dir).agg(count(lit(1)).as("n"))
    pairs
      .join(broadcast(marg.select(col("i"), col("s").as("si"))), Seq("i"))
      .join(broadcast(marg.select(col("i").as("j"), col("s").as("sj"))), Seq("j"))
      .crossJoin(broadcast(n))
      .select(col("i"), col("j"),
        Num.pround(((col("sij").cast("double") - col("si").cast("double") * col("sj") / col("n"))
          / (col("n") - 1) / lit(1000000000000.0)), 8).as("cov"))
      .orderBy(col("i"), col("j"))
  }

  val q141Sql: String =
    """WITH v AS (
      |  SELECT vec_id, i,
      |    CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS q
      |  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)),
      |pairs AS (
      |  SELECT a.i AS i, b.i AS j, SUM(a.q * b.q) AS sij
      |  FROM v a JOIN v b ON a.vec_id = b.vec_id AND b.i >= a.i
      |  GROUP BY 1, 2),
      |marg AS (SELECT i, SUM(q) AS s FROM v GROUP BY i),
      |n AS (SELECT COUNT(*) AS n FROM embeddings)
      |SELECT p.i, p.j,
      |  FLOOR(((CAST(sij AS DOUBLE) - CAST(ma.s AS DOUBLE) * mb.s / n)
      |        / (n - 1) / 1000000000000.0) * 1e8 + 0.5) / 1e8 AS cov
      |FROM pairs p
      |JOIN marg ma ON ma.i = p.i
      |JOIN marg mb ON mb.i = p.j
      |CROSS JOIN n
      |ORDER BY p.i, p.j""".stripMargin

  // --------------------------------------------------------------------------
  // q172 — semantic deduplication (SemDeDup-style): partition the embedding
  // space by nearest seed centroid, then remove within-cluster cosine
  // near-duplicates (≥ 0.85) keeping the lowest id — the embedding-space
  // analogue of MinHash dedup, used to prune semantically redundant
  // training examples.
  //
  // Scale (the round-7 verdict's fix): BOTH knobs that made the old shape
  // quadratic are now scale-aware.
  //   1. Seed count k = max(8, n div 256) GROWS with the corpus
  //      (SemDeDup's k ∝ n / target-cluster-size), so cluster sizes stay
  //      ~256-bounded and within-cluster pair mass is Θ(n·256) — linear —
  //      instead of Θ((n/8)²) under the old fixed 8 seeds. The ScaleProbe
  //      decade curve measures exactly this (semdedup_candidates).
  //   2. Banding is the PLANNER-derived realistic setting (16 bands × 8
  //      planes), not the 64×4 stress setting q104 was demoted for:
  //      q273's s-curve arithmetic (pinned in SeriesEncodeSpec) gives
  //      (16,8) ≥ 99.6% per-pair collision at s = 0.9 and ≥ 1−1e-7 at the
  //      jitter-twin sims (≥ 0.99) actual semantic dups exhibit, while a
  //      random pair collides in 16·2⁻⁸ ≈ 0.06 bands vs 64·2⁻⁴ = 4 — a
  //      64× candidate-constant cut.
  //   The broadcast-argmax assignment costs n·k row-local dot products
  //   (no shuffle); at extreme n swap it for q45's IVF coarse quantizer —
  //   the join shape downstream is unchanged.
  // Tie-break: argmax prefers the LOWER centroid id on exact sim ties
  // (max(struct(sim, -cid))) — mirrored in the oracle's ROW_NUMBER
  // ORDER BY sim DESC, cid ASC.
  private[ops] val sdBands = 16
  private[ops] val sdPlanesPerBand = 8

  /** Nearest-seed assignment with k = max(8, n div 256) — q172's first
    * stage, shared with the probe helper below.
    */
  private def sdAssigned(spark: SparkSession, emb: DataFrame): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    val kRow = emb.agg(expr("greatest(8L, count(1) div 256)").as("k"))
    val seeds = emb.select(col("vec_id"), vd.as("cv"))
      .crossJoin(broadcast(kRow))
      .filter(col("vec_id") < col("k"))
      .select(col("vec_id").as("cid"), col("cv"))
    emb.select(col("vec_id"), vd.as("v"))
      .crossJoin(broadcast(seeds))
      .withColumn("sim", expr("cosine_sim(v, cv)"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("sim"), (-col("cid")).as("nc"))).as("m"))
      .select(col("vec_id"), (-col("m.nc")).as("cluster"))
  }

  def q172SemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val assigned = sdAssigned(spark, emb)
    val keyed = bandKeyed(spark, emb, sdBands, sdPlanesPerBand)
      .join(assigned, Seq("vec_id"))
    val removed = keyed.toDF("id_a", "va", "band", "bucket", "cluster")
      .join(keyed.toDF("id_b", "vb", "band", "bucket", "cluster"),
        Seq("cluster", "band", "bucket"))
      .filter(col("id_a") < col("id_b") && expr("cosine_sim(va, vb)") >= 0.85)
      .select(col("cluster"), col("id_b").as("vec_id")).distinct()
    assigned.join(removed, Seq("cluster", "vec_id"), "left_anti")
      .groupBy(col("cluster")).agg(count(lit(1)).as("n_kept"))
      .join(assigned.groupBy(col("cluster")).agg(count(lit(1)).as("n_vecs")), Seq("cluster"))
      .select(col("cluster"), col("n_vecs"), (col("n_vecs") - col("n_kept")).as("n_removed"))
      .orderBy(col("cluster"))
  }

  /** q172's pre-threshold candidate-pair set (cluster ∧ band ∧ bucket
    * collisions) — the fan-out the ScaleProbe decade curve measures.
    */
  private[graft] def semanticDedupCandidatePairs(spark: SparkSession,
                                                 emb: DataFrame): DataFrame = {
    val assigned = sdAssigned(spark, emb)
    val keyed = bandKeyed(spark, emb, sdBands, sdPlanesPerBand).drop("v")
      .join(assigned, Seq("vec_id"))
    keyed.toDF("id_a", "band", "bucket", "cluster")
      .join(keyed.toDF("id_b", "band", "bucket", "cluster"),
        Seq("cluster", "band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  val q172Sql: String =
    """WITH base AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |    list_reduce(list_transform(embedding::DOUBLE[], x -> x * x), (a, b) -> a + b) AS n2
      |  FROM embeddings),
      |seeds AS (SELECT vec_id AS cid, v AS cv, n2 AS cn2 FROM base
      |          WHERE vec_id < (SELECT GREATEST(8, COUNT(*) // 256) FROM base)),
      |assigned AS (
      |  SELECT vec_id, cid AS cluster FROM (
      |    SELECT b.vec_id, s.cid,
      |      ROW_NUMBER() OVER (PARTITION BY b.vec_id
      |        ORDER BY list_reduce(list_transform(range(1, 65),
      |          i -> b.v[i] * s.cv[i]), (x, y) -> x + y) / sqrt(b.n2 * s.cn2) DESC,
      |          s.cid ASC) AS rk
      |    FROM base b CROSS JOIN seeds s) WHERE rk = 1),
      |removed AS (
      |  SELECT DISTINCT aa.cluster, bb.vec_id
      |  FROM assigned aa JOIN base a ON a.vec_id = aa.vec_id
      |  JOIN assigned bb ON bb.cluster = aa.cluster AND bb.vec_id > aa.vec_id
      |  JOIN base b ON b.vec_id = bb.vec_id
      |  WHERE list_reduce(list_transform(range(1, 65),
      |          i -> a.v[i] * b.v[i]), (x, y) -> x + y) / sqrt(a.n2 * b.n2) >= 0.85)
      |SELECT cluster, COUNT(*) AS n_vecs,
      |  COUNT(*) FILTER (WHERE r.vec_id IS NOT NULL) AS n_removed
      |FROM assigned LEFT JOIN removed r USING (cluster, vec_id)
      |GROUP BY cluster ORDER BY cluster""".stripMargin

  // --------------------------------------------------------------------------
  // q212 — EMBEDDING-SPACE OUTLIER filter: assign every vector to its
  // nearest seed centroid (q172's broadcast argmax), then flag vectors
  // whose similarity-to-centroid z-score sits below −2 within their
  // cluster — the "drop embedding-space junk before training" screen
  // (mislabeled/degenerate samples land far from every centroid).
  //
  // Determinism: the per-row cosine is a fixed-order fold; cluster
  // mean/std go through the scaled-long policy (sims quantized to the
  // 1e-12 grid, Σq as exact longs, Σq² as DECIMAL(38,0)) so the moments
  // are order-free; the z division is per-row IEEE.
  //
  // Scale: one broadcast-assignment pass, one hash agg to the k-row
  // cluster-stats table, broadcast back — two linear passes, no windows.
  def q212EmbeddingOutliers(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val seeds = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), vd.as("cv"))
    val assigned = emb.select(col("vec_id"), vd.as("v"))
      .crossJoin(broadcast(seeds))
      .withColumn("sim", expr("cosine_sim(v, cv)"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("sim"), (-col("cid")).as("nc"))).as("m"))
      .select(col("vec_id"), (-col("m.nc")).as("cluster"), col("m.sim").as("sim"))
      .withColumn("sq", expr("cast(floor(sim * 1e12 + 0.5d) as long)"))
    val stats = assigned.groupBy(col("cluster")).agg(
      count(lit(1)).as("n"),
      sum(col("sq")).as("s1"),
      sum(col("sq").cast(org.apache.spark.sql.types.DecimalType(38, 0)) * col("sq")).as("s2"))
      .withColumn("mean_s", col("s1").cast("double") / 1e12 / col("n"))
      .withColumn("ex2", col("s2").cast("double") / 1e24 / col("n"))
      // singleton clusters have no spread: std (and so z/is_outlier) is
      // null rather than a divide-by-zero
      .withColumn("std_s", when(col("n") > 1,
        sqrt((col("ex2") - col("mean_s") * col("mean_s"))
          * col("n") / (col("n") - 1))))
      .select(col("cluster"), col("mean_s"), col("std_s"))
    assigned.join(broadcast(stats), Seq("cluster"))
      .withColumn("z", (col("sim") - col("mean_s")) / col("std_s"))
      .select(col("vec_id"), col("cluster"), Num.pround(col("sim"), 6).as("sim"),
        Num.pround(col("z"), 4).as("z"), (col("z") < -2.0).as("is_outlier"))
      .orderBy(col("vec_id"))
  }

  val q212Sql: String =
    """WITH base AS (
      |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v,
      |    list_reduce(list_transform(embedding, x -> x::DOUBLE * x), (a, b) -> a + b) AS n2
      |  FROM embeddings),
      |seeds AS (SELECT vec_id AS cid, v AS cv, n2 AS cn2 FROM base WHERE vec_id < 8),
      |assigned AS (
      |  SELECT vec_id, cid AS cluster, sim,
      |    CAST(FLOOR(sim * 1e12 + 0.5) AS BIGINT) AS sq FROM (
      |    SELECT b.vec_id, s.cid,
      |      list_reduce(list_transform(range(1, 65), i -> b.v[i] * s.cv[i]),
      |        (x, y) -> x + y) / sqrt(b.n2 * s.cn2) AS sim,
      |      ROW_NUMBER() OVER (PARTITION BY b.vec_id
      |        ORDER BY list_reduce(list_transform(range(1, 65), i -> b.v[i] * s.cv[i]),
      |          (x, y) -> x + y) / sqrt(b.n2 * s.cn2) DESC, s.cid ASC) AS rk
      |    FROM base b CROSS JOIN seeds s) WHERE rk = 1),
      |stats AS (
      |  SELECT cluster, COUNT(*) AS n,
      |    CAST(SUM(sq) AS DOUBLE) / 1e12 / COUNT(*) AS mean_s,
      |    CAST(SUM(sq::HUGEINT * sq) AS DOUBLE) / 1e24 / COUNT(*) AS ex2
      |  FROM assigned GROUP BY cluster),
      |st AS (
      |  SELECT cluster, mean_s,
      |    CASE WHEN n > 1
      |         THEN sqrt((ex2 - mean_s * mean_s) * n / (n - 1)) END AS std_s
      |  FROM stats)
      |SELECT vec_id, cluster, FLOOR((sim) * 1e6 + 0.5) / 1e6 AS sim,
      |  FLOOR(((sim - mean_s) / std_s) * 1e4 + 0.5) / 1e4 AS z,
      |  (sim - mean_s) / std_s < -2.0 AS is_outlier
      |FROM assigned JOIN st USING (cluster)
      |ORDER BY vec_id""".stripMargin

  // --------------------------------------------------------------------------
  // q229 — MATRYOSHKA PREFIX-DIMENSION RECALL EVAL: can the 64-d corpus be
  // served from its first 16 (or 32) dimensions? For each query, compare
  // the exact top-4 neighbor set under full-dim cosine against the top-4
  // under prefix-dim cosine and report recall@4 — the measurement behind
  // the "truncate MRL embeddings to cut ANN cost 4×" decision (Kusupati
  // et al.). Complements q205/q217 (quantization) with the OTHER
  // compression axis (dimension truncation).
  //
  // Scale: one corpus pass computes all three cosines per (query, vec)
  // against the broadcast 4-row query side; per-query rank windows are
  // partitioned by qid; the overlap join runs on 4·k rows. Cosines are
  // rounded to 6 dp BEFORE ranking, ties break on vec_id — identical
  // ranking in both engines.
  def q229MatryoshkaEval(spark: SparkSession, dir: String): DataFrame = {
    def cosAt(d: Int): org.apache.spark.sql.Column = Num.pround(
      expr(s"aggregate(zip_with(slice(v, 1, $d), slice(qv, 1, $d), (x, y) -> x * y), 0.0d, (a, x) -> a + x)") /
        sqrt(expr(s"aggregate(slice(v, 1, $d), 0.0d, (a, x) -> a + x * x)") *
          expr(s"aggregate(slice(qv, 1, $d), 0.0d, (a, x) -> a + x * x)")), 6)
    val base = Tables.embeddings(spark, dir).select(col("vec_id"), vd.as("v"))
    val queries = base.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val scored = base.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosAt(64).as("s64"), cosAt(32).as("s32"), cosAt(16).as("s16"))
    def top4(simCol: String) = scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col(simCol).desc, col("vec_id"))))
      .filter(col("rk") <= 4).select(col("qid"), col("vec_id"))
    val full = top4("s64")
    def overlap(d: Int) = full.join(top4(s"s$d"), Seq("qid", "vec_id"))
      .groupBy(col("qid")).agg(count(lit(1)).as(s"n$d"))
    queries.select(col("qid"))
      .join(overlap(16), Seq("qid"), "left")
      .join(overlap(32), Seq("qid"), "left")
      .select(col("qid"),
        Num.pround(coalesce(col("n16"), lit(0L)).cast("double") / 4, 6).as("recall16"),
        Num.pround(coalesce(col("n32"), lit(0L)).cast("double") / 4, 6).as("recall32"))
      .orderBy(col("qid"))
  }

  val q229Sql: String = {
    def cosAt(d: Int): String =
      s"FLOOR((list_reduce(list_transform(range(1, ${d + 1}), i -> v[i] * qv[i]), (a, b) -> a + b)" +
        s" / sqrt(list_reduce(list_transform(range(1, ${d + 1}), i -> v[i] * v[i]), (a, b) -> a + b)" +
        s" * list_reduce(list_transform(range(1, ${d + 1}), i -> qv[i] * qv[i]), (a, b) -> a + b))) * 1e6 + 0.5) / 1e6"
    s"""WITH base AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT vec_id AS qid, v AS qv FROM base WHERE vec_id < 4),
       |sc AS MATERIALIZED (
       |  SELECT qid, vec_id, ${cosAt(64)} AS s64, ${cosAt(32)} AS s32,
       |    ${cosAt(16)} AS s16
       |  FROM base CROSS JOIN q WHERE vec_id <> qid),
       |t64 AS (SELECT qid, vec_id FROM (
       |  SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY s64 DESC, vec_id) AS rk FROM sc) WHERE rk <= 4),
       |t32 AS (SELECT qid, vec_id FROM (
       |  SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY s32 DESC, vec_id) AS rk FROM sc) WHERE rk <= 4),
       |t16 AS (SELECT qid, vec_id FROM (
       |  SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY s16 DESC, vec_id) AS rk FROM sc) WHERE rk <= 4),
       |o16 AS (SELECT t64.qid, COUNT(*) AS n16 FROM t64
       |  JOIN t16 ON t64.qid = t16.qid AND t64.vec_id = t16.vec_id GROUP BY 1),
       |o32 AS (SELECT t64.qid, COUNT(*) AS n32 FROM t64
       |  JOIN t32 ON t64.qid = t32.qid AND t64.vec_id = t32.vec_id GROUP BY 1)
       |SELECT q.qid,
       |  FLOOR((COALESCE(n16, 0) / 4.0) * 1e6 + 0.5) / 1e6 AS recall16,
       |  FLOOR((COALESCE(n32, 0) / 4.0) * 1e6 + 0.5) / 1e6 AS recall32
       |FROM q LEFT JOIN o16 ON q.qid = o16.qid LEFT JOIN o32 ON q.qid = o32.qid
       |ORDER BY q.qid""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q248 — CLUSTERING QUALITY via the CENTROID-MARGIN SILHOUETTE: per
  // vector, a = L2² distance to its own (nearest) centroid, b = distance
  // to the runner-up; s = (b − a)/max(a, b) ∈ [0,1] measures how
  // decisively the vector belongs to its cluster (the simplified
  // silhouette — sklearn's medoid-free variant — which needs only the
  // k broadcast centroids, never pairwise points, so it runs at 100 TB
  // where the classic pairwise silhouette cannot). Reported per cluster:
  // size and mean margin.
  //
  // Determinism: both distances come from a sort_array over the 8
  // per-centroid rows (ties broken by centroid id); the per-vector fold
  // over dims is sequential and identical in both engines; s is
  // quantized to an exact 1e-9 long BEFORE the per-cluster mean (the
  // scaled-long Σ policy — double sums never cross engines).
  def q248Silhouette(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val seeds = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), vd.as("cv"))
    emb.select(col("vec_id"), vd.as("v"))
      .crossJoin(broadcast(seeds))
      .withColumn("d", expr(
        "aggregate(zip_with(v, cv, (x, y) -> (x - y) * (x - y)), cast(0 as double), (acc, t) -> acc + t)"))
      .groupBy(col("vec_id"))
      .agg(sort_array(collect_list(struct(col("d"), col("cid")))).as("arr"))
      .select(col("vec_id"),
        col("arr").getItem(0).getField("cid").as("cluster"),
        col("arr").getItem(0).getField("d").as("a"),
        col("arr").getItem(1).getField("d").as("b"))
      .withColumn("sq",
        when(greatest(col("a"), col("b")) === 0.0, lit(0L))
          .otherwise(floor((col("b") - col("a")) / greatest(col("a"), col("b")) * 1e9)
            .cast("long")))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        Num.pround(sum(col("sq")).cast("double") / 1e9 / count(lit(1)), 6).as("mean_margin"))
      .orderBy(col("cluster"))
  }

  val q248Sql: String =
    """WITH base AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |seeds AS (SELECT vec_id AS cid, v AS cv FROM base WHERE vec_id < 8),
      |dist AS (
      |  SELECT b.vec_id, s.cid,
      |    list_reduce(list_transform(range(1, 65),
      |      i -> (b.v[i] - s.cv[i]) * (b.v[i] - s.cv[i])), (x, y) -> x + y) AS d
      |  FROM base b CROSS JOIN seeds s),
      |rk AS (
      |  SELECT vec_id, cid, d,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS r
      |  FROM dist),
      |sv AS (
      |  SELECT vec_id,
      |    MIN(CASE WHEN r = 1 THEN cid END) AS cluster,
      |    MIN(CASE WHEN r = 1 THEN d END) AS a,
      |    MIN(CASE WHEN r = 2 THEN d END) AS b
      |  FROM rk WHERE r <= 2 GROUP BY 1),
      |q AS (
      |  SELECT vec_id, cluster,
      |    CASE WHEN GREATEST(a, b) = 0.0 THEN 0
      |         ELSE CAST(FLOOR((b - a) / GREATEST(a, b) * 1e9) AS BIGINT) END AS sq
      |  FROM sv)
      |SELECT cluster, COUNT(*) AS n,
      |  FLOOR((CAST(SUM(sq) AS DOUBLE) / 1e9 / COUNT(*)) * 1e6 + 0.5) / 1e6 AS mean_margin
      |FROM q GROUP BY cluster ORDER BY cluster""".stripMargin

  // --------------------------------------------------------------------------
  // q259 — DIVERSIFIED UNCERTAINTY ACQUISITION (active learning): pick
  // the next labeling batch as the most-uncertain points SUBJECT TO a
  // per-cluster cap — pure uncertainty sampling collapses onto one
  // confusing region; the cluster cap (q172's 8 broadcast seed centroids)
  // forces coverage. Uncertainty is the deterministic md5 acquisition
  // score (stand-in for a model's 1 − max-prob, same shape the real
  // scorer emits); selection = rank by (uncertainty desc, vec_id) within
  // cluster, keep 2 per cluster.
  //
  // Scale: one broadcast-assignment pass + a window PARTITIONED by
  // cluster — never a global uncertainty sort.
  def q259Acquisition(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val seeds = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), vd.as("cv"))
    val assigned = emb.select(col("vec_id"), vd.as("v"))
      .crossJoin(broadcast(seeds))
      .withColumn("sim", expr("cosine_sim(v, cv)"))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("sim"), (-col("cid")).as("nc"))).as("m"))
      .select(col("vec_id"), (-col("m.nc")).as("cluster"))
    val u = (conv(substring(md5(concat(lit("unc:"), col("vec_id").cast("string"))), 1, 13),
      16, 10).cast("long").cast("double") + 0.5) / lit(4503599627370496.0)
    assigned.withColumn("unc", Num.pround(u, 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("cluster")).orderBy(col("unc").desc, col("vec_id"))))
      .filter(col("rk") <= 2)
      .select(col("cluster"), col("rk"), col("vec_id"), col("unc"))
      .orderBy(col("cluster"), col("rk"))
  }

  val q259Sql: String =
    """WITH base AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |    list_reduce(list_transform(embedding::DOUBLE[], x -> x * x), (a, b) -> a + b) AS n2
      |  FROM embeddings),
      |seeds AS (SELECT vec_id AS cid, v AS cv, n2 AS cn2 FROM base WHERE vec_id < 8),
      |assigned AS (
      |  SELECT vec_id, cid AS cluster FROM (
      |    SELECT b.vec_id, s.cid,
      |      ROW_NUMBER() OVER (PARTITION BY b.vec_id
      |        ORDER BY list_reduce(list_transform(range(1, 65),
      |          i -> b.v[i] * s.cv[i]), (x, y) -> x + y) / sqrt(b.n2 * s.cn2) DESC,
      |          s.cid ASC) AS rk
      |    FROM base b CROSS JOIN seeds s) WHERE rk = 1),
      |scored AS (
      |  SELECT vec_id, cluster,
      |    FLOOR(((('0x' || substr(md5('unc:' || vec_id::VARCHAR), 1, 13))::BIGINT + 0.5)
      |      / 4503599627370496.0) * 1e6 + 0.5) / 1e6 AS unc
      |  FROM assigned),
      |rk AS (
      |  SELECT cluster, vec_id, unc,
      |    ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY unc DESC, vec_id) AS rk
      |  FROM scored QUALIFY rk <= 2)
      |SELECT cluster, CAST(rk AS INT) AS rk, vec_id, unc
      |FROM rk ORDER BY cluster, rk""".stripMargin

  // --------------------------------------------------------------------------
  // q263 — EMBEDDING DRIFT MONITOR: did the embedding distribution move
  // between two production batches? Split the corpus into cohorts A/B
  // (vec_id halves standing in for week-1/week-2 batches), compute per-
  // DIMENSION mean and variance for each cohort in ONE pass (explode to
  // (dim, value) with exact 1e6-scaled-long moments — 64·2 grid rows),
  // and report each dimension's mean shift in pooled-σ units plus the
  // variance ratio. The per-dim readout localizes WHICH dimensions moved
  // — the signal a scalar drift score (q133's PSI) cannot give.
  //
  // Exactness: all moments are exact integer sums; shift/ratio are two
  // double divisions at output, rounded 6 dp.
  def q263EmbeddingDrift(spark: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val half = Tables.embeddings(spark, dir)
      .select(col("vec_id"), vd.as("v"))
      .crossJoin(broadcast(Tables.embeddings(spark, dir)
        .agg(max(col("vec_id")).as("mx"))))
      .withColumn("cohort", (col("vec_id") * 2 <= col("mx")).cast("int"))
    val byDim = half
      .select(col("cohort"), posexplode(col("v")).as(Seq("dim", "x")))
      .withColumn("q", floor(col("x") * 1e6 + 0.5).cast("long"))
      .groupBy(col("dim"), col("cohort"))
      .agg(count(lit(1)).cast(d38).as("n"),
        sum(col("q")).cast(d38).as("s1"),
        sum(col("q").cast(d38) * col("q")).cast(d38).as("s2"))
    val a = byDim.filter(col("cohort") === 1)
      .select(col("dim"), col("n").as("na"), col("s1").as("sa1"), col("s2").as("sa2"))
    val b = byDim.filter(col("cohort") === 0)
      .select(col("dim"), col("n").as("nb"), col("s1").as("sb1"), col("s2").as("sb2"))
    a.join(b, Seq("dim"))
      .withColumn("va", (col("sa2") * col("na") - col("sa1") * col("sa1")).cast("double") /
        (col("na") * col("na")).cast("double"))
      .withColumn("vb", (col("sb2") * col("nb") - col("sb1") * col("sb1")).cast("double") /
        (col("nb") * col("nb")).cast("double"))
      // zero-variance guard (q199's rule): Spark's Divide yields NULL on
      // /0 while DuckDB yields NaN/inf — pin degenerate dims explicitly
      .withColumn("shift",
        when(col("va") + col("vb") > 0.0,
          (col("sa1").cast("double") / col("na").cast("double") -
            col("sb1").cast("double") / col("nb").cast("double")) /
            sqrt((col("va") + col("vb")) / 2.0))
          .otherwise(lit(0.0)))
      .select(col("dim"),
        Num.pround(col("shift"), 6).as("mean_shift_sigma"),
        when(col("vb") > 0.0, Num.pround(col("va") / col("vb"), 6)).as("var_ratio"),
        (abs(col("shift")) > 0.1).as("drifted"))
      .orderBy(col("dim"))
  }

  val q263Sql: String =
    """WITH base AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v,
      |    CAST(vec_id * 2 <= (SELECT MAX(vec_id) FROM embeddings) AS INT) AS cohort
      |  FROM embeddings),
      |e AS (
      |  SELECT cohort, i - 1 AS dim,
      |    CAST(FLOOR(v[i] * 1e6 + 0.5) AS BIGINT) AS q
      |  FROM base, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) u),
      |m AS (
      |  SELECT dim, cohort, COUNT(*) AS n,
      |    SUM(CAST(q AS HUGEINT)) AS s1, SUM(CAST(q AS HUGEINT) * q) AS s2
      |  FROM e GROUP BY 1, 2),
      |j AS (
      |  SELECT a.dim,
      |    CAST(a.s2 * a.n - a.s1 * a.s1 AS DOUBLE) / CAST(a.n * a.n AS DOUBLE) AS va,
      |    CAST(b.s2 * b.n - b.s1 * b.s1 AS DOUBLE) / CAST(b.n * b.n AS DOUBLE) AS vb,
      |    (CAST(a.s1 AS DOUBLE) / CAST(a.n AS DOUBLE)
      |      - CAST(b.s1 AS DOUBLE) / CAST(b.n AS DOUBLE)) AS md,
      |    a.n AS na, b.n AS nb
      |  FROM m a JOIN m b ON a.dim = b.dim AND a.cohort = 1 AND b.cohort = 0)
      |SELECT CAST(dim AS INT) AS dim,
      |  FLOOR((CASE WHEN va + vb > 0.0 THEN md / sqrt((va + vb) / 2.0)
      |    ELSE 0.0 END) * 1e6 + 0.5) / 1e6 AS mean_shift_sigma,
      |  CASE WHEN vb > 0.0 THEN FLOOR((va / vb) * 1e6 + 0.5) / 1e6 END AS var_ratio,
      |  ABS(CASE WHEN va + vb > 0.0 THEN md / sqrt((va + vb) / 2.0)
      |    ELSE 0.0 END) > 0.1 AS drifted
      |FROM j ORDER BY dim""".stripMargin

  // --------------------------------------------------------------------------
  // q411 — LABEL CENTROID-MARGIN AUDIT (round 9): for every labeled
  // vector, own-centroid cosine minus the best rival-centroid cosine;
  // per label the confusable count (margin < 0 — the vector sits closer
  // to another label's centroid) and the mean margin. The classifier-
  // free separability readout an embedding pipeline checks before
  // trusting labels for curriculum/filter decisions — q212 flags
  // within-cluster outliers, this flags BETWEEN-label confusion.
  //
  // Determinism: centroid components go through q41's scaled-long mean
  // (Σ floor(x·1e12+0.5) exact, one double division) so both engines
  // build bit-identical centroid vectors; cosines are the fused
  // cosine_sim chain (= DuckDB's independent left-to-right folds);
  // margins are differences of identical doubles, so the margin<0 cut
  // is engine-stable; the mean margin rides the scaled-long policy.
  //
  // Scale: one explode + hash agg for centroids (|labels|·dims rows),
  // one broadcast(|labels|) cross join — q212's assignment class.
  def q411LabelMargin(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.CosineSimilarity.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val comp = emb.select(col("label"), posexplode(vd))
      .withColumnRenamed("pos", "dim").withColumnRenamed("col", "v")
      .withColumn("vq", expr("cast(floor(v * 1e12 + 0.5d) as long)"))
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("vq")).as("sq"), count(lit(1)).as("n"))
      .select(col("label"), col("dim"),
        (col("sq").cast("double") / 1e12 / col("n")).as("c"))
    val cents = comp.groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, c))), s -> s.c)")
        .as("cv"))
      .select(col("label").as("clabel"), col("cv"))
    val assigned = emb.select(col("vec_id"), col("label"), vd.as("v"))
      .crossJoin(broadcast(cents))
      .withColumn("sim", expr("cosine_sim(v, cv)"))
      .localCheckpoint(false) // feeds the own-sim AND rival-sim passes
    val own = assigned.filter(col("label") === col("clabel"))
      .select(col("vec_id"), col("label"), col("sim").as("own_sim"))
    val rival = assigned.filter(col("label") =!= col("clabel"))
      .groupBy(col("vec_id")).agg(max(col("sim")).as("rival_sim"))
    own.join(rival, Seq("vec_id"))
      .withColumn("mq",
        expr("cast(floor((own_sim - rival_sim) * 1e12 + 0.5d) as long)"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        count_if(col("own_sim") < col("rival_sim")).as("confusable"),
        sum(col("mq")).as("smq"))
      .select(col("label"), col("n_vecs"), col("confusable"),
        expr("(1000000L * confusable) div n_vecs").as("confusable_ppm"),
        Num.pround(col("smq").cast("double") / 1e12 / col("n_vecs"), 6)
          .as("avg_margin6"))
      .orderBy(col("label"))
  }

  val q411Sql: String =
    """WITH base AS (
      |  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v,
      |    list_reduce(list_transform(embedding, x -> x::DOUBLE * x),
      |      (a, b) -> a + b) AS n2
      |  FROM embeddings),
      |comp AS (
      |  SELECT label, dim, CAST(SUM(vq) AS DOUBLE) / 1e12 / COUNT(*) AS c
      |  FROM (
      |    SELECT label, generate_subscripts(embedding, 1) AS dim,
      |      CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1e12 + 0.5)
      |        AS BIGINT) AS vq
      |    FROM embeddings)
      |  GROUP BY 1, 2),
      |cents AS (
      |  SELECT label AS clabel, list(c ORDER BY dim) AS cv FROM comp GROUP BY 1),
      |cent2 AS (
      |  SELECT clabel, cv,
      |    list_reduce(list_transform(cv, x -> x * x), (a, b) -> a + b) AS cn2
      |  FROM cents),
      |assigned AS (
      |  SELECT b.vec_id, b.label, c.clabel,
      |    list_reduce(list_transform(range(1, 65), i -> b.v[i] * c.cv[i]),
      |      (x, y) -> x + y) / sqrt(b.n2 * c.cn2) AS sim
      |  FROM base b CROSS JOIN cent2 c),
      |own AS (
      |  SELECT vec_id, label, sim AS own_sim FROM assigned WHERE label = clabel),
      |riv AS (
      |  SELECT vec_id, MAX(sim) AS rival_sim FROM assigned
      |  WHERE label <> clabel GROUP BY 1)
      |SELECT o.label, COUNT(*) AS n_vecs,
      |  CAST(COUNT(*) FILTER (own_sim < rival_sim) AS BIGINT) AS confusable,
      |  CAST((1000000 * COUNT(*) FILTER (own_sim < rival_sim)) // COUNT(*)
      |    AS BIGINT) AS confusable_ppm,
      |  FLOOR((CAST(SUM(CAST(FLOOR((own_sim - rival_sim) * 1e12 + 0.5)
      |      AS BIGINT)) AS DOUBLE) / 1e12 / COUNT(*)) * 1e6 + 0.5) / 1e6
      |    AS avg_margin6
      |FROM own o JOIN riv r USING (vec_id)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ═════════════════ formerly Round8Ops (consolidated round 10) ═════════════════

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
  // q443 — LATE-INTERACTION MAXSIM RETRIEVAL (round 12; ColBERT-style,
  // Khattab & Zaharia, SIGIR'20): treat each run of `TokensPerMsDoc`
  // consecutive embedding rows as one DOCUMENT's token vectors; score a
  // document against a query document as
  //   MaxSim(q, d) = Σ_{qt ∈ q}  max_{dt ∈ d}  cosine(qt, dt)
  // — per query token, the best-matching doc token, summed. This is the
  // multi-vector retrieval operator single-vector q40/q42/q45 cannot
  // express, and the standard quality/cost middle ground between
  // bi-encoders and cross-encoders.
  //
  // Scale shape: the query side is a BOUNDED probe set (3 docs ×
  // TokensPerMsDoc vectors, broadcast); the corpus streams through ONE
  // pass scoring |corpus tokens| × |query tokens| row-locally, then two
  // hash aggregates (per-query-token max over each doc, then the sum per
  // doc) and a per-query top-k window — corpus-linear, never all-pairs.
  // At 100 TB the candidate set comes from q42/q45's banded ANN first
  // and this operator re-scores the survivors.
  //
  // Determinism (§8.4): cosines use q40's fold order, then collapse to
  // floor(sim·1e6) BIGINTs BEFORE the max/sum aggregates — integers are
  // order-free, so the whole score is engine-exact.
  val TokensPerMsDoc = 8

  def q443MaxsimRetrieval(spark: SparkSession, dir: String): DataFrame = {
    val t = TokensPerMsDoc
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), vd.as("v"))
      .withColumn("doc", expr(s"vec_id div $t"))
      .withColumn("n2", expr("aggregate(v, 0.0d, (a, x) -> a + x * x)"))
    val qtok = base.filter(col("doc") < 3)
      .select(col("doc").as("qdoc"), col("vec_id").as("qt"),
        col("v").as("qv"), col("n2").as("qn2"))
    base.crossJoin(broadcast(qtok))
      .filter(col("doc") =!= col("qdoc"))
      .withColumn("dot",
        expr("aggregate(zip_with(v, qv, (x, y) -> x * y), 0.0d, (a, x) -> a + x)"))
      .withColumn("sim_e6",
        floor(col("dot") / sqrt(col("n2") * col("qn2")) * 1e6).cast("long"))
      .groupBy(col("qdoc"), col("qt"), col("doc"))
      .agg(max(col("sim_e6")).as("tok_max"))
      .groupBy(col("qdoc"), col("doc"))
      .agg(sum(col("tok_max")).as("maxsim_e6"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qdoc"))
          .orderBy(col("maxsim_e6").desc, col("doc"))))
      .filter(col("rank") <= 5)
      .select(col("qdoc"), col("rank").cast("int").as("rank"),
        col("doc").as("doc_id"), col("maxsim_e6"))
      .orderBy(col("qdoc"), col("rank"))
  }

  val q443Sql: String = {
    val t = TokensPerMsDoc
    s"""WITH base AS (
       |  SELECT vec_id, vec_id // $t AS doc, embedding::DOUBLE[] AS v,
       |    list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
       |      (a, b) -> a + b) AS n2
       |  FROM embeddings),
       |qtok AS (
       |  SELECT doc AS qdoc, vec_id AS qt, v AS qv, n2 AS qn2
       |  FROM base WHERE doc < 3),
       |sims AS (
       |  SELECT qdoc, qt, doc,
       |    CAST(FLOOR(list_reduce(list_transform(range(1, 65),
       |        i -> v[i] * qv[i]), (a, b) -> a + b)
       |      / sqrt(n2 * qn2) * 1e6) AS BIGINT) AS sim_e6
       |  FROM base CROSS JOIN qtok WHERE doc <> qdoc),
       |tok AS (
       |  SELECT qdoc, qt, doc, MAX(sim_e6) AS tok_max
       |  FROM sims GROUP BY 1, 2, 3),
       |score AS (
       |  SELECT qdoc, doc, SUM(tok_max) AS maxsim_e6
       |  FROM tok GROUP BY 1, 2),
       |r AS (
       |  SELECT qdoc, doc, maxsim_e6,
       |    ROW_NUMBER() OVER (PARTITION BY qdoc
       |      ORDER BY maxsim_e6 DESC, doc) AS rank
       |  FROM score)
       |SELECT qdoc, CAST(rank AS INT) AS rank, doc AS doc_id,
       |  CAST(maxsim_e6 AS BIGINT) AS maxsim_e6
       |FROM r WHERE rank <= 5 ORDER BY qdoc, rank""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q444 — ANN → MAXSIM TWO-STAGE RETRIEVAL (round 12): the 100 TB shape
  // q443's scaladoc promises, as a real catalog entry. Stage 1 buckets
  // every document by hyperplane LSH (q42's fixed portable planes) over
  // its CLS vector — the doc's FIRST token embedding, the single-vector
  // summary convention — with hamming-1 multi-probe on the query side;
  // stage 2 re-scores ONLY the bucket candidates with the exact MaxSim
  // late interaction. Candidate generation is the banded equi-join (a
  // probed fraction of the corpus), the re-score is |candidates| ×
  // |query tokens| — never corpus × query tokens, never all-pairs.
  //
  // Determinism: same integer-collapse discipline as q443; bucket bits
  // replay exactly (q42's plane literals are embedded in the oracle).
  // MaxsimRerankSpec pins stage-2 scores equal to q443's for shared
  // (qdoc, doc) pairs and recall on a planted clustered corpus.
  def q444MaxsimAnnRerank(spark: SparkSession, dir: String): DataFrame = {
    val t = TokensPerMsDoc
    // base feeds the CLS bucketing AND both re-scoring sides (§8.22)
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), vd.as("v"))
      .withColumn("doc", expr(s"vec_id div $t"))
      .withColumn("n2", expr("aggregate(v, 0.0d, (a, x) -> a + x * x)"))
      .localCheckpoint(false)
    val planes = typedlit(hyperplanes)
    val cls = base.filter(expr(s"vec_id % $t = 0"))
      .select(col("doc"), col("v"))
      .withColumn("planes", planes)
      .withColumn("bucket", expr(
        """aggregate(sequence(0, size(planes) - 1), 0,
          |  (acc, i) -> acc * 2 + (CASE WHEN
          |     aggregate(zip_with(v, planes[i], (x, p) -> x * p), 0.0d, (a, x) -> a + x) > 0.0d
          |     THEN 1 ELSE 0 END))""".stripMargin))
      .select(col("doc"), col("bucket"))
    val qb = cls.filter(col("doc") < 3)
      .select(col("doc").as("qdoc"), explode(expr(
        s"""transform(sequence(0, $numPlanes),
           |  i -> CASE WHEN i = 0 THEN bucket
           |       ELSE bucket ^ shiftleft(1, i - 1) END)""".stripMargin)).as("bucket"))
    val cand = cls.join(broadcast(qb), Seq("bucket"))
      .filter(col("doc") =!= col("qdoc"))
      .select(col("qdoc"), col("doc")).distinct()
    val qtok = base.filter(col("doc") < 3)
      .select(col("doc").as("qdoc"), col("vec_id").as("qt"),
        col("v").as("qv"), col("n2").as("qn2"))
    base.join(broadcast(cand), Seq("doc"))
      .join(broadcast(qtok), Seq("qdoc"))
      .withColumn("dot",
        expr("aggregate(zip_with(v, qv, (x, y) -> x * y), 0.0d, (a, x) -> a + x)"))
      .withColumn("sim_e6",
        floor(col("dot") / sqrt(col("n2") * col("qn2")) * 1e6).cast("long"))
      .groupBy(col("qdoc"), col("qt"), col("doc"))
      .agg(max(col("sim_e6")).as("tok_max"))
      .groupBy(col("qdoc"), col("doc"))
      .agg(sum(col("tok_max")).as("maxsim_e6"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qdoc"))
          .orderBy(col("maxsim_e6").desc, col("doc"))))
      .filter(col("rank") <= 5)
      .select(col("qdoc"), col("rank").cast("int").as("rank"),
        col("doc").as("doc_id"), col("maxsim_e6"))
      .orderBy(col("qdoc"), col("rank"))
  }

  val q444Sql: String = {
    val t = TokensPerMsDoc
    s"""WITH planes AS (SELECT ${planesSqlLit} AS P),
       |base AS (
       |  SELECT vec_id, vec_id // $t AS doc, embedding::DOUBLE[] AS v,
       |    list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
       |      (a, b) -> a + b) AS n2
       |  FROM embeddings),
       |cls AS (
       |  SELECT doc,
       |    list_reduce(
       |      list_transform(range($numPlanes), i -> CASE WHEN
       |        list_reduce(list_transform(range(1, 65), d -> v[d] * P[i + 1][d]),
       |          (a, b) -> a + b) > 0.0
       |        THEN 1 ELSE 0 END),
       |      (acc, bit) -> acc * 2 + bit) AS bucket
       |  FROM base CROSS JOIN planes WHERE vec_id % $t = 0),
       |qb AS (
       |  SELECT qdoc, unnest(probes) AS bucket FROM (
       |    SELECT doc AS qdoc,
       |      list_transform(range(0, ${numPlanes + 1}),
       |        i -> CASE WHEN i = 0 THEN bucket
       |             ELSE xor(bucket, (1 << (i - 1))) END) AS probes
       |    FROM cls WHERE doc < 3)),
       |cand AS (
       |  SELECT DISTINCT qdoc, c.doc
       |  FROM cls c JOIN qb USING (bucket) WHERE c.doc <> qdoc),
       |qtok AS (
       |  SELECT doc AS qdoc, vec_id AS qt, v AS qv, n2 AS qn2
       |  FROM base WHERE doc < 3),
       |sims AS (
       |  SELECT cand.qdoc, qt, cand.doc,
       |    CAST(FLOOR(list_reduce(list_transform(range(1, 65),
       |        i -> b.v[i] * qv[i]), (x, y) -> x + y)
       |      / sqrt(b.n2 * qn2) * 1e6) AS BIGINT) AS sim_e6
       |  FROM base b
       |  JOIN cand ON b.doc = cand.doc
       |  JOIN qtok ON qtok.qdoc = cand.qdoc),
       |tok AS (
       |  SELECT qdoc, qt, doc, MAX(sim_e6) AS tok_max
       |  FROM sims GROUP BY 1, 2, 3),
       |score AS (
       |  SELECT qdoc, doc, SUM(tok_max) AS maxsim_e6
       |  FROM tok GROUP BY 1, 2),
       |r AS (
       |  SELECT qdoc, doc, maxsim_e6,
       |    ROW_NUMBER() OVER (PARTITION BY qdoc
       |      ORDER BY maxsim_e6 DESC, doc) AS rank
       |  FROM score)
       |SELECT qdoc, CAST(rank AS INT) AS rank, doc AS doc_id,
       |  CAST(maxsim_e6 AS BIGINT) AS maxsim_e6
       |FROM r WHERE rank <= 5 ORDER BY qdoc, rank""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q446 — POOLING AUDIT: single-vector CLS retrieval vs multi-vector
  // MaxSim (round 12). Bi-encoder systems collapse a document to ONE
  // vector and hope the ranking survives; this measures the hope: per
  // query doc, the top-5 overlap and top-1 agreement between (a) cosine
  // ranking over CLS (first-token) vectors and (b) exact MaxSim — the
  // audit that decides whether the 8× cheaper single-vector index is
  // good enough for THIS corpus before anyone builds it.
  //
  // Scale shape: both rankings are one corpus-linear pass against the
  // bounded broadcast query side + a per-query top-k window; the audit
  // join is 15 rows × 15 rows. Integer-collapsed sims throughout.
  def q446PoolingAudit(spark: SparkSession, dir: String): DataFrame = {
    val t = TokensPerMsDoc
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), vd.as("v"))
      .withColumn("doc", expr(s"vec_id div $t"))
      .withColumn("n2", expr("aggregate(v, 0.0d, (a, x) -> a + x * x)"))
      .localCheckpoint(false) // feeds both rankings' corpus and query sides
    val dot = expr("aggregate(zip_with(v, qv, (x, y) -> x * y), 0.0d, (a, x) -> a + x)")
    val qtok = base.filter(col("doc") < 3)
      .select(col("doc").as("qdoc"), col("vec_id").as("qt"),
        col("v").as("qv"), col("n2").as("qn2"))
    val wQ = Window.partitionBy(col("qdoc"))
      .orderBy(col("score").desc, col("doc"))
    val mTop = base.crossJoin(broadcast(qtok))
      .filter(col("doc") =!= col("qdoc"))
      .withColumn("sim_e6", floor(dot / sqrt(col("n2") * col("qn2")) * 1e6).cast("long"))
      .groupBy(col("qdoc"), col("qt"), col("doc"))
      .agg(max(col("sim_e6")).as("tok_max"))
      .groupBy(col("qdoc"), col("doc"))
      .agg(sum(col("tok_max")).as("score"))
      .withColumn("rank", row_number().over(wQ))
      .filter(col("rank") <= 5)
    val cls = base.filter(expr(s"vec_id % $t = 0"))
    val qcls = cls.select(col("doc").as("qdoc"), col("v").as("qv"), col("n2").as("qn2"))
      .filter(col("qdoc") < 3)
    val cTop = cls.crossJoin(broadcast(qcls))
      .filter(col("doc") =!= col("qdoc"))
      .withColumn("score", floor(dot / sqrt(col("n2") * col("qn2")) * 1e6).cast("long"))
      .withColumn("rank", row_number().over(wQ))
      .filter(col("rank") <= 5)
      .select(col("qdoc"), col("doc"), col("rank"))
    val overlap = mTop.select(col("qdoc"), col("doc"))
      .join(cTop.select(col("qdoc"), col("doc")), Seq("qdoc", "doc"))
      .groupBy(col("qdoc")).agg(count(lit(1)).as("overlap_at5"))
    val m1 = mTop.filter(col("rank") === 1).select(col("qdoc"), col("doc").as("m_top1"))
    val c1 = cTop.filter(col("rank") === 1).select(col("qdoc"), col("doc").as("c_top1"))
    m1.join(c1, Seq("qdoc"))
      .join(overlap, Seq("qdoc"), "left")
      .select(col("qdoc"),
        coalesce(col("overlap_at5"), lit(0L)).as("overlap_at5"),
        col("m_top1"), col("c_top1"),
        (col("m_top1") === col("c_top1")).as("top1_agree"))
      .orderBy(col("qdoc"))
  }

  val q446Sql: String = {
    val t = TokensPerMsDoc
    s"""WITH base AS (
       |  SELECT vec_id, vec_id // $t AS doc, embedding::DOUBLE[] AS v,
       |    list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
       |      (a, b) -> a + b) AS n2
       |  FROM embeddings),
       |qtok AS (
       |  SELECT doc AS qdoc, vec_id AS qt, v AS qv, n2 AS qn2
       |  FROM base WHERE doc < 3),
       |msims AS (
       |  SELECT qdoc, qt, doc,
       |    CAST(FLOOR(list_reduce(list_transform(range(1, 65),
       |        i -> v[i] * qv[i]), (a, b) -> a + b)
       |      / sqrt(n2 * qn2) * 1e6) AS BIGINT) AS sim_e6
       |  FROM base CROSS JOIN qtok WHERE doc <> qdoc),
       |mtop AS (
       |  SELECT qdoc, doc, rank FROM (
       |    SELECT qdoc, doc, score,
       |      ROW_NUMBER() OVER (PARTITION BY qdoc ORDER BY score DESC, doc) AS rank
       |    FROM (SELECT qdoc, doc, SUM(tok_max) AS score FROM (
       |            SELECT qdoc, qt, doc, MAX(sim_e6) AS tok_max
       |            FROM msims GROUP BY 1, 2, 3)
       |          GROUP BY 1, 2))
       |  WHERE rank <= 5),
       |cls AS (SELECT doc, v, n2 FROM base WHERE vec_id % $t = 0),
       |qcls AS (SELECT doc AS qdoc, v AS qv, n2 AS qn2 FROM cls WHERE doc < 3),
       |ctop AS (
       |  SELECT qdoc, doc, rank FROM (
       |    SELECT qdoc, doc,
       |      ROW_NUMBER() OVER (PARTITION BY qdoc ORDER BY score DESC, doc) AS rank
       |    FROM (
       |      SELECT qdoc, doc,
       |        CAST(FLOOR(list_reduce(list_transform(range(1, 65),
       |            i -> v[i] * qv[i]), (a, b) -> a + b)
       |          / sqrt(n2 * qn2) * 1e6) AS BIGINT) AS score
       |      FROM cls CROSS JOIN qcls WHERE doc <> qdoc))
       |  WHERE rank <= 5),
       |ov AS (
       |  SELECT m.qdoc, COUNT(*) AS overlap_at5
       |  FROM mtop m JOIN ctop c ON m.qdoc = c.qdoc AND m.doc = c.doc
       |  GROUP BY 1)
       |SELECT m1.qdoc, CAST(COALESCE(overlap_at5, 0) AS BIGINT) AS overlap_at5,
       |  m1.doc AS m_top1, c1.doc AS c_top1,
       |  m1.doc = c1.doc AS top1_agree
       |FROM (SELECT qdoc, doc FROM mtop WHERE rank = 1) m1
       |JOIN (SELECT qdoc, doc FROM ctop WHERE rank = 1) c1 USING (qdoc)
       |LEFT JOIN ov ON ov.qdoc = m1.qdoc
       |ORDER BY m1.qdoc""".stripMargin
  }

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q40_cosine_topk", q40CosineTopk _, Some(q40Sql)),
    ("q443_maxsim_retrieval", q443MaxsimRetrieval _, Some(q443Sql)),
    ("q444_maxsim_ann_rerank", q444MaxsimAnnRerank _, Some(q444Sql)),
    ("q446_pooling_audit", q446PoolingAudit _, Some(q446Sql)),
    ("q248_silhouette", q248Silhouette _, Some(q248Sql)),
    ("q259_acquisition", q259Acquisition _, Some(q259Sql)),
    ("q263_embedding_drift", q263EmbeddingDrift _, Some(q263Sql)),
    ("q229_matryoshka_eval", q229MatryoshkaEval _, Some(q229Sql)),
    ("q212_embedding_outliers", q212EmbeddingOutliers _, Some(q212Sql)),
    ("q172_semantic_dedup", q172SemanticDedup _, Some(q172Sql)),
    ("q141_cov_matrix", q141CovMatrix _, Some(q141Sql)),
    // q49 (exact all-pairs BNLJ near-dup) is deliberately NOT cataloged:
    // it exists as the baseline twin the q104 LSH path is proven equal to
    // (VectorOpsSpec asserts q104 == q49 exactly; PlanSpec pins its BNLJ
    // shape) — an O(n²) plan has no place in the default query surface.
    ("q41_centroids", q41Centroids _, Some(q41Sql)),
    ("q42_ann_lsh", q42AnnLsh _, Some(q42Sql)),
    ("q43_centroid_agg", q43CentroidAgg _, Some(q43Sql)),
    ("q45_ann_ivf", q45AnnIvf _, Some(q45Sql)),
    ("q424_nprobe_curve", q424NprobeCurve _, Some(q424Sql)),
    // the realistic-threshold (0.9, 16×8) entry over the planted-twin
    // corpus; the oracle is the exact all-pairs SQL over the same corpus
    // (full recall by construction of the band params). The adversarial
    // 0.4/(64×4) stress setting lives in VectorOpsSpec only — its OUTPUT
    // is O(n²), so it has no place in the default query surface.
    ("q104_cosine_neardup_lsh", q104CosineNearDupLsh _, Some(q104Sql)),
    ("q452_incremental_vector_index", q452IncrementalVectorIndex _, Some(q452Sql)),
    ("q116_contrastive_pairs", q116ContrastivePairs _, Some(q116Sql)),
    ("q411_label_margin", q411LabelMargin _, Some(q411Sql)),
    // formerly Round8Ops
    ("q280_int8_quant", q280Int8Quant _, Some(q280Sql)))
}
