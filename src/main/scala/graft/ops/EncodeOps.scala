package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Feature-engineering / encoding operators for ML data prep: distributed
  * global indexing, target encoding, the hashing trick, an n-gram language
  * model, and graph triangle counting — [EXT] north-star surface (the
  * reference has nothing comparable).
  *
  * Hash portability rule for this file: Spark's hash()/xxhash64() have no
  * DuckDB twin, so every cross-engine hash goes through md5 hex (identical
  * by spec in both) — Spark `conv(substring(md5(w),1,8),16,10)`, DuckDB
  * `('0x' || substr(md5(w),1,8))::BIGINT` (proven equal by q138/q33).
  */
object EncodeOps {

  // --------------------------------------------------------------------------
  // q169 — distributed dense global row index: assign 0..n-1 by o_orderkey
  // order WITHOUT a global sort through one task. The naive
  // row_number().over(Window.orderBy(key)) funnels the whole table through
  // a single partition — exactly the plan class PlanLintSpec bans. The
  // scalable classic is two-pass:
  //   1. range-bucket the key (bucket = key div width, width from a
  //      broadcast max — 257 buckets in key order);
  //   2. per-bucket counts → exclusive prefix sum, a window over the
  //      BOUNDED bucket grid only (allowlisted);
  //   3. broadcast the offsets back; index = bucket offset + (rank within
  //      bucket), where the in-bucket rank is a PARTITIONED window.
  // Equivalence to the oracle's global row_number is exact because buckets
  // partition the keyspace in order. This is the batch version of
  // zipWithIndex that stays in the DataFrame/codegen world.
  def q169GlobalIndex(spark: SparkSession, dir: String): DataFrame = {
    val keys = Tables.orders(spark, dir).select(col("o_orderkey"))
    val mx = keys.agg(max(col("o_orderkey")).as("mx"))
    val bucketed = keys.crossJoin(broadcast(mx))
      .withColumn("bucket", expr("o_orderkey div (mx div 256 + 1)"))
      .drop("mx")
    val offsets = bucketed.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
      .withColumn("offset",
        coalesce(sum(col("cnt")).over(
          Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("offset"))
    bucketed.join(broadcast(offsets), Seq("bucket"))
      .select(col("o_orderkey"),
        (col("offset") + row_number().over(
          Window.partitionBy(col("bucket")).orderBy(col("o_orderkey"))) - 1).as("idx"))
      .orderBy(col("o_orderkey"))
  }

  val q169Sql: String =
    """SELECT o_orderkey,
      |  ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS idx
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // --------------------------------------------------------------------------
  // q170 — smoothed mean target encoding: replace a categorical with the
  // smoothed mean of a numeric target, enc = (Σ_seg y + m·prior)/(n_seg+m)
  // with prior = global mean and m = 20 pseudo-observations — the standard
  // leakage-resistant categorical encoder.
  //
  // Scale: one map-side-partial aggregate per segment + a broadcast 1-row
  // global aggregate; the encoder table (|categories| rows) then broadcasts
  // onto the training scan for free. Numerics: both means stay exact
  // rationals in cents — enc = (scents·gn + m·gcents)/(100·gn·(n+m)) — so
  // the ONLY float op is the final division (same expression both engines).
  def q170TargetEncoding(spark: SparkSession, dir: String): DataFrame = {
    val m = 20
    val cents = (sum(col("c_acctbal").cast(DecimalType(18, 2))) * 100).cast(DecimalType(38, 0))
    val c = Tables.customer(spark, dir)
    val glob = c.agg(cents.as("gcents"), count(lit(1)).as("gn"))
    c.groupBy(col("c_mktsegment"))
      .agg(cents.as("scents"), count(lit(1)).as("n_cust"))
      .crossJoin(broadcast(glob))
      .select(col("c_mktsegment"), col("n_cust"),
        Num.pround(col("gcents").cast("double") / (lit(100.0) * col("gn")), 2).as("prior"),
        Num.pround((col("scents") * col("gn") + lit(m) * col("gcents")).cast("double")
          / (lit(100.0) * col("gn") * (col("n_cust") + m)), 4).as("enc"))
      .orderBy(col("c_mktsegment"))
  }

  val q170Sql: String =
    """WITH g AS (
      |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS DECIMAL(38,0)) AS gcents,
      |         COUNT(*) AS gn
      |  FROM customer),
      |s AS (
      |  SELECT c_mktsegment,
      |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS DECIMAL(38,0)) AS scents,
      |    COUNT(*) AS n_cust
      |  FROM customer GROUP BY c_mktsegment)
      |SELECT c_mktsegment, n_cust,
      |  FLOOR((CAST(gcents AS DOUBLE) / (100e0 * gn)) * 1e2 + 0.5) / 1e2 AS prior,
      |  FLOOR((CAST(scents * gn + 20 * gcents AS DOUBLE)
      |        / (100e0 * gn * (n_cust + 20))) * 1e4 + 0.5) / 1e4 AS enc
      |FROM s, g ORDER BY c_mktsegment""".stripMargin

  // --------------------------------------------------------------------------
  // q171 — feature hashing (the hashing trick): project an unbounded token
  // vocabulary into 64 fixed buckets via a portable md5-derived hash, and
  // report per-bucket load + type collisions — the collision profile that
  // sizes a hashed feature space.
  //
  // Scale: one explode + one hash aggregate; bucket assignment is a
  // row-local projection (no vocabulary table, no join — the entire point
  // of the hashing trick at 100 TB: the encoder is stateless).
  private val bucketExpr =
    "cast(conv(substring(md5(w), 1, 8), 16, 10) as bigint) % 64"

  def q171FeatureHash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(TextOps.toks).as("w"))
      .select(col("w"), expr(bucketExpr).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_tok"), countDistinct(col("w")).as("n_types"))
      .orderBy(col("bucket"))

  val q171Sql: String =
    s"""WITH tok AS (
       |  SELECT unnest(t) AS w
       |  FROM (SELECT ${TextOps.toksSqlD} AS t FROM documents))
       |SELECT (('0x' || substr(md5(w), 1, 8))::BIGINT) % 64 AS bucket,
       |  COUNT(*) AS n_tok, COUNT(DISTINCT w) AS n_types
       |FROM tok GROUP BY 1 ORDER BY bucket""".stripMargin

  // --------------------------------------------------------------------------
  // q173 — bigram language model scoring: fit add-k-smoothed bigram
  // probabilities P(w2|w1) = (C(w1w2)+k)/(C(w1·)+k·V) on the corpus and
  // score each document by its mean bigram log-probability — the n-gram
  // upgrade of q97's unigram filter (repetitive low-quality text scores
  // high, incoherent token soup scores low).
  //
  // Scale: the q97/q87 one-lineage rule — bigram and left-context counts
  // are COUNT windows over the single exploded token stream (partitioned
  // by the bigram / by w1: no join-back, no second corpus scan); V rides a
  // broadcast 1-row aggregate. Shuffles: doc_id (lead window), w1
  // (counts), doc_id (final agg). avg-of-ln rounds at 4 (§8.4).
  def q173BigramLm(spark: SparkSession, dir: String): DataFrame = {
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bigrams = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(TextOps.toks))
      .toDF("doc_id", "pos", "w1")
      .withColumn("w2", lead(col("w1"), 1).over(byPos))
      .filter(col("w2").isNotNull)
    val v = bigrams.agg(countDistinct(col("w2")).as("v"))
    bigrams
      .withColumn("c2", count(lit(1)).over(Window.partitionBy(col("w1"), col("w2"))))
      .withColumn("c1", count(lit(1)).over(Window.partitionBy(col("w1"))))
      .crossJoin(broadcast(v))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        Num.pround(avg(log((col("c2") + 0.5) / (col("c1") + lit(0.5) * col("v")))), 4)
          .as("avg_logprob"))
      .orderBy(col("doc_id"))
  }

  val q173Sql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, i AS pos, t[i] AS w1, t[i+1] AS w2
       |  FROM (SELECT doc_id, ${TextOps.toksSqlD} AS t FROM documents),
       |       UNNEST(generate_series(1, len(t) - 1)) AS u(i)),
       |v AS (SELECT COUNT(DISTINCT w2) AS v FROM tok),
       |cnt AS (
       |  SELECT doc_id,
       |    COUNT(*) OVER (PARTITION BY w1, w2) AS c2,
       |    COUNT(*) OVER (PARTITION BY w1) AS c1
       |  FROM tok)
       |SELECT doc_id, COUNT(*) AS n_bigrams,
       |  FLOOR((AVG(LN((c2 + 0.5e0) / (c1 + 0.5e0 * v)))) * 1e4 + 0.5) / 1e4 AS avg_logprob
       |FROM cnt, v GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------------
  // q174 — triangle counting on the token co-occurrence graph: nodes are
  // the top-100-df tokens, edges are pairs co-occurring in ≥ 40 documents,
  // triangles counted once via the ordered-orientation three-way self-join
  // (a<b, b<c, a<c) — the clustering-structure primitive.
  //
  // Scale: the vocabulary is a TakeOrderedAndProject top-K (q107 pattern)
  // broadcast into the per-doc pair fan-out, so pair generation is bounded
  // by K²/2 per doc, not corpus vocabulary; the triangle join runs on the
  // EDGE table (≤ K²/2 rows total — corpus-size-independent). On a general
  // graph the same plan applies after degree-ordering the edges (orient
  // low→high degree), which bounds the per-node fan-out.
  def q174Triangles(spark: SparkSession, dir: String): DataFrame = {
    val dt = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(array_distinct(TextOps.toks)).as("w"))
    val vocab = dt.groupBy(col("w")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("w")).limit(100).select(col("w"))
    val vt = dt.join(broadcast(vocab), Seq("w"))
    val edges = vt.as("a").join(vt.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.w") < col("b.w"))
      .groupBy(col("a.w").as("s"), col("b.w").as("t"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= 40)
      .select(col("s"), col("t"))
    val tri = edges.as("e1")
      .join(edges.as("e2"), col("e1.t") === col("e2.s"))
      .join(edges.as("e3"),
        col("e3.s") === col("e1.s") && col("e3.t") === col("e2.t"))
    val nodes = edges.select(col("s").as("w")).union(edges.select(col("t").as("w")))
      .distinct().agg(count(lit(1)).as("n_nodes"))
    val counts = edges.agg(count(lit(1)).as("n_edges"))
      .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
    nodes.crossJoin(counts).select(col("n_nodes"), col("n_edges"), col("n_triangles"))
  }

  val q174Sql: String =
    s"""WITH dt AS (
       |  SELECT doc_id, unnest(t) AS w
       |  FROM (SELECT doc_id, list_distinct(${TextOps.toksSqlD}) AS t FROM documents)),
       |vocab AS (
       |  SELECT w FROM (
       |    SELECT w, COUNT(*) AS df FROM dt GROUP BY w
       |    ORDER BY df DESC, w LIMIT 100)),
       |vt AS (SELECT dt.doc_id, dt.w FROM dt JOIN vocab USING (w)),
       |edges AS (
       |  SELECT a.w AS s, b.w AS t
       |  FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.w < b.w
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 40),
       |tri AS (
       |  SELECT COUNT(*) AS n_triangles
       |  FROM edges e1 JOIN edges e2 ON e1.t = e2.s
       |       JOIN edges e3 ON e3.s = e1.s AND e3.t = e2.t),
       |nn AS (SELECT COUNT(*) AS n_nodes FROM
       |       (SELECT s AS w FROM edges UNION SELECT t FROM edges)),
       |ne AS (SELECT COUNT(*) AS n_edges FROM edges)
       |SELECT n_nodes, n_edges, n_triangles FROM nn, ne, tri""".stripMargin

  // --------------------------------------------------------------------------
  // q186 — WEIGHT-OF-EVIDENCE encoding: per category, ln of the smoothed
  // odds ratio ln((pos_s+0.5)/(pos+1) ÷ (neg_s+0.5)/(neg+1)) against a
  // binary label (account in credit) — the scorecard-modeling categorical
  // encoder that complements q170's mean target encoding (WOE is for
  // binary targets and is monotone in the category's event rate).
  //
  // Scale: one conditional-count groupBy per category + a broadcast 1-row
  // label-total aggregate; exact long counts everywhere, the ln is the
  // only float op and its argument is an integer-ratio double.
  def q186WoeEncoding(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_mktsegment"), (col("c_acctbal") > 0).as("pos"))
    val tot = c.agg(count_if(col("pos")).as("p_tot"),
      count_if(!col("pos")).as("n_tot"))
    c.groupBy(col("c_mktsegment"))
      .agg(count_if(col("pos")).as("p_s"), count_if(!col("pos")).as("n_s"))
      .crossJoin(broadcast(tot))
      .select(col("c_mktsegment"), col("p_s"), col("n_s"),
        Num.pround(log(((col("p_s") + 0.5) / (col("p_tot") + 1)) /
          ((col("n_s") + 0.5) / (col("n_tot") + 1))), 4).as("woe"))
      .orderBy(col("c_mktsegment"))
  }

  val q186Sql: String =
    """WITH t AS (
      |  SELECT COUNT(*) FILTER (c_acctbal > 0) AS p_tot,
      |         COUNT(*) FILTER (c_acctbal <= 0) AS n_tot
      |  FROM customer)
      |SELECT c_mktsegment,
      |  COUNT(*) FILTER (c_acctbal > 0) AS p_s,
      |  COUNT(*) FILTER (c_acctbal <= 0) AS n_s,
      |  FLOOR((LN(((COUNT(*) FILTER (c_acctbal > 0) + 0.5e0) / (p_tot + 1)) /
      |           ((COUNT(*) FILTER (c_acctbal <= 0) + 0.5e0) / (n_tot + 1)))) * 1e4 + 0.5) / 1e4 AS woe
      |FROM customer, t GROUP BY c_mktsegment, p_tot, n_tot
      |ORDER BY c_mktsegment""".stripMargin

  // --------------------------------------------------------------------------
  // q187 — Johnson-Lindenstrauss RANDOM PROJECTION: project the 64-d
  // embeddings to 16-d with a deterministic Rademacher (±1/√16) matrix
  // derived from md5(i || '_' || j) parity — the dimensionality-reduction
  // front door for cheaper ANN / clustering passes. The matrix is
  // engine-portable by construction (md5 is specified identically), so
  // the oracle re-derives the SAME projection.
  //
  // Scale: the 1024-entry matrix is built ONCE as a 1-row aggregate and
  // broadcast; projection is a row-local fixed-order fold (left fold over
  // the input index — bit-identical in both engines: no shuffled sum
  // order), arrays stay packed. At 100 TB this is a map-only pass.
  private val jlMatSql: String =
    "transform(flatten(transform(sequence(0, 63), i -> transform(sequence(0, 15)," +
      " j -> concat(cast(i as string), '_', cast(j as string))))), " +
      "s -> case when cast(conv(substring(md5(s), 1, 2), 16, 10) as int) % 2 = 0" +
      " then 0.25d else -0.25d end)"

  def q187JlProjection(spark: SparkSession, dir: String): DataFrame = {
    val mat = Tables.embeddings(spark, dir).limit(1)
      .select(expr(jlMatSql).as("m"))
    val projected = Tables.embeddings(spark, dir)
      .crossJoin(broadcast(mat))
      .select(col("vec_id"), expr(
        """transform(sequence(0, 15), j -> floor(aggregate(sequence(0, 63), 0d,
          |  (acc, i) -> acc + cast(element_at(embedding, i + 1) as double)
          |              * element_at(m, i * 16 + j + 1)) * 1e6 + 0.5) / 1e6)""".stripMargin).as("proj"))
    // flatten to scalar columns: array-typed result cells break hash/sort
    // tooling downstream (pandas can't lexsort ndarray cells), and scalar
    // doubles are the layout a projection sink would write anyway
    projected
      .select(col("vec_id") +: (0 until 16).map(j =>
        element_at(col("proj"), j + 1).as(s"p$j")): _*)
      .orderBy(col("vec_id"))
  }

  val q187Sql: String = {
    val cols = (0 until 16)
      .map(j => s"FLOOR((list_reduce(list_transform(range(0, 64), i -> " +
        s"embedding[i + 1]::DOUBLE * m[i * 16 + $j + 1]), (a, b) -> a + b)) * 1e6 + 0.5) / 1e6 AS p$j")
      .mkString(",\n      |  ")
    s"""WITH m AS (
      |  SELECT list_transform(flatten(list_transform(range(0, 64), i ->
      |    list_transform(range(0, 16), j -> i::VARCHAR || '_' || j::VARCHAR))),
      |    s -> CASE WHEN ('0x' || substr(md5(s), 1, 2))::BIGINT % 2 = 0
      |              THEN 0.25 ELSE -0.25 END) AS m)
      |SELECT vec_id,
      |  $cols
      |FROM embeddings, m ORDER BY vec_id""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q195 — ORDER-PRESERVING dense dictionary encoding: map the corpus
  // vocabulary to ids 0..|V|-1 such that w1 < w2 ⇔ id1 < id2 — the
  // encoding that keeps range predicates (`w BETWEEN 'a' AND 'b'`) and
  // sort order valid on the ENCODED column, which frequency-ranked vocabs
  // (q107) destroy. The naive plan is row_number() over a global ORDER BY
  // w — one task for the whole vocabulary, the banned plan class. This is
  // q169's two-pass shape transplanted to a STRING domain:
  //   1. bucket = first character of the token — buckets partition the
  //      vocabulary INTO CONTIGUOUS LEXICOGRAPHIC RANGES (every token
  //      sharing a leading char is adjacent in sorted order), so
  //      per-bucket dense ranks + bucket offsets compose to the exact
  //      global rank;
  //   2. exclusive prefix sum of bucket sizes over the bucket grid —
  //      bounded by the leading-character alphabet, not the vocabulary
  //      (allowlisted in PlanLintSpec);
  //   3. id = offset + rank-within-bucket (PARTITIONED window).
  // The dictionary itself is the output — Heaps'-law-small relative to the
  // corpus (the synthetic corpus vocabulary is ~31 words at every SF, so
  // the domain is widened with the part-name color words to spread the
  // bucket grid across the alphabet). EncodeMoreSpec checks the complete
  // dictionary against a JVM-side sort on a planted multi-bucket
  // vocabulary.
  /** Order-preserving dense ids for the distinct values of `w` in `words`,
    * with no global single-partition sort. Returns (w, id), id 0-based.
    */
  def sortedDictionary(words: DataFrame): DataFrame = {
    val bucketed = words.select(col("w")).distinct()
      .withColumn("bucket", substring(col("w"), 1, 1))
    val offsets = bucketed.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
      .withColumn("offset",
        coalesce(sum(col("cnt")).over(
          Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("offset"))
    bucketed.join(broadcast(offsets), Seq("bucket"))
      .select(col("w"),
        (col("offset") + row_number().over(
          Window.partitionBy(col("bucket")).orderBy(col("w"))) - 1).as("id"))
  }

  def q195SortedDict(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(spark, dir)
      .select(explode(TextOps.toks).as("w"))
      .unionByName(Tables.part(spark, dir)
        .select(explode(split(lower(col("p_name")), " ")).as("w"))
        .filter(col("w") =!= ""))
    sortedDictionary(words).orderBy(col("w"))
  }

  val q195Sql: String =
    s"""WITH v AS (
       |  SELECT DISTINCT w FROM (
       |    SELECT unnest(t) AS w
       |    FROM (SELECT ${TextOps.toksSqlD} AS t FROM documents)
       |    UNION
       |    SELECT unnest(list_filter(string_split(lower(p_name), ' '), t -> t != '')) AS w
       |    FROM part))
       |SELECT w, ROW_NUMBER() OVER (ORDER BY w) - 1 AS id FROM v ORDER BY w""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q169_global_index", q169GlobalIndex _, Some(q169Sql)),
    ("q195_sorted_dict", q195SortedDict _, Some(q195Sql)),
    ("q186_woe_encoding", q186WoeEncoding _, Some(q186Sql)),
    ("q187_jl_projection", q187JlProjection _, Some(q187Sql)),
    ("q170_target_encoding", q170TargetEncoding _, Some(q170Sql)),
    ("q171_feature_hash", q171FeatureHash _, Some(q171Sql)),
    ("q173_bigram_lm", q173BigramLm _, Some(q173Sql)),
    ("q174_triangles", q174Triangles _, Some(q174Sql)))
}
