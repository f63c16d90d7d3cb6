package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-pipeline operators — [EXT] north-star surface: product
  * quantization (the memory-compression backbone of billion-vector ANN),
  * reciprocal-rank fusion of heterogeneous retrieval rankings, and
  * overlap-chunking with provenance spans (RAG ingestion).
  */
object RagOps {

  // --------------------------------------------------------------------------
  // q205 — PRODUCT QUANTIZATION (Jégou et al.): split the 64-d embedding
  // into 4 subspaces of 16 dims, learn a 4-codeword codebook per subspace
  // (init = first K vectors by vec_id, one Lloyd L2 update — q110's
  // deterministic k-means recipe per subspace), then encode every vector
  // as 4 small codes + its reconstruction error. PQ is how a 100 TB vector
  // corpus fits RAM: 64 floats → 4 bytes, with ADC distance computed
  // against the tiny codebook.
  //
  // Determinism: assignment argmin tie-breaks on code (min(struct(d2,
  // code))); the L2 fold runs in fixed dimension order; centroid updates
  // use the scaled-long exact mean (order-free integer sums); the final
  // error is a fixed-order 4-term sum. Bit-identical cross-engine.
  //
  // Scale: codebooks are S×K rows — always broadcast; assignment/encode
  // are linear passes; the update shuffles on (subspace, code, dim) with
  // map-side partial sums. The one-row-per-(vec, subspace) fan-out is ×4,
  // not ×dims.
  /** (vec_id, s, sv): every vector split into 4 16-dim subvectors. */
  private[ops] def pqSub(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .select(col("vec_id"), explode(expr(
        "transform(sequence(0, 3), s -> named_struct('s', s, 'sv', slice(v, s * 16 + 1, 16)))")).as("e"))
      .select(col("vec_id"), col("e.s").as("s"), col("e.sv").as("sv"))

  private val d2Sub = "aggregate(zip_with(sv, cv, (a, b) -> (a - b) * (a - b)), " +
    "cast(0 as double), (acc, x) -> acc + x)"

  /** Nearest-codeword assignment per (vector, subspace); tie-break on code. */
  private[ops] def pqAssign(sub: DataFrame, cb: DataFrame): DataFrame =
    sub.join(broadcast(cb), Seq("s"))
      .withColumn("d2", expr(d2Sub))
      .groupBy(col("vec_id"), col("s"))
      .agg(min(struct(col("d2"), col("code"))).as("best"), first(col("sv")).as("sv"))
      .select(col("vec_id"), col("s"), col("best.code").as("code"),
        col("best.d2").as("d2"), col("sv"))

  /** Deterministic PQ codebook: init = first K subvectors by vec_id, one
    * scaled-long Lloyd update, checkpointed (q110 lineage lesson).
    */
  private[ops] def pqCodebook(sub: DataFrame): DataFrame = {
    val init = sub.filter(col("vec_id") < 4)
      .select(col("s"), col("vec_id").cast("int").as("code"), col("sv").as("cv"))
    pqAssign(sub, init)
      .select(col("s"), col("code"), posexplode(col("sv")))
      .withColumn("vq", expr("cast(floor(col * 1e12 + 0.5d) as long)"))
      .groupBy(col("s"), col("code"), col("pos"))
      .agg((sum(col("vq")).cast("double") / 1e12 / count(lit(1))).as("c"))
      .groupBy(col("s"), col("code"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("s"), col("code"), expr("transform(pc, x -> x.c)").as("cv"))
      .localCheckpoint()
  }

  def q205PqEncode(spark: SparkSession, dir: String): DataFrame = {
    val sub = pqSub(spark, dir)
    pqAssign(sub, pqCodebook(sub))
      .groupBy(col("vec_id"))
      .agg(
        max(when(col("s") === 0, col("code"))).as("c0"),
        max(when(col("s") === 1, col("code"))).as("c1"),
        max(when(col("s") === 2, col("code"))).as("c2"),
        max(when(col("s") === 3, col("code"))).as("c3"),
        max(when(col("s") === 0, col("d2"))).as("e0"),
        max(when(col("s") === 1, col("d2"))).as("e1"),
        max(when(col("s") === 2, col("d2"))).as("e2"),
        max(when(col("s") === 3, col("d2"))).as("e3"))
      .select(col("vec_id"), col("c0"), col("c1"), col("c2"), col("c3"),
        Num.pround(col("e0") + col("e1") + col("e2") + col("e3"), 6).as("rec_err"))
      .orderBy(col("vec_id"))
  }

  /** The shipped PQ fit replayed in DuckDB: per subspace, init from the
    * first K subvectors, one scaled-long Lloyd update, encode with
    * (d2 ASC, code ASC) tie-break — mirrors min(struct(d2, code)).
    */
  private val pqD2Sql = "list_reduce(list_transform(range(1, 17), " +
    "d -> (sv[d] - cv[d]) * (sv[d] - cv[d])), (x, y) -> x + y)"

  /** Shared PQ CTE chain: subvectors → init codebook → one Lloyd update →
    * per-(vector, subspace) codes. Reused by q205 and q213.
    */
  private val pqSqlCtes: String =
    s"""sub AS (
       |  SELECT vec_id, s,
       |    list_transform(embedding[s * 16 + 1 : s * 16 + 16], x -> x::DOUBLE) AS sv
       |  FROM embeddings, UNNEST(range(4)) AS g(s)),
       |init AS (
       |  SELECT s, CAST(vec_id AS INT) AS code, sv AS cv FROM sub WHERE vec_id < 4),
       |a0 AS (
       |  SELECT vec_id, s, code, sv FROM (
       |    SELECT b.vec_id, b.s, c.code, b.sv,
       |      ROW_NUMBER() OVER (PARTITION BY b.vec_id, b.s
       |        ORDER BY $pqD2Sql ASC, c.code ASC) AS rn
       |    FROM sub b JOIN init c USING (s)) WHERE rn = 1),
       |cb AS (
       |  SELECT s, code, list(c ORDER BY dim) AS cv FROM (
       |    SELECT s, code, dim, CAST(SUM(vq) AS DOUBLE) / 1e12 / COUNT(*) AS c FROM (
       |      SELECT s, code, generate_subscripts(sv, 1) AS dim,
       |        CAST(FLOOR(unnest(sv) * 1e12 + 0.5) AS BIGINT) AS vq
       |      FROM a0)
       |    GROUP BY s, code, dim)
       |  GROUP BY s, code),
       |enc AS (
       |  SELECT vec_id, s, code, d2 FROM (
       |    SELECT b.vec_id, b.s, c.code, $pqD2Sql AS d2,
       |      ROW_NUMBER() OVER (PARTITION BY b.vec_id, b.s
       |        ORDER BY $pqD2Sql ASC, c.code ASC) AS rn
       |    FROM sub b JOIN cb c USING (s)) WHERE rn = 1)""".stripMargin

  val q205Sql: String = {
    s"""WITH $pqSqlCtes
       |SELECT vec_id,
       |  MAX(CASE WHEN s=0 THEN code END) AS c0, MAX(CASE WHEN s=1 THEN code END) AS c1,
       |  MAX(CASE WHEN s=2 THEN code END) AS c2, MAX(CASE WHEN s=3 THEN code END) AS c3,
       |  FLOOR((MAX(CASE WHEN s=0 THEN d2 END) + MAX(CASE WHEN s=1 THEN d2 END)
       |      + MAX(CASE WHEN s=2 THEN d2 END) + MAX(CASE WHEN s=3 THEN d2 END)) * 1e6 + 0.5) / 1e6
       |    AS rec_err
       |FROM enc GROUP BY vec_id ORDER BY vec_id""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q213 — IVF-PQ ANN SEARCH: the full billion-vector serving stack in one
  // plan — a coarse quantizer (8 IVF lists = seed centroids, nprobe=2)
  // prunes the corpus to two lists per query, then candidates are scored
  // by ASYMMETRIC DISTANCE (ADC): the query's exact subvectors against
  // each candidate's 4 PQ codes via a (query × subspace × codeword)
  // lookup table — candidates' raw vectors are NEVER touched, which is
  // the point: at scale the index is codes (4 bytes/vector) + two tiny
  // broadcast tables (coarse centroids, ADC LUT).
  //
  // Determinism: every distance is a fixed-order fold; coarse/probe/final
  // ranks tie-break on id; the 4-term ADC sum is assembled by fixed-order
  // pivot addition (never an unordered SUM over doubles).
  //
  // Scale: coarse assignment + probe are broadcast passes; the candidate
  // set is an equi-join on the list id; ADC scoring is an equi-join
  // against the 48-row broadcast LUT. No shuffle touches full vectors
  // after the one-time coarse pass.
  def q213IvfPqSearch(spark: SparkSession, dir: String): DataFrame = {
    val full = Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val seeds = full.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cid"), col("v").as("cv"))
    val d2Full = "aggregate(zip_with(%s, cv, (a, b) -> (a - b) * (a - b)), " +
      "cast(0 as double), (acc, x) -> acc + x)"
    val coarse = full.crossJoin(broadcast(seeds))
      .withColumn("d2", expr(d2Full.format("v")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cid"))).as("best"))
      .select(col("vec_id"), col("best.cid").as("list"))
    val sub = pqSub(spark, dir)
    val cb = pqCodebook(sub)
    val codes = pqAssign(sub, cb).select(col("vec_id"), col("s"), col("code"))
    val queries = full.filter(col("vec_id").between(100, 102))
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val probe = queries.crossJoin(broadcast(seeds))
      .withColumn("d2", expr(d2Full.format("qv")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("d2"), col("cid"))))
      .filter(col("rn") <= 2).select(col("qid"), col("cid").as("list"))
    val qsub = queries.select(col("qid"), explode(expr(
      "transform(sequence(0, 3), s -> named_struct('s', s, 'sv', slice(qv, s * 16 + 1, 16)))")).as("e"))
      .select(col("qid"), col("e.s").as("s"), col("e.sv").as("sv"))
    val adc = qsub.join(broadcast(cb), Seq("s"))
      .withColumn("d2", expr(d2Sub))
      .select(col("qid"), col("s"), col("code"), col("d2"))
    val cands = coarse.join(broadcast(probe), Seq("list"))
      .select(col("qid"), col("vec_id"))
    cands.join(codes, Seq("vec_id"))
      .join(broadcast(adc), Seq("qid", "s", "code"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(max(when(col("s") === 0, col("d2"))).as("a0"),
        max(when(col("s") === 1, col("d2"))).as("a1"),
        max(when(col("s") === 2, col("d2"))).as("a2"),
        max(when(col("s") === 3, col("d2"))).as("a3"))
      .withColumn("adc", col("a0") + col("a1") + col("a2") + col("a3"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("adc"), col("vec_id"))))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("rank"), col("vec_id"), Num.pround(col("adc"), 6).as("adc_dist"))
      .orderBy(col("qid"), col("rank"))
  }

  val q213Sql: String = {
    def d2Full(a: String, b: String) =
      s"list_reduce(list_transform(range(1, 65), i -> ($a[i] - $b[i]) * ($a[i] - $b[i])), (x, y) -> x + y)"
    s"""WITH $pqSqlCtes,
       |base AS (
       |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       |seeds AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM base WHERE vec_id < 8),
       |coarse AS (
       |  SELECT vec_id, cid AS list FROM (
       |    SELECT b.vec_id, s.cid,
       |      ROW_NUMBER() OVER (PARTITION BY b.vec_id
       |        ORDER BY ${d2Full("b.v", "s.cv")} ASC, s.cid ASC) AS rn
       |    FROM base b CROSS JOIN seeds s) WHERE rn = 1),
       |queries AS (SELECT vec_id AS qid, v AS qv FROM base WHERE vec_id BETWEEN 100 AND 102),
       |probe AS (
       |  SELECT qid, cid AS list FROM (
       |    SELECT q.qid, s.cid,
       |      ROW_NUMBER() OVER (PARTITION BY q.qid
       |        ORDER BY ${d2Full("q.qv", "s.cv")} ASC, s.cid ASC) AS rn
       |    FROM queries q CROSS JOIN seeds s) WHERE rn <= 2),
       |qsub AS (
       |  SELECT qid, s, qv[s * 16 + 1 : s * 16 + 16] AS sv
       |  FROM queries, UNNEST(range(4)) AS g(s)),
       |adc AS (
       |  SELECT qid, c.s, c.code, $pqD2Sql AS d2
       |  FROM qsub JOIN cb c USING (s)),
       |cands AS (SELECT p.qid, c.vec_id FROM coarse c JOIN probe p USING (list)),
       |scored AS (
       |  SELECT qid, vec_id,
       |    MAX(CASE WHEN s=0 THEN d2 END) + MAX(CASE WHEN s=1 THEN d2 END)
       |      + MAX(CASE WHEN s=2 THEN d2 END) + MAX(CASE WHEN s=3 THEN d2 END) AS adc
       |  FROM (
       |    SELECT ca.qid, ca.vec_id, e.s, a.d2
       |    FROM cands ca JOIN enc e ON ca.vec_id = e.vec_id
       |    JOIN adc a ON a.qid = ca.qid AND a.s = e.s AND a.code = e.code)
       |  GROUP BY qid, vec_id)
       |SELECT qid, CAST(rank AS INT) AS rank, vec_id, FLOOR((adc) * 1e6 + 0.5) / 1e6 AS adc_dist FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc ASC, vec_id ASC) AS rank
       |  FROM scored)
       |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q208 — RECIPROCAL-RANK FUSION (Cormack et al.): fuse two retrieval
  // rankings — BM25 and TF-IDF — into one list per query term via
  // RRF(d) = Σ 1/(60 + rank_i(d)), the standard hybrid-search merge that
  // needs no score calibration between retrievers.
  //
  // Determinism: both ranks are integer row_numbers with (score DESC,
  // doc_id) total-order tie-breaks; the fused score is a fixed two-term
  // sum of exact-integer-denominator divisions.
  //
  // Scale: query terms are a top-K broadcast (TakeOrderedAndProject);
  // scoring is one pass over the posting lists (term-partitioned); the
  // rank windows partition BY TERM; corpus stats (N, avgdl) ride broadcast
  // 1-row aggregates.
  def q208RrfFusion(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.toks.as("toks"))
      .withColumn("dl", size(col("toks")))
    // avgdl = exact long sum / count (engine AVG accumulators differ)
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val posting = docs.select(col("doc_id"), col("dl"), explode(col("toks")).as("w"))
      .groupBy(col("w"), col("doc_id"), col("dl")).agg(count(lit(1)).as("tf"))
    val df = posting.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val queries = df.orderBy(col("df").desc, col("w")).limit(3)
      .select(col("w"), col("df"))
    val scored = posting.join(broadcast(queries), Seq("w"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf", log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("bm25", col("idf") * (col("tf") * 2.2)
        / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .withColumn("tfidf", col("tf") * log(col("n_docs") / col("df")))
    val byTerm = Window.partitionBy(col("w"))
    val ranked = scored
      .withColumn("r_bm25", row_number().over(byTerm.orderBy(col("bm25").desc, col("doc_id"))))
      .withColumn("r_tfidf", row_number().over(byTerm.orderBy(col("tfidf").desc, col("doc_id"))))
      .withColumn("rrf", Num.pround(lit(1.0) / (col("r_bm25") + 60) + lit(1.0) / (col("r_tfidf") + 60), 6))
      .withColumn("r_fused", row_number().over(byTerm.orderBy(col("rrf").desc, col("doc_id"))))
    ranked.filter(col("r_fused") <= 5)
      .select(col("w").as("term"), col("r_fused"), col("doc_id"),
        col("r_bm25"), col("r_tfidf"), col("rrf"))
      .orderBy(col("term"), col("r_fused"))
  }

  val q208Sql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, ${TextOps.toksSqlD} AS toks FROM documents),
       |stats AS (
       |  SELECT COUNT(*)::DOUBLE AS n_docs,
       |    CAST(SUM(len(toks)) AS DOUBLE) / COUNT(*) AS avgdl FROM docs),
       |posting AS (
       |  SELECT w, doc_id, dl, COUNT(*) AS tf FROM (
       |    SELECT doc_id, len(toks) AS dl, unnest(toks) AS w FROM docs)
       |  GROUP BY 1, 2, 3),
       |dfreq AS (SELECT w, COUNT(*) AS df FROM posting GROUP BY w),
       |queries AS (SELECT w, df FROM dfreq ORDER BY df DESC, w LIMIT 3),
       |scored AS (
       |  SELECT p.w, p.doc_id,
       |    ln((n_docs - q.df + 0.5) / (q.df + 0.5) + 1.0)
       |      * (p.tf::DOUBLE * 2.2::DOUBLE)
       |      / (p.tf + 1.2::DOUBLE * (0.25 + 0.75::DOUBLE * p.dl / avgdl)) AS bm25,
       |    p.tf * ln(n_docs / q.df) AS tfidf
       |  FROM posting p JOIN queries q USING (w), stats),
       |ranked AS (
       |  SELECT w, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY w ORDER BY bm25 DESC, doc_id) AS r_bm25,
       |    ROW_NUMBER() OVER (PARTITION BY w ORDER BY tfidf DESC, doc_id) AS r_tfidf
       |  FROM scored),
       |fused AS (
       |  SELECT w, doc_id, r_bm25, r_tfidf,
       |    FLOOR((1.0::DOUBLE / (r_bm25 + 60) + 1.0::DOUBLE / (r_tfidf + 60)) * 1e6 + 0.5) / 1e6 AS rrf
       |  FROM ranked),
       |final AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY w ORDER BY rrf DESC, doc_id) AS r_fused
       |  FROM fused)
       |SELECT w AS term, CAST(r_fused AS INT) AS r_fused, doc_id,
       |  CAST(r_bm25 AS INT) AS r_bm25, CAST(r_tfidf AS INT) AS r_tfidf, rrf
       |FROM final WHERE r_fused <= 5 ORDER BY term, r_fused""".stripMargin

  // --------------------------------------------------------------------------
  // q209 — OVERLAP CHUNKING with provenance: split every document into
  // 8-token windows at stride 4 (50% overlap — the RAG ingestion default),
  // carrying (start, end) token spans and a chunk content hash for
  // chunk-level dedup downstream.
  //
  // Scale: fully row-local — the chunk fan-out is size/stride per doc, no
  // shuffle until a consumer aggregates. The span arithmetic is integer;
  // the hash is md5 of the joined token slice (engine-portable).
  def q209ChunkOverlap(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.toks.as("toks"))
      .withColumn("n", size(col("toks")))
      .select(col("doc_id"), col("n"), col("toks"),
        posexplode(expr("sequence(1, greatest(n - 7, 1), 4)")))
      .select(col("doc_id"), (col("pos") + 1).as("chunk_id"),
        col("col").as("start_tok"),
        least(col("col") + 7, col("n")).as("end_tok"),
        md5(expr("cast(concat_ws(' ', slice(toks, col, 8)) as binary)")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))

  val q209Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, ${TextOps.toksSqlD} AS toks FROM documents),
       |c AS (
       |  SELECT doc_id, s, len(toks) AS n,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s) AS chunk_id,
       |    array_to_string(toks[s : s + 7], ' ') AS chunk
       |  FROM t, UNNEST(generate_series(1, greatest(len(toks) - 7, 1), 4)) AS g(s))
       |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id, s AS start_tok,
       |  LEAST(s + 7, n) AS end_tok, md5(chunk) AS chunk_md5
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  // --------------------------------------------------------------------------
  // q217 — RESIDUAL VECTOR QUANTIZATION (2-stage RVQ): quantize each
  // vector against a coarse full-vector codebook, then quantize the
  // RESIDUAL against a second codebook fit on the residuals — the additive
  // codec behind modern neural audio codecs and coarse-to-fine ANN
  // (reconstruction v̂ = cb1[c1] + cb2[c2], error falls with every stage
  // where PQ splits dimensions instead). Same deterministic Lloyd recipe
  // as q205: init = first K vectors by vec_id, one scaled-long-mean
  // update, (d2, code) tie-break — bit-identical cross-engine.
  //
  // Scale: both codebooks are K-row broadcasts; assignment and residual
  // subtraction are linear row-local passes; the codebook update shuffles
  // on (code, dim) with map-side partial sums. Nothing touches pairs.
  /** (vec_id, v): full 64-d vectors as doubles. */
  private def rvqVecs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))

  private val d2Vec = "aggregate(zip_with(v, cv, (a, b) -> (a - b) * (a - b)), " +
    "cast(0 as double), (acc, x) -> acc + x)"

  /** Nearest-codeword assignment over FULL vectors; tie-break on code. */
  private[ops] def vqAssign(vecs: DataFrame, cb: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(cb))
      .withColumn("d2", expr(d2Vec))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("code"))).as("best"), first(col("v")).as("v"))
      .select(col("vec_id"), col("best.code").as("code"),
        col("best.d2").as("d2"), col("v"))

  /** Deterministic K=4 full-vector codebook: init = first 4 vectors by
    * vec_id, one scaled-long Lloyd update (q205's recipe, un-subspaced).
    */
  private[ops] def vqCodebook(vecs: DataFrame): DataFrame = {
    val init = vecs.filter(col("vec_id") < 4)
      .select(col("vec_id").cast("int").as("code"), col("v").as("cv"))
    vqAssign(vecs, init)
      .select(col("code"), posexplode(col("v")))
      .withColumn("vq", expr("cast(floor(col * 1e12 + 0.5d) as long)"))
      .groupBy(col("code"), col("pos"))
      .agg((sum(col("vq")).cast("double") / 1e12 / count(lit(1))).as("c"))
      .groupBy(col("code"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("code"), expr("transform(pc, x -> x.c)").as("cv"))
      .localCheckpoint()
  }

  def q217RvqEncode(spark: SparkSession, dir: String): DataFrame = {
    val vecs = rvqVecs(spark, dir)
    val cb1 = vqCodebook(vecs)
    val resid = vqAssign(vecs, cb1)
      .join(broadcast(cb1), Seq("code"))
      .select(col("vec_id"), col("code").as("c1"),
        expr("zip_with(v, cv, (a, b) -> a - b)").as("v"))
      .localCheckpoint() // stage 2 reads residuals for init, fit, and encode
    val cb2 = vqCodebook(resid.select(col("vec_id"), col("v")))
    vqAssign(resid.select(col("vec_id"), col("v")), cb2)
      .join(resid.select(col("vec_id"), col("c1")), Seq("vec_id"))
      .select(col("vec_id"), col("c1"), col("code").as("c2"),
        Num.pround(col("d2"), 6).as("rec_err"))
      .orderBy(col("vec_id"))
  }

  val q217Sql: String = {
    def d2(a: String, b: String) =
      s"list_reduce(list_transform(range(1, 65), i -> ($a[i] - $b[i]) * ($a[i] - $b[i])), (x, y) -> x + y)"
    def assign(src: String, cb: String) =
      s"""SELECT vec_id, code, v FROM (
         |    SELECT b.vec_id, c.code, b.v,
         |      ROW_NUMBER() OVER (PARTITION BY b.vec_id
         |        ORDER BY ${d2("b.v", "c.cv")} ASC, c.code ASC) AS rn
         |    FROM $src b CROSS JOIN $cb c) WHERE rn = 1""".stripMargin
    def fit(assigned: String) =
      s"""SELECT code, list(c ORDER BY dim) AS cv FROM (
         |    SELECT code, dim, CAST(SUM(vq) AS DOUBLE) / 1e12 / COUNT(*) AS c FROM (
         |      SELECT code, generate_subscripts(v, 1) AS dim,
         |        CAST(FLOOR(unnest(v) * 1e12 + 0.5) AS BIGINT) AS vq
         |      FROM $assigned)
         |    GROUP BY code, dim)
         |  GROUP BY code""".stripMargin
    s"""WITH base AS (
       |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       |init1 AS (SELECT CAST(vec_id AS INT) AS code, v AS cv FROM base WHERE vec_id < 4),
       |a0 AS (${assign("base", "init1")}),
       |cb1 AS (${fit("a0")}),
       |e1 AS (
       |  SELECT vec_id, code AS c1, v, cv FROM (
       |    SELECT b.vec_id, c.code, b.v, c.cv,
       |      ROW_NUMBER() OVER (PARTITION BY b.vec_id
       |        ORDER BY ${d2("b.v", "c.cv")} ASC, c.code ASC) AS rn
       |    FROM base b CROSS JOIN cb1 c) WHERE rn = 1),
       |res AS (
       |  SELECT vec_id, c1,
       |    list_transform(range(1, 65), i -> v[i] - cv[i]) AS v FROM e1),
       |init2 AS (SELECT CAST(vec_id AS INT) AS code, v AS cv FROM res WHERE vec_id < 4),
       |b0 AS (${assign("res", "init2")}),
       |cb2 AS (${fit("b0")}),
       |e2 AS (
       |  SELECT vec_id, code AS c2, d2 FROM (
       |    SELECT b.vec_id, c.code, ${d2("b.v", "c.cv")} AS d2,
       |      ROW_NUMBER() OVER (PARTITION BY b.vec_id
       |        ORDER BY ${d2("b.v", "c.cv")} ASC, c.code ASC) AS rn
       |    FROM res b CROSS JOIN cb2 c) WHERE rn = 1)
       |SELECT r.vec_id, r.c1, e2.c2, FLOOR((e2.d2) * 1e6 + 0.5) / 1e6 AS rec_err
       |FROM res r JOIN e2 ON r.vec_id = e2.vec_id
       |ORDER BY r.vec_id""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q222 — MAXIMAL MARGINAL RELEVANCE re-ranking (Carbonell & Goldstein):
  // retrieve top-16 candidates by query cosine, then greedily select 8
  // balancing relevance against redundancy — score(d) = λ·rel(d) −
  // (1−λ)·max_{s∈S} sim(d, s), λ = 0.5. The diversity stage every RAG
  // retrieval stack runs after ANN candidate generation (q40/q42/q45
  // produce candidates; this is the re-ranker).
  //
  // Scale shape: the corpus is touched ONCE — a linear cosine scan into a
  // TakeOrderedAndProject top-16 (q107's rule). Everything after operates
  // on the BOUNDED candidate set: the 16×16 similarity matrix is a
  // broadcast cross of 16-row frames, and each of the 7 greedy rounds
  // joins frames of ≤16 rows. Per-query work after the scan is O(k²) on
  // k = 16 regardless of corpus size — the standard MMR contract.
  //
  // Determinism: the query vector is the exact scaled-long dim-wise mean
  // of vectors 0–3; cosines fold in fixed dim order and are rounded to
  // 6 dp BEFORE any comparison; greedy argmax ties break on vec_id. The
  // oracle unrolls the same 8 greedy steps as chained CTEs (q217's
  // generated-SQL precedent).
  private val mmrK = 8
  private val mmrCand = 16

  private def cosExpr(a: String, b: String): String =
    s"floor(aggregate(zip_with($a, $b, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)" +
      s" / (sqrt(aggregate($a, cast(0 as double), (acc, x) -> acc + x * x))" +
      s" * sqrt(aggregate($b, cast(0 as double), (acc, x) -> acc + x * x))) * 1e6 + 0.5) / 1e6"

  def q222MmrRerank(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val qv = base.filter(col("vec_id") < 4)
      .select(posexplode(col("v")))
      .withColumn("vq", expr("cast(floor(col * 1e12 + 0.5d) as long)"))
      .groupBy(col("pos"))
      .agg((sum(col("vq")).cast("double") / 1e12 / count(lit(1))).as("c"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(expr("transform(pc, x -> x.c)").as("q"))
    val cand = base.crossJoin(broadcast(qv))
      .withColumn("rel", expr(cosExpr("v", "q")))
      .select(col("vec_id"), col("v"), col("rel"))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(mmrCand)
      .localCheckpoint()
    val sims = cand.select(col("vec_id").as("ia"), col("v").as("va"))
      .crossJoin(broadcast(cand.select(col("vec_id").as("ib"), col("v").as("vb"))))
      .filter(col("ia") =!= col("ib"))
      .select(col("ia"), col("ib"), expr(cosExpr("va", "vb")).as("s"))
      .localCheckpoint()
    val rels = cand.select(col("vec_id"), col("rel")).localCheckpoint()
    var selected = rels.orderBy(col("rel").desc, col("vec_id")).limit(1)
      .select(col("vec_id"), col("rel").as("score"), lit(1).as("rank"))
      .localCheckpoint()
    for (k <- 2 to mmrK) {
      val selIds = selected.select(col("vec_id").as("sel_id"))
      val maxSim = sims.join(broadcast(selIds), col("ib") === col("sel_id"))
        .groupBy(col("ia")).agg(max(col("s")).as("ms"))
      val pick = rels.join(selIds, col("vec_id") === col("sel_id"), "left_anti")
        .join(maxSim, col("vec_id") === col("ia"))
        .select(col("vec_id"),
          Num.pround(lit(0.5) * col("rel") - lit(0.5) * col("ms"), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(1)
        .withColumn("rank", lit(k))
      selected = selected.union(pick).localCheckpoint()
    }
    selected.select(col("rank"), col("vec_id"), col("score")).orderBy(col("rank"))
  }

  val q222Sql: String = {
    def cosSql(a: String, b: String): String =
      s"FLOOR((list_reduce(list_transform(range(1, 65), i -> $a[i] * $b[i]), (x, y) -> x + y)" +
        s" / (sqrt(list_reduce(list_transform(range(1, 65), i -> $a[i] * $a[i]), (x, y) -> x + y))" +
        s" * sqrt(list_reduce(list_transform(range(1, 65), i -> $b[i] * $b[i]), (x, y) -> x + y)))) * 1e6 + 0.5) / 1e6"
    val steps = (2 to mmrK).map { k =>
      s"""p$k AS MATERIALIZED (
         |  SELECT c.vec_id, FLOOR((0.5 * c.rel - 0.5 * m.ms) * 1e6 + 0.5) / 1e6 AS score, $k AS rank
         |  FROM cand c JOIN (
         |    SELECT s.ia AS vec_id, MAX(s.s) AS ms FROM sims s
         |    WHERE s.ib IN (SELECT vec_id FROM u${k - 1}) GROUP BY s.ia) m
         |    ON c.vec_id = m.vec_id
         |  WHERE c.vec_id NOT IN (SELECT vec_id FROM u${k - 1})
         |  ORDER BY score DESC, c.vec_id LIMIT 1),
         |u$k AS MATERIALIZED (SELECT * FROM u${k - 1} UNION ALL SELECT * FROM p$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH base AS (
       |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       |qv AS (
       |  SELECT list(c ORDER BY dim) AS q FROM (
       |    SELECT dim, CAST(SUM(vq) AS DOUBLE) / 1e12 / COUNT(*) AS c FROM (
       |      SELECT generate_subscripts(v, 1) AS dim,
       |        CAST(FLOOR(unnest(v) * 1e12 + 0.5) AS BIGINT) AS vq
       |      FROM base WHERE vec_id < 4)
       |    GROUP BY dim)),
       |cand AS MATERIALIZED (
       |  SELECT vec_id, v, ${cosSql("v", "q")} AS rel
       |  FROM base CROSS JOIN qv
       |  ORDER BY rel DESC, vec_id LIMIT $mmrCand),
       |sims AS MATERIALIZED (
       |  SELECT a.vec_id AS ia, b.vec_id AS ib, ${cosSql("a.v", "b.v")} AS s
       |  FROM cand a CROSS JOIN cand b WHERE a.vec_id <> b.vec_id),
       |u1 AS MATERIALIZED (
       |  SELECT vec_id, rel AS score, 1 AS rank FROM cand
       |  ORDER BY rel DESC, vec_id LIMIT 1),
       |$steps
       |SELECT rank, vec_id, score FROM u$mmrK ORDER BY rank""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q251 — nDCG@10 RETRIEVAL EVALUATION: the graded-ranking readout that
  // completes the eval family (q193 AUC = probability ordering, q229 =
  // prefix-dim recall, q208 = fusion). Per query vector: candidates
  // ranked by cosine (rounded to 6 dp BEFORE ranking, vec_id tie-break —
  // q229's rule), relevance = label match, DCG@10 = Σ rel_i·disc_i and
  // IDCG = cum-discount at min(10, |relevant|).
  //
  // Determinism: the log2 discounts are HARD-CODED decimal literals
  // (both engines parse the same strings to the same doubles — no libm
  // log at query time), the DCG fold runs in pinned rank order via a
  // sorted-array reduce (q201's rule), and IDCG is a literal-array
  // lookup. Scale: one corpus pass against 5 broadcast queries; the
  // per-query rank window is partitioned by query.
  private val ndcgDisc = Seq(
    "1.0", "0.6309297535714575", "0.5", "0.43067655807339306",
    "0.38685280723454163", "0.3562071871080222", "0.3333333333333333",
    "0.31546487678572877", "0.3010299956639812", "0.2890648263178879")
  private val ndcgCum = Seq(
    "1.0", "1.6309297535714575", "2.1309297535714578", "2.5616063116448506",
    "2.9484591188793923", "3.3046663059874146", "3.637999639320748",
    "3.953464516106477", "4.254494511770458", "4.543559338088346")

  def q251Ndcg(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val queries = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"), col("v").as("qv"))
    val relTot = base.groupBy(col("label")).agg(count(lit(1)).as("n_label"))
    val sim = Num.pround(
      expr("aggregate(zip_with(v, qv, (x, y) -> x * y), 0.0d, (a, x) -> a + x)") /
        sqrt(expr("aggregate(v, 0.0d, (a, x) -> a + x * x)") *
          expr("aggregate(qv, 0.0d, (a, x) -> a + x * x)")), 6)
    val discArr = array(ndcgDisc.map(s => lit(s.toDouble)): _*)
    val cumArr = array(ndcgCum.map(s => lit(s.toDouble)): _*)
    val top = base.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("qlabel"), col("vec_id"), col("label"), sim.as("sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rk") <= 10)
      .withColumn("g",
        (col("label") === col("qlabel")).cast("int").cast("double") *
          element_at(discArr, col("rk")))
    top.groupBy(col("qid"), col("qlabel"))
      .agg(expr("aggregate(sort_array(collect_list(struct(rk, g))), 0.0d, (a, s) -> a + s.g)")
        .as("dcg"))
      .join(broadcast(relTot), col("qlabel") === col("label"))
      .withColumn("n_rel", col("n_label") - 1) // the query itself is excluded
      .select(col("qid"), col("n_rel"),
        Num.pround(col("dcg"), 6).as("dcg"),
        Num.pround(col("dcg") / element_at(cumArr,
          greatest(least(col("n_rel"), lit(10L)), lit(1L)).cast("int")), 6)
          .as("ndcg"))
      .orderBy(col("qid"))
  }

  val q251Sql: String = {
    val discList = ndcgDisc.mkString("[", ", ", "]")
    val cumList = ndcgCum.mkString("[", ", ", "]")
    s"""WITH base AS (
       |  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
       |  FROM embeddings),
       |q AS (SELECT vec_id AS qid, label AS qlabel, v AS qv FROM base WHERE vec_id < 5),
       |rt AS (SELECT label, COUNT(*) AS n_label FROM base GROUP BY 1),
       |sc AS (
       |  SELECT qid, qlabel, b.vec_id, b.label,
       |    FLOOR((list_reduce(list_transform(range(1, 65), i -> b.v[i] * qv[i]), (a, x) -> a + x)
       |      / sqrt(list_reduce(list_transform(range(1, 65), i -> b.v[i] * b.v[i]), (a, x) -> a + x)
       |        * list_reduce(list_transform(range(1, 65), i -> qv[i] * qv[i]), (a, x) -> a + x))) * 1e6 + 0.5) / 1e6
       |      AS sim
       |  FROM base b CROSS JOIN q WHERE b.vec_id <> qid),
       |rk AS (
       |  SELECT qid, qlabel, vec_id, label, sim,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rk
       |  FROM sc QUALIFY rk <= 10),
       |dg AS (
       |  SELECT qid, qlabel,
       |    list_reduce(
       |      list(CASE WHEN label = qlabel THEN 1.0 ELSE 0.0 END * ($discList)[rk]
       |        ORDER BY rk), (a, b) -> a + b) AS dcg
       |  FROM rk GROUP BY 1, 2)
       |SELECT qid, rt.n_label - 1 AS n_rel,
       |  FLOOR((dcg) * 1e6 + 0.5) / 1e6 AS dcg,
       |  FLOOR((dcg / ($cumList)[CAST(GREATEST(LEAST(rt.n_label - 1, 10), 1) AS INT)]) * 1e6 + 0.5) / 1e6 AS ndcg
       |FROM dg JOIN rt ON dg.qlabel = rt.label
       |ORDER BY qid""".stripMargin
  }

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q251_ndcg", q251Ndcg _, Some(q251Sql)),
    ("q222_mmr_rerank", q222MmrRerank _, Some(q222Sql)),
    ("q205_pq_encode", q205PqEncode _, Some(q205Sql)),
    ("q217_rvq_encode", q217RvqEncode _, Some(q217Sql)),
    ("q208_rrf_fusion", q208RrfFusion _, Some(q208Sql)),
    ("q209_chunk_overlap", q209ChunkOverlap _, Some(q209Sql)),
    ("q213_ivfpq_search", q213IvfPqSearch _, Some(q213Sql)))
}
