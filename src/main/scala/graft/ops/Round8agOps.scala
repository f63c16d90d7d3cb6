package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 thirty-third operator batch: suffix–prefix stitch detection
  * and Good–Toulmin vocabulary extrapolation — crawl-split repair and
  * corpus-growth planning on the §8.4 exact-integer discipline.
  */
object Round8agOps {

  // --------------------------------------------------------------------------
  // q371 — SUFFIX–PREFIX STITCH CENSUS: crawlers and chunkers split
  // documents; the tell is one doc's TAIL matching another doc's HEAD.
  // An overlap of j tokens pins B's first 2 tokens to A's pair at
  // offset wc−j+1, so the LEFT side multi-probes: it emits its token
  // pair at every candidate offset j = 2..8 (7 keys/doc), the RIGHT
  // side emits its opening pair once, and the equi-join anchors each
  // candidate AT a specific j that one row-local slice compare then
  // verifies; a pair matching several j (periodic text) keeps its max.
  // Hot boundary keys cap at df ≤ 1000 (the standard inverted-index
  // guard — a boilerplate opener would otherwise make a quadratic key
  // group). Ships the verified-overlap histogram with distinct
  // left/right doc counts — the repair-queue sizing readout.
  // Complements q113 (within-doc spans) and q176 (containment): this
  // finds CROSS-doc continuation.
  //
  // Scale: one token pass, a 7×-amplified equi-join on the capped
  // boundary key (candidates ∝ Σ df_L·df_R per key, bounded by the
  // cap), all verification row-local — no corpus cross join anywhere.
  def stitchCensus(docs: DataFrame): DataFrame = {
    val t = docs
      .select(col("doc_id"), TextOps.toks.as("t"))
      .filter(size(col("t")) >= 16)
      .select(col("doc_id"),
        expr("slice(t, 1, 8)").as("head8"),
        expr("slice(t, -8, 8)").as("tail8"))
      .localCheckpoint()
    val left = t.select(col("doc_id").as("left_doc"), col("tail8"),
        explode(expr(
          """transform(sequence(2, 8), j -> named_struct(
            |  'j', cast(j as int),
            |  'k', array_join(slice(tail8, -j, 2), ' ')))""".stripMargin))
          .as("x"))
      .select(col("left_doc"), col("tail8"), col("x.j").as("j"),
        col("x.k").as("bk"))
    val right = t.select(col("doc_id").as("right_doc"), col("head8"),
      expr("array_join(slice(head8, 1, 2), ' ')").as("bk"))
    val okL = left.groupBy(col("bk"), col("j")).agg(count(lit(1)).as("dfl"))
      .filter(col("dfl") <= 1000L).select(col("bk"), col("j"))
    val okR = right.groupBy(col("bk")).agg(count(lit(1)).as("dfr"))
      .filter(col("dfr") <= 1000L).select(col("bk"))
    val cand = left.join(okL, Seq("bk", "j"))
      .join(right.join(okR, Seq("bk")), Seq("bk"))
      .filter(col("left_doc") =!= col("right_doc"))
      .filter(expr("slice(tail8, -j, j)") === expr("slice(head8, 1, j)"))
    cand.groupBy(col("left_doc"), col("right_doc"))
      .agg(max(col("j")).as("overlap_len"))
      .groupBy(col("overlap_len"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("left_doc")).as("n_left_docs"),
        countDistinct(col("right_doc")).as("n_right_docs"))
      .orderBy(col("overlap_len"))
  }

  def q371StitchCensus(spark: SparkSession, dir: String): DataFrame =
    stitchCensus(Tables.documents(spark, dir))

  val q371Sql: String =
    s"""WITH tt AS (
       |  SELECT doc_id, ${TextOps.toksSqlD} AS t FROM documents),
       |e AS (
       |  SELECT doc_id, list_slice(t, 1, 8) AS head8,
       |    list_slice(t, -8, -1) AS tail8
       |  FROM tt WHERE len(t) >= 16),
       |lft AS (
       |  SELECT doc_id AS left_doc, tail8, j,
       |    array_to_string(list_slice(tail8, -j, 1 - j), ' ') AS bk
       |  FROM e, UNNEST([2, 3, 4, 5, 6, 7, 8]) AS u(j)),
       |rgt AS (
       |  SELECT doc_id AS right_doc, head8,
       |    array_to_string(list_slice(head8, 1, 2), ' ') AS bk
       |  FROM e),
       |okl AS (SELECT bk, j FROM lft GROUP BY bk, j HAVING COUNT(*) <= 1000),
       |okr AS (SELECT bk FROM rgt GROUP BY bk HAVING COUNT(*) <= 1000),
       |cand AS (
       |  SELECT left_doc, right_doc, MAX(j) AS overlap_len
       |  FROM (SELECT lft.* FROM lft JOIN okl USING (bk, j)) a
       |  JOIN (SELECT rgt.* FROM rgt JOIN okr USING (bk)) b USING (bk)
       |  WHERE left_doc <> right_doc
       |    AND list_slice(a.tail8, -a.j, -1) = list_slice(b.head8, 1, a.j)
       |  GROUP BY 1, 2)
       |SELECT overlap_len, COUNT(*) AS n_pairs,
       |  COUNT(DISTINCT left_doc) AS n_left_docs,
       |  COUNT(DISTINCT right_doc) AS n_right_docs
       |FROM cand GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------------------
  // q372 — GOOD–TOULMIN VOCABULARY EXTRAPOLATION: if the corpus
  // DOUBLED, how many new token types appear? The Good–Toulmin
  // estimator at t = 1 is the alternating count-of-counts series
  // U = V₁ − V₂ + V₃ − …, an EXACT INTEGER — no smoothing, no floats;
  // also ships the 10-term truncation (the variance-bounded form used
  // in practice) and the Chao1 richness lower bound V₁²/(2V₂) as an
  // exact floor. Closes the unseen-mass family: q302 smooths seen
  // frequencies, q326 estimates detector coverage, q335 measures
  // novelty; this PLANS corpus growth.
  //
  // Scale: one token-count pass → count-of-counts grid (bounded far
  // below the corpus, q302's argument) → one aggregate.
  def goodToulmin(docs: DataFrame): DataFrame = {
    val coc = docs.select(explode(TextOps.toks).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .groupBy(col("f")).agg(count(lit(1)).as("vm"))
    coc.agg(sum(col("f") * col("vm")).as("n_tokens"),
        sum(col("vm")).as("v_types"),
        sum(when(col("f") === 1L, col("vm")).otherwise(0L)).as("v1"),
        sum(when(col("f") === 2L, col("vm")).otherwise(0L)).as("v2"),
        sum(when(col("f") % 2L === 1L, col("vm")).otherwise(-col("vm")))
          .as("gt_add"),
        sum(when(col("f") <= 10L,
          when(col("f") % 2L === 1L, col("vm")).otherwise(-col("vm")))
          .otherwise(0L)).as("gt_add_t10"))
      .select(col("n_tokens"), col("v_types"), col("v1"), col("v2"),
        col("gt_add"), col("gt_add_t10"),
        when(col("v2") === 0L, lit(null))
          .otherwise(expr("(v1 * v1) div (2L * v2)")).as("chao1_add"))
  }

  def q372GoodToulmin(spark: SparkSession, dir: String): DataFrame =
    goodToulmin(Tables.documents(spark, dir))

  val q372Sql: String =
    s"""WITH w AS (
       |  SELECT UNNEST(t) AS w FROM (SELECT ${TextOps.toksSqlD} AS t FROM documents)),
       |freq AS (SELECT w, COUNT(*) AS f FROM w GROUP BY 1),
       |coc AS (SELECT f, COUNT(*) AS vm FROM freq GROUP BY 1),
       |a AS (
       |  SELECT SUM(f * vm) AS n_tokens, SUM(vm) AS v_types,
       |    SUM(CASE WHEN f = 1 THEN vm ELSE 0 END) AS v1,
       |    SUM(CASE WHEN f = 2 THEN vm ELSE 0 END) AS v2,
       |    SUM(CASE WHEN f % 2 = 1 THEN vm ELSE -vm END) AS gt_add,
       |    SUM(CASE WHEN f <= 10 THEN
       |      CASE WHEN f % 2 = 1 THEN vm ELSE -vm END ELSE 0 END) AS gt_add_t10
       |  FROM coc)
       |SELECT CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(v_types AS BIGINT) AS v_types, CAST(v1 AS BIGINT) AS v1,
       |  CAST(v2 AS BIGINT) AS v2, CAST(gt_add AS BIGINT) AS gt_add,
       |  CAST(gt_add_t10 AS BIGINT) AS gt_add_t10,
       |  CASE WHEN v2 = 0 THEN NULL
       |    ELSE CAST((v1 * v1) // (2 * v2) AS BIGINT) END AS chao1_add
       |FROM a""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q371_stitch_census", q371StitchCensus _, Some(q371Sql)),
    ("q372_good_toulmin", q372GoodToulmin _, Some(q372Sql)))
}
