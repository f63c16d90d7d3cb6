package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tokenizer-training and novelty-attribution operators — [EXT] north-star
  * surface: distributed BPE merge learning (the tokenizer-fitting step of
  * every LLM data pipeline) and first-occurrence duplicate attribution.
  */
object TokenizerOps {

  // --------------------------------------------------------------------------
  // q183 — distributed BPE MERGE TRAINING (Sennrich et al.): learn the
  // first R merge rules over the corpus. Each round counts frequency-
  // weighted adjacent symbol pairs, picks the argmax, and applies the
  // merge greedily left-to-right to every word — the byte-pair-encoding
  // fit loop, run on the WORD-TYPE table (Heaps-law bounded), never the
  // token stream.
  //
  // Representation: a word's symbol sequence is "<s1><s2>...<sk>" — every
  // symbol wrapped in its OWN delimiters, so the merge "(x,y) → xy" is
  // the plain string replace '<x><y>' → '<xy>'. Because adjacent patterns
  // share no characters, left-to-right non-overlapping replace() — the
  // same semantics in Spark (Java) and DuckDB — IS greedy BPE merge
  // application: "<a><a><a>" → "<aa><a>", "<x><y><x><y>" → "<xy><xy>",
  // and no pattern can match across a symbol boundary (the corpus
  // alphabet is alnum; delimiters never occur inside a symbol).
  //
  // Scale: the state is (word-type, freq, seq) — vocabulary-sized, not
  // corpus-sized (the one token-stream scan builds the freq table). Per
  // round: one row-local pair fan-out (avg word length × |vocab|), one
  // hash agg, a 1-row TakeOrderedAndProject argmax broadcast back into a
  // row-local replace. Exact long counts; (cnt desc, x, y) is a total
  // order, so every round is deterministic cross-engine. Rounds unroll in
  // ONE lazy plan; beyond ~6 rounds localCheckpoint the seq table per
  // round (the q110/q120 iterative-lineage lesson).
  def bpeMerges(docs: DataFrame, rounds: Int): DataFrame = {
    val words = docs.select(explode(TextOps.toks).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    var seqs = words.select(col("f"),
      concat(lit("<"),
        array_join(expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"), "><"),
        lit(">")).as("seq"))
    var merges: Seq[DataFrame] = Nil
    for (r <- 1 to rounds) {
      val top = seqs
        .select(col("f"), expr("split(substring(seq, 2, length(seq) - 2), '><')").as("syms"))
        .select(col("f"), explode(expr(
          "zip_with(slice(syms, 1, size(syms) - 1), slice(syms, 2, size(syms) - 1)," +
            " (a, b) -> struct(a AS x, b AS y))")).as("p"))
        .groupBy(col("p.x").as("x"), col("p.y").as("y"))
        .agg(sum(col("f")).as("cnt"))
        .orderBy(col("cnt").desc, col("x"), col("y")).limit(1)
      merges = merges :+ top.select(lit(r).as("round"),
        concat(col("x"), lit(" "), col("y")).as("pair"), col("cnt"))
      seqs = seqs.crossJoin(broadcast(top.select(col("x"), col("y"))))
        .withColumn("seq", expr(
          "replace(seq, '<' || x || '><' || y || '>', '<' || x || y || '>')"))
        .select(col("f"), col("seq"))
    }
    merges.reduce(_ union _).orderBy(col("round"))
  }

  def q183BpeTrain(spark: SparkSession, dir: String): DataFrame =
    bpeMerges(Tables.documents(spark, dir), 3)

  /** One unrolled BPE round in DuckDB; r chains on the previous round's
    * sequence table. Mirrors bpeMerges round-for-round.
    */
  private def bpeRoundSql(r: Int): String =
    s"""p$r AS (
       |  SELECT syms[i] AS x, syms[i + 1] AS y, SUM(f) AS cnt
       |  FROM (SELECT f, string_split(seq[2:-2], '><') AS syms FROM v${r - 1}),
       |       UNNEST(generate_series(1, len(syms) - 1)) AS u(i)
       |  GROUP BY 1, 2),
       |m$r AS (SELECT $r AS round, x, y, cnt FROM p$r
       |        ORDER BY cnt DESC, x, y LIMIT 1),
       |v$r AS (SELECT f, replace(seq, '<' || x || '><' || y || '>',
       |                          '<' || x || y || '>') AS seq FROM v${r - 1}, m$r)"""
      .stripMargin

  val q183Sql: String =
    s"""WITH words AS (
       |  SELECT w, COUNT(*) AS f FROM (
       |    SELECT unnest(${TextOps.toksSqlD}) AS w FROM documents) GROUP BY w),
       |v0 AS (
       |  SELECT f, '<' || array_to_string(
       |    list_transform(range(1, len(w) + 1), i -> w[i]), '><') || '>' AS seq
       |  FROM words),
       |${bpeRoundSql(1)},
       |${bpeRoundSql(2)},
       |${bpeRoundSql(3)}
       |SELECT round, x || ' ' || y AS pair, CAST(cnt AS BIGINT) AS cnt
       |FROM (SELECT * FROM m1 UNION ALL SELECT * FROM m2 UNION ALL SELECT * FROM m3)
       |ORDER BY round""".stripMargin

  // --------------------------------------------------------------------------
  // q185 — FIRST-OCCURRENCE NOVELTY attribution: per document, the
  // fraction of its distinct 3-gram shingles already seen in an EARLIER
  // document (corpus order = doc_id) — the directional "who copied whom"
  // curation metric. q113 measures corpus-wide repeated-span coverage
  // symmetrically; this op attributes each duplicate to its first
  // occurrence, so originals keep dup_frac ≈ 0 while late copies score
  // ≈ 1 and can be dropped without touching the source they duplicate.
  //
  // Scale: one row-local shingle explode, first_doc = MIN(doc_id) as a
  // window over the shingle key (single shuffle, no join-back — the
  // q97/q173 one-lineage rule), then a per-doc hash agg. Integer-ratio
  // double at the end (bit-identical cross-engine).
  def q185Novelty(spark: SparkSession, dir: String): DataFrame =
    TextOps.shingleEdges(Tables.documents(spark, dir))
      .withColumn("first_doc", min(col("doc_id")).over(Window.partitionBy(col("s"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"),
        count_if(col("first_doc") < col("doc_id")).as("n_dup"))
      .withColumn("dup_frac", Num.pround(col("n_dup").cast("double") / col("n_sh"), 6))
      .orderBy(col("doc_id"))

  val q185Sql: String =
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id, s FROM (
       |    SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       |    FROM (SELECT doc_id, ${TextOps.toksSqlD} AS t FROM documents),
       |         UNNEST(generate_series(1, len(t) - 2)) AS u(i))),
       |f AS (SELECT doc_id, s, MIN(doc_id) OVER (PARTITION BY s) AS first_doc FROM sh)
       |SELECT doc_id, COUNT(*) AS n_sh,
       |  COUNT(*) FILTER (first_doc < doc_id) AS n_dup,
       |  FLOOR((CAST(COUNT(*) FILTER (first_doc < doc_id) AS DOUBLE) / COUNT(*)) * 1e6 + 0.5) / 1e6
       |    AS dup_frac
       |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q183_bpe_train", q183BpeTrain _, Some(q183Sql)),
    ("q185_novelty", q185Novelty _, Some(q185Sql)))
}
