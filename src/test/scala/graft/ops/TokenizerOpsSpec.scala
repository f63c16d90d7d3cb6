package graft.ops

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Planted-fixture tests for the tokenizer/novelty/stateful batch
  * (q183-q185): hand-computed BPE merge sequences (including the greedy
  * consecutive-repeat case string replace must get right), directional
  * first-occurrence attribution, and transformWithState totals across
  * micro-batches.
  */
class TokenizerOpsSpec extends SparkSpec {

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_tok_docs").toString
    rows.map { case (id, text) => (id, text, "en", "s", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("q183 BPE learns the textbook merges in weighted frequency order") {
    // Sennrich-style corpus: low ×5, lower ×2, newest ×2.
    // Round 1: (l,o)=7 ties (o,w)=7 → (l,o) by pair order.
    // Round 2: (lo,w)=7. Round 3: all remaining pairs tie at 2 → (e,r).
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++ Seq.fill(2)("newest"))
      .mkString(" ")
    val got = TokenizerOps.bpeMerges(
      spark.read.parquet(s"${docsDir(Seq((1L, text)))}/documents.parquet"), 3)
      .collect().map(r => (r.getAs[Int]("round"), r.getAs[String]("pair"),
        r.getAs[Long]("cnt")))
    assert(got.toSeq === Seq((1, "l o", 7L), (2, "lo w", 7L), (3, "e r", 2L)))
  }

  test("q183 merge application is GREEDY left-to-right on consecutive repeats") {
    // "aaaa" → pairs (a,a)×3; after merging (a,a) the sequence must be
    // <aa><aa> (greedy), NOT <aa><a><a> — round 2's top pair proves which
    // happened: greedy gives (aa,aa)=1; the broken shared-separator
    // replace would leave (aa,a)=1,(a,a)=1 and pick (a,a).
    val got = TokenizerOps.bpeMerges(
      spark.read.parquet(s"${docsDir(Seq((1L, "aaaa")))}/documents.parquet"), 2)
      .collect().map(r => (r.getAs[Int]("round"), r.getAs[String]("pair"),
        r.getAs[Long]("cnt")))
    assert(got.toSeq === Seq((1, "a a", 3L), (2, "aa aa", 1L)))
  }

  test("q185 novelty attributes duplicates to the FIRST occurrence only") {
    // doc 1 = original, doc 3 = exact copy of 1 (every shingle first seen
    // in 1), doc 2 = unrelated. Directionality: the original scores 0,
    // the later copy scores 1 — q113's symmetric coverage can't tell them
    // apart.
    val orig = "alpha beta gamma delta epsilon zeta eta theta"
    val d = docsDir(Seq(
      (1L, orig), (2L, "completely different words in this one here now"),
      (3L, orig)))
    val got = PrepFixtures.collectNovelty(spark, d)
    assert(got === Map(1L -> 0.0, 2L -> 0.0, 3L -> 1.0))
  }

  test("q184 transformWithState totals are exact across micro-batches") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_tws").toString
    val ns = 1000000000L
    val t0 = 1704067200L * ns
    // user 1: 5 events over what will be ≥2 micro-batch files; user 2: 1.
    val rows = (0 until 5).map(i =>
      (i.toLong, t0 + i * ns, 1L, "click", 10.01, "{}")) :+
      (9L, t0, 2L, "click", 0.10, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val got = StreamingOps.q184TransformWithState(spark, d).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("total")))).toMap
    // 5 × 10.01 = 50.05 exactly (cent-long state, no float accumulation)
    assert(got === Map(1L -> ((5L, 50.05)), 2L -> ((1L, 0.10))))
  }
}

/** Shared helper kept outside the suite so the novelty collect stays
  * one-line in tests. */
private object PrepFixtures {
  def collectNovelty(spark: org.apache.spark.sql.SparkSession, dir: String): Map[Long, Double] =
    TokenizerOps.q185Novelty(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dup_frac")).toMap
}
