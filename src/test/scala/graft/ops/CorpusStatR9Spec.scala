package graft.ops

import java.nio.file.Files

import graft.SparkSpec

/** Planted-fixture tests for the round-9 corpus-hygiene batch
  * (q407–q410): hand-computed repetition/duplication/contamination/yield
  * ledgers on tiny corpora.
  */
class CorpusStatR9Spec extends SparkSpec {

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_r9_docs").toString
    rows.map { case (id, text, lang, source) =>
      (id, text, lang, source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("q407 repetition audit: hand-computed bigram shares; 1-token docs excluded") {
    // doc 1 "a b a b": bigrams (a b, b a, a b) -> n=3 d=2 top=2
    //   dup_ppm = 1e6 - 2e6/3 = 333334, top_ppm = 666666
    // doc 2 "x y z": n=2 d=2 top=1 -> dup 0, top 500000
    // doc 3 "solo": no bigram slots, excluded
    val d = docsDir(Seq(
      (1L, "a b a b", "en", "s1"),
      (2L, "x y z", "en", "s1"),
      (3L, "solo", "en", "s1")))
    val got = CorpusStatOps.q407RepetitionAudit(spark, d).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Long]("n_docs") === 2L)
    assert(r.getAs[Long]("avg_dup_ppm") === (333334L + 0L) / 2)
    assert(r.getAs[Long]("avg_top_ppm") === (666666L + 500000L) / 2)
    assert(r.getAs[Long]("high_rep_docs") === 2L) // both tops >= 20%
  }

  test("q408 dup inflation: token mass by exact-copy multiplicity") {
    // "a b" x3 (k=3, 2 tokens) and "c" x1 (k=1, 1 token)
    val d = docsDir(Seq(
      (1L, "a b", "en", "s1"), (2L, "a b", "en", "s1"),
      (3L, "a b", "en", "s2"), (4L, "c", "en", "s1")))
    val got = CorpusStatOps.q408DupInflation(spark, d).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("n_texts"),
        r.getAs[Long]("token_mass"), r.getAs[Long]("wasted_tokens")))
    assert(got.toSeq === Seq((1L, 1L, 1L, 0L), (3L, 1L, 6L, 4L)))
  }

  test("q409 ngram contamination: one of two eval 5-grams appears in train") {
    // eval = doc_id % 10 == 7; train doc shares the "a b c d e" 5-gram
    val d = docsDir(Seq(
      (1L, "a b c d e f", "en", "s1"),    // train: "a b c d e", "b c d e f"
      (7L, "a b c d e x", "en", "s1"),    // eval:  "a b c d e", "b c d e x"
      (17L, "p q r s t", "de", "s1")))    // eval de: "p q r s t", no train hit
    val got = CorpusStatOps.q409NgramContamination(spark, d).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("eval_grams"), r.getAs[Long]("contaminated"),
          r.getAs[Long]("contamination_ppm")))).toMap
    assert(got("en") === ((2L, 1L, 500000L)))
    assert(got("de") === ((1L, 0L, 0L)))
  }

  test("q410 token yield: min-doc_id keep policy charges re-crawls to their source") {
    // s1 doc1 "a b" kept; s2 doc2 "a b" is the dup (loses the min race);
    // s2 doc3 "c d e" unique
    val d = docsDir(Seq(
      (1L, "a b", "en", "s1"),
      (2L, "a b", "en", "s2"),
      (3L, "c d e", "en", "s2")))
    val got = CorpusStatOps.q410TokenYield(spark, d).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("docs"), r.getAs[Long]("tokens"),
          r.getAs[Long]("kept_docs"), r.getAs[Long]("kept_tokens"),
          r.getAs[Long]("yield_ppm")))).toMap
    assert(got("s1") === ((1L, 2L, 1L, 2L, 1000000L)))
    assert(got("s2") === ((2L, 5L, 1L, 3L, 600000L)))
  }

  test("q411 label margin: a traitor vector is the only confusable one") {
    import spark.implicits._
    // 64-dim vectors, only dims 0/1 non-zero. label 0: two copies of e0
    // (centroid e0). label 1: e1 and a traitor e0 (centroid (.5,.5)).
    // Margins: e0-own=1 vs rival .7071 (fine); e1-own .7071 vs rival 0
    // (fine); traitor own .7071 vs rival 1 -> confusable.
    val d = Files.createTempDirectory("graft_r9_emb").toString
    def v(x: Float, y: Float): Array[Float] = Array(x, y) ++ Array.fill(62)(0f)
    Seq((1L, v(1f, 0f), 0), (2L, v(1f, 0f), 0),
        (3L, v(0f, 1f), 1), (4L, v(1f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    val got = VectorOps.q411LabelMargin(spark, d).collect()
      .map(r => r.getInt(0) -> ((r.getAs[Long]("n_vecs"),
        r.getAs[Long]("confusable"), r.getAs[Long]("confusable_ppm")))).toMap
    assert(got(0) === ((2L, 0L, 0L)))
    assert(got(1) === ((2L, 1L, 500000L)))
  }

  test("q412 cluster census: one exact-dup pair plus one singleton") {
    val d = docsDir(Seq(
      (1L, "a b c d", "en", "s1"),
      (2L, "a b c d", "en", "s1"),   // jaccard 1 with doc 1 -> cluster of 2
      (3L, "x y z w", "en", "s1")))  // untouched singleton
    val got = TextOps.q412ClusterCensus(spark, d).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("n_clusters"),
        r.getAs[Long]("n_docs")))
    assert(got.toSeq === Seq((1L, 1L, 1L), (2L, 1L, 2L)))
  }

  test("q413 truncation audit: hand-computed loss at each cut") {
    // token counts 10, 20, 40 (total 70)
    val d = docsDir(Seq(
      (1L, Seq.fill(10)("w").mkString(" "), "en", "s1"),
      (2L, Seq.fill(20)("w").mkString(" "), "en", "s1"),
      (3L, Seq.fill(40)("w").mkString(" "), "en", "s1")))
    val got = CorpusStatOps.q413TruncationAudit(spark, d).collect()
      .map(r => r.getAs[Long]("cut") -> ((r.getAs[Long]("docs"),
        r.getAs[Long]("tokens"), r.getAs[Long]("docs_truncated"),
        r.getAs[Long]("tokens_kept"), r.getAs[Long]("loss_ppm")))).toMap
    assert(got(16L) === ((3L, 70L, 2L, 42L, 400000L)))
    assert(got(32L) === ((3L, 70L, 1L, 62L, 1000000L - 62000000L / 70L)))
    assert(got(64L) === ((3L, 70L, 0L, 70L, 0L)))
  }

  test("q414 threshold sensitivity: exact-dup pair survives every cut, the 0.5 pairs only the base") {
    // docs 1,2 identical (j=1 with each other); doc 3 shares 2 of its 3
    // 3-gram shingles with each (j = 2/4 = 0.5). Pairs: (1,2)@1.0,
    // (1,3)@0.5, (2,3)@0.5 -> base 3; >=0.6..0.9 keep only (1,2).
    val d = docsDir(Seq(
      (1L, "a b c d e", "en", "s1"),
      (2L, "a b c d e", "en", "s1"),
      (3L, "a b c d x", "en", "s1")))
    val got = TextOps.q414ThresholdSensitivity(spark, d).collect()
      .map(r => r.getAs[Long]("t_pct") -> ((r.getAs[Long]("n_pairs"),
        r.getAs[Long]("base_pairs"), r.getAs[Long]("share_ppm")))).toMap
    assert(got(50L) === ((3L, 3L, 1000000L)))
    Seq(60L, 70L, 80L, 90L).foreach { t =>
      assert(got(t) === ((1L, 3L, 333333L)), s"t=$t") }
  }

  test("q415 incremental dedup: exact, near, and novel incoming docs classified") {
    // md5(doc_id) first hex < '2' marks ids 6, 19, 24 incoming; 1-5
    // existing. 6 is an exact dup of existing 1; 19 a near dup (j=0.5)
    // of existing 2; 24 novel.
    val d = docsDir(Seq(
      (1L, "a b c d e", "en", "s1"),
      (2L, "p q r s t", "en", "s1"),
      (6L, "a b c d e", "en", "s1"),   // incoming, exact dup of 1
      (19L, "p q r s x", "en", "s1"),  // incoming, near dup of 2
      (24L, "m n o k l", "en", "s1"))) // incoming, novel
    val got = TextOps.q415IncrementalDedup(spark, d).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Long]("incoming") === 3L)
    assert(r.getAs[Long]("exact_dup") === 1L)
    assert(r.getAs[Long]("near_dup") === 1L)
    assert(r.getAs[Long]("novel") === 1L)
    assert(r.getAs[Long]("novel_ppm") === 333333L)
  }

  test("q416 token gini: uniform source scores 0, one-doc-takes-all approaches max") {
    // s1: three docs of 5 tokens each -> G = (2*(5+10+15) - 4*15)/(3*15) = 0
    // s2: token counts 1,1,8 sorted -> 2*(1+2+24) - 4*10 = 14; /(3*10)
    //   -> G_ppm = 14_000_000 div 30 = 466666
    val d = docsDir(Seq(
      (1L, Seq.fill(5)("w").mkString(" "), "en", "s1"),
      (2L, Seq.fill(5)("w").mkString(" "), "en", "s1"),
      (3L, Seq.fill(5)("w").mkString(" "), "en", "s1"),
      (4L, "w", "en", "s2"),
      (5L, "w", "en", "s2"),
      (6L, Seq.fill(8)("w").mkString(" "), "en", "s2")))
    val got = CorpusStatOps.q416TokenGini(spark, d).collect()
      .map(r => r.getAs[String]("source") -> ((r.getAs[Long]("docs"),
        r.getAs[Long]("tokens"), r.getAs[Long]("gini_ppm")))).toMap
    assert(got("s1") === ((3L, 15L, 0L)))
    assert(got("s2") === ((3L, 10L, 466666L)))
  }

  test("q419 vocabulary growth: nested id-range prefixes count exact types") {
    // doc_id 0..7 -> lo=0, hi=7, span 8; cutoff(e) = (8*e) div 8 = e,
    // so prefixes are ids {0}, {0,1}, {0..3}, {0..7}. doc i carries
    // tokens t0..t(i): vocab(prefix e) = e (types t0..t(e-1) from docs
    // 0..e-1? no: doc i introduces type ti, so prefix of e docs has
    // types t0..t(e-1) -> vocab = e) and tokens = 1+2+...+e = e(e+1)/2.
    val d = docsDir((0L to 7L).map(i =>
      (i, (0L to i).map(j => s"t$j").mkString(" "), "en", "s1")))
    val got = CorpusStatOps.q419VocabGrowth(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    def row(e: Long) = {
      val toks = e * (e + 1) / 2
      (e, e, toks, e, 1000000L * e / toks)
    }
    assert(got.toSeq === Seq(row(1), row(2), row(4), row(8)))
  }

  test("q420 padding audit: hand-computed blocks and pad at each cap") {
    // ntok 5, 16, 17. cap 16: blocks 1+1+2=4, slots 64, pad = 1e6 -
    // (38e6 div 64) = 406250. cap 32: blocks 3, slots 96 -> 604167.
    // cap 64: blocks 3, slots 192 -> 802084.
    val d = docsDir(Seq(
      (1L, (1 to 5).map(i => s"w$i").mkString(" "), "en", "s1"),
      (2L, (1 to 16).map(i => s"w$i").mkString(" "), "en", "s1"),
      (3L, (1 to 17).map(i => s"w$i").mkString(" "), "en", "s1")))
    val got = CorpusStatOps.q420PaddingAudit(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      (16L, 3L, 38L, 4L, 64L, 406250L),
      (32L, 3L, 38L, 3L, 96L, 604167L),
      (64L, 3L, 38L, 3L, 192L, 802084L)))
  }

  test("q421 cap pricing: hand-computed df histogram mass at each cap") {
    // three copies of "x y z" -> one shingle with df=3; "a b c d" -> two
    // df=1 shingles. postings 5, pair mass C(3,2)=3.
    // cap 1/2: keep the two df=1 types -> 2/5 postings (400000 ppm),
    // pair mass kept 0 / dropped 3; cap 5: everything kept, incl. the
    // df=3 shingle's C(3,2)=3 pair mass.
    val d = docsDir(Seq(
      (1L, "x y z", "en", "s1"), (2L, "x y z", "en", "s1"),
      (3L, "x y z", "en", "s1"), (4L, "a b c d", "en", "s1")))
    val got = CorpusStatOps.capPricing(
      graft.Tables.documents(spark, d), Seq(1L, 2L, 5L)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      (1L, 2L, 3L, 400000L, 0L, 3L),
      (2L, 2L, 3L, 400000L, 0L, 3L),
      (5L, 3L, 3L, 1000000L, 3L, 0L)))
  }

  test("q422 length drift: disjoint tail buckets score the full L1") {
    // lo=0, hi=3 -> half cut at doc_id 2. Half a: ntok 4 (bucket 0) and
    // 20 (bucket 2); half b: ntok 5 (bucket 0) and 100 (bucket 12).
    // Bucket 0 shares match (500000 each); buckets 2 and 12 are
    // exclusive -> L1 = 500000 + 500000 = 1000000.
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val d = docsDir(Seq(
      (0L, words(4), "en", "s1"), (1L, words(20), "en", "s1"),
      (2L, words(5), "en", "s1"), (3L, words(100), "en", "s1")))
    val got = CorpusStatOps.q422LengthDrift(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(("s1", 2L, 2L, 1000000L)))
  }

  test("q422 length drift: a fully one-sided source reads as maximal drift, not null") {
    // lo=0, hi=3 -> half cut at doc_id 2. Source s2 lives entirely in
    // half a: its per-half share is undefined (div by zero) — the guard
    // must report the total-variation bound 1000000, never null.
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val d = docsDir(Seq(
      (0L, words(4), "en", "s2"), (1L, words(20), "en", "s2"),
      (2L, words(5), "en", "s1"), (3L, words(100), "en", "s1")))
    val got = CorpusStatOps.q422LengthDrift(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.isNullAt(3), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("s1", 0L, 2L, false, 1000000L), ("s2", 2L, 0L, false, 1000000L)))
  }
}
