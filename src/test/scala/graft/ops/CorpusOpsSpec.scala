package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions.array_contains

/** Planted-content corpus for the fourth-wave pipeline operators: a known
  * email for redaction, a shared boilerplate phrase for the corpus-frequency
  * filter, and a 40-token doc for chunk-boundary arithmetic.
  */
class CorpusOpsSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private lazy val corpusDir: String = {
    import spark.implicits._
    val d1 = "please mail me at bob@corp.io for details on the offer"
    val boiler = "subscribe to our newsletter now"
    val d5 = (1 to 40).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, d1, "en", "src0", d1.length.toLong),
      (2L, s"$boiler alpha beta gamma", "en", "src0", 0L),
      (3L, s"$boiler delta epsilon zeta", "en", "src1", 0L),
      (4L, s"$boiler eta theta iota", "en", "src0", 0L),
      (5L, d5, "en", "src1", d5.length.toLong),
      (6L, d5, "en", "src0", d5.length.toLong)) // exact dup of 5 (split-leakage probe)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft_corpus").toString
    docs.coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("PII redaction replaces the planted email and counts it") {
    val rows = CorpusOps.q85PiiRedact(spark, corpusDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("red_md5"), r.getAs[Int]("n_pii")))).toMap
    assert(rows(1L)._2 === 1)
    assert(rows(1L)._1 ===
      md5hex("please mail me at <EMAIL> for details on the offer"))
    // untouched docs hash to their original text, zero redactions
    assert(rows(5L)._2 === 0)
    assert(rows(5L)._1 === md5hex((1 to 40).map(i => s"t$i").mkString(" ")))
  }

  test("boilerplate share flags exactly the docs sharing the planted phrase") {
    val rows = CorpusOps.q87Boilerplate(spark, corpusDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_boiler")).toMap
    // "subscribe to our newsletter now" contributes 3 word-3-grams, each in
    // 3 distinct docs (df=3 ≥ threshold); every other gram is unique.
    assert(rows(2L) === 3L && rows(3L) === 3L && rows(4L) === 3L)
    assert(rows(1L) === 0L && rows(5L) === 0L)
  }

  test("chunking tiles a 40-token doc as 32/24/8 at stride 16") {
    val chunks = CorpusOps.q88Chunk(spark, corpusDir).collect()
      .filter(_.getAs[Long]("doc_id") == 5L)
      .map(r => (r.getAs[Int]("start"), r.getAs[Int]("n_tok")))
    assert(chunks.toSeq === Seq((1, 32), (17, 24), (33, 8)))
    // every chunk stays within the doc and the last chunk reaches the end
    assert(chunks.map { case (s, n) => s + n - 1 }.max === 40)
  }

  test("sequence packing is gapless: each doc starts where the previous one ended") {
    val rows = CorpusOps.q95Pack(spark, corpusDir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tok"), r.getAs[Long]("bin_start"),
        r.getAs[Long]("bin_end"), r.getAs[Long]("off_in_bin")))
    for ((_, shard) <- rows.groupBy(_._1)) {
      val byId = shard.sortBy(_._2)
      val absStarts = byId.map { case (_, _, _, binStart, _, off) => binStart * 2048 + off }
      val expected = byId.map(_._3).scanLeft(0L)(_ + _).init // running starts
      assert(absStarts.toSeq === expected.toSeq)
      assert(byId.forall { case (_, _, _, bs, be, _) => be >= bs })
    }
  }

  test("content-hash split puts exact duplicates in the same split") {
    val rows = CorpusOps.q90Split(spark, corpusDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(rows(5L) === rows(6L)) // same text → same split, no leakage
    assert(rows.values.forall(Set("train", "val", "test")))
  }

  test("q129 relational division keeps exactly the docs containing every term") {
    val dir = "/root/testdata/sf0.001"
    val got = CorpusOps.q129Division(spark, dir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val expected = graft.Tables.documents(spark, dir)
      .filter(Seq("scan", "join", "hash")
        .map(t => array_contains(TextOps.toks, t)).reduce(_ && _))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got === expected)
    assert(got.nonEmpty)
    // and it excludes docs matching only a strict subset of the terms
    val partial = graft.Tables.documents(spark, dir)
      .filter(array_contains(TextOps.toks, "scan") && !array_contains(TextOps.toks, "join"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(partial.nonEmpty && partial.forall(!got.contains(_)))
  }

  /** docs with controlled (source, n_chars) only — q133 reads nothing else. */
  private def psiDir(refLens: Seq[Long], curLens: Seq[Long]): String = {
    import spark.implicits._
    val rows =
      refLens.zipWithIndex.map { case (n, i) => (i.toLong, "x", "en", "src0", n) } ++
        curLens.zipWithIndex.map { case (n, i) =>
          (1000L + i, "x", "en", "src10", n)
        }
    val d = Files.createTempDirectory("graft_psi").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("q133 PSI is exactly zero for identical distributions, 'major' under a full shift") {
    val same = CorpusOps.q133PsiDrift(spark,
      psiDir(Seq(60L, 160L, 260L), Seq(60L, 160L, 260L))).collect().head
    assert(same.getAs[Double]("psi") === 0.0)
    assert(same.getAs[String]("drift_band") === "stable")
    // ref mass all in bin 1, cur mass all in bin 11 → large PSI
    val shifted = CorpusOps.q133PsiDrift(spark,
      psiDir(Seq.fill(4)(60L), Seq.fill(4)(580L))).collect().head
    assert(shifted.getAs[Double]("psi") > 0.25)
    assert(shifted.getAs[String]("drift_band") === "major")
  }

  test("q153 readability matches the hand-computed Flesch millis") {
    import spark.implicits._
    // "the quick brown fox. it jumps!" → w=6, sentences=2, vowel groups=6
    // flesch = 206.835 − 1.015·(6/2) − 84.6·(6/6) = 119.19 → 119190 millis
    val d = Files.createTempDirectory("graft_read").toString
    Seq((1L, "the quick brown fox. it jumps!", "en", "src0", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val r = CorpusOps.q153Readability(spark, d).collect().head
    assert(r.getAs[Int]("n_words") === 6)
    assert(r.getAs[Int]("n_sentences") === 2)
    assert(r.getAs[Int]("n_syllables") === 6)
    assert(r.getAs[Long]("wps_milli") === 3000L)
    assert(r.getAs[Long]("spw_milli") === 1000L)
    assert(r.getAs[Long]("flesch_milli") === 119190L)
  }

  test("q134 PMI scores the planted collocation and enforces min support") {
    import spark.implicits._
    // alpha∧beta in 6 docs, alpha alone in 2 more (df_a=8, df_b=6, N=20);
    // gamma∧delta co-occur only 4 times — below the support-5 gate.
    val rows =
      (1 to 6).map(i => (i.toLong, s"alpha beta f$i", "en", "src0", 10L)) ++
        (7 to 8).map(i => (i.toLong, s"alpha f$i", "en", "src0", 10L)) ++
        (9 to 12).map(i => (i.toLong, s"gamma delta f$i", "en", "src0", 10L)) ++
        (13 to 20).map(i => (i.toLong, s"u$i v$i", "en", "src0", 10L))
    val d = Files.createTempDirectory("graft_pmi").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val got = CorpusOps.q134PmiPairs(spark, d).collect()
    assert(got.length === 1) // gamma/delta and all filler pairs gated out
    val r = got.head
    assert(r.getAs[String]("t1") === "alpha" && r.getAs[String]("t2") === "beta")
    assert(r.getAs[Long]("c_ab") === 6L)
    // pmi = ln(N·c_ab/(df_a·df_b)) = ln(20·6/(8·6)) = ln(2.5)
    assert(r.getAs[Double]("pmi") === math.rint(math.log(2.5) * 1e6) / 1e6)
  }
}
