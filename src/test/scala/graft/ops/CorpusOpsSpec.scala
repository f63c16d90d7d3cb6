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
}
