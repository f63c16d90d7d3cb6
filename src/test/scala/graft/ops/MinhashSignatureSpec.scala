package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Non-degeneracy guard for q32's 32-slice md5 minhash family: every
  * slice of the concatenated digest must be a real 8-hex value with
  * per-corpus variation. The failure mode this pins actually happened in
  * round 12: slicing past the digest length yields "" for EVERY doc, so
  * the affected bands become one all-docs bucket and the banded candidate
  * join silently degrades to all-pairs — results stay correct (the exact
  * Jaccard verification rejects non-dups), but the scale shape is gone
  * and nothing else notices. */
class MinhashSignatureSpec extends SparkSpec {
  import spark.implicits._

  test("all 32 minhash slices are 8-hex and vary across docs") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again today"),
      (1L, "a completely different document about spark catalyst optimizer rules"),
      (2L, "yet another text with its own vocabulary of streaming watermarks here"),
      (3L, "fourth sample mentioning parquet footers predicate pushdown and scans"))
      .toDF("doc_id", "text")
    graft.functions.WordShingles.register(spark)
    val sig = TextOps.minhashSignatures(
      docs.select(col("doc_id"), expr(
        "word_shingles(filter(split(lower(text), ' '), t -> t != ''), 3)").as("sh")))
    val checks = (0 until 32).flatMap { i =>
      Seq(countDistinct(col(s"m$i")).as(s"d$i"),
        count_if(col(s"m$i").isNull).as(s"n$i"),
        min(col(s"m$i")).as(s"lo$i"),
        max(col(s"m$i")).as(s"hi$i"))
    }
    val r = sig.agg(checks.head, checks.tail: _*).head()
    (0 until 32).foreach { i =>
      assert(r.getAs[Long](s"d$i") > 1L, s"slice m$i is constant across docs")
      assert(r.getAs[Long](s"n$i") == 0L,
        s"slice m$i has NULLs — offset past the digest?")
      assert(r.getAs[Long](s"lo$i") >= 0L && r.getAs[Long](s"hi$i") <= 0xFFFFFFFFL,
        s"slice m$i outside the 32-bit range")
    }
  }
}
