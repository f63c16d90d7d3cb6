package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8an batch (q385-q386). */
class HampelFilterOovAuditSpec extends SparkSpec {

  test("q385 Hampel: a planted spike is flagged with exact med/mad") {
    import spark.implicits._
    // 15 quiet days of 10 orders, day 8 spikes to 30:
    // day 8 window = [10,10,10,30,10,10,10] -> med 10, mad 0 -> floor 1
    // dev 20 > 3*max(0,->1) -> flagged
    val days = (1 to 15).map(i => (f"2024-01-$i%02d", if (i == 8) 30 else 10))
    val orders = days.flatMap { case (d, k) => Seq.fill(k)(d) }
      .toDF("o_orderdate")
    val got = CorpusStatOps.hampel(orders).collect()
    val top = got(0)
    assert(top.getString(0) === "2024-01-08")
    assert((top.getLong(1), top.getLong(2), top.getLong(3), top.getLong(4),
      top.getBoolean(5)) === ((30L, 10L, 0L, 20L, true)))
    // neighbors see the spike in their window but their own dev is 0
    assert(got.drop(1).forall(!_.getBoolean(5)))
  }

  test("q385 Hampel: gentle trend is never flagged") {
    import spark.implicits._
    val days = (1 to 14).map(i => (f"2024-02-$i%02d", 10 + i))
    val orders = days.flatMap { case (d, k) => Seq.fill(k)(d) }
      .toDF("o_orderdate")
    val got = CorpusStatOps.hampel(orders).collect()
    assert(got.nonEmpty && got.forall(!_.getBoolean(5)))
  }

  test("q386 OOV audit: threshold vocabulary and per-source ppm are exact") {
    import spark.implicits._
    // global freq: common x8 (f=8 across sources), mid x3, rare1/rare2 x1
    // budget 2 -> cum_ge: f=8 ->1, f=3 ->2, f=1 ->4; f* = 3, vocab = 2
    // s1 tokens: common x5, mid x3 -> oov 0
    // s2 tokens: common x3, rare1, rare2 -> oov 2/5 = 400000 ppm
    val docs = Seq(
      (1L, ("common common common common common mid mid mid"), "s1"),
      (2L, "common common common rare1 rare2", "s2"))
      .toDF("doc_id", "text", "source")
    val got = CorpusStatOps.oovAudit(docs, budget = 2L).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(got("s1") === ((8L, 0L, 3L, 2L, 0L)))
    assert(got("s2") === ((5L, 2L, 3L, 2L, 400000L)))
  }

  test("q386 OOV audit: a budget covering everything yields zero OOV") {
    import spark.implicits._
    val docs = Seq((1L, "a b c a", "s")).toDF("doc_id", "text", "source")
    val r = CorpusStatOps.oovAudit(docs, budget = 100L).collect()(0)
    assert(r.getLong(2) === 0L && r.getLong(5) === 0L)
    assert(r.getLong(4) === 3L)   // vocab covers all 3 types
  }
}
