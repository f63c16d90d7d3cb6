package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-fixture tests for the round-8e batch (q306-q309). */
class KneserNeyNeymanBitmapSpec extends SparkSpec {

  test("q306 Kneser-Ney: hand-computed smoothed ppm on a 2-bigram corpus") {
    import spark.implicits._
    // "a b a b" -> bigrams (a,b)x2, (b,a)x1; T=2.
    // P(b|a) = (2-3/4)/2 + (3/4 * 1/2)*(1/2) = 0.8125
    // P(a|b) = (1-3/4)/1 + (3/4 * 1/1)*(1/2) = 0.625
    val docs = Seq("a b a b").toDF("text")
    val got = CorpusStatOps.knBigrams(docs, topK = 10).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(got(("a", "b")) === ((2L, 2L, 1L, 1L, 812500L)))
    assert(got(("b", "a")) === ((1L, 1L, 1L, 1L, 625000L)))
    assert(got.size === 2)
  }

  test("q307 Neyman: allocations follow N_h*sigma_h and sum exactly to budget") {
    import spark.implicits._
    // A: cents {0,200} -> w = sqrt(2*40000-200^2) = 200
    // B: cents {0,400} -> w = sqrt(2*160000-400^2) = 400
    // 1000 * (1/3, 2/3) -> bases 333/666, one remainder seat -> B (larger rem)
    val cust = Seq(("A", 0.00), ("A", 2.00), ("B", 0.00), ("B", 4.00))
      .toDF("c_mktsegment", "c_acctbal")
    val got = CorpusStatOps.neymanAllocation(cust, budget = 1000).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got("A") === ((2L, 20000L, 333333L, 333L)))
    assert(got("B") === ((2L, 40000L, 666666L, 667L)))
    assert(got.values.map(_._4).sum === 1000L)
  }

  test("q308 RR debias: observation mass is conserved and the estimator is consistent") {
    import spark.implicits._
    val docs = (1L to 60L).map(i => (i, if (i % 3 == 0) "de" else "en"))
      .toDF("doc_id", "lang")
    val rows = CorpusStatOps.rrDebias(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val n = rows.map(_._2).sum
    assert(n === 60L)
    assert(rows.map(_._3).sum === 60L, "every doc reports exactly one language")
    val k = rows.length.toLong
    rows.foreach { case (_, nTrue, nObs, est, err) =>
      assert(est === 100L * (4L * k * nObs - n) / (3L * k))
      assert(err === est - 100L * nTrue)
    }
    // determinism: the md5 mechanism is partition-invariant
    val again = CorpusStatOps.rrDebias(docs.repartition(7)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("q309 bitmap intersection equals the plain GROUP BY, across word boundaries") {
    import spark.implicits._
    // keys straddle the 62-bit word boundary (61, 62, 124) on purpose
    val orders = Seq(
      (1L, "O", "HI"), (61L, "O", "LO"), (62L, "O", "HI"),
      (63L, "F", "HI"), (124L, "F", "LO"), (125L, "O", "HI"))
      .toDF("o_orderkey", "o_orderstatus", "o_orderpriority")
    val got = CorpusStatOps.bitmapIntersect(orders).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = orders.groupBy("o_orderstatus", "o_orderpriority").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === want)
    assert(got(("O", "HI")) === 3L)
  }
}
