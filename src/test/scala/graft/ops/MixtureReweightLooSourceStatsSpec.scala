package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-fixture tests for the round-8l batch (q329-q330). */
class MixtureReweightLooSourceStatsSpec extends SparkSpec {

  test("q329 mixture reweighting matches the exact integer recursion") {
    import spark.implicits._
    // source A: 2 docs x 2 tokens (below the corpus mean -> upweighted);
    // source B: 2 docs x 6 tokens.
    val docs = Seq(
      ("A", "x y"), ("A", "x z"),
      ("B", "a b c d e f"), ("B", "a b c d e g")).toDF("source", "text")
    val got = CorpusStatOps.mixtureReweight(docs, rounds = 3).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // independent reference: the same fixed-point recursion in BigInt
    val m = Map("A" -> BigInt(2000000), "B" -> BigInt(6000000))
    val gm = BigInt(1000000) * 16 / 4
    val e = m.view.mapValues(v => (gm - v).max(BigInt(0))).toMap
    var w = Map("A" -> BigInt(1000000), "B" -> BigInt(1000000))
    val traj = (1 to 3).map { _ =>
      val up = w.map { case (s, v) => s -> v * (BigInt(1000000) + e(s) / 4) / 1000000 }
      val sw = up.values.sum
      w = up.map { case (s, v) => s -> BigInt(1000000) * 2 * v / sw }
      w
    }
    for (s <- Seq("A", "B")) {
      assert(got(s)._1 === 2L)                       // n_docs
      assert(got(s)._2 === m(s).toLong / 1)          // m_ppm
      assert(got(s)._3 === e(s).toLong)              // e_ppm
      assert((got(s)._4, got(s)._5, got(s)._6) ===
        ((traj(0)(s).toLong, traj(1)(s).toLong, traj(2)(s).toLong)))
    }
  }

  test("q330 LOO source stats: sole types and subtraction ratios are exact") {
    import spark.implicits._
    // A: "a b" (tok 2, sole type a); B: "b c c" (tok 3, sole type c);
    // gt=5, gv=3, d1 = 600000.
    val docs = Seq(("A", "a b"), ("B", "b c c")).toDF("source", "text")
    val got = CorpusStatOps.looSourceStats(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(got("A") === ((1L, 2L, 1L, 3000000L, 600000L, 666666L, 66666L)))
    assert(got("B") === ((1L, 3L, 1L, 2000000L, 600000L, 1000000L, 400000L)))
  }
}
