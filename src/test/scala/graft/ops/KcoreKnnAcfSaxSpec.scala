package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-fixture tests for the round-8d batch (q300-q305). */
class KcoreKnnAcfSaxSpec extends SparkSpec {

  test("q300 k-core peel: the planted cascade unravels round by round") {
    import spark.implicits._
    // c3 has degree 1 -> peeled in round 1; that drops p3 to degree 1 ->
    // peeled in round 2; the remaining 2x2 biclique is the (2,2)-core and
    // is stable from round 2 on. Classic k-core cascade.
    val edges = Seq(
      (1L, 101L), (1L, 102L),
      (2L, 101L), (2L, 102L), (2L, 103L),
      (3L, 103L)).toDF("ck", "pk")
    val got = GraphMiningOps.kcorePeel(edges, kc = 2, kp = 2, rounds = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (0, 3L, 3L, 6L),
      (1, 2L, 3L, 5L),
      (2, 2L, 2L, 4L),
      (3, 2L, 2L, 4L),
      (4, 2L, 2L, 4L)))
  }

  test("q301 kNN audit flags exactly the planted mislabeled vector") {
    import spark.implicits._
    // Two tight orthogonal clusters; vec 6 sits in cluster B's cone but
    // carries cluster A's label -> its 3 neighbours all vote label 1 and
    // it is the ONLY noisy probe. Distinct jitter keeps all sims distinct.
    def v(axis: Int, jitter: Float): Array[Float] = {
      val a = Array.fill(4)(0f); a(axis) = 1f; a(3) = jitter; a
    }
    val emb = Seq(
      (0L, 0, v(0, 0.01f)), (1L, 0, v(0, 0.02f)), (2L, 0, v(0, 0.03f)),
      (3L, 1, v(1, 0.01f)), (4L, 1, v(1, 0.02f)), (5L, 1, v(1, 0.03f)),
      (6L, 0, v(1, 0.04f))).toDF("vec_id", "label", "embedding")
    val got = GraphMiningOps.knnLabelAudit(emb, probeEvery = 1, probeCap = 100, k = 3)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(0) === ((4L, 1L, 250000L)))
    assert(got(1) === ((3L, 0L, 0L)))
  }

  test("q302 Good-Turing: planted counts-of-counts and exact r* ppm") {
    import spark.implicits._
    // "a b c a b c" -> 3-grams: "a b c"(x2), "b c a", "c a b";
    // a 2-token doc contributes nothing (the descending-sequence guard).
    val docs = Seq("a b c a b c", "x y").toDF("text")
    val got = GraphMiningOps.goodTuring(docs, maxR = 12)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    // r=1: N_1=2, N_2=1 -> r* = 2*1/2 = 1.0 -> 1_000_000 ppm
    assert(got(1L) === ((2L, 1L, 1000000L)))
    // r=2: N_2=1, N_3=0 -> r* NULL
    assert(got(2L) === ((1L, 0L, -1L)))
    assert(got.size === 2)
  }

  test("q303 ACF: a period-2 series reads r=-1 at lag 1 and r=+1 at lag 2") {
    import spark.implicits._
    val daily = (1 to 20).map { i =>
      (java.sql.Date.valueOf(f"2024-01-$i%02d"),
        if (i % 2 == 0) 20L else 10L)
    }.toDF("d", "x")
    val got = GraphMiningOps.acf(daily, maxLag = 2)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(5)))).toMap
    assert(got(1) === ((19L, -1.0)))
    assert(got(2) === ((18L, 1.0)))
  }

  test("q304 HHI: monopoly reads 1e6 ppm, a 50/50 duopoly reads 5e5") {
    import spark.implicits._
    val li = Seq((1L, 100.00), (2L, 60.00), (3L, 60.00))
      .toDF("l_suppkey", "l_extendedprice")
    val supp = Seq((1L, 10), (2L, 20), (3L, 20)).toDF("s_suppkey", "s_nationkey")
    val nat = Seq((10, "MONO"), (20, "DUO")).toDF("n_nationkey", "n_name")
    val got = GraphMiningOps.hhi(li, supp, nat)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got("MONO") === ((1L, 1000000L, 1000000L, 100L)))
    assert(got("DUO") === ((2L, 500000L, 500000L, 200L)))
  }

  test("q305 SAX: monotone fortnight symbolizes to the two expected words") {
    import spark.implicits._
    // 2024-01-01 is a Monday; 14 strictly increasing days -> ntile(4)
    // buckets of 4/4/3/3 -> week 1 = aaaabbb, week 2 = bcccddd.
    val daily = (1 to 14).map { i =>
      (java.sql.Date.valueOf(f"2024-01-$i%02d"), i * 100L)
    }.toDF("d", "cents")
    val got = GraphMiningOps.saxMotifs(daily)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("aaaabbb" -> 1L, "bcccddd" -> 1L))
  }
}
