package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8aj batch (q377-q378). */
class SimpsonParadoxPassAtKSpec extends SparkSpec {

  test("q377 Simpson detector: textbook reversal flags every stratum") {
    import spark.implicits._
    // S1: A one $10 order vs B ten $8 orders; S2: A ten $2 vs B one $1.
    // A wins inside BOTH strata; B wins pooled -> reversal everywhere.
    val cust = Seq((1L, "S1"), (2L, "S2"))
      .toDF("c_custkey", "c_mktsegment")
    val orders =
      (Seq((1L, "1-URGENT", 10.0)) ++
        Seq.fill(10)((1L, "5-LOW", 8.0)) ++
        Seq.fill(10)((2L, "1-URGENT", 2.0)) ++
        Seq((2L, "5-LOW", 1.0)))
        .toDF("o_custkey", "o_orderpriority", "o_totalprice")
    val got = EvalReplayOps.simpsonDetector(orders, cust).collect()
    assert(got.length === 2)
    assert(got.forall(_.getLong(5) === 1L))      // dir_stratum: A wins
    assert(got.forall(_.getLong(6) === -1L))     // dir_pooled: B wins
    assert(got.forall(_.getBoolean(7)))
    val s1 = got.find(_.getString(0) == "S1").get
    assert((s1.getLong(1), s1.getLong(2), s1.getLong(3), s1.getLong(4))
      === ((1L, 1000L, 10L, 800L)))
  }

  test("q377 Simpson detector: aligned strata do not flag") {
    import spark.implicits._
    val cust = Seq((1L, "S1")).toDF("c_custkey", "c_mktsegment")
    val orders = Seq((1L, "1-URGENT", 10.0), (1L, "5-LOW", 5.0))
      .toDF("o_custkey", "o_orderpriority", "o_totalprice")
    val got = EvalReplayOps.simpsonDetector(orders, cust).collect()
    assert(got.length === 1 && !got(0).getBoolean(7))
  }

  private def teleRef(n: Long, c: Long, k: Int): Long = {
    var r = BigInt(1000000) * (n - c) / n
    for (i <- 1 until k) r = r * (n - c - i) / (n - i)
    (BigInt(1000000) - r).toLong
  }

  test("q378 pass@k matches the telescoped BigInt reference") {
    import spark.implicits._
    val tasks = Seq((10L, 3L), (20L, 0L), (12L, 12L), (10L, 8L), (15L, 1L))
      .toDF("n", "c")
    val r = EvalReplayOps.passAtK(tasks).collect()(0)
    val per = Seq((10L, 3L), (20L, 0L), (12L, 12L), (10L, 8L), (15L, 1L))
    def mean(k: Int) = per.map { case (n, c) => teleRef(n, c, k) }.sum / 5L
    assert(r.getLong(0) === 5L)
    assert((r.getLong(1), r.getLong(2), r.getLong(3))
      === ((mean(1), mean(5), mean(10))))
  }

  test("q378 pass@k boundary: n - c < k lands exactly at 1e6") {
    import spark.implicits._
    // n=10, c=8 -> n-c=2: pass@5 and pass@10 must be exactly 1e6;
    // all-correct task is 1e6 at every k; tasks under n=10 drop
    val tasks = Seq((10L, 8L), (11L, 11L), (9L, 9L)).toDF("n", "c")
    val r = EvalReplayOps.passAtK(tasks).collect()(0)
    assert(r.getLong(0) === 2L)
    assert(r.getLong(2) === 1000000L)
    assert(r.getLong(3) === 1000000L)
  }
}
