package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8ah batch (q373-q374). */
class CvmTestRegressionToMeanSpec extends SparkSpec {

  test("q373 CvM: hand-computed pooled-grid statistic") {
    import spark.implicits._
    // A = {1,1,2}, B = {2,3}: g_ppm = 666666, 500000, 0 over the grid
    // S = 2*666666^2 + 2*500000^2 = 1388887111112
    // T_ppm = (6*S) // (25*1e6) = 333332
    val rows = Seq(("A", 1L), ("A", 1L), ("A", 2L), ("B", 2L), ("B", 3L))
      .toDF("g", "v")
    val r = InferenceTestOps.cvmTest(rows).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((3L, 2L, 3L, 333332L)))
  }

  test("q373 CvM: identical samples give exactly zero") {
    import spark.implicits._
    val vals = Seq(1L, 2L, 2L, 5L, 9L)
    val rows = (vals.map(("A", _)) ++ vals.map(("B", _))).toDF("g", "v")
    assert(InferenceTestOps.cvmTest(rows).collect()(0).getLong(3) === 0L)
  }

  test("q373 matches an independent BigInt reference") {
    import spark.implicits._
    val av = (1 to 120).map(i => (i * 7L) % 13L)
    val bv = (1 to 80).map(i => (i * 11L) % 17L)
    val rows = (av.map(("A", _)) ++ bv.map(("B", _))).toDF("g", "v")
    val r = InferenceTestOps.cvmTest(rows).collect()(0)
    val grid = (av ++ bv).distinct.sorted
    val n = av.size.toLong; val m = bv.size.toLong
    val s = grid.map { v =>
      val g = BigInt(1000000) * av.count(_ <= v) / n -
        BigInt(1000000) * bv.count(_ <= v) / m
      val t = av.count(_ == v) + bv.count(_ == v)
      BigInt(t) * g * g
    }.sum
    val want = (BigInt(n) * m * s / (BigInt(n + m) * (n + m) * 1000000)).toLong
    assert(r.getLong(3) === want)
  }

  test("q374 regression to the mean: hand-computed two-customer split") {
    import spark.implicits._
    // span 2024-01-01..01-11 -> midpoint 01-06
    val orders = Seq(
      (1L, "2024-01-01", 100.0), (1L, "2024-01-10", 50.0),
      (2L, "2024-01-02", 20.0), (2L, "2024-01-11", 20.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = InferenceTestOps.regressionToMean(orders).collect()
    assert(got.length === 2)
    val r1 = got(0); val r2 = got(1)
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3))
      === ((1L, 10000L, 5000L, 500000L)))
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2), r2.getLong(3))
      === ((2L, 2000L, 2000L, 1000000L)))
    // population ratio 7000/12000 -> 583333, same on every row
    assert(got.forall(_.getLong(4) === 583333L))
  }

  test("q374 top-k selection is rev1-desc with custkey tie-break") {
    import spark.implicits._
    val orders = (1 to 30).map(i =>
      (i.toLong, "2024-01-01", 10.0)) ++ (1 to 30).map(i =>
      (i.toLong, "2024-03-01", 5.0))
    val got = InferenceTestOps.regressionToMean(orders.toDF(
      "o_custkey", "o_orderdate", "o_totalprice")).collect()
    assert(got.length === 20)
    assert(got.map(_.getLong(0)).toSeq === (1L to 20L))
  }
}
