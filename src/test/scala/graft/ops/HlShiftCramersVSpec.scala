package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8af batch (q369-q370). */
class HlShiftCramersVSpec extends SparkSpec {

  test("q369 Hodges-Lehmann: hand-computed pairwise difference median") {
    import spark.implicits._
    // A = {1,2}, B = {4,6}: diffs sorted [2,3,4,5], low median = 3
    val rows = Seq(("A", 1L), ("A", 2L), ("B", 4L), ("B", 6L)).toDF("g", "v")
    val r = InferenceTestOps.hlShift(rows).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6))
      === ((2L, 2L, 4L, 4L, 0L, 0L, 3L)))
  }

  test("q369 Hodges-Lehmann: pure shift is recovered exactly") {
    import spark.implicits._
    val a = Seq(1L, 2L, 3L)
    val rows = (a.map(("A", _)) ++ a.map(v => ("B", v + 7L))).toDF("g", "v")
    val r = InferenceTestOps.hlShift(rows).collect()(0)
    assert(r.getLong(6) === 7L)
  }

  test("q369 matches an independent BigInt rank reference") {
    import spark.implicits._
    val av = (1 to 40).map(i => (i * 13L) % 9L)
    val bv = (1 to 55).map(i => (i * 29L) % 11L + 3L)
    val rows = (av.map(("A", _)) ++ bv.map(("B", _))).toDF("g", "v")
    val r = InferenceTestOps.hlShift(rows).collect()(0)
    val diffs = for (x <- av; y <- bv) yield y - x
    val sorted = diffs.sorted
    val want = sorted((sorted.size + 1) / 2 - 1)
    assert(r.getLong(2) === diffs.size.toLong)
    assert(r.getLong(6) === want)
    assert(r.getLong(3) === diffs.count(_ > 0).toLong)
    assert(r.getLong(4) === diffs.count(_ == 0).toLong)
  }

  test("q370 Cramer's V: perfect association gives V = 1, independence 0") {
    import spark.implicits._
    val perfect = (1 to 10).map(i =>
      (if (i % 2 == 0) "x" else "y", if (i % 2 == 0) "p" else "q"))
      .toDF("a", "b")
    val rp = InferenceTestOps.cramersV(perfect, "perf", "a", "b").collect()(0)
    assert(rp.getLong(4) === 10000000L)      // chi2 = N = 10
    assert(rp.getDouble(5) === 1.0)
    val indep = (for {a <- Seq("x", "y"); b <- Seq("p", "q"); _ <- 1 to 5}
      yield (a, b)).toDF("a", "b")
    val ri = InferenceTestOps.cramersV(indep, "ind", "a", "b").collect()(0)
    assert(ri.getLong(4) === 0L)
    assert(ri.getDouble(5) === 0.0)
  }

  test("q370 matches an independent per-cell-floor chi2 reference") {
    import spark.implicits._
    val rows = (1 to 300).map(i => (s"a${i % 4}", s"b${(i * i) % 3}"))
    val r = InferenceTestOps.cramersV(rows.toDF("a", "b"), "gen", "a", "b")
      .collect()(0)
    val cells = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nr = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nc = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nn = rows.size.toLong
    val chi2 = cells.toSeq.map { case ((a, b), obs) =>
      (BigInt(1000000) * obs * obs * nn) / (BigInt(nr(a)) * nc(b))
    }.sum - BigInt(1000000) * nn
    assert(r.getLong(4) === chi2.toLong)
    assert((r.getLong(1), r.getLong(2), r.getLong(3))
      === ((nn, nr.size.toLong, nc.size.toLong)))
  }
}
