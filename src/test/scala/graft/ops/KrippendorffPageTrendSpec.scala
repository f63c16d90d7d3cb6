package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8ad batch (q365-q366). */
class KrippendorffPageTrendSpec extends SparkSpec {

  test("q365 Krippendorff: hand-computed alpha with a missing-rating unit") {
    import spark.implicits._
    // d1: all three gates pass -> (1,1,1); d2: (0,0,1); d3: empty doc,
    // raters 2-3 abstain, m = 1 -> dropped.
    // O = 2, n = 6, n_1 = 4, n_0 = 2
    // alpha = 1 - 2*5/(2*2*4) = 0.375
    val docs = Seq(
      (1L, Seq.fill(60)("word").mkString(" ")),
      (2L, "aa bb"),
      (3L, ""))
      .toDF("doc_id", "text")
    val r = InferenceTestOps.krippendorff(docs).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((2L, 6L, 2L, 4L, 2L)))
    assert(r.getLong(5) === 375000L)
  }

  test("q365 Krippendorff: unanimous corpus yields NULL (degenerate margin)") {
    import spark.implicits._
    val docs = Seq((1L, Seq.fill(60)("word").mkString(" ")),
      (2L, Seq.fill(55)("verse").mkString(" ")))
      .toDF("doc_id", "text")
    val r = InferenceTestOps.krippendorff(docs).collect()(0)
    assert(r.getLong(2) === 0L)     // n_0 = 0
    assert(r.isNullAt(5))
  }

  test("q366 Page's L: perfect weekly ramp, hand-computed z") {
    import spark.implicits._
    // 2024-01-01 is a Monday; two complete weeks with j orders on
    // weekday j: per block L2 = 280, T = 112
    // z = 112 / sqrt(14/3 * 224) = 3.464102
    val days = (0 until 14).flatMap { i =>
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(i).toString
      Seq.fill(i % 7 + 1)(d)
    }
    val orders = days.toDF("o_orderdate")
    val r = InferenceTestOps.pageL(orders).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((2L, 560L, 448L, 224L)))
    assert(r.getDouble(4) === 3.464102)
  }

  test("q366 Page's L: tied week contributes E exactly; partial week drops") {
    import spark.implicits._
    // week 1: all days tied (r2 = 8 each) -> L2 = 224, T = 0
    // week 2: perfect ramp -> L2 = 280, T = 112
    // week 3: only 3 days -> dropped
    val wk1 = (0 until 7).flatMap { i =>
      Seq.fill(2)(java.time.LocalDate.of(2024, 1, 1).plusDays(i).toString) }
    val wk2 = (7 until 14).flatMap { i =>
      Seq.fill(i % 7 + 1)(java.time.LocalDate.of(2024, 1, 1).plusDays(i).toString) }
    val wk3 = (14 until 17).map { i =>
      java.time.LocalDate.of(2024, 1, 1).plusDays(i).toString }
    val orders = (wk1 ++ wk2 ++ wk3).toDF("o_orderdate")
    val r = InferenceTestOps.pageL(orders).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((2L, 504L, 448L, 112L)))
    // z = 56 / sqrt(14/3 * 112) = 2.449490
    assert(r.getDouble(4) === 2.449490)
  }
}
