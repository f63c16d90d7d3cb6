package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8y batch (q355-q356). */
class IccDeffMedianCiSpec extends SparkSpec {

  test("q355 ICC: perfectly clustered groups give ICC 1 and DEFF 1+(m-1)") {
    import spark.implicits._
    val rows = Seq((1L, 10.0), (1L, 10.0), (2L, 20.0), (2L, 20.0))
      .toDF("l_orderkey", "l_extendedprice")
    val r = InferenceTestOps.iccDeff(rows).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((4L, 2L, 0L, 100L)))  // ssw 0; ssb 1e6 cents^2 -> 100 dollars^2
    assert(r.getDouble(4) === 2.0)   // n0
    assert(r.getDouble(5) === 1.0)   // icc
    assert(r.getDouble(6) === 2.0)   // deff = 1 + (4/2 - 1) * 1
  }

  test("q355 identical within-group spread gives the negative-ICC floor") {
    import spark.implicits._
    val rows = Seq((1L, 10.0), (1L, 20.0), (2L, 10.0), (2L, 20.0))
      .toDF("l_orderkey", "l_extendedprice")
    val r = InferenceTestOps.iccDeff(rows).collect()(0)
    assert(r.getLong(2) === 100L && r.getLong(3) === 0L)
    assert(r.getDouble(5) === -1.0 && r.getDouble(6) === 0.0)
  }

  test("q356 median CI: ranks land on hand-computed order statistics") {
    import spark.implicits._
    // 1.00..9.00 -> n=9; med ranks 5/5 -> 500; ci ranks 1 and 9
    val rows = (1 to 9).map(i => ("X", i * 1.0)).toDF("g", "bal")
    val r = InferenceTestOps.medianCi(rows, "bal").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === ((9L, 100L, 500L, 500L, 900L)))
  }

  test("q356 even n takes both middle order statistics") {
    import spark.implicits._
    val rows = (1 to 10).map(i => ("X", i * 1.0)).toDF("g", "bal")
    val r = InferenceTestOps.medianCi(rows, "bal").collect()(0)
    assert(r.getLong(2) === 500L && r.getLong(3) === 600L)
  }
}
