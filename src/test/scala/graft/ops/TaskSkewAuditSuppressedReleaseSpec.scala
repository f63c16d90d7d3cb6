package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8al batch (q381-q382). */
class TaskSkewAuditSuppressedReleaseSpec extends SparkSpec {

  test("q381 task-skew audit: hot key drives the max bucket exactly") {
    import spark.implicits._
    // keys: 1 x 10 rows, 33 x 4 rows (same bucket 1 under mod 32!),
    // 2 x 6 rows -> bucket 1 load 14, bucket 2 load 6
    val rows = (Seq.fill(10)(1L) ++ Seq.fill(4)(33L) ++ Seq.fill(6)(2L))
      .toDF("k")
    val r = CapacityAuditOps.taskSkewAudit(rows, "k", p = 32, rowBytes = 100L)
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((32L, 20L, 3L, 2L)))
    assert(r.getLong(4) === 10L)             // max single key
    assert(r.getLong(5) === 14L)             // max bucket (1 + 33 collide)
    // skew = 1e6 * 14 * 32 / 20 = 22400000
    assert(r.getLong(6) === 22400000L)
    assert(r.getLong(7) === 1400L)
  }

  test("q381 task-skew audit: uniform keys sit near even") {
    import spark.implicits._
    val rows = (0L until 320L).map(i => i % 32L).toDF("k")
    val r = CapacityAuditOps.taskSkewAudit(rows, "k", p = 32, rowBytes = 8L)
      .collect()(0)
    assert(r.getLong(5) === 10L)
    assert(r.getLong(6) === 1000000L)        // perfectly even
  }

  test("q382 suppression release: small cells ship NULLs with the flag") {
    import spark.implicits._
    val cust = ((1 to 25).map(i => (1L, "BIG", 100.0)) ++
      (1 to 3).map(i => (2L, "SMALL", 50.0)))
      .toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val got = CapacityAuditOps.suppressedRelease(cust, k = 20L).collect()
    assert(got.length === 2)
    val big = got.find(_.getString(1) == "BIG").get
    assert((big.getLong(2), big.getLong(3), big.getBoolean(4))
      === ((25L, 250000L, false)))
    val small = got.find(_.getString(1) == "SMALL").get
    assert(small.isNullAt(2) && small.isNullAt(3) && small.getBoolean(4))
    assert(got.forall(r => (r.getLong(5), r.getLong(6)) === ((2L, 1L))))
  }
}
