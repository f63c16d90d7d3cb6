package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8ai batch (q375-q376). */
class BroadcastAdvisorShufflePlannerSpec extends SparkSpec {

  test("q375 broadcast advisor: exact byte accounting and verdicts") {
    import spark.implicits._
    val dim = Seq((1L, "ab"), (2L, "cde"), (3L, "fghi"))
      .toDF("k", "name")
    // var = 2+3+4 = 9; fixed = 8*1*3 = 24 -> est 33
    val got = CapacityAuditOps.broadcastAdvisor(
      Seq(("small", dim, Seq("name"), 1), ("big", dim, Seq("name"), 1)),
      thresholdBytes = 33L).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(4), r.getLong(5)))).toMap
    assert(got("small") === ((3L, 33L, "broadcast", 100L)))
    val tight = CapacityAuditOps.broadcastAdvisor(
      Seq(("over", dim, Seq("name"), 1)), thresholdBytes = 32L).collect()(0)
    assert(tight.getString(4) === "shuffle")
    assert(tight.getLong(5) === 103L)    // (100*33) div 32
  }

  test("q376 shuffle planner: ceil-div partition sizing with clamps") {
    import spark.implicits._
    val wide = (1 to 10).map(i => (i.toLong, "x" * 100)).toDF("k", "t")
    val got = CapacityAuditOps.shufflePlanner(
      Seq(("s1", wide, Seq("t"), 1)), targetBytes = 300L).collect()(0)
    // bytes = 1000 + 80 = 1080 -> parts = ceil(1080/300) = 4
    assert((r0(got, 1), r0(got, 2), r0(got, 3), r0(got, 4))
      === ((10L, 1080L, 4L, 3L)))
    val tiny = CapacityAuditOps.shufflePlanner(
      Seq(("s2", wide, Nil, 1)), targetBytes = 1L << 30).collect()(0)
    assert(r0(tiny, 3) === 1L)           // clamped to >= 1
  }

  private def r0(r: org.apache.spark.sql.Row, i: Int): Long = r.getLong(i)
}
