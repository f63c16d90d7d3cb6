package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8ab batch (q361-q362). */
class CochranQFdDiscoverySpec extends SparkSpec {

  test("q361 Cochran's Q: hand-computed three-doc fixture") {
    import spark.implicits._
    // doc A passes all three gates (1,1,1); doc B fails only the
    // word-count floor (0,1,1); doc C passes only the max-length cap
    // (0,0,1). G=(1,2,3) T=6 sumG2=14 sumL2=14
    // Q = 2*(3*14-36)/(3*6-14) = 12/4 = 3
    val docs = Seq(
      (1L, Seq.fill(50)("aaaaa").mkString(" ")),
      (2L, Seq.fill(10)("aaaaa").mkString(" ")),
      (3L, "a b"))
      .toDF("doc_id", "text")
    val r = InferenceTestOps.cochranQ(docs).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) === ((3L, 1L, 2L, 3L, 6L, 14L)))
    assert(r.getLong(6) === 3000000L)
  }

  test("q361 Cochran's Q: all-concordant corpus yields NULL Q") {
    import spark.implicits._
    val docs = Seq((1L, Seq.fill(60)("word").mkString(" ")),
      (2L, Seq.fill(70)("other").mkString(" ")))
      .toDF("doc_id", "text")
    val r = InferenceTestOps.cochranQ(docs).collect()(0)
    assert(r.getLong(4) === 6L)      // both docs pass all 3 gates
    assert(r.isNullAt(6))
  }

  test("q362 FD audit: exact dependency holds with zero violations") {
    import spark.implicits._
    val df = Seq(("b1", "m1"), ("b1", "m1"), ("b2", "m2"), ("b3", "m1"))
      .toDF("brand", "mfgr")
    val r = InferenceTestOps.fdAudit(df, "t.brand->mfgr", "brand", "mfgr")
      .collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getBoolean(6)) === ((4L, 3L, 0L, 0L, 0L, true)))
  }

  test("q362 FD audit: minimal-repair violation count is exact") {
    import spark.implicits._
    // a1 -> {x:3, y:1} violates with 1 repair row; a2 -> {x:2} clean
    val df = Seq(("a1", "x"), ("a1", "x"), ("a1", "x"), ("a1", "y"),
      ("a2", "x"), ("a2", "x"))
      .toDF("a", "b")
    val r = InferenceTestOps.fdAudit(df, "t.a->b", "a", "b").collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === ((6L, 2L, 1L, 1L)))
    assert(r.getLong(5) === 166666L)      // (1e6*1) div 6
    assert(!r.getBoolean(6))
  }

  test("q362 matches an independent reference on a generated pair table") {
    import spark.implicits._
    val rows = (1 to 200).map { i =>
      (s"a${i % 7}", s"b${(i * i) % 5}")
    }
    val r = InferenceTestOps.fdAudit(rows.toDF("a", "b"), "gen", "a", "b")
      .collect()(0)
    val byA = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val na = byA.view.mapValues(_.size.toLong).toMap
    val maxc = byA.view.mapValues(vs =>
      vs.groupBy(identity).values.map(_.size.toLong).max).toMap
    val viol = na.keys.toSeq.map(k => na(k) - maxc(k)).sum
    val violGroups = byA.count(_._2.distinct.size > 1).toLong
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === ((200L, byA.size.toLong, violGroups, viol)))
  }
}
