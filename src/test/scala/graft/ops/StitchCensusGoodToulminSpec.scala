package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8ag batch (q371-q372). */
class StitchCensusGoodToulminSpec extends SparkSpec {

  test("q371 stitch census: planted tail-head continuation is found") {
    import spark.implicits._
    val aToks = (1 to 20).map(i => s"w$i")
    val bToks = aToks.takeRight(5) ++ (1 to 15).map(i => s"x$i")
    val noise = (1 to 18).map(i => s"n$i")
    val docs = Seq(
      (1L, aToks.mkString(" ")),
      (2L, bToks.mkString(" ")),
      (3L, noise.mkString(" ")))
      .toDF("doc_id", "text")
    val got = EvalReplayOps.stitchCensus(docs).collect()
    assert(got.length === 1)
    val r = got(0)
    assert((r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((5, 1L, 1L, 1L)))
  }

  test("q371 stitch census: hot boundary keys are capped out") {
    import spark.implicits._
    // 1001 docs all ending with the same 2 tokens -> tail key df > 1000
    val docs = ((1 to 1001).map { i =>
      (i.toLong, ((1 to 16).map(j => s"t${i}_$j") ++ Seq("end", "key"))
        .mkString(" "))
    } :+ (2000L, (Seq("end", "key") ++ (1 to 16).map(i => s"z$i"))
      .mkString(" ")))
      .toDF("doc_id", "text")
    assert(EvalReplayOps.stitchCensus(docs).collect().isEmpty)
  }

  test("q372 Good-Toulmin: hand-computed count-of-counts fixture") {
    import spark.implicits._
    // tokens a, b once; c twice; d three times:
    // V1=2 V2=1 V3=1 -> gt = 2-1+1 = 2; chao1 = 4 // 2 = 2
    val docs = Seq((1L, "a b c c d d d")).toDF("doc_id", "text")
    val r = EvalReplayOps.goodToulmin(docs).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6))
      === ((7L, 4L, 2L, 1L, 2L, 2L, 2L)))
  }

  test("q372 matches an independent reference on a generated corpus") {
    import spark.implicits._
    val words = (1 to 400).map(i => s"tok${(i * i * 7) % 97}")
    val docs = words.grouped(25).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val r = EvalReplayOps.goodToulmin(docs).collect()(0)
    val freq = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val coc = freq.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val gt = coc.toSeq.map { case (f, vm) =>
      if (f % 2 == 1) vm else -vm }.sum
    val v1 = coc.getOrElse(1L, 0L); val v2 = coc.getOrElse(2L, 0L)
    assert(r.getLong(0) === 400L)
    assert(r.getLong(1) === freq.size.toLong)
    assert(r.getLong(4) === gt)
    if (v2 > 0) assert(r.getLong(6) === v1 * v1 / (2 * v2))
  }
}
