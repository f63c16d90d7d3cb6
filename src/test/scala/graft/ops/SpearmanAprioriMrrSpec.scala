package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Planted-fixture tests for the round-8h batch (q316-q319). */
class SpearmanAprioriMrrSpec extends SparkSpec {

  test("q316 Spearman: perfect inversion is -1, a tied triple matches the hand value") {
    import spark.implicits._
    // segment A: x 1..4, y perfectly reversed -> rho = -1 exactly.
    // segment B: x = (1,1,2) tied pair, y = (10,20,30):
    //   doubled ranks rx = (3,3,6), ry = (2,4,6) -> num=18, dx=18, dy=24,
    //   rho = 18/sqrt(18*24) = 0.8660254... -> pround 6 = 0.866025.
    val base = Seq(
      ("A", 1L, 40L), ("A", 2L, 30L), ("A", 3L, 20L), ("A", 4L, 10L),
      ("B", 1L, 10L), ("B", 1L, 20L), ("B", 2L, 30L)).toDF("segment", "x", "y")
    val got = TrendStatOps.spearmanBySegment(base).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(got("A") === ((4L, -80L, 80L, 80L, -1.0)))
    assert(got("B") === ((3L, 18L, 18L, 24L, 0.866025)))
  }

  test("q317 Apriori: the planted triple survives the prune with exact support and lift") {
    import spark.implicits._
    // baskets: {10,20,30} x2, {10,20,40}, {50}. Frequent pairs keep only
    // {10,20,30}; the sole frequent triple has support 2/4 and lift
    // 4^2*2/(3*3*2) = 16/9 = 1.777778.
    val items = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L), (2L, 30L),
      (3L, 10L), (3L, 20L), (3L, 40L),
      (4L, 50L)).toDF("ok", "p")
    val got = TrendStatOps.aprioriTriples(items, minsup = 2L).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getDouble(5)) === ((10L, 20L, 30L, 2L, 500000L, 1.777778)))
  }

  test("q318 MRR: first relevant at rank 2 gives rr 500000 and full recall") {
    import spark.implicits._
    // query 0 (label 1); best candidate is the WRONG label, the two
    // relevant docs sit at ranks 2 and 3 -> first_rel_rank=2,
    // rr_ppm=500000, hits@10=2, n_rel=2, recall10_ppm=1000000.
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f), 1),
      (100L, Seq(0.99f, 0.01f), 2),
      (101L, Seq(0.9f, 0.1f), 1),
      (102L, Seq(0.0f, 1.0f), 1)).toDF("vec_id", "embedding", "label")
    val got = TrendStatOps.mrrEval(emb, nQueries = 1).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) === ((0L, 2L, 2, 500000L, 2L, 1000000L)))
  }

  test("q319 peak concurrency: in-day triple overlap, midnight split, end-exclusive touch") {
    import spark.implicits._
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val events = Seq(
      (1L, ts(0L)),      // [00:00, 00:30) day 0
      (2L, ts(600L)),    // [00:10, 00:40) -> cum 2
      (3L, ts(1200L)),   // [00:20, 00:50) -> peak 3 at 00:20
      (4L, ts(85800L)),  // 23:50 day 0 -> crosses midnight, piece in day 1
      (5L, ts(87000L)),  // 00:10 day 1 -> overlaps e4's spill -> peak 2
      (6L, ts(90000L)),  // [01:00, 01:30) day 1
      (7L, ts(91800L))   // [01:30, 02:00) touches e6's end: NOT concurrent
    ).toDF("event_id", "ts")
    val got = TrendStatOps.peakConcurrency(events, lenSec = 1800L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (0L, 3L, 1200000000L),
      (1L, 2L, 87000000000L)))
  }
}
