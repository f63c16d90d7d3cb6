package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Planted-fixture tests for the round-8g batch (q314-q315). */
class SegmentedTrendLpaCommunitiesSpec extends SparkSpec {

  test("q314 finds the planted break and the per-segment slopes exactly") {
    import spark.implicits._
    // 20 days: days 1-10 flat at 10 units; days 11-20 jump to 210 units
    // and climb mildly (210,220,...,300) — a genuine LEVEL SHIFT, so the
    // mean-shift objective splits exactly at day 10 (a pure ramp would
    // legitimately split mid-ramp instead). On the x grid (x = units*10):
    // slope before = 0; after = 100 x-units/day -> 100_000_000 ppm.
    val d = Files.createTempDirectory("graft_r8g_ord").toString
    (1 to 20).map { day =>
      val units = if (day <= 10) 10L else 210L + (day - 11) * 10L
      (day.toLong, units * 1e6, Timestamp.valueOf(f"2024-01-$day%02d 00:00:00"))
    }.toDF("o_orderkey", "o_totalprice", "o_orderdate")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    val got = GraphMiningOps.q314SegmentedTrend(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(5))))
      .toMap
    assert(got("before") === ((10L, 10L, 0L)))
    assert(got("after")._1 === 10L)
    assert(got("after")._3 === 100000000L)
  }

  test("q315 LPA: two planted bicliques converge to exactly two communities") {
    import spark.implicits._
    val edges = Seq(
      (1L, 101L), (1L, 102L), (2L, 101L), (2L, 102L),
      (5L, 105L), (5L, 106L), (6L, 105L), (6L, 106L)).toDF("ck", "pk")
    val got = GraphMiningOps.lpaCommunities(edges, rounds = 3).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // r0: 8 disjoint labels; r1 on: each biclique floods to its min part
    // label (2*101+1 = 203, 2*105+1 = 211) and stays there.
    assert(got.toSeq === Seq(
      (0, 8L, 2L, 1L),
      (1, 2L, 203L, 4L),
      (2, 2L, 203L, 4L),
      (3, 2L, 203L, 4L)))
  }
}
