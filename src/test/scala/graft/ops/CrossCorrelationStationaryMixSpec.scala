package graft.ops

import graft.SparkSpec
import java.nio.file.Files
import java.sql.Timestamp

/** Planted-fixture tests for the round-8q batch (q339-q340). */
class CrossCorrelationStationaryMixSpec extends SparkSpec {

  test("q339 CCF: proportional series correlate perfectly at every defined lag") {
    import spark.implicits._
    // day i: i orders of $1e6 -> x=[1..4], y=[10..40] (1e7-cent units)
    val d = Files.createTempDirectory("graft_r8q").toString
    val rows = for { day <- 1 to 4; j <- 1 to day }
      yield ((day * 10 + j).toLong, 1e6, Timestamp.valueOf(f"2024-02-0$day 00:00:00"))
    rows.toDF("o_orderkey", "o_totalprice", "o_orderdate")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    val got = TrendStatOps.q339CrossCorrelation(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    assert(got.length === 4) // lags 0..3 have pairs
    assert(got(0) === ((0L, 4L, 200L, 20L, 2000L, Some(1.0))))
    assert(got(1) === ((1L, 3L, 60L, 6L, 600L, Some(1.0))))
    assert(got(3) === ((3L, 1L, 0L, 0L, 0L, None))) // single pair: undefined r
  }

  test("q340 stationary mix: oscillator stays uniform; biased chain settles at 4:1") {
    import spark.implicits._
    def ev(uid: Long, seq: Seq[String]) = seq.zipWithIndex.map { case (t, i) =>
      (uid * 100 + i, new Timestamp(i * 1000L), uid, t)
    }
    val osc = ev(1L, Seq("A", "B", "A", "B", "A"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val g1 = TrendStatOps.stationaryMix(osc, iters = 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(g1.toSeq === Seq(("A", 500000L), ("B", 500000L)))
    // A->A x3, A->B, B->A: P = [[3/4, 1/4], [1, 0]] -> pi = (0.8, 0.2)
    val biased = ev(2L, Seq("A", "A", "A", "A", "B", "A"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val g2 = TrendStatOps.stationaryMix(biased, iters = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(g2("A") - 800000L) <= 5, g2)
    assert(math.abs(g2("B") - 200000L) <= 5, g2)
    assert(g2("A") + g2("B") >= 999998L)
  }
}
