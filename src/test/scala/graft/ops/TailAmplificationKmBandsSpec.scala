package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8at batch (q397-q398). */
class TailAmplificationKmBandsSpec extends SparkSpec {

  test("q397 tail amplification matches a replicated fixed-point chain") {
    import spark.implicits._
    // v = 1..100 uniform: r(v) = v*10000 ppm
    val rows = (1L to 100L).toDF("v")
    val got = CapacityAuditOps.tailAmplification(rows).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    def chain(r0: Long, j: Int): Long = {
      var r = r0
      for (_ <- 1 to j) r = r * r / 1000000L
      r
    }
    val stageOf = Map(1L -> 0, 16L -> 4, 64L -> 6, 256L -> 8, 1024L -> 10)
    val want = stageOf.map { case (k, j) =>
      k -> (1L to 100L).find(v => chain(v * 10000L, j) >= 990000L).get
    }
    assert(got === want)
    // the straggler tax is monotone in fan-out
    val sorted = got.toSeq.sortBy(_._1).map(_._2)
    assert(sorted === sorted.sorted)
    assert(got(1L) === 99L)
  }

  private def pr6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("q398 KM Greenwood bands: hand-built three-user cohort") {
    import spark.implicits._
    // u1 dur 4 (churn), u2 dur 1 (churn), u3 dur 29 (censored at tend)
    val events = Seq(
      (1L, "2024-01-01 00:00:00"), (1L, "2024-01-05 00:00:00"),
      (2L, "2024-01-01 00:00:00"), (2L, "2024-01-02 00:00:00"),
      (3L, "2024-01-01 00:00:00"), (3L, "2024-01-30 00:00:00"))
      .toDF("user_id", "ts")
      .selectExpr("user_id", "cast(ts as timestamp) as ts")
    val got = CapacityAuditOps.kmBands(events).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    // dur 1: n=3, d=1 -> S=2/3, g=1/6
    val s1 = math.exp(math.log(2.0 / 3.0))
    val se1 = s1 * math.sqrt(1.0 / 6.0)
    assert(got(1) === ((3L, 1L, 0L, pr6(s1), pr6(se1),
      pr6(math.max(s1 - 1.959964 * se1, 0.0)),
      pr6(math.min(s1 + 1.959964 * se1, 1.0)))))
    // dur 4: n=2, d=1 -> S=1/3, g=1/6+1/2=2/3
    val s4 = math.exp(math.log(2.0 / 3.0) + math.log(1.0 / 2.0))
    val se4 = s4 * math.sqrt(1.0 / 6.0 + 1.0 / 2.0)
    assert(got(4)._4 === pr6(s4))
    assert(got(4)._5 === pr6(se4))
    // dur 29: censored only -> survival flat, se flat
    assert(got(29)._4 === got(4)._4 && got(29)._5 === got(4)._5)
    assert(got(29)._2 === 0L && got(29)._3 === 1L)
    // bands bracket the estimate everywhere
    got.values.foreach { case (_, _, _, s, _, lo, hi) =>
      assert(lo <= s && s <= hi)
    }
  }
}
