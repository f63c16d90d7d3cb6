package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8ak batch (q379-q380). */
class RankStabilityPotCensusSpec extends SparkSpec {

  test("q379 rank stability: full reversal maximizes the distance") {
    import spark.implicits._
    // 3 suppliers; period-1 ranking 1,2,3 exactly reverses in period 2
    // -> all 3 pairs discordant
    val li = Seq(
      (1L, 1L, 300.0), (2L, 2L, 200.0), (3L, 3L, 100.0),   // first half
      (4L, 1L, 100.0), (5L, 2L, 200.0), (6L, 3L, 300.0))   // second half
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice")
    val ord = Seq(
      (1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-01-03"),
      (4L, "2024-03-01"), (5L, "2024-03-02"), (6L, "2024-03-03"))
      .toDF("o_orderkey", "o_orderdate")
    val r = EvalReplayOps.rankStability(li, ord, k = 10).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((3L, 3L, 3L, 1000000L)))
  }

  test("q379 rank stability: identical periods have zero distance") {
    import spark.implicits._
    val li = Seq(
      (1L, 1L, 300.0), (2L, 2L, 100.0),
      (3L, 1L, 300.0), (4L, 2L, 100.0))
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice")
    val ord = Seq(
      (1L, "2024-01-01"), (2L, "2024-01-02"),
      (3L, "2024-03-01"), (4L, "2024-03-02"))
      .toDF("o_orderkey", "o_orderdate")
    val r = EvalReplayOps.rankStability(li, ord, k = 10).collect()(0)
    assert(r.getLong(2) === 0L && r.getLong(3) === 0L)
  }

  test("q380 POT census: planted spikes form the expected episodes") {
    import spark.implicits._
    // 20 quiet days of 1 order; two spike runs of 5-order days:
    // days 21-22 (len 2) and day 25 (len 1). p90 of 23 days = rank 21
    // over sorted counts (1 x 20, then 5s) -> threshold 5? No: rank
    // (9*23+9)//10 = 21 -> 21st smallest = 5. Exceed needs x > 5 -> none.
    // Use taller spikes: spike days have 7,8 | 9 orders -> thr = 7 at
    // rank 21; exceed = {8, 9} -> episodes split by the gap.
    val days =
      (1 to 20).map(i => (f"2024-01-$i%02d", 1)) ++
        Seq(("2024-01-21", 7), ("2024-01-22", 8), ("2024-01-25", 9))
    val orders = days.flatMap { case (d, k) => Seq.fill(k)(d) }
      .toDF("o_orderdate")
    val r = EvalReplayOps.potCensus(orders).collect()(0)
    assert(r.getLong(0) === 7L)          // threshold_count
    assert(r.getLong(1) === 2L)          // episodes (day 22; day 25)
    assert(r.getLong(2) === 2L)          // exceed_days
    assert(r.getLong(3) === 1L)          // longest_episode
    assert(r.getLong(4) === 9L)          // peak_count
  }

  test("q380 POT census: consecutive exceedances merge into one episode") {
    import spark.implicits._
    val days =
      (1 to 18).map(i => (f"2024-02-$i%02d", 1)) ++
        Seq(("2024-02-19", 8), ("2024-02-20", 9), ("2024-02-21", 10))
    val orders = days.flatMap { case (d, k) => Seq.fill(k)(d) }
      .toDF("o_orderdate")
    val r = EvalReplayOps.potCensus(orders).collect()(0)
    // 21 days -> p90 rank (189+9)//10 = 19 -> 19th smallest = 8
    assert(r.getLong(0) === 8L)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === ((1L, 2L, 2L, 10L)))
  }
}
