package graft.ops

import graft.SparkSpec
import java.nio.file.Files
import java.sql.Timestamp

/** Planted-fixture tests for the round-8n batch (q333-q334). */
class MaseBacktestSiegelSlopeSpec extends SparkSpec {

  test("q333 MASE: linear daily counts give exactly 7/49 error mass") {
    import spark.implicits._
    // day i has i orders, i = 1..14: eval days 8..14 -> naive1 errors all
    // 1 (sum 7), naive7 errors all 7 (sum 49), mase = 7e6 // 49 = 142857
    val d = Files.createTempDirectory("graft_r8n").toString
    val rows = for {
      day <- 1 to 14
      k <- 1 to day
    } yield ((day * 100 + k).toLong, Timestamp.valueOf(f"2024-01-$day%02d 00:00:00"))
    rows.toDF("o_orderkey", "o_orderdate")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    val got = TrendStatOps.q333MaseBacktest(spark, d).collect()
    assert(got.length === 1)
    assert(got.head.toSeq === Seq(7L, 7L, 49L, 142857L))
  }

  test("q334 Siegel: the repeated median shrugs off the planted outlier day") {
    import spark.implicits._
    // x = 0,10,20,100 — day 4 is the outlier. Per-day slope medians are
    // 10,10,10,45; the outer median element is day 2's (dy=10, dx=1).
    val daily = Seq(
      (java.sql.Date.valueOf("2024-01-01"), 0L),
      (java.sql.Date.valueOf("2024-01-02"), 10L),
      (java.sql.Date.valueOf("2024-01-03"), 20L),
      (java.sql.Date.valueOf("2024-01-04"), 100L)).toDF("d", "x")
    val got = TrendStatOps.siegelSlope(daily).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3), r.getDouble(4)) ===
      ((4L, 2L, 10L, 1L, 10.0)))
  }
}
