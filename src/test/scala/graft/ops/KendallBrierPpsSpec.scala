package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Planted-fixture tests for the round-8i batch (q320-q323). */
class KendallBrierPpsSpec extends SparkSpec {

  test("q320 Kendall tau-b: planted tie structure gives tau = 0.4 exactly") {
    import spark.implicits._
    // daily series x=[1,2,2,3], y=[10,30,20,20] cents:
    //   pairs: 3 concordant, 1 discordant, 1 x-tie, 1 y-tie
    //   tau_b = (3-1)/(sqrt(6-1-0)*sqrt(6-1-0)) = 2/5 = 0.4
    val d = Files.createTempDirectory("graft_r8i_ord").toString
    val rows = Seq(
      (1L, 0.10, "2024-03-01"),
      (2L, 0.30, "2024-03-02"), (3L, 0.30, "2024-03-02"),
      (4L, 0.20, "2024-03-03"), (5L, 0.20, "2024-03-03"),
      (6L, 0.20, "2024-03-04"), (7L, 0.20, "2024-03-04"), (8L, 0.20, "2024-03-04"))
    rows.map { case (k, p, day) => (k, p, Timestamp.valueOf(s"$day 00:00:00")) }
      .toDF("o_orderkey", "o_totalprice", "o_orderdate")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    val got = TrendStatOps.q320KendallTau(spark, d).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)) ===
      ((4L, 6L, 3L, 1L, 1L, 1L, 0L, 0.4)))
  }

  test("q321 Brier: with no positives, resolution and uncertainty vanish and brier = reliability") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_r8i_ev").toString
    (1L to 500L).map(i => (i, "view"))
      .toDF("event_id", "event_type")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val got = TrendStatOps.q321BrierDecomposition(spark, d).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(2) === 0L)            // n_pos
      assert(r.getDouble(3) === 0.0)         // obar
      assert(r.getDouble(5) === 0.0)         // resolution
      assert(r.getDouble(6) === 0.0)         // uncertainty
      assert(r.getDouble(7) === r.getDouble(4)) // brier == reliability
      assert(r.getDouble(4) > 0.0)           // discretization penalty is real
    }
    // the forecast is u*0.8 with no shift: every bin must be < 0.8*20 = 16
    assert(got.map(_.getInt(0)).max < 16)
  }

  test("q322 systematic PPS: stride selection is exact and sums to k") {
    import spark.implicits._
    // equal weights, k=2: thresholds at 100 and 300 select units 2 and 4
    val w1 = Seq((1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L)).toDF("sk", "w")
    val got1 = TrendStatOps.systematicPps(w1, k = 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got1.toSeq === Seq((2L, 100L, 200L, 1L, 250000L), (4L, 100L, 400L, 1L, 250000L)))
    // a dominant unit absorbs all 4 thresholds (PPS multiplicity)
    val w2 = Seq((1L, 100L), (2L, 1000L), (3L, 100L)).toDF("sk", "w")
    val got2 = TrendStatOps.systematicPps(w2, k = 4L).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(got2.toSeq === Seq((2L, 4L)))
  }

  test("q323 distinct-n: repetitive vs fully-diverse sources get exact ppm ratios") {
    import spark.implicits._
    val docs = Seq(
      ("srcA", "a a a a"),  // 4 unigrams 1 distinct; 3 bigrams 1; 2 trigrams 1
      ("srcB", "a b c")     // all distinct at every n
    ).toDF("source", "text")
    val got = TrendStatOps.distinctN(docs).collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1).map(_.asInstanceOf[Long]))
      .toMap
    assert(got("srcA") === Seq(4L, 1L, 250000L, 3L, 1L, 333333L, 2L, 1L, 500000L))
    assert(got("srcB") === Seq(3L, 3L, 1000000L, 2L, 2L, 1000000L, 1L, 1L, 1000000L))
  }
}
