package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Planted-fixture tests for the round-8f batch (q310-q313). */
class RobustTrendRebalanceSpec extends SparkSpec {

  /** orders dir with x_day rows on 2024-01-<day> (count series fixture). */
  private def ordersDir(counts: Seq[(Int, Int)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_r8f_ord").toString
    counts.flatMap { case (day, x) =>
      (1 to x).map(j => ((day * 1000 + j).toLong,
        Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")))
    }.toDF("o_orderkey", "o_orderdate")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    d
  }

  test("q310 Theil-Sen ignores the planted outlier day and reads slope 3") {
    // days 1-9: x = 3*day + 2 (every pairwise slope exactly 3);
    // day 10: x = 1000 (9 wild slopes). m = 45, rank 23 lands among the
    // 3-slopes sorted by (dy, dx): cum 8,15,21,26 -> (dy=12, dx=4).
    val d = ordersDir((1 to 9).map(i => (i, 3 * i + 2)) :+ ((10, 1000)))
    val r = TrendStatOps.q310TheilSen(spark, d).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ===
      ((45L, 12L, 4L, 3.0)))
  }

  test("q311 Mann-Kendall: strictly increasing series is a confirmed trend") {
    // 10 strictly increasing distinct counts: S = 45, no ties ->
    // var18 = 10*9*25 = 2250, z = 44/sqrt(125).
    val d = ordersDir((1 to 10).map(i => (i, 10 + 7 * i)))
    val r = TrendStatOps.q311MannKendall(spark, d).collect().head
    assert(r.getLong(0) === 10L)
    assert(r.getLong(1) === 45L)
    assert(r.getLong(2) === 2250L)
    assert(math.abs(r.getDouble(3) - 44.0 / math.sqrt(125.0)) < 1e-6)
    assert(r.getString(4) === "increasing")
  }

  test("q312 rebalance keeps exactly the m lowest-md5 ids per class") {
    import spark.implicits._
    val docs = ((1L to 5L).map((_, "a")) ++ (6L to 8L).map((_, "b")) ++
      (9L to 15L).map((_, "c"))).toDF("doc_id", "lang")
    def h(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    val want = docs.collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).view.mapValues { ids =>
        ids.map(_._1).sortBy(id => (h(id), id)).take(3).sum
      }.toMap
    val got = TrendStatOps.classRebalance(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got("a") === ((5L, 3L, want("a"))))
    assert(got("b") === ((3L, 3L, want("b"))))
    assert(got("c") === ((7L, 3L, want("c"))))
  }

  test("q313 interval union merges overlaps and sums covered time exactly") {
    import spark.implicits._
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    // user 1: [0,600) U [300,900) -> one 900s island; [2000,2600) second.
    // user 2: one event -> one 600s island.
    val events = Seq(
      (1L, ts(0L), 1L), (1L, ts(300L), 2L), (1L, ts(2000L), 3L),
      (2L, ts(50L), 4L)).toDF("user_id", "ts", "event_id")
    val got = TrendStatOps.intervalUnion(events, lenSec = 600L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) === ((2L, 1500L)))
    assert(got(2L) === ((1L, 600L)))
  }
}
