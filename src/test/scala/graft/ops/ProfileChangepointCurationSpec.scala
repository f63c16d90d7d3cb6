package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Planted-fixture tests for the round-8c batch (q291-q293). */
class ProfileChangepointCurationSpec extends SparkSpec {

  private def ordersDir(rows: Seq[(Long, Long, String, Double, String, String)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_r8c_ord").toString
    rows.map { case (ok, ck, st, tp, day, pr) =>
      (ok, ck, st, tp, Timestamp.valueOf(s"$day 00:00:00"), pr)
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    d
  }

  test("q291 profiler: counts, distincts, extremes, and char mass are exact") {
    val d = ordersDir(Seq(
      (1L, 10L, "O", 1.00, "2024-01-01", "1-URGENT"),
      (2L, 10L, "F", 2.50, "2024-01-01", "1-URGENT"),
      (3L, 20L, "O", 10.00, "2024-01-01", "5-LOW")))
    val got = CapacityAuditOps.q291DataProfile(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5), r.getLong(6)))).toMap
    // statuses: O,F,O -> 2 distinct, min "F", max "O", 3 chars total
    assert(got("o_orderstatus") === ((3L, 0L, 2L, "F", "O", 3L)))
    // custkeys as strings: "10","10","20"
    assert(got("o_custkey") === ((3L, 0L, 2L, "10", "20", 6L)))
    // cents: 100, 250, 1000 -> lexicographic min "100", max "250"!
    assert(got("o_totalprice_cents") === ((3L, 0L, 3L, "100", "250", 10L)))
  }

  test("q292 binseg finds the two planted mean shifts in order") {
    // 30 days: days 1-10 revenue 10.00/day, 11-20 revenue 1000.00/day,
    // 21-30 revenue 10.00/day. In kilodollar units the series is 0 / 1 /
    // 0 — the best single split is at one shift, the second completes
    // the step; both recovered exactly.
    val rows = (1 to 30).map { day =>
      val rev = if (day >= 11 && day <= 20) 1000000.00 else 10.00
      (day.toLong, 1L, "O", rev, f"2024-01-$day%02d", "1-URGENT")
    }
    val d = ordersDir(rows)
    val got = TrendStatOps.q292ChangepointBinseg(spark, d).collect()
      .map(r => (r.getInt(0), r.getDate(1).toString))
    // x = floor(cents/1e5): 1000000.00 -> 1000 kilodollars; 10.00 -> 0.
    // Step 1 must split at one edge of the plateau (day 10 or 20); step 2
    // at the other.
    val days = got.map(_._2).toSet
    assert(got.map(_._1).toSeq === Seq(1, 2))
    assert(days === Set("2024-01-10", "2024-01-20"))
  }

  test("q294 rate-limit audit flags only the user whose burst exceeds the quota") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_r8c_rate").toString
    val t = (h: Int, m: Int) => Timestamp.valueOf(f"2024-01-0${1 + h / 24}%d ${h % 24}%02d:$m%02d:00")
    // user 1: three events inside one hour -> the third breaks the
    // 2-per-24h quota (1 violation, worst burst 3)
    // user 2: three events 48h apart -> never more than 1 in-window
    val rows = Seq(
      (1L, t(0, 0), 1L), (2L, t(0, 10), 1L), (3L, t(0, 20), 1L),
      (4L, t(0, 0), 2L), (5L, t(48, 0), 2L), (6L, t(96, 0), 2L))
      .map { case (id, ts, u) => (id, ts, u, "view", 1.0, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val got = EventOps.q294RateLimitAudit(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 3L, 1L, 3L)))
  }

  test("q295 ANOVA recovers the exact F on two planted groups") {
    // A = {1.00, 2.00, 3.00}, B = {11.00, 12.00, 13.00} dollars:
    // SSB = 1.5e6 cents^2, SSW = 4e4 cents^2, F = (SSB/1)/(SSW/4) = 150
    val rows = Seq(
      (1L, 1L, "O", 1.00, "2024-01-01", "1-URGENT"),
      (2L, 1L, "O", 2.00, "2024-01-01", "1-URGENT"),
      (3L, 1L, "O", 3.00, "2024-01-01", "1-URGENT"),
      (4L, 1L, "O", 11.00, "2024-01-01", "5-LOW"),
      (5L, 1L, "O", 12.00, "2024-01-01", "5-LOW"),
      (6L, 1L, "O", 13.00, "2024-01-01", "5-LOW"))
    val d = ordersDir(rows)
    val r = InferenceTestOps.q295Anova(spark, d).collect().head
    assert(r.getInt(0) === 2)
    assert(r.getLong(1) === 6L)
    assert(r.getLong(2) === 150000000L)
  }

  test("q296 as-of enrichment attributes each purchase to the version current at event time") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_r8c_asof").toString
    val t = (hm: String) => Timestamp.valueOf(s"2024-01-01 $hm:00")
    val rows = Seq(
      (1L, t("10:00"), 1L, "view", 1.0, "{}"),     // opens version 1 (100c)
      (2L, t("10:30"), 1L, "purchase", 1.0, "{}"), // same value: still v1
      (3L, t("11:00"), 1L, "view", 2.0, "{}"),     // opens version 2 (200c)
      (4L, t("11:30"), 1L, "purchase", 2.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val got = RelationalMore.q296AsofEnrich(spark, d).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 1, 100L, 1L), (1L, 2, 200L, 1L)))
  }

  test("q297 shares of region and total are exact ppm floor-divisions") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_r8c_share").toString
    Seq((0L, "AMERICA"), (1L, "ASIA")).toDF("r_regionkey", "r_name")
      .coalesce(1).write.parquet(s"$d/region.parquet")
    Seq((0L, "BRAZIL", 0L), (1L, "CANADA", 0L), (2L, "JAPAN", 1L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.parquet(s"$d/nation.parquet")
    Seq((10L, 0L), (11L, 1L), (12L, 2L))
      .toDF("c_custkey", "c_nationkey")
      .coalesce(1).write.parquet(s"$d/customer.parquet")
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    Seq((1L, 10L, "O", 1.00, ts, "1-URGENT"), (2L, 11L, "O", 3.00, ts, "1-URGENT"),
      (3L, 12L, "O", 6.00, ts, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    val got = RelationalMore.q297ShareOfParent(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // AMERICA holds 100+300 of 1000 cents; ASIA 600
    assert(got.toSeq === Seq(
      ("AMERICA", "BRAZIL", 100L, 250000L, 400000L),
      ("AMERICA", "CANADA", 300L, 750000L, 400000L),
      ("ASIA", "JAPAN", 600L, 1000000L, 600000L)))
  }

  test("q298 nearest-rank percentiles pick the exact order statistics") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_r8c_pct").toString
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    // 5×1.00 + 4×2.00 + 1×100.00: ranks -> P50 = 5th = 100c,
    // P90 = 9th = 200c, P99 = 10th = 10000c
    val rows = (1 to 10).map { k =>
      val v = if (k <= 5) 1.00 else if (k <= 9) 2.00 else 100.00
      (k.toLong, ts, k.toLong, "view", v, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val r = RelationalMore.q298PercentileBands(spark, d).collect().head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === (("view", 10L, 100L, 200L, 10000L)))
  }

  test("q299 capstone: dedup, DSIR selection, and packing account exactly") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_r8c_cur").toString
    // source s: en doc repeated twice (dedup to one), a second en doc,
    // and a de doc with disjoint bigrams (DSIR must drop it)
    val en1 = (1 to 30).map(_ => "alpha beta").mkString(" ")   // 60 tokens
    val en2 = (1 to 20).map(_ => "alpha beta").mkString(" ")   // 40 tokens
    val de1 = (1 to 25).map(_ => "gamma delta").mkString(" ")  // 50 tokens
    Seq((1L, en1, "en", "s"), (2L, en1, "en", "s"),
      (3L, en2, "en", "s"), (4L, de1, "de", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val r = CurateOps.q299CurationV2(spark, d).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5), x.getLong(6)))
    // kept = docs 1 (60 toks) + 3 (40 toks) = 100 tokens -> 1 block;
    // loss = (60 - 15) + (40 - 10) = 75
    assert(r.toSeq === Seq(("s", 4L, 3L, 2L, 100L, 75L, 1L)))
  }

  test("q293 advisor recommends DICT for low-cardinality, PLAIN for unique columns") {
    // 200 rows, 2 statuses (dict trivially wins), unique keys where the
    // 8-bit dict index + value dictionary cannot beat plain storage
    val rows = (1L to 200L).map { k =>
      (k, k, if (k % 2 == 0) "O" else "F", 1.00, "2024-01-01", "1-URGENT")
    }
    val d = ordersDir(rows)
    val got = CapacityAuditOps.q293EncodingAdvisor(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getString(5)))).toMap
    assert(got("o_orderstatus") === ((2L, "DICT")))
    assert(got("o_orderpriority")._2 === "DICT")
    // o_custkey: unique 1..200 -> dict stores every value PLUS indexes
    assert(got("o_custkey") === ((200L, "PLAIN")))
  }
}
