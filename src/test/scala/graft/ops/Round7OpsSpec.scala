package graft.ops

import graft.SparkSpec
import java.nio.file.Files

/** Round-7 operator batch: BFS hop distance, MMR re-ranking, t-closeness,
  * calibration/ECE, grid ε-join, and the chained dedup→window streaming
  * topology — planted fixtures with hand-computable expectations.
  */
class Round7OpsSpec extends SparkSpec {

  private def dirWith(write: String => Unit): String = {
    val d = Files.createTempDirectory("graft_r7").toString
    write(d)
    d
  }

  test("q221 BFS: hop distances follow the planted path graph") {
    import spark.implicits._
    // cust1 -(o100)- supp10 -(o101)- cust5 -(o102)- supp20 -(o103)- cust7
    // seeds = custkey <= 3 → cust1 only. Node ids: cust c → 2c, supp s → 2s+1.
    val d = dirWith { d =>
      Seq((1L, "c1", 0, 0.0, "A"), (5L, "c5", 0, 0.0, "A"), (7L, "c7", 0, 0.0, "A"))
        .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .coalesce(1).write.parquet(s"$d/customer.parquet")
      Seq((100L, 1L), (101L, 5L), (102L, 5L), (103L, 7L))
        .toDF("o_orderkey", "o_custkey")
        .coalesce(1).write.parquet(s"$d/orders.parquet")
      Seq((100L, 10L), (101L, 10L), (102L, 20L), (103L, 20L))
        .toDF("l_orderkey", "l_suppkey")
        .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    }
    val got = PipelineOps.q221BfsDistance(spark, d).collect()
      .map(r => r.getAs[Int]("hop") ->
        ((r.getAs[Long]("n_nodes"), r.getAs[Long]("min_node"), r.getAs[Long]("max_node"))))
      .toMap
    assert(got === Map(
      0 -> ((1L, 2L, 2L)),    // cust1
      1 -> ((1L, 21L, 21L)),  // supp10
      2 -> ((1L, 10L, 10L)),  // cust5
      3 -> ((1L, 41L, 41L)),  // supp20
      4 -> ((1L, 14L, 14L)))) // cust7
  }

  test("q222 MMR: diversification promotes the orthogonal vector over redundant near-duplicates") {
    import spark.implicits._
    // q = mean(v0..v3) = (.5, .5, 0, ...). Corpus: e1 ×3 (ids 0,1,4),
    // e2 ×3 (ids 2,3,5), the (1,1) diagonal (id 6, rel 1.0), e3 (id 7,
    // rel 0, orthogonal to everything). Pure relevance order is
    // 6,0,1,2,3,4,5,7; MMR must interleave axes and pull 7 up to rank 4.
    def vec(hot: Seq[(Int, Float)]): Array[Float] = {
      val a = Array.fill(64)(0.0f); hot.foreach { case (i, x) => a(i) = x }; a
    }
    val rows = Seq(
      (0L, vec(Seq(0 -> 1f))), (1L, vec(Seq(0 -> 1f))),
      (2L, vec(Seq(1 -> 1f))), (3L, vec(Seq(1 -> 1f))),
      (4L, vec(Seq(0 -> 1f))), (5L, vec(Seq(1 -> 1f))),
      (6L, vec(Seq(0 -> 1f, 1 -> 1f))), (7L, vec(Seq(2 -> 1f))))
    val d = dirWith { d =>
      rows.toDF("vec_id", "embedding")
        .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    }
    val got = RagOps.q222MmrRerank(spark, d).collect()
      .map(r => r.getAs[Int]("rank") -> r.getAs[Long]("vec_id"))
    assert(got.sortBy(_._1).map(_._2).toSeq === Seq(6L, 0L, 2L, 7L, 1L, 3L, 4L, 5L))
  }

  test("q223 t-closeness: two point-mass groups at opposite ends of the range have EMD 0.5") {
    import spark.implicits._
    // Nation 0: two customers at 0.00; nation 1: two at 9.00. Global bins:
    // half the mass in bin 0, half in bin 9. Each group's cumulative diff
    // is |±4| for bins 0..8 → EMD = 36 / (9·2·4) = 0.5 for both.
    val d = dirWith { d =>
      Seq((1L, "c", 0, 0.0, "A"), (2L, "c", 0, 0.0, "A"),
          (3L, "c", 1, 9.0, "A"), (4L, "c", 1, 9.0, "A"))
        .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .coalesce(1).write.parquet(s"$d/customer.parquet")
    }
    val got = PrepOps.q223TCloseness(spark, d).collect()
      .map(r => r.getAs[Int]("c_nationkey") ->
        ((r.getAs[Long]("n_g"), r.getAs[Double]("emd"), r.getAs[Boolean]("breach"))))
      .toMap
    assert(got === Map(0 -> ((2L, 0.5, true)), 1 -> ((2L, 0.5, true))))
  }

  test("q224 calibration: bins partition the corpus, conf stays in-bin, ECE matches its definition") {
    val dir = "/root/testdata/sf0.001"
    val rows = Metrics.q224Calibration(spark, dir).collect()
    val nTot = rows.map(_.getAs[Long]("n")).sum
    assert(nTot === 1000L)
    var ece = 0.0
    rows.sortBy(_.getAs[Int]("bin")).foreach { r =>
      val bin = r.getAs[Int]("bin"); val n = r.getAs[Long]("n")
      val conf = r.getAs[Double]("conf"); val acc = r.getAs[Double]("acc")
      assert(conf >= bin / 10.0 - 1e-9 && conf < (bin + 1) / 10.0 + 1e-9)
      assert(acc >= 0.0 && acc <= 1.0)
      ece += n * math.abs(acc - conf)
    }
    val expected = BigDecimal(ece / nTot)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.head.getAs[Double]("ece") === expected)
    // the 0.2 class shift must make high bins purer in positives
    val byBin = rows.map(r => r.getAs[Int]("bin") -> r.getAs[Double]("acc")).toMap
    assert(byBin.filter(_._1 >= 8).values.sum / byBin.count(_._1 >= 8) >
      byBin.filter(_._1 <= 1).values.sum / math.max(1, byBin.count(_._1 <= 1)))
  }

  test("q225 grid ε-join equals the brute-force all-pairs result") {
    // The grid prune must be lossless: a point can only be within ε of a
    // station in the station's own or 8 adjacent cells (cell size = ε).
    // Run the catalog entry on real keys and compare against a brute
    // force computed with the same md5-derived coordinates.
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val got = SpatialOps.q225GridEpsJoin(spark, dir).collect()
      .map(r => (r.getAs[Long]("s_suppkey"), r.getAs[Long]("n_within"),
        Option(r.getAs[java.lang.Double]("min_dist")).map(_.doubleValue)))
    val eps = 0.08
    val cust = graft.Tables.customer(spark, dir).selectExpr(
      "c_custkey",
      "(cast(conv(substring(md5(concat('px:', cast(c_custkey as string))), 1, 13), 16, 10) as long) + 0.5d) / 4503599627370496.0d as x",
      "(cast(conv(substring(md5(concat('py:', cast(c_custkey as string))), 1, 13), 16, 10) as long) + 0.5d) / 4503599627370496.0d as y")
    val supp = graft.Tables.supplier(spark, dir).selectExpr(
      "s_suppkey",
      "(cast(conv(substring(md5(concat('sx:', cast(s_suppkey as string))), 1, 13), 16, 10) as long) + 0.5d) / 4503599627370496.0d as sx",
      "(cast(conv(substring(md5(concat('sy:', cast(s_suppkey as string))), 1, 13), 16, 10) as long) + 0.5d) / 4503599627370496.0d as sy")
    val brute = supp.crossJoin(cust)
      .withColumn("d2", expr("(x - sx) * (x - sx) + (y - sy) * (y - sy)"))
      .filter(col("d2") <= eps * eps)
      .groupBy(col("s_suppkey"))
      .agg(count(lit(1)).as("n_within"), round(sqrt(min(col("d2"))), 6).as("min_dist"))
      .collect()
      .map(r => r.getAs[Long]("s_suppkey") ->
        ((r.getAs[Long]("n_within"), r.getAs[Double]("min_dist")))).toMap
    got.foreach { case (sk, n, md) =>
      brute.get(sk) match {
        case Some((bn, bd)) => assert(n === bn && md.contains(bd), s"station $sk")
        case None           => assert(n === 0L && md.isEmpty, s"station $sk")
      }
    }
    assert(got.count(_._2 > 0) === brute.size)
  }

  test("q228 lateness audit: planted out-of-order events count against exactly the right delays") {
    import spark.implicits._
    // user 1 arrival order (by event_id): t0, t0+1h, t0+1h-120s (2 min
    // late), t0+2h, t0+2h-30min (30 min late). Lateness > delay drops:
    // delay 60s → both stragglers; 300/600s → only the 30-min one;
    // 3600s → none.
    val h = 3600L * 1000000000L
    val t0 = java.time.Instant.parse("2024-03-01T00:00:00Z").getEpochSecond * 1000000000L
    def ev(id: Long, ns: Long): (Long, Long, Long, String, Double, String) =
      (id, ns, 1L, "view", 1.0, "{}")
    val d = dirWith { d =>
      Seq(ev(1, t0), ev(2, t0 + h), ev(3, t0 + h - 120L * 1000000000L),
        ev(4, t0 + 2 * h), ev(5, t0 + 2 * h - 1800L * 1000000000L))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$d/events.parquet")
    }
    val got = EventOps.q228LatenessAudit(spark, d).collect()
      .map(r => r.getAs[Long]("delay_s") ->
        ((r.getAs[Long]("n_dropped"), r.getAs[Long]("max_late_us")))).toMap
    assert(got === Map(
      60L -> ((2L, 1800000000L)), 300L -> ((1L, 1800000000L)),
      600L -> ((1L, 1800000000L)), 3600L -> ((0L, 1800000000L))))
  }

  test("q229 matryoshka: identical prefixes break prefix recall, full dims keep it") {
    import spark.implicits._
    // Queries 0-3 = e1. Corpus vectors 4-9: all share the SAME first 32
    // dims (strongly e1-aligned) and differ only in dims 33+ — so s16/s32
    // CANNOT tell them apart (rank = id order), while full-dim cosine
    // ranks them by their tail mass. Vectors 4-7 carry increasing tail
    // noise (worse full cosine), 8-9 are clean.
    def vec(tail: Float): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(0) = 1.0f
      if (tail != 0f) { a(40) = tail }
      a
    }
    val rows = (0L to 3L).map(i => (i, vec(0f))) ++ Seq(
      (4L, vec(1.0f)), (5L, vec(1.5f)), (6L, vec(2.0f)), (7L, vec(2.5f)),
      (8L, vec(0f)), (9L, vec(0f)))
    val d = dirWith { d =>
      rows.toDF("vec_id", "embedding")
        .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    }
    val got = VectorOps.q229MatryoshkaEval(spark, d).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Double]("recall16"),
        r.getAs[Double]("recall32")))
    // For qid 0: by s64 the tail-noise vectors rank below the clean ones,
    // so top-4 = {1,2,3,8}; by s16/s32 everyone ties at 1.0 and the id
    // tie-break gives top-4 = {1,2,3,4} → overlap 3/4 for every query.
    got.foreach { case (_, r16, r32) =>
      assert(r16 === 0.75 && r32 === 0.75)
    }
  }

  test("q230 checkpoint restart: two-run sink equals the batch aggregate with no double-processing") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val got = StreamingOps.q230CheckpointRestart(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Double]("sum_value")))
    val want = graft.Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy(col("event_type")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Double]("sum_value")))
    assert(got.toSeq === want.toSeq)
    assert(got.map(_._2).sum === 1000L) // every event exactly once
  }

  test("q231 timer sessions: successor-closed and timer-closed sessions emit, the last open one is withheld") {
    import spark.implicits._
    // user 1: session A (t0, t0+10m), session B (t0+2h), session C (t0+10h).
    // user 2's event at t0+12h drives the final watermark to t0+11h50m, so
    // C's timer (t0+10h30m) fires; user 2's own session (end+gap t0+12h30m
    // > watermark) stays open and is withheld.
    val m = 60L * 1000000000L
    val t0 = java.time.Instant.parse("2024-05-01T00:00:00Z").getEpochSecond * 1000000000L
    def ev(id: Long, ns: Long, user: Long): (Long, Long, Long, String, Double, String) =
      (id, ns, user, "view", 1.0, "{}")
    val d = dirWith { d =>
      Seq(ev(1, t0, 1), ev(2, t0 + 10 * m, 1), ev(3, t0 + 120 * m, 1),
        ev(4, t0 + 600 * m, 1), ev(5, t0 + 720 * m, 2))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$d/events.parquet")
    }
    val got = StreamingOps.q231TimerSessions(spark, d).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"),
          r.getAs[Double]("total_value")))).toMap
    assert(got === Map(1L -> ((3L, 4L, 4.0))))
  }

  test("q232 conformal: the bucketed two-pass k-th order statistic matches a direct sort") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val row = Metrics.q232Conformal(spark, dir).head()
    val nCal = row.getAs[Long]("n_cal"); val nTest = row.getAs[Long]("n_test")
    val qhat = row.getAs[Double]("qhat"); val cov = row.getAs[Double]("coverage")
    val total = graft.Tables.lineitem(spark, dir).count()
    assert(nCal + nTest === total)
    // independent qhat: direct residual sort on the calibration half
    val rs = graft.Tables.lineitem(spark, dir).selectExpr(
      "abs(cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)" +
        " - cast(cast(l_quantity as decimal(18,2)) * 100 as bigint) * 3000) as r",
      "(cast(conv(substring(md5(concat_ws(':', 'conf', l_orderkey, l_linenumber)), 1, 13), 16, 10) as long) + 0.5d) / 4503599627370496.0d < 0.5d as is_cal")
      .filter(col("is_cal")).select(col("r")).collect().map(_.getAs[Long]("r")).sorted
    val k = math.ceil(0.75 * (nCal + 1)).toLong.toInt
    assert(qhat === rs(k - 1) / 100.0)
    // finite-sample guarantee holds with slack on the test half
    assert(cov >= 0.70 && cov <= 1.0)
  }

  test("q233 STL: a planted revenue spike is the only anomaly; flat days decompose to zero residual") {
    import spark.implicits._
    // 21 days of $100/day with one $800 spike on day 11 (index 10).
    val d0 = java.time.LocalDate.of(2024, 1, 1)
    val d = dirWith { d =>
      (0 until 21).map { i =>
        val price = if (i == 10) 800.0 else 100.0
        (i.toLong + 1, 1L, "O", price,
          java.sql.Timestamp.valueOf(d0.plusDays(i).atStartOfDay), "1-URGENT")
      }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
        .coalesce(1).write.parquet(s"$d/orders.parquet")
    }
    val rows = SeriesOps.q233StlDecompose(spark, d).collect()
    assert(rows.length === 15) // days 4..18 have a full ±3 window
    val anomalies = rows.filter(_.getAs[Boolean]("anomaly"))
      .map(_.getAs[String]("day"))
    assert(anomalies.toSeq === Seq("2024-01-11"))
    // a day far from the spike: flat trend, zero-ish residual
    val far = rows.find(_.getAs[String]("day") == "2024-01-17").get
    assert(far.getAs[Double]("rev") === 100.0)
    assert(far.getAs[Double]("trend") === 100.0)
  }

  test("q234 group-wise OLS: an exact linear relation recovers slope, intercept, and R² = 1") {
    import spark.implicits._
    // y_cents = 2 x_cents + 500 exactly → slope 2, intercept $5.00, r2 1.
    val d = dirWith { d =>
      (1 to 40).map { i =>
        val qty = (i % 10) + 1.0
        (i.toLong, 1L, 1L, i, qty, (2 * qty * 100 + 500) / 100.0,
          0.0, 0.0, if (i % 2 == 0) "R" else "N", "O",
          java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
      }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
        .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    }
    val got = RelationalMore.q234GroupwiseOls(spark, d).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("slope"),
          r.getAs[Double]("intercept"), r.getAs[Double]("r2")))).toMap
    assert(got === Map("R" -> ((20L, 2.0, 5.0, 1.0)), "N" -> ((20L, 2.0, 5.0, 1.0))))
  }

  test("q226 chained dedup→window: double-fed events collapse and the open window is withheld") {
    import spark.implicits._
    val day = 86400L * 1000000000L // nanos
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond * 1000000000L
    def ev(id: Long, ns: Long, typ: String, v: Double): (Long, Long, Long, String, Double, String) =
      (id, ns, 1L, typ, v, "{}")
    val d = dirWith { d =>
      Seq(
        ev(1, t0 + 3600L * 1000000000L, "A", 1.0),
        ev(2, t0 + 7200L * 1000000000L, "A", 2.0),
        ev(3, t0 + 7200L * 1000000000L, "B", 3.0),
        ev(4, t0 + day + 3600L * 1000000000L, "A", 4.0),
        // final, partial day: sets the watermark to 11:50, leaving its own
        // window (end = Jan 4) open and withheld
        ev(5, t0 + 2 * day + 43200L * 1000000000L, "C", 5.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$d/events.parquet")
    }
    val got = StreamingOps.q226DedupThenWindow(spark, d).collect()
      .map(r => (r.getAs[String]("window_start"), r.getAs[String]("event_type"),
        r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
    assert(got.toSeq === Seq(
      ("2024-01-01 00:00:00", "A", 2L, 3.0),
      ("2024-01-01 00:00:00", "B", 1L, 3.0),
      ("2024-01-02 00:00:00", "A", 1L, 4.0)))
  }
}
