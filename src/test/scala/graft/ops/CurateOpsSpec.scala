package graft.ops

import graft.SparkSpec
import java.nio.file.Files

/** Round-6 curation batch: planted fixtures per operator. */
class CurateOpsSpec extends SparkSpec {

  private def dirWith(write: String => Unit): String = {
    val d = Files.createTempDirectory("graft_curate").toString
    write(d)
    d
  }

  test("q197 banded hamming join: pairs at distance <= 3 survive, distant pairs drop") {
    import spark.implicits._
    // hand-built 4x16-bit signatures: distances from doc 1 are 1/3/5 bits;
    // docs 1..5 share bands b1-b3 so all are CANDIDATES, and the exact
    // bit_count check must kill exactly the >3 ones; 4 shares no band
    // value with anyone and must never become a candidate
    val hashes = Seq(
      (1L, 0L, 0L, 0L, 0L),
      (2L, 1L, 0L, 0L, 0L),
      (3L, 0x15L, 0L, 0L, 0L),
      (5L, 0x1FL, 0L, 0L, 0L),
      (4L, 0xFFFFL, 0xFFFFL, 0xFFFFL, 0xABCDL))
      .toDF("doc_id", "b0", "b1", "b2", "b3")
    val got = CurateOps.phashPairs(hashes, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // dropped: (1,5) 5 bits, (2,5) 4 bits; kept: the <=3 pairs
    assert(got.toSet === Set((1L, 2L, 1), (1L, 3L, 3), (2L, 3L, 2), (3L, 5L, 2)))
  }

  test("q197 end-to-end: identical documents produce a hamming-0 image pair") {
    import spark.implicits._
    // `other` must be visually distinct, i.e. far in hash space — repetitive
    // low-variance byte patterns ("zzz yyy ...") hash IDENTICALLY to the
    // `same` text (every sample below the mean), which is correct aHash
    // behavior: near-constant images are all alike. Mixed-case alphanumerics
    // give a 11-bit distance (precomputed with the same sample math).
    val same = "aaa bbb ccc ddd eee fff"
    val other = "Zq9 k2M xT7 pL4 wR8 vN1"
    val d = dirWith { d =>
      Seq(
        (1L, same, "en", "s", same.length.toLong),
        (2L, same, "en", "s", same.length.toLong),
        (3L, other, "en", "s", other.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$d/documents.parquet")
    }
    val got = CurateOps.q197PhashDedup(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.contains((1L, 2L, 0)))
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("q198 association metrics: support/confidence/lift from a known basket set") {
    import spark.implicits._
    // orders: 1:{10,20,30} 2:{10,20} 3:{10,20} 4:{30}
    val d = dirWith { d =>
      Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 20L),
        (3L, 10L), (3L, 20L), (4L, 30L))
        .toDF("l_orderkey", "l_partkey")
        .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    }
    val got = CurateOps.q198MarketBasket(spark, d).collect()
    assert(got.length === 1) // only (10,20) co-occurs >= 2 times
    val r = got.head
    assert((r.getAs[Long]("p1"), r.getAs[Long]("p2"), r.getAs[Long]("c12")) === ((10L, 20L, 3L)))
    assert(r.getAs[Double]("support") === 0.75) // 3 of 4 orders
    assert(r.getAs[Double]("confidence") === 1.0) // every order with 10 has 20
    assert(r.getAs[Double]("lift") === 1.333333) // 4*3/(3*3) rounded to 6
  }

  test("q199 exact histogram quantiles: odd group hits values, even group interpolates") {
    import spark.implicits._
    val d = dirWith { d =>
      (Seq.tabulate(5)(i => (i + 1L, "A", (i + 1).toDouble)) ++
        Seq((10L, "B", 0.0), (11L, "B", 10.0)))
        .toDF("c_custkey", "c_mktsegment", "c_acctbal")
        .coalesce(1).write.parquet(s"$d/customer.parquet")
    }
    val z = CurateOps.q199RobustScale(spark, d).collect()
      .map(r => r.getAs[Long]("c_custkey") -> r.getAs[Double]("robust_z")).toMap
    // A: balances 1..5 -> p25=2 p50=3 p75=4, iqr=2: z(5)=(5-3)/2=1, z(1)=-1
    assert(z(5L) === 1.0)
    assert(z(1L) === -1.0)
    assert(z(3L) === 0.0)
    // B: n=2 -> p25=2.5 p50=5 p75=7.5 (interpolated), iqr=5: z(10)=1
    assert(z(11L) === 1.0)
    assert(z(10L) === -1.0)
  }

  test("q200 zone-map audit: disjoint file ranges skip, overlapping ranges scan") {
    import spark.implicits._
    val d = dirWith { d =>
      Seq(
        (0L, "1994-02-01"), (1L, "1994-03-01"), // file 0
        (1024L, "1995-03-01"), (1025L, "1995-04-01")) // file 1
        .toDF("o_orderkey", "dt")
        .selectExpr("o_orderkey", "cast(dt as date) as o_orderdate")
        .coalesce(1).write.parquet(s"$d/orders.parquet")
    }
    val got = CurateOps.q200ZoneMapPrune(spark, d).collect()
      .map(r => r.getAs[Int]("pred_id") ->
        ((r.getAs[Long]("n_files_skipped"), r.getAs[Long]("n_files_scanned"),
          r.getAs[Long]("rows_scanned")))).toMap
    assert(got(1) === ((1L, 1L, 2L))) // 1994H1: file1 skipped
    assert(got(2) === ((1L, 1L, 2L))) // 1995: file0 skipped
    assert(got(3) === ((2L, 0L, 0L))) // 1993Q3: nothing overlaps
    assert(got(4) === ((2L, 0L, 0L))) // 1998H2: nothing overlaps
  }

  test("q201 decay fold: spend halves per 7-day bucket in exact powers of two") {
    import spark.implicits._
    val ns = 1000000000L
    val t0 = 1704067200L * ns // 2024-01-01
    val day = 86400L * ns
    val d = dirWith { d =>
      Seq(
        (1L, t0 + 21 * day, 1L, "buy", 8.0, "{}"), // k=0 (anchor day)
        (2L, t0 + 14 * day, 1L, "buy", 8.0, "{}"), // k=1 -> 8/2
        (3L, t0, 2L, "buy", 8.0, "{}")) // k=3 -> 8/8
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$d/events.parquet")
    }
    val got = CurateOps.q201DecayProfile(spark, d).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("decayed_spend")).toMap
    assert(got(1L) === 12.0) // 8 + 4
    assert(got(2L) === 1.0) // 8 / 2^3
  }

  test("q202 l-diversity counts distinct sensitive values per QI group") {
    import spark.implicits._
    val d = dirWith { d =>
      Seq((1L, 1L, 10.0), (2L, 1L, 20.0), (3L, 2L, 10.0))
        .toDF("c_custkey", "c_nationkey", "c_acctbal")
        .coalesce(1).write.parquet(s"$d/customer.parquet")
      Seq((1L, 1L, "1-URGENT"), (2L, 1L, "2-HIGH"), (3L, 2L, "1-URGENT"),
        (4L, 2L, "1-URGENT"), (5L, 3L, "3-MEDIUM"), (6L, 3L, "2-HIGH"),
        (7L, 3L, "1-URGENT"))
        .toDF("o_orderkey", "o_custkey", "o_orderpriority")
        .coalesce(1).write.parquet(s"$d/orders.parquet")
    }
    val got = CurateOps.q202LDiversity(spark, d).collect()
      .map(r => (r.getAs[Long]("c_nationkey"), r.getAs[Long]("bal_band")) ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("l"), r.getAs[Boolean]("diverse")))).toMap
    // nation 1 band 0: custs 1,2 with orders {URGENT, HIGH, URGENT, URGENT} +
    // cust 3's orders {MEDIUM, HIGH, URGENT}... cust3 is nation 2
    assert(got((1L, 0L)) === ((4L, 2L, false)))
    assert(got((2L, 0L)) === ((3L, 3L, true)))
  }

  test("q203 funnel drops exactly one planted doc per stage") {
    import spark.implicits._
    def doc(id: Long, text: String) = (id, text, "en", "s", text.length.toLong)
    val pass = "the a cat dog bird fish cow pig hen fox wolf bear deer elk moose"
    val d = dirWith { d =>
      Seq(
        doc(0L, "alpha beta gamma delta"), // eval doc (id % 50 == 0)
        doc(1L, "tiny doc here now"), // fails length (4 toks)
        doc(2L, Seq.fill(20)("x").mkString(" ")), // fails diversity
        doc(3L, (1 to 15).map(i => s"w$i").mkString(" ")), // fails stopwords
        doc(4L, pass), // survives everything
        doc(5L, pass), // dropped by exact dedup (doc 4 is first)
        doc(6L, "the a one two three four five six seven eight nine ten " +
          "alpha beta gamma delta")) // dropped by decontamination
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$d/documents.parquet")
    }
    val got = CurateOps.q203CurationFunnel(spark, d).collect()
      .map(r => r.getAs[Int]("stage") ->
        ((r.getAs[String]("stage_name"), r.getAs[Long]("docs_in"), r.getAs[Long]("docs_out"))))
      .toMap
    assert(got(1) === (("length", 6L, 5L)))
    assert(got(2) === (("diversity", 5L, 4L)))
    assert(got(3) === (("stopwords", 4L, 3L)))
    assert(got(4) === (("exact_dedup", 3L, 2L)))
    assert(got(5) === (("decontaminate", 2L, 1L)))
  }

  test("q204 zipf fit equals the JVM OLS over the same rounded log-log points") {
    import spark.implicits._
    // one doc with geometric frequencies 16/8/4/2/1 over 5 tokens
    val text = (Seq.fill(16)("t01") ++ Seq.fill(8)("t02") ++ Seq.fill(4)("t03") ++
      Seq.fill(2)("t04") ++ Seq("t05")).mkString(" ")
    val d = dirWith { d =>
      Seq((1L, text, "en", "s", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$d/documents.parquet")
    }
    val r = CurateOps.q204ZipfFit(spark, d).collect().head
    assert(r.getAs[Int]("n_points") === 5)
    // replicate the exact fixed-order fold (rank-ascending, ln pre-rounded)
    def r6(v: Double): Double = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pts = Seq((1, 16), (2, 8), (3, 4), (4, 2), (5, 1))
      .map { case (rk, f) => (r6(math.log(rk)), r6(math.log(f))) }
    val (sx, sy, sxy, sxx) = pts.foldLeft((0.0, 0.0, 0.0, 0.0)) {
      case ((a, b, c, dd), (x, y)) => (a + x, b + y, c + x * y, dd + x * x)
    }
    val k = 5.0
    val slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    val intercept = (sy - slope * sx) / k
    assert(r.getAs[Double]("slope") === r6(slope))
    assert(r.getAs[Double]("intercept") === r6(intercept))
    // geometric halving per rank step is steeper than Zipf's -1
    assert(r.getAs[Double]("slope") < -1.0)
  }
}
