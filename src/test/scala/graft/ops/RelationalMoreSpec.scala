package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class RelationalMoreSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q219 mergeSchema read surfaces the evolved column as NULL on old files") {
    val out = RelationalMore.q219SchemaEvolution(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // generation-1 rows (even keys, written without the column) must all
    // land in the sentinel group, and the split must cover every order
    val o = Tables.orders(spark, dir)
    assert(out("pre-evolution") === o.filter(col("o_orderkey") % 2 === 0).count())
    assert(out.values.sum === o.count())
    assert(out.keySet.size >= 2, "evolved rows must group by real priorities")
  }

  test("q53 date spine is dense (one row per day, gaps zero-filled)") {
    val rows = RelationalMore.q53DateSpine(spark, dir).collect()
    val days = rows.map(_.getTimestamp(0).toInstant)
    // dense: consecutive days differ by exactly 86400s
    days.sliding(2).foreach { case Array(a, b) =>
      assert(java.time.Duration.between(a, b).getSeconds === 86400L)
    }
    // gap rows exist at this SF and are zero-filled consistently
    val gaps = rows.filter(_.getAs[Long]("n_orders") == 0L)
    assert(gaps.nonEmpty, "expected at least one empty day at sf0.001")
    gaps.foreach(r => assert(r.getAs[Double]("sum_price") === 0.0))
    // spine covers >= the number of distinct order days
    val distinctDays = Tables.orders(spark, dir)
      .select(date_trunc("day", col("o_orderdate"))).distinct().count()
    assert(rows.length >= distinctDays.toInt)
  }

  test("q67 merge keeps counts consistent and changes win on collision") {
    val target = Tables.orders(spark, dir)
    val nTarget = target.count()
    val nUpd = target.filter(col("o_orderkey") % 10 === 0).count()
    val nIns = target.filter(col("o_orderkey") % 10 === 3).count()
    val merged = RelationalMore.q67MergeUpsert(spark, dir).cache()
    try {
      assert(merged.count() === nTarget + nIns)
      assert(merged.filter(col("op") === "U").count() === nUpd)
      assert(merged.filter(col("op") === "I").count() === nIns)
      // keys stay unique after the merge
      assert(merged.select("o_orderkey").distinct().count() === nTarget + nIns)
      // an updated row carries the new (higher) price
      val one = merged.filter(col("op") === "U").limit(1).collect()(0)
      val orig = target.filter(col("o_orderkey") === one.getAs[Long]("o_orderkey"))
        .collect()(0).getAs[Double]("o_totalprice")
      assert(one.getAs[Double]("o_totalprice") > orig)
    } finally merged.unpersist()
  }

  test("q68 max_by agrees with the window-based argmax") {
    val viaAgg = RelationalMore.q68ArgMax(spark, dir)
      .select("o_custkey", "top_priority").collect().map(_.toSeq)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(
        col("o_totalprice").desc, col("o_orderkey").desc)
    val viaWindow = Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderpriority"))
      .orderBy(col("o_custkey"))
      .collect().map(_.toSeq)
    assert(viaAgg.toSeq === viaWindow.toSeq)
  }

  test("q76 regression slope/intercept satisfy the normal equations vs corr/stddev") {
    RelationalMore.q76Stats(spark, dir).collect().foreach { r =>
      val corr = r.getAs[Double]("corr_qty_price")
      val cov = r.getAs[Double]("cov_qp")
      val sd = r.getAs[Double]("sd_qty")
      val slope = r.getAs[Double]("slope")
      // slope = cov / var(x); tolerate the output rounding
      assert(math.abs(slope - cov / (sd * sd)) < 0.01, s"$slope vs ${cov / (sd * sd)}")
      assert(corr >= -1.0 && corr <= 1.0)
    }
  }

  test("q69 unionByName fills the missing legacy column with null") {
    val df = RelationalMore.q69UnionByName(spark, dir).cache()
    try {
      assert(df.count() === Tables.customer(spark, dir).count())
      assert(df.filter(col("batch") === "legacy")
        .filter(col("c_mktsegment").isNotNull).count() === 0L)
      assert(df.filter(col("batch") === "v2")
        .filter(col("c_mktsegment").isNull).count() === 0L)
      // every batch kept its c_name
      assert(df.filter(col("c_name").isNull).count() === 0L)
    } finally df.unpersist()
  }

  test("weighted median picks the lowest value whose cumulative weight reaches half") {
    val rows = RelationalMore.q117WeightedMedian(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    // cross-check each flag against a driver-side reference on the tiny SF
    val raw = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1)).setScale(2), r.getDouble(2).toLong))
    val expected = raw.groupBy(_._1).map { case (flag, rs) =>
      val sorted = rs.sortBy(_._2)
      val tot = sorted.map(_._3).sum
      var cum = 0L
      flag -> sorted.collectFirst {
        case (_, price, q) if { cum += q; cum * 2 >= tot } => price.toDouble
      }.get
    }
    rows.foreach { r =>
      assert(r.getAs[Double]("wmedian") === expected(r.getAs[String]("flag")),
        s"flag ${r.getAs[String]("flag")}")
    }
  }

  test("KS statistic matches a sequential reference on the tiny SF") {
    val dir = "/root/testdata/sf0.001"
    val row = RelationalMore.q118KsTest(spark, dir).head()
    // driver-side reference: pooled sort, running counts, max gap
    val seg = graft.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val vs = graft.Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .flatMap { r =>
        seg.get(r.getLong(0)) match {
          case Some("AUTOMOBILE") => Some((r.getDouble(1), 1))
          case Some("BUILDING") => Some((r.getDouble(1), 0))
          case _ => None
        }
      }
    val n1 = vs.count(_._2 == 1).toLong
    val n2 = vs.length - n1
    var c1 = 0L; var c2 = 0L; var best = -1L
    vs.sortBy(_._1).groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, rs) =>
      c1 += rs.count(_._2 == 1); c2 += rs.count(_._2 == 0)
      best = math.max(best, math.abs(c1 * n2 - c2 * n1))
    }
    assert(row.getAs[Long]("n1") === n1 && row.getAs[Long]("n2") === n2)
    val expected = BigDecimal(best.toDouble / (n1 * n2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("ks_d") === expected)
  }

  test("association stats: perfect correlation maxes Cramér's V, independence zeroes it") {
    import spark.implicits._
    // bijective lang↔source, 4 categories × 25 docs: V = 1, MI = ln(4)
    val correlated = (0 until 100).map { i =>
      (s"l${i % 4}", s"s${i % 4}")
    }.toDF("lang", "source")
    val c = RelationalMore.association(correlated).head()
    assert(math.abs(c.getAs[Double]("cramers_v") - 1.0) < 1e-6)
    assert(math.abs(c.getAs[Double]("mi") - math.log(4)) < 1e-4)
    // independent uniform grid: every cell at its expected count → chi2 = 0
    val independent = (for (l <- 0 until 4; s <- 0 until 5; _ <- 0 until 5)
      yield (s"l$l", s"s$s")).toDF("lang", "source")
    val ind = RelationalMore.association(independent).head()
    assert(ind.getAs[Double]("chi2") === 0.0)
    assert(math.abs(ind.getAs[Double]("mi")) < 1e-9)
    assert(ind.getAs[Double]("cramers_v") === 0.0)
  }

  test("q128 binned range join equals the direct theta join") {
    import org.apache.spark.sql.DataFrame
    val binned = RelationalMore.q128BinnedRangeJoin(spark, dir)
      .collect().map(_.toSeq).toSet
    val bands = spark.range(0, 60).select(
      col("id").as("band_id"),
      (col("id") * 1000).cast("double").as("lo"),
      (col("id") * 1000 + 1500).cast("double").as("hi"))
    val direct: DataFrame = Tables.lineitem(spark, dir)
      .select(col("l_extendedprice").as("price"))
      .join(bands, col("price") >= col("lo") && col("price") < col("hi"))
      .groupBy(col("band_id"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"),
        graft.ops.Num.moneySum(col("price")).as("sum_price"))
    assert(binned === direct.collect().map(_.toSeq).toSet)
    assert(binned.nonEmpty)
  }

  test("q130 equi-depth histogram balances bucket mass and tiles the value range") {
    val rows = RelationalMore.q130EquiDepthHist(spark, dir).collect()
    assert(rows.map(_.getAs[Int]("bucket")).toSeq === (0 until 10))
    val n = Tables.lineitem(spark, dir).count()
    rows.foreach { r =>
      val c = r.getAs[Long]("n")
      assert(math.abs(c - n / 10.0) <= n * 0.02 + 1, s"bucket ${r.getAs[Int]("bucket")}: $c vs ${n / 10}")
      assert(r.getAs[Double]("lo") <= r.getAs[Double]("hi"))
    }
    // buckets tile: next bucket's lo is >= previous hi
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Double]("lo") >= a.getAs[Double]("hi"))
    }
    assert(rows.map(_.getAs[Long]("n")).sum === n)
  }

  test("q125 winsorization clips ~5% per tail and keeps the total inside the band") {
    val rows = RelationalMore.q125Winsorize(spark, dir).collect()
    assert(rows.nonEmpty)
    val sizes = Tables.lineitem(spark, dir).groupBy(col("l_returnflag")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val n = sizes(r.getAs[String]("l_returnflag"))
      val (p05, p95) = (r.getAs[Double]("p05"), r.getAs[Double]("p95"))
      val (lo, hi) = (r.getAs[Long]("n_lo"), r.getAs[Long]("n_hi"))
      assert(p05 < p95)
      // interpolated percentiles put at most ~5% strictly outside each edge
      assert(lo <= n * 0.05 + 1, s"lo=$lo n=$n")
      assert(hi <= n * 0.05 + 1, s"hi=$hi n=$n")
      assert(lo >= n * 0.04 - 1 && hi >= n * 0.04 - 1, "tails should be near 5%")
      val total = r.getAs[Double]("winsorized_total")
      assert(total >= n * p05 && total <= n * p95)
    }
  }

  test("q135 table diff classifies added/removed/changed against the mutation spec") {
    val byType = RelationalMore.q135TableDiff(spark, dir).collect()
      .groupBy(_.getAs[String]("change_type"))
      .map { case (t, rs) => t -> rs.map(_.getAs[Long]("o_orderkey")).toSet }
    val keys = Tables.orders(spark, dir).select(col("o_orderkey"))
      .collect().map(_.getLong(0)).toSet
    // re-inserted keys are offset by the live max key (collision-proof at
    // any sweep scale), not a constant
    assert(byType("added") === keys.filter(_ % 10 == 3).map(_ + keys.max))
    assert(byType("removed") === keys.filter(_ % 10 == 7))
    assert(byType("changed") === keys.filter(_ % 10 == 0))
    // presence columns: adds have no before-value, removes no after-value
    RelationalMore.q135TableDiff(spark, dir).collect().foreach { r =>
      r.getAs[String]("change_type") match {
        case "added"   => assert(r.isNullAt(r.fieldIndex("old_price")))
        case "removed" => assert(r.isNullAt(r.fieldIndex("new_price")))
        case _ => assert(!r.isNullAt(r.fieldIndex("old_price")) &&
          !r.isNullAt(r.fieldIndex("new_price")))
      }
    }
  }

  test("q142 z-order buckets are small rectangles in BOTH dimensions") {
    val rows = RelationalMore.q142ZOrder(spark, dir).collect()
    assert(rows.length > 4, "expected a non-degenerate bucket count")
    val globalX = rows.map(_.getAs[Long]("max_x")).max - rows.map(_.getAs[Long]("min_x")).min
    val globalY = rows.map(_.getAs[Long]("max_y")).max - rows.map(_.getAs[Long]("min_y")).min
    rows.foreach { r =>
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") <= globalX / 4 + 1,
        s"bucket ${r.getAs[Long]("bucket")} x-span")
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") <= globalY / 4 + 1,
        s"bucket ${r.getAs[Long]("bucket")} y-span")
    }
    // contrast: slicing by x alone leaves some slice spanning ~all of y —
    // single-column layout prunes one dimension and none of the other
    val o = Tables.orders(spark, dir).select(
      col("o_custkey").cast("long").as("x"),
      datediff(to_date(col("o_orderdate")), lit("1995-01-01")).cast("long").as("y"))
    val xSliced = o.withColumn("bucket", expr("x div 64"))
      .groupBy("bucket").agg(min(col("y")).as("lo"), max(col("y")).as("hi"))
      .collect()
    assert(xSliced.exists(r => r.getAs[Long]("hi") - r.getAs[Long]("lo") > globalY / 2))
  }

  test("q143 incremental merge equals the full recompute (mergeable-aggregate law)") {
    val merged = RelationalMore.q143IncrementalMv(spark, dir).collect()
    val full = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        Num.moneySum(col("o_totalprice")).as("sum_price"))
      .collect()
      .map(r => r.getAs[Long]("o_custkey") ->
        ((r.getAs[Long]("n_orders"), r.getAs[Double]("sum_price")))).toMap
    assert(merged.length === full.size)
    merged.foreach { r =>
      val (n, s) = full(r.getAs[Long]("o_custkey"))
      assert(r.getAs[Long]("n_orders") === n)
      assert(r.getAs[Double]("sum_price") === s) // exact decimal merge — bit-equal
    }
  }

  test("merge law: partial-then-merge equals direct aggregation for ANY split (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val rowsGen = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(0L, 7L)
        cents <- Gen.choose(0L, 999999L) // values on the exact .01 grid
      } yield (k, cents / 100.0))
      splitMod <- Gen.choose(2, 9)
      splitRem <- Gen.choose(0, 8)
    } yield (rows, splitMod, splitRem.min(splitMod - 1))
    val prop = Prop.forAll(rowsGen) { case (rows, m, r) =>
      val df = rows.toDF("k", "v")
      val idx = df.withColumn("i", monotonically_increasing_id())
      val a = RelationalMore.mvPartial(idx.filter(col("i") % m === r), "k", "v")
      val b = RelationalMore.mvPartial(idx.filter(col("i") % m =!= r), "k", "v")
      val merged = RelationalMore.mvMerge("k", a, b).collect()
        .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
      val direct = RelationalMore.mvMerge("k", RelationalMore.mvPartial(df, "k", "v"))
        .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
      merged == direct // exact decimal partials → bit-equal merge
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(result.passed, result.status.toString)
  }

  test("q158 RFM scores are 1..5, roughly equi-depth, and segments cover the rules") {
    val rows = RelationalMore.q158RfmSegments(spark, dir).collect()
    val n = rows.length.toDouble
    Seq("r_score", "f_score", "m_score").foreach { c =>
      val scores = rows.map(_.getAs[Int](c))
      assert(scores.forall(v => v >= 1 && v <= 5), c)
      // equi-depth up to tie distortion: no bucket hoards the population
      scores.groupBy(identity).values.foreach(b => assert(b.length <= n * 0.45, c))
    }
    rows.foreach { r =>
      val (rs, fs) = (r.getAs[Int]("r_score"), r.getAs[Int]("f_score"))
      val seg = r.getAs[String]("segment")
      if (rs >= 4 && fs >= 4) assert(seg === "champion")
      else if (rs <= 2 && fs >= 4) assert(seg === "at_risk_loyal")
      else if (rs >= 4 && fs <= 2) assert(seg === "recent_light")
      else assert(seg === "regular")
    }
  }

  test("q164 skyline keeps exactly the planted non-dominated customers") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // (custkey → f orders totalling m): A(3,300) B(2,400) C(1,500) on the
    // frontier; D(2,100) dominated by A, E(1,50) dominated by A/B
    val rows = Seq(
      (1L, 100.0), (2L, 100.0), (3L, 100.0),       // A = cust 1
      (4L, 200.0), (5L, 200.0),                    // B = cust 2
      (6L, 500.0),                                 // C = cust 3
      (7L, 50.0), (8L, 50.0),                      // D = cust 4
      (9L, 50.0))                                  // E = cust 5
    val cust = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L,
      6L -> 3L, 7L -> 4L, 8L -> 4L, 9L -> 5L)
    val d = java.nio.file.Files.createTempDirectory("graft_sky").toString
    rows.map { case (ok, p) => (ok, cust(ok), "O", p, ts, "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    val got = RelationalMore.q164Skyline(spark, d).collect()
      .map(_.getAs[Long]("o_custkey")).toSet
    assert(got === Set(1L, 2L, 3L))
  }

  test("q164 skyline keeps a point whose spend TIES the max at higher frequency (strict domination)") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // A = cust 1: f=3, m=300. T = cust 2: f=1, m=300 — m ties A's max, so
    // under the oracle's STRICT domination (q.f > p.f AND q.m > p.m) T is
    // NOT dominated and must survive; a `m > mx` reformulation drops it.
    // D = cust 3: f=2, m=200 — strictly dominated by A, must go.
    val rows = Seq(
      (1L, 1L, 100.0), (2L, 1L, 100.0), (3L, 1L, 100.0), // A: 3 × 100
      (4L, 2L, 300.0),                                   // T: 1 × 300
      (5L, 3L, 100.0), (6L, 3L, 100.0))                  // D: 2 × 100
    val d = java.nio.file.Files.createTempDirectory("graft_sky_tie").toString
    rows.map { case (ok, ck, p) => (ok, ck, "O", p, ts, "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    val got = RelationalMore.q164Skyline(spark, d).collect()
      .map(r => r.getAs[Long]("o_custkey") -> r.getAs[Long]("m")).toMap
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L) === 30000L && got(2L) === 30000L) // exact cent-grid ties
  }

  test("q151 Benford audit covers digits 1-9 with proportions that sum to one") {
    val rows = RelationalMore.q151Benford(spark, dir).collect()
    assert(rows.map(_.getAs[Int]("digit")).toSeq === (1 to 9))
    assert(math.abs(rows.map(_.getAs[Double]("p_obs")).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getAs[Double]("p_benford")).sum - 1.0) < 1e-4)
    // expectation is monotonically decreasing in the digit
    val exp = rows.map(_.getAs[Double]("p_benford"))
    assert(exp.zip(exp.tail).forall { case (a, b) => a > b })
  }

  test("q136 MAD flags exactly the planted extreme, with the hand-computed score") {
    import spark.implicits._
    // group: 3×10.00, 3×11.00, 3×12.00, one 100.00 → median 11.00 cents=1100,
    // p = 2·cents − 2200, MAD half-cents mad4 = 400; only the 100.00 row
    // passes 1349·|p| > 3500·400, score = (13490·17800) div 400 = 600305.
    val vals = Seq(10.0, 10.0, 10.0, 11.0, 11.0, 11.0, 12.0, 12.0, 12.0, 100.0)
    val d = java.nio.file.Files.createTempDirectory("graft_mad").toString
    vals.zipWithIndex
      .map { case (v, i) => (i.toLong, 1704067200L * 1000000000L, 1L, "view", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val got = RelationalMore.q136MadOutliers(spark, d).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Double]("value") === 100.0)
    assert(got.head.getAs[Long]("mod_z_bp") === 600305L)
  }

  test("q196 CDC apply: out-of-order seq wins, deletes erase, resurrection works") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    // keys chosen to hit every CDC path; maxk = 63 so fresh keys are 63+k:
    //   1  → untouched 'K'
    //   7  → 'U' seq 2 only (price ×1.2)
    //   14 → 'D' seq 1 then 'U' seq 2: the LATER update resurrects the row
    //   3  → 'D' seq 3: deleted
    //   63 → 'U' seq 2 then 'D' seq 3: the LATER delete wins over the update
    //   6  → fresh key 69 as 'U' (insert seq 1 then update seq 2, ×1.3)
    //   16 → fresh key 79 as 'I' (insert only)
    Seq(1L, 3L, 6L, 7L, 14L, 16L, 63L)
      .map(k => (k, 1L, "O", 100.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    val got = RelationalMore.q196CdcApply(spark, d).collect()
      .map(r => r.getAs[Long]("o_orderkey") ->
        ((r.getAs[String]("op"), r.getAs[Double]("o_totalprice")))).toMap
    assert(got === Map(
      1L -> (("K", 100.0)), 7L -> (("U", 120.0)), 14L -> (("U", 120.0)),
      6L -> (("K", 100.0)), 16L -> (("K", 100.0)),
      69L -> (("U", 130.0)), 79L -> (("I", 100.0))))
  }
}
