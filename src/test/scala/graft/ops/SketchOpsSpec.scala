package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SketchOpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q220 KMV similarity: identical sources estimate 1.0, disjoint sources 0.0") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_kmv").toString
    // srcA and srcB share the exact token set (est must be 1.0 — the
    // sketches are identical); srcC is disjoint (est must be 0.0)
    val shared = (1 to 200).map(i => s"tok$i").mkString(" ")
    val other = (1 to 200).map(i => s"zzz$i").mkString(" ")
    Seq(
      (1L, shared, "en", "srcA"), (2L, shared, "en", "srcB"),
      (3L, other, "en", "srcC"))
      .map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val got = SketchOps.q220SourceSimilarity(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("est_jaccard")).toMap
    assert(got(("srcA", "srcB")) === 1.0)
    assert(got(("srcA", "srcC")) === 0.0)
    assert(got(("srcB", "srcC")) === 0.0)
  }

  test("q74 merged region sketches land within rank tolerance of exact percentiles") {
    val approx = SketchOps.q74Raw(spark, dir).collect()
      .map(r => r.getAs[Number]("n_regionkey").longValue -> r).toMap
    // exact per-region percentiles straight off customer⋈nation
    val exact = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey"))
      .agg(
        expr("percentile(c_acctbal, 0.1)").as("e10"),
        expr("percentile(c_acctbal, 0.5)").as("e50"),
        expr("percentile(c_acctbal, 0.9)").as("e90"),
        expr("max(c_acctbal) - min(c_acctbal)").as("range"),
        count(lit(1)).as("n"))
      .collect()
    assert(exact.nonEmpty)
    exact.foreach { r =>
      val k = r.getAs[Number]("n_regionkey").longValue
      val a = approx(k)
      val range = r.getAs[Double]("range")
      // GK guarantees rank error <= eps*n; with small n per region translate
      // to a generous value-tolerance: 15% of the group's value range.
      for ((ac, ec) <- Seq("p10" -> "e10", "p50" -> "e50", "p90" -> "e90")) {
        val av = a.getAs[Double](ac)
        val ev = r.getAs[Double](ec)
        assert(math.abs(av - ev) <= 0.15 * range,
          s"region $k $ac: sketch $av vs exact $ev (range $range)")
      }
      assert(a.getAs[Long]("n_customers") === r.getAs[Long]("n"))
    }
  }

  test("Misra-Gries with k << vocab keeps every heavy hitter and never overestimates") {
    val mg = new SketchOps.MisraGriesAgg(4)
    // skewed stream: 'a' x60, 'b' x25, then 30 singletons
    val stream = Seq.fill(60)("a") ++ Seq.fill(25)("b") ++ (1 to 30).map(i => s"x$i")
    val n = stream.length
    // split across 3 "partitions", reduce each, then merge (mergeable-summary path)
    val parts = stream.grouped((n + 2) / 3).toSeq
      .map(p => p.foldLeft(mg.zero)(mg.reduce))
    val summary = parts.reduce(mg.merge)
    assert(summary.size <= 4)
    // guarantee: freq > n/k = 115/4 = 28.75 -> 'a' must survive
    assert(summary.contains("a"))
    // MG counters never exceed the true frequency
    assert(summary("a") <= 60L)
    summary.get("b").foreach(c => assert(c <= 25L))
  }

  test("q77 two-pass heavy hitters returns the exact top-10 (k exceeds vocab here)") {
    val viaSketch = SketchOps.q77HeavyHitters(spark, dir).collect().map(_.toSeq)
    val exact = Tables.documents(spark, dir)
      .select(explode(expr("filter(split(lower(text), ' '), t -> t != '')")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc).limit(10)
      .collect().map(_.toSeq)
    assert(viaSketch.toSeq === exact.toSeq)
  }

  test("sketch merge is associative with grouping: global quantile from region sketches matches direct sketch") {
    import org.apache.spark.sql.Encoders
    val sketch = udaf(SketchOps.SketchAgg, Encoders.scalaDouble)
    val mergeQ = udaf(SketchOps.SketchMergeAgg, Encoders.BINARY)
    val c = Tables.customer(spark, dir)
    // two-level: nation sketches -> single merged global
    val twoLevel = c.groupBy(col("c_nationkey")).agg(sketch(col("c_acctbal")).as("sk"))
      .agg(mergeQ(col("sk")).as("q")).select(col("q.p50")).collect()(0).getDouble(0)
    // one-level: direct global sketch
    val oneLevel = c.agg(sketch(col("c_acctbal")).as("sk"))
      .agg(mergeQ(col("sk")).as("q")).select(col("q.p50")).collect()(0).getDouble(0)
    val exact = c.agg(expr("percentile(c_acctbal, 0.5)")).collect()(0).getDouble(0)
    val range = c.agg(expr("max(c_acctbal) - min(c_acctbal)")).collect()(0).getDouble(0)
    assert(math.abs(twoLevel - exact) <= 0.05 * range, s"two-level $twoLevel vs exact $exact")
    assert(math.abs(oneLevel - exact) <= 0.05 * range, s"one-level $oneLevel vs exact $exact")
  }

  test("q99 HLL rollup: merged nation sketches within 5% of exact region distincts, merge == direct") {
    val rolled = SketchOps.q99Raw(spark, dir).collect()
      .map(r => r.getAs[Number]("n_regionkey").longValue ->
        (r.getAs[Long]("approx_customers"), r.getAs[Long]("n_customers"))).toMap
    val exact = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey"))
      .agg(countDistinct(col("c_custkey")).as("d"))
      .collect().map(r => r.getAs[Number]("n_regionkey").longValue -> r.getAs[Long]("d")).toMap
    for ((region, d) <- exact) {
      val (approx, n) = rolled(region)
      assert(n === d) // custkeys are unique, so counts equal distincts
      assert(math.abs(approx - d) <= math.max(1L, (d * 0.05).toLong),
        s"region $region: approx $approx vs exact $d")
    }
    // merging per-nation sketches must equal sketching the region directly
    val direct = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(c_custkey))").cast("long").as("a"))
      .collect().map(r => r.getAs[Number]("n_regionkey").longValue -> r.getAs[Long]("a")).toMap
    for ((region, a) <- direct) assert(rolled(region)._1 === a, s"region $region")
  }

  test("q126 CMS point estimates honor the overcount-only eps bound on the exact top-10") {
    val rows = SketchOps.q126CmsFreq(spark, dir).collect()
    assert(rows.length === 10)
    assert(rows.forall(_.getAs[Boolean]("within_eps_bound")))
    // the exact side must agree with a plain groupBy top-10
    val expected = Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey").cast("long").as("k"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("k")).limit(10)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("n"))).toSeq
    val got = rows.map(r => (r.getAs[Long]("l_suppkey"), r.getAs[Long]("exact_n"))).toSeq
    assert(got === expected)
  }
}
