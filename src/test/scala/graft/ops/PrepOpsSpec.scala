package graft.ops

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Planted-fixture tests for the prep/governance batch (q176-q182): known
  * answers on handcrafted inputs covering the directions and boundaries the
  * sf oracles only exercise in bulk (containment asymmetry, bin edges,
  * missing Variant fields, out-of-domain LM scoring, exact k-anonymity
  * group sizes, independence ⇒ MI = 0).
  */
class PrepOpsSpec extends SparkSpec {

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_prep_docs").toString
    rows.map { case (id, text, lang, source) => (id, text, lang, source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("q216 DP release: noise is reproducible, nonzero per cell, and Laplace-bounded") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_prep_ev").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00") // a Monday
    (0 until 300).map { i =>
      (i.toLong, new java.sql.Timestamp(base.getTime + i * 3600_000L),
        (i % 7).toLong, if (i % 3 == 0) "click" else "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")

    val r1 = PrepOps.q216DpCounts(spark, d).collect()
    val r2 = PrepOps.q216DpCounts(spark, d).collect()
    // published-once semantics: the release is a pure function of the data
    assert(r1.map(_.toSeq).toSeq === r2.map(_.toSeq).toSeq)
    val truth = spark.read.parquet(s"$d/events.parquet")
      .groupBy(col("event_type"), dayofweek(col("ts")).as("dow"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    r1.foreach { r =>
      val key = (r.getAs[String]("event_type"), r.getAs[Int]("dow"))
      val noise = r.getAs[Double]("noisy_n") - truth(key)
      assert(noise !== 0.0, s"cell $key drew exactly zero noise")
      // |Laplace(1)| < 30 has probability 1 - e^-30 — a failure here means
      // the inverse-CDF transform broke, not bad luck
      assert(math.abs(noise) < 30.0, s"cell $key noise $noise out of bounds")
    }
  }

  test("q176 containment is DIRECTED: excerpt ⊂ page, not the reverse") {
    // doc 1 = a 6-token excerpt (4 shingles), doc 2 = the same text plus a
    // long unique tail. Every shingle of 1 appears in 2 ⇒ cont(1⊂2) = 1.0;
    // 2 has many extra shingles ⇒ cont(2⊂1) ≪ 0.8. Jaccard would be ~0.1
    // and miss the pair entirely — the asymmetry is the point of the op.
    val excerpt = "alpha beta gamma delta epsilon zeta"
    val tail = (1 to 40).map(i => s"tail$i").mkString(" ")
    val d = docsDir(Seq(
      (1L, excerpt, "en", "s"),
      (2L, s"$excerpt $tail", "en", "s"),
      (3L, "unrelated words entirely different content here", "en", "s")))
    val got = PrepOps.q176Containment(spark, d).collect()
      .map(r => (r.getAs[Long]("id_sub"), r.getAs[Long]("id_super"),
        r.getAs[Double]("containment")))
    assert(got.toSeq === Seq((1L, 2L, 1.0)))
  }

  test("q176 stop-shingle cap at df<=25 is a no-op on the driver corpus (exact twin)") {
    // the cap equals the measured max shingle df at sf0.1, so NOTHING is
    // dropped at any driver SF — since round 9 the CAPPED form is the
    // catalog entry (the guard bounds pair mass to 25·postings on
    // saturated-vocab corpora, SURVEY §8.18) and the exact form is the
    // spec-only twin this test replays to prove the cap is lossless here
    val dir = "/root/testdata/sf0.001"
    val exact = PrepOps.q176ContainmentExact(spark, dir).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    val capped = PrepOps.q176Containment(spark, dir).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    assert(exact.nonEmpty)
    assert(capped === exact)
  }

  test("q177 compaction bins split at exact cumulative-byte boundaries") {
    // target = 32768. Sizes 30000, 2768, 10, 40000: cumulative-before =
    // 0, 30000, 32768, 32778 → bins 0, 0, 1, 1. The third file starts
    // EXACTLY at the target boundary — the off-by-one a float plan gets
    // wrong. (text padded to the size; n_chars = text.length)
    val d = docsDir(Seq(
      (1L, "x" * 30000, "en", "s"),
      (2L, "x" * 2768, "en", "s"),
      (3L, "x" * 10, "en", "s"),
      (4L, "x" * 40000, "en", "s")))
    val got = PrepOps.q177CompactionPlan(spark, d).collect()
      .map(r => r.getAs[Long]("bin") ->
        ((r.getAs[Long]("n_files"), r.getAs[Long]("bytes"),
          r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc")))).toMap
    assert(got === Map(0L -> ((2L, 32768L, 1L, 2L)), 1L -> ((2L, 40010L, 3L, 4L))))
  }

  test("q178 variant_get skips a missing field as NULL, count still sees the row") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_prep_ev").toString
    val ns = 1000000000L
    Seq(
      (1L, 1704067200L * ns, 1L, "a", 1.0, """{"k": 5}"""),
      (2L, 1704067201L * ns, 1L, "a", 1.0, """{"k": -3}"""),
      (3L, 1704067202L * ns, 1L, "a", 1.0, """{"other": 9}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val r = PrepOps.q178VariantJson(spark, d).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n") === 3L) // missing-k row still counted
    assert(r(0).getAs[Int]("min_k") === -3)
    assert(r(0).getAs[Int]("max_k") === 5)
    assert(r(0).getAs[Long]("sum_k") === 2L) // null skipped by sum
  }

  test("q179 reference-LM filter keeps reference-like text, drops token soup") {
    // Reference slice (src0) establishes the LM; doc 10 repeats reference
    // bigrams (seen → high logprob), docs 11-14 are out-of-domain soup
    // (every bigram unseen → add-k floor). 3 ref + 1 ref-like + 4 soup:
    // the median falls between the soup block and doc 10, so the filter
    // keeps the reference-like docs and drops every soup doc.
    val refText = "the quick brown fox jumps over the lazy dog again and again"
    val soup = "zzq qqx vvw wvv xqq qzz wwv xxq"
    val d = docsDir(
      (1L to 3L).map(i => (i, refText, "en", "src0")) ++ Seq(
        (10L, "the quick brown fox jumps over the lazy dog", "en", "src9"),
        (11L, soup, "en", "src9"), (12L, soup, "en", "src9"),
        (13L, soup, "en", "src9"), (14L, soup, "en", "src9")))
    val kept = PrepOps.q179CcnetFilter(spark, d).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(kept === Set(1L, 2L, 3L, 10L))
  }

  test("q180 k-anonymity counts exactly the sub-k groups and their rows") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_prep_cust").toString
    // group A: 6 rows (safe), group B: 2 rows, group C: 1 row (risky).
    // bal 1500.00 → band 1; 500.00 → band 0; 2500.00 → band 2.
    val rows =
      (1L to 6L).map(i => (i, s"c$i", "BUILDING", 1L, 1500.00)) ++
        Seq((7L, "c7", "AUTO", 1L, 500.00), (8L, "c8", "AUTO", 1L, 500.00),
          (9L, "c9", "AUTO", 2L, 2500.00))
    rows.toDF("c_custkey", "c_name", "c_mktsegment", "c_nationkey", "c_acctbal")
      .coalesce(1).write.parquet(s"$d/customer.parquet")
    val r = PrepOps.q180KAnonymity(spark, d).collect()(0)
    assert(r.getAs[Long]("n_groups") === 3L)
    assert(r.getAs[Long]("n_risky_groups") === 2L)
    assert(r.getAs[Long]("n_risky_rows") === 3L)
    assert(r.getAs[Long]("min_group") === 1L)
  }

  test("q181 rule engine: exact violation counts per rule from one scan each") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_prep_dq").toString
    val sd = java.sql.Date.valueOf("2024-01-01")
    Seq(
      (1L, 1L, 1L, 1, 50.0, 0.10, 0.08, "N", "O", sd), // qty>45, disc>8, tax>6
      (2L, 1L, 1L, 2, 10.0, 0.02, 0.01, "N", "O", sd))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    Seq(
      (1L, 1L, "O", 500000.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT"),
      (2L, 1L, "X", 1000.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    val got = PrepOps.q181DqRules(spark, d).collect()
      .map(r => r.getAs[String]("rule") ->
        ((r.getAs[Long]("n_checked"), r.getAs[Long]("n_violations")))).toMap
    assert(got === Map(
      "li_qty_gt_45" -> ((2L, 1L)), "li_tax_gt_6pct" -> ((2L, 1L)),
      "li_discount_gt_8pct" -> ((2L, 1L)),
      "ord_price_gt_400k" -> ((2L, 1L)), "ord_status_invalid" -> ((2L, 1L))))
  }

  test("q192 HRW resharding: every mover lands on the ADDED shard, counts match an independent replica") {
    val d = docsDir((1L to 200L).map(i => (i, s"text $i", "en", "s")))
    val rows = PrepOps.q192RendezvousShard(spark, d).collect()
    // the HRW invariant: a doc moves under 8→9 expansion IFF its new argmax
    // IS shard 8 — so per group n_moved must equal n_moved_to_new exactly
    rows.foreach { r =>
      assert(r.getAs[Long]("n_moved") === r.getAs[Long]("n_moved_to_new"),
        s"shard ${r.getAs[Int]("shard8")}: a doc moved to an OLD shard")
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum === 200L)
    // independent JVM-side replica of the md5-prefix HRW argmax
    def h(id: Long, s: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$id:$s".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    def argmax(id: Long, n: Int): Int = (0 until n).maxBy(s => (h(id, s), s))
    val expected = (1L to 200L).groupBy(argmax(_, 8)).map { case (s8, ids) =>
      s8 -> ((ids.size.toLong, ids.count(id => argmax(id, 9) != s8).toLong))
    }
    val got = rows.map(r => r.getAs[Int]("shard8") ->
      ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_moved")))).toMap
    assert(got === expected)
    // expansion moved SOME docs, but far fewer than mod-hash's ~8/9
    val moved = rows.map(_.getAs[Long]("n_moved")).sum
    assert(moved > 0L && moved < 100L, s"moved $moved of 200 — not HRW-minimal")
  }

  test("q182 MI: independent features score 0, dependent features score ln 2") {
    import spark.implicits._
    val ns = 1000000000L
    val day = 86400L * ns
    val mon = 1704672000L * ns // 2024-01-08 Mon
    def write(rows: Seq[(Long, Long, String)]): String = {
      val d = Files.createTempDirectory("graft_prep_mi").toString
      rows.zipWithIndex.map { case ((ts, uid, et), i) => (i.toLong, ts, uid, et, 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$d/events.parquet")
      d
    }
    // independent: both types occur equally on both days → MI = 0
    val ind = write(Seq(
      (mon, 1L, "a"), (mon, 1L, "b"), (mon + day, 1L, "a"), (mon + day, 1L, "b")))
    val mi0 = PrepOps.q182MutualInfo(spark, ind).collect()(0).getAs[Double]("mi_nats")
    assert(mi0 === 0.0)
    // dependent: type determines day → MI = H(X) = ln 2 ≈ 0.6931
    val dep = write(Seq((mon, 1L, "a"), (mon, 1L, "a"), (mon + day, 1L, "b"), (mon + day, 1L, "b")))
    val mi1 = PrepOps.q182MutualInfo(spark, dep).collect()(0).getAs[Double]("mi_nats")
    assert(mi1 === 0.6931)
  }
}
