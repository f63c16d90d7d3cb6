package graft.ops

import java.nio.file.Files

import graft.SparkSpec

/** Planted-fixture tests for the round-11 planner/audit batch: metadata
  * conflicts over near-dup clusters (q423), the IVF nprobe recall curve
  * (q424), the quality-gate overlap census (q425), per-source survivor
  * retention (q426), the source vocabulary-overlap matrix (q427), and the
  * portable LSH bucket forecast (q428) — each on a hand-computed ledger.
  */
class CorpusPlannerSpec extends SparkSpec {

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_r11_docs").toString
    rows.map { case (id, text, lang, source) =>
      (id, text, lang, source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  private def embDir(rows: Seq[(Long, Seq[Float], Int)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_r11_emb").toString
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("q423 label conflict: a cross-lang cluster lands in the (true, false) cell") {
    // docs 1+2 are exact near-dups (jaccard 1) but disagree on lang and
    // agree on source; doc 3 is an untouched singleton (not censused).
    val d = docsDir(Seq(
      (1L, "a b c d", "en", "s1"),
      (2L, "a b c d", "de", "s1"),
      (3L, "x y z w", "en", "s1")))
    val got = CorpusStatOps.q423LabelConflict(spark, d).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1),
        r.getAs[Long]("n_clusters"), r.getAs[Long]("n_docs")))
    assert(got.toSeq === Seq((true, false, 1L, 2L)))
  }

  test("q424 nprobe curve: recall 1/2 at nprobe=1, exact at nprobe >= #cells") {
    // Two well-separated cells. Query = vec 0 (the only vec_id < 5).
    // Ground truth top-10 = all 4 other vectors. nprobe=1 probes only the
    // query's own cell {10, 11} -> 2/4 hits; nprobe >= 2 covers both
    // cells -> 4/4.
    val d = embDir(Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0),
      (10L, Seq(0.9f, 0.1f, 0f, 0f), 0),
      (11L, Seq(0.8f, 0.2f, 0f, 0f), 0),
      (20L, Seq(0f, 1f, 0f, 0f), 1),
      (21L, Seq(0.1f, 0.9f, 0f, 0f), 1)))
    val got = VectorOps.q424NprobeCurve(spark, d).collect()
      .map(r => (r.getInt(0), r.getAs[Long]("hits"),
        r.getAs[Long]("gt_rows"), r.getAs[Long]("recall_ppm")))
    assert(got.toSeq === Seq(
      (1, 2L, 4L, 500000L), (2, 4L, 4L, 1000000L), (4, 4L, 4L, 1000000L)))
  }

  test("q425 filter overlap: hand-computed gate cells and shares") {
    // doc A: 8 tokens, all stopwords, no punctuation -> (T, T, T)
    // doc B: 2 tokens, no stopwords, no punctuation -> len fail, stop
    // fail, sym ok -> (F, F, T)
    val d = docsDir(Seq(
      (1L, "the of and is a to the of", "en", "s1"),
      (2L, "x y", "en", "s1")))
    val got = CurateOps.q425FilterOverlap(spark, d).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2),
        r.getAs[Long]("n_docs"), r.getAs[Long]("tokens"),
        r.getAs[Long]("docs_ppm")))
    assert(got.toSeq === Seq(
      (false, false, true, 1L, 2L, 500000L),
      (true, true, true, 1L, 8L, 500000L)))
  }

  test("q426 survivor retention: the dropped cluster member bills its source") {
    // docs 1+2 cluster (tie on n_chars -> key n_chars*1e8 - doc_id keeps
    // doc 1); doc 3 is a singleton in s2 and fully retained.
    val d = docsDir(Seq(
      (1L, "a b c d", "en", "s1"),
      (2L, "a b c d", "en", "s1"),
      (3L, "x y z w", "en", "s2")))
    val rows = TextOps.q426SurvivorRetention(spark, d).collect()
      .map(r => (r.getString(0), r.getAs[Long]("docs_before"),
        r.getAs[Long]("tokens_before"), r.getAs[Long]("docs_after"),
        r.getAs[Long]("tokens_after"), r.getAs[Long]("docs_kept_ppm"),
        r.getAs[Long]("tokens_kept_ppm")))
    assert(rows.toSeq === Seq(
      ("s1", 2L, 8L, 1L, 4L, 500000L, 500000L),
      ("s2", 1L, 4L, 1L, 4L, 1000000L, 1000000L)))
  }

  test("q427 source type overlap: one shared shingle of two per side") {
    // s1: {"a b c", "b c d"}; s2: {"a b c", "b c x"} -> inter 1, union 3
    val d = docsDir(Seq(
      (1L, "a b c d", "en", "s1"),
      (2L, "a b c x", "en", "s2")))
    val got = CorpusStatOps.q427SourceTypeOverlap(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("inter"),
        r.getAs[Long]("na"), r.getAs[Long]("nb"),
        r.getAs[Long]("jaccard_ppm")))
    assert(got.toSeq === Seq(("s1", "s2", 1L, 2L, 2L, 333333L)))
  }

  test("q429 interleave audit: runs computed against a JVM-side md5 replay") {
    // Recompute the md5 global order here and derive the expected
    // per-source run ledger independently of the two-pass cumsum.
    val rows = Seq(
      (1L, "w", "en", "s1"), (2L, "w", "en", "s1"), (3L, "w", "en", "s1"),
      (4L, "w", "en", "s2"), (5L, "w", "en", "s2"), (6L, "w", "en", "s2"))
    def md5hex(s: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val order = rows.map(_._1).sortBy(id => md5hex(id.toString))
    val srcOf = rows.map(r => r._1 -> r._4).toMap
    val runs = order.foldLeft(List.empty[(String, Long)]) { (acc, id) =>
      val s = srcOf(id)
      acc match {
        case (ps, len) :: tail if ps == s => (ps, len + 1) :: tail
        case _ => (s, 1L) :: acc
      }
    }.reverse
    val expect = runs.groupBy(_._1).map { case (s, rs) =>
      (s, rs.map(_._2).sum, rs.length.toLong, rs.map(_._2).max,
        1000000L * rs.length / rs.map(_._2).sum)
    }.toSeq.sortBy(_._1)
    val d = docsDir(rows)
    val got = CorpusOps.q429InterleaveAudit(spark, d).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_runs"), r.getAs[Long]("max_run"),
        r.getAs[Long]("runs_ppm")))
    assert(got.toSeq === expect)
  }

  test("q430 pack purity: one straddling mixed block on a hand-packed corpus") {
    // All docs are 1500 tokens -> cum 1500/3000/4500: doc A fills block 0
    // into block 1 alone? No: blocks of 2048 — A spans [0,1500) block 0;
    // B spans [1500,3000) blocks 0-1; C spans [3000,4500) blocks 1-2.
    // Per block: b0 {A,B}, b1 {B,C}, b2 {C}. Expected purity depends on
    // the md5 order of doc_ids — recompute it here the same way.
    def words(n: Int) = (1 to n).map(_ => "w").mkString(" ")
    val rows = Seq(
      (1L, words(1500), "en", "s1"),
      (2L, words(1500), "de", "s2"),
      (3L, words(1500), "en", "s1"))
    def md5hex(s: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val order = rows.sortBy(r => md5hex(r._1.toString))
    val bins = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.Set[(String, String)]]
    var cum = 0L
    order.foreach { case (_, _, lang, src) =>
      val lo = cum / 2048; cum += 1500; val hi = (cum - 1) / 2048
      (lo to hi).foreach(b =>
        bins.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += ((src, lang)))
    }
    val blocks = bins.size.toLong
    val multiSrc = bins.values.count(_.map(_._1).size > 1).toLong
    val multiLang = bins.values.count(_.map(_._2).size > 1).toLong
    val d = docsDir(rows)
    val got = CorpusOps.q430PackPurity(spark, d).collect().head
    assert(got.getAs[Long]("blocks") === blocks)
    assert(got.getAs[Long]("multi_source_blocks") === multiSrc)
    assert(got.getAs[Long]("multi_lang_blocks") === multiLang)
    assert(got.getAs[Long]("pure_source_blocks") === blocks - multiSrc)
    assert(got.getAs[Long]("multi_source_ppm") === 1000000L * multiSrc / blocks)
  }

  test("q428 LSH bucket forecast: identical docs share every band bucket") {
    // Three identical docs -> identical 4-hash signatures -> one bucket
    // of 3 per band -> 3 candidate pairs per band. The 1-token doc has
    // no shingles and stays out of the index entirely.
    val d = docsDir(Seq(
      (1L, "a b c d e", "en", "s1"),
      (2L, "a b c d e", "en", "s1"),
      (3L, "a b c d e", "en", "s2"),
      (4L, "solo", "en", "s1")))
    val got = CapacityAuditOps.q428LshBucketForecast(spark, d).collect()
      .map(r => (r.getInt(0), r.getAs[Long]("n_buckets"),
        r.getAs[Long]("docs"), r.getAs[Long]("max_bucket"),
        r.getAs[Long]("cand_pairs")))
    assert(got.toSeq === Seq((0, 1L, 3L, 3L, 3L), (1, 1L, 3L, 3L, 3L)))
  }

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("q431 survivor rules: first/longest/hash pick different reps, hand-computed swing") {
    // Docs 1 and 4 are near-dups (jaccard 3/4): rep_first = 1 (min id),
    // rep_longest = 4 (more chars), rep_hash = 4 (md5("4") = a87f... <
    // md5("1") = c4ca...). Doc 7 is an untouched s2 singleton.
    // s1 token masses: keep-first -> doc1 = 5; keep-longest/hash ->
    // doc4 = 6; swing = 1e6 * (6 - 5) div 11 = 90909.
    val d = docsDir(Seq(
      (1L, "a b c d e", "en", "s1"),
      (4L, "a b c d e f", "en", "s1"),
      (7L, "x y z w", "en", "s2")))
    val got = TextOps.q431SurvivorRuleSensitivity(spark, d).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("docs_before"),
        r.getAs[Long]("tokens_before"), r.getAs[Long]("tok_first"),
        r.getAs[Long]("tok_longest"), r.getAs[Long]("tok_hash"),
        r.getAs[Long]("swing_ppm")))
    assert(got.toSeq === Seq(
      ("s1", 2L, 11L, 5L, 6L, 6L, 90909L),
      ("s2", 1L, 4L, 4L, 4L, 4L, 0L)))
  }

  test("q432 ingest-gap histogram: gaps 1 and 3 land in log2 buckets 0 and 1") {
    // Pair (10, 11): identical docs, gap 1 -> bucket 0. Pair (1, 4):
    // jaccard 3/4, gap 3 -> bucket 1 (2 <= 3 < 4).
    val d = docsDir(Seq(
      (1L, "a b c d e", "en", "s1"),
      (4L, "a b c d e f", "en", "s1"),
      (10L, "p q r s t", "en", "s1"),
      (11L, "p q r s t", "en", "s1")))
    val got = TextOps.q432DupIngestGap(spark, d).collect()
      .map(r => (r.getInt(0), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("cum_pairs"), r.getAs[Long]("cum_ppm")))
    assert(got.toSeq === Seq((0, 1L, 1L, 500000L), (1, 1L, 2L, 1000000L)))
  }

  test("q433 block-size sweep: split/crossing counts replayed over the md5 order") {
    // Two 600-token docs; md5("1") = c4ca... < md5("2") = c81e..., so the
    // pack order is doc1 (offsets 0-599) then doc2 (600-1199).
    // B=512: both docs cross one boundary (3 blocks); B=1024: only doc2
    // does (2 blocks); B=2048/4096: one block, no splits.
    def words(n: Int): String = (0 until n).map(i => s"w$i").mkString(" ")
    val d = docsDir(Seq(
      (1L, words(600), "en", "s1"),
      (2L, words(600), "en", "s2")))
    val got = CorpusOps.q433BlockSizeSweep(spark, d).collect()
      .map(r => (r.getAs[Long]("block_tokens"), r.getAs[Long]("n_blocks"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("split_docs"),
        r.getAs[Long]("split_ppm"), r.getAs[Long]("boundary_crossings"),
        r.getAs[Long]("docs_per_block_ppm")))
    assert(got.toSeq === Seq(
      (512L, 3L, 2L, 2L, 1000000L, 2L, 666666L),
      (1024L, 2L, 2L, 1L, 500000L, 1L, 1000000L),
      (2048L, 1L, 2L, 0L, 0L, 0L, 2000000L),
      (4096L, 1L, 2L, 0L, 0L, 0L, 2000000L)))
  }

  test("q434 shard forecast: JVM-side md5 replay of the token-mass balance") {
    val rows = (1L to 40L).map(i =>
      (i, (0 until (3 + (i % 5)).toInt).map(j => s"t$j").mkString(" "), "en", s"s${i % 3}"))
    def hk(id: Long): Long =
      java.lang.Long.parseLong(md5hex(s"shard:$id").substring(0, 13), 16)
    val expected = Seq(64L, 256L, 1024L).map { n =>
      val byShard = rows.groupBy(r => hk(r._1) % n)
        .view.mapValues(_.map(_._2.split(" ").length.toLong).sum).toMap
      val tot = byShard.values.sum
      (n, byShard.size.toLong, tot, byShard.values.max, byShard.values.min,
        1000000L * byShard.values.max * n / tot)
    }
    val d = docsDir(rows)
    val got = CapacityAuditOps.q434ShardCountForecast(spark, d).collect()
      .map(r => (r.getAs[Long]("n_shards"), r.getAs[Long]("nonempty_shards"),
        r.getAs[Long]("tokens_total"), r.getAs[Long]("max_shard_tok"),
        r.getAs[Long]("min_shard_tok"), r.getAs[Long]("hot_ppm")))
    assert(got.toSeq === expected)
  }

  test("q435 epoch budget: the 4-epoch clamp fires on the starved source") {
    // s1: 10 tokens, s2: 1 token. T = 11, need = 5 each. s2 wants 5
    // epochs -> clamped at 4e6 ppm, take = 4, deficit = 1.
    val d = docsDir(Seq(
      (1L, "a b c d e f g h i j", "en", "s1"),
      (2L, "k", "en", "s2")))
    val got = CorpusStatOps.q435EpochBudget(spark, d).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("tok"),
        r.getAs[Long]("need_tok"), r.getAs[Long]("epochs_ppm"),
        r.getAs[Long]("take_tok"), r.getAs[Long]("deficit_tok")))
    assert(got.toSeq === Seq(
      ("s1", 10L, 5L, 500000L, 5L, 0L),
      ("s2", 1L, 5L, 4000000L, 4L, 1L)))
  }

  test("q436 minhash width: JVM-side md5 replay of the k-prefix estimates") {
    // One pair: shingle sets {abc,bcd,cde} vs {abc,bcd,cde,def} ->
    // exact jaccard 3/4 -> 750000 ppm. Per hash index i the doc minhashes
    // agree unless min lands on 'd e f'; replay the 16 mins in the JVM.
    val shA = Seq("a b c", "b c d", "c d e")
    val shB = shA :+ "d e f"
    def minh(sh: Seq[String], i: Int): String = sh.map(s => md5hex(s"$s#$i")).min
    def est(k: Int): Long =
      1000000L * (0 until k).count(i => minh(shA, i) == minh(shB, i)) / k
    val expected = Seq(4, 8, 16).map { k =>
      val e = est(k)
      val err = math.abs(e - 750000L)
      (k.toLong, 1L, err, math.max(e - 750000L, 0L), math.max(750000L - e, 0L))
    }
    val d = docsDir(Seq(
      (1L, "a b c d e", "en", "s1"),
      (4L, "a b c d e f", "en", "s1")))
    val got = CapacityAuditOps.q436MinhashWidthAudit(spark, d).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("mae_ppm"), r.getAs[Long]("over_ppm"),
        r.getAs[Long]("under_ppm")))
    assert(got.toSeq === expected)
  }

  test("q438 contamination attribution: per-source gram coverage of the eval leak") {
    // Eval doc 7 has 5-grams {"a b c d e", "b c d e f"}. Train: doc 1
    // (s1) carries the first; docs 2 and 3 (s2) carry one each -> s2
    // covers both. contaminated_total = 2.
    val d = docsDir(Seq(
      (7L, "a b c d e f", "en", "s9"),
      (1L, "a b c d e x y", "en", "s1"),
      (2L, "b c d e f", "en", "s2"),
      (3L, "z a b c d e", "en", "s2"),
      (4L, "no leak here at all", "en", "s3")))
    val got = CorpusStatOps.q438ContaminationAttribution(spark, d).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("hit_grams"),
        r.getAs[Long]("hit_docs"), r.getAs[Long]("contaminated_total"),
        r.getAs[Long]("coverage_ppm")))
    assert(got.toSeq === Seq(
      ("s1", 1L, 1L, 2L, 500000L), ("s2", 2L, 2L, 2L, 1000000L)))
  }

  test("q439 attention contamination: JVM-side replay of the packed segment math") {
    // md5 order: doc4 (a87f...) < doc1 (c4ca...) < doc2 (c81e...)? No —
    // c4ca < c81e, so the order is 4, 1, 2. The replay recomputes it.
    def words(n: Int): String = (0 until n).map(i => s"w$i").mkString(" ")
    val rows = Seq((1L, 600L), (2L, 600L), (4L, 1500L))
    val order = rows.sortBy(r => md5hex(r._1.toString))
    var cum = 0L
    val bins = scala.collection.mutable.Map.empty[Long, List[Long]]
    order.foreach { case (_, n) =>
      val st = cum; cum += n; val en = cum - 1
      (st / 2048 to en / 2048).foreach { b =>
        val seg = math.min(en, (b + 1) * 2048 - 1) - math.max(st, b * 2048) + 1
        bins(b) = seg :: bins.getOrElse(b, Nil)
      }
    }
    val stats = bins.values.map { segs =>
      val t = segs.sum; val sumsq = segs.map(s => s * s).sum
      (segs.length, t, sumsq)
    }.toSeq
    val expBlocks = stats.length.toLong
    val expMulti = stats.count(_._1 > 1).toLong
    val expTokens = stats.map(_._2).sum
    val expCross = stats.map { case (_, t, sq) => (t * t - sq) / 2 }.sum
    val expTsq = stats.map { case (_, t, _) => t * t }.sum
    val expPpm = 1000000L * (2 * expCross) / expTsq
    val expMax = stats.map { case (_, t, sq) => 1000000L * (t * t - sq) / (t * t) }.max
    val d = docsDir(rows.map { case (id, n) => (id, words(n.toInt), "en", "s1") })
    val got = CorpusOps.q439AttentionContamination(spark, d).collect().head
    assert(got.getAs[Long]("blocks") === expBlocks)
    assert(got.getAs[Long]("multi_doc_blocks") === expMulti)
    assert(got.getAs[Long]("tokens") === expTokens)
    assert(got.getAs[Long]("cross_pair_mass") === expCross)
    assert(got.getAs[Long]("cross_ppm") === expPpm)
    assert(got.getAs[Long]("max_block_cross_ppm") === expMax)
  }

  test("q440 cap recall frontier: a df-6 shingle's candidates vanish below cap 10") {
    // Docs 1/4: near-dup pair via df-2 shingles -> candidate AND accepted
    // at every cap. Docs 20-25 share ONLY the df-6 shingle "x y z": their
    // C(6,2) = 15 pairs are candidates at cap >= 10 (inter = 1, jaccard
    // 1/5 < 0.5 -> never accepted) and vanish entirely at cap 5.
    val six = (20L to 25L).map(i => (i, s"x y z u$i v$i", "en", "s1"))
    val d = docsDir(Seq(
      (1L, "a b c d e", "en", "s1"),
      (4L, "a b c d e f", "en", "s1")) ++ six)
    val got = CorpusStatOps.q440CapRecallFrontier(spark, d).collect()
      .map(r => (r.getAs[Long]("cap"), r.getAs[Long]("cand_pairs"),
        r.getAs[Long]("accepted_pairs"), r.getAs[Long]("lost_vs_max"),
        r.getAs[Long]("lost_ppm")))
    assert(got.toSeq === Seq(
      (5L, 1L, 1L, 0L, 0L), (10L, 16L, 1L, 0L, 0L),
      (25L, 16L, 1L, 0L, 0L), (50L, 16L, 1L, 0L, 0L)))
  }

  test("q441 edit locus: append vs interior edit vs identical, hand-computed ends") {
    // Pair (1,4): append ("a b c d e" -> "+ f") -> cp=5, cs=0, end-only.
    // Pair (10,11): identical -> cp=minl=5, end-only.
    // Pair (20,21): 12 tokens, one interior swap at position 6 -> cp=5,
    // cs=6 (jaccard 7/13 ~ 0.538 >= 0.5 keeps it a pair), NOT end-only.
    val twelveA = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12"
    val twelveB = "t1 t2 t3 t4 t5 X t7 t8 t9 t10 t11 t12"
    val d = docsDir(Seq(
      (1L, "a b c d e", "en", "s1"),
      (4L, "a b c d e f", "en", "s1"),
      (10L, "p q r s t", "en", "s1"),
      (11L, "p q r s t", "en", "s1"),
      (20L, twelveA, "en", "s1"),
      (21L, twelveB, "en", "s1")))
    val got = TextOps.q441EditLocus(spark, d).collect().head
    assert(got.getAs[Long]("n_pairs") === 3L)
    assert(got.getAs[Long]("end_only_pairs") === 2L)
    assert(got.getAs[Long]("end_only_ppm") === 666666L)
    assert(got.getAs[Long]("rewrite_pairs") === 0L)
    // sum_cp = 5 + 5 + 5; sum_cs = 0 + 0 + 6; sum_minl = 5 + 5 + 12
    assert(got.getAs[Long]("sum_cp") === 15L)
    assert(got.getAs[Long]("sum_cs") === 6L)
    assert(got.getAs[Long]("common_end_share_ppm") === 1000000L * 21 / 22)
  }

  test("q437 dedup scope: within-source capture of the global losable mass") {
    // Pairs: (1,4) within s1 (doc4 losable, 6 tok); (10,11) cross-source
    // (doc11 losable, 5 tok). Global losable = {4, 11} = 11 tok; within-
    // source losable = {4} = 6 tok; capture = 1e6*6 div 11 = 545454.
    val d = docsDir(Seq(
      (1L, "a b c d e", "en", "s1"),
      (4L, "a b c d e f", "en", "s1"),
      (10L, "p q r s t", "en", "s2"),
      (11L, "p q r s t", "en", "s1")))
    val got = TextOps.q437DedupScopePlanner(spark, d).collect().head
    assert(got.getAs[Long]("docs_total") === 4L)
    assert(got.getAs[Long]("tokens_total") === 21L)
    assert(got.getAs[Long]("global_losable_docs") === 2L)
    assert(got.getAs[Long]("global_losable_tok") === 11L)
    assert(got.getAs[Long]("within_losable_docs") === 1L)
    assert(got.getAs[Long]("within_losable_tok") === 6L)
    assert(got.getAs[Long]("capture_ppm") === 545454L)
  }
}
