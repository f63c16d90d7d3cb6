package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Controlled-duplicate corpus for the near-dup operators (the driver test
  * data has no duplicate texts, so recall is asserted here instead).
  */
class TextOpsSpec extends SparkSpec {

  /** Writes a documents.parquet with planted duplicates; returns the dir. */
  private lazy val corpusDir: String = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    val nearDup = "the quick brown fox jumps over the lazy dog and runs far away home today"  // 1 word changed
    val distinct = "completely different content about spark catalyst optimizer plans and shuffles"
    val docs = Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, base, "en", "src1", base.length.toLong),          // exact dup of 0
      (2L, nearDup, "en", "src0", nearDup.length.toLong),    // near dup of 0/1
      (3L, distinct, "en", "src1", distinct.length.toLong),
      (4L, "el la de y que en palabras cortas aqui", "es", "src0", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft_docs").toString
    docs.coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("exact dedup groups identical texts under the lowest doc_id") {
    val out = TextOps.q30ExactDedup(spark, corpusDir).collect()
    assert(out.length === 4) // 5 docs, one exact-dup pair
    val dup = out.find(_.getAs[Long]("n_copies") === 2L).get
    assert(dup.getAs[Long]("keep_id") === 0L)
  }

  test("exact n-gram Jaccard finds both the exact and the near duplicate pair") {
    val pairs = TextOps.q31NgramJaccard(spark, corpusDir)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("jaccard")))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 1L)))  // exact dup: jaccard 1.0
    assert(pairs.find(p => (p._1, p._2) == ((0L, 1L))).get._3 === 1.0)
    assert(keys.contains((0L, 2L)) && keys.contains((1L, 2L)))  // near dups
    assert(!keys.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("q31 stop-shingle cap at df<=25 is a no-op on the driver corpus (exact twin)") {
    // the cap equals the measured max shingle df at sf0.1 (9 at sf0.001,
    // 7 at sf0.01), so NOTHING is dropped at any driver SF — since round
    // 10 the CAPPED form is the catalog entry (pair mass ≤ 25·|postings|
    // on saturated-vocab corpora instead of Σ df², SURVEY §8.18) and the
    // exact form is the spec-only twin this test replays to prove the
    // cap is lossless here, q176's discipline applied to q31
    val dir = "/root/testdata/sf0.001"
    val exact = TextOps.q31NgramJaccardExact(spark, dir).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    val capped = TextOps.q31NgramJaccard(spark, dir).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    assert(exact.nonEmpty)
    assert(capped === exact)
  }

  test("q31 stop-shingle guard fires on a planted hot shingle (capped ⊆ exact, conservative)") {
    import spark.implicits._
    // docs 1/2 are identical ("a b c d": shingles {a b c, b c d}); docs
    // 3..6 all contain "a b c", pushing df("a b c") to 6. At cap = 2 the
    // hot shingle leaves the index, the (1,2) intersection falls to 1 of
    // 2 (jaccard 1/3 < 0.5) and the pair drops — underestimated, never
    // overestimated, exactly the documented stop-shingle semantics.
    val rows = Seq(
      (1L, "a b c d"), (2L, "a b c d"),
      (3L, "a b c z3"), (4L, "a b c z4"), (5L, "a b c z5"), (6L, "a b c z6"))
    val dir = Files.createTempDirectory("graft_hot").toString
    rows.map { case (i, t) => (i, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val docs = graft.Tables.documents(spark, dir)
    def pairSet(cap: Option[Int]) = TextOps.ngramJaccardPairs(docs, cap)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(None)
    val capped = pairSet(Some(2))
    assert(exact.contains((1L, 2L)))
    assert(!capped.contains((1L, 2L))) // the guard actually fired
    assert(capped.subsetOf(exact))     // never invents a pair
  }

  test("q415 stop-shingle cap at df<=25 is a no-op on the driver corpus (exact twin)") {
    val dir = "/root/testdata/sf0.001"
    val exact = TextOps.q415IncrementalDedupExact(spark, dir).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    val capped = TextOps.q415IncrementalDedup(spark, dir).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    assert(exact.nonEmpty)
    assert(capped === exact)
  }

  test("q417 source copy matrix: exact combinatorics and near pairs per source pair") {
    import spark.implicits._
    // T appears 2x in s1 and 1x in s2: exact pairs = C(2,2)=1 within s1,
    // 2x1=2 across s1-s2; the same trio is also pairwise near-dup
    // (jaccard 1.0), and docs 4/5 add one cross-source near pair (one
    // trailing-token edit on a 20-token base)
    val t = (1 to 10).map(i => s"t$i").mkString(" ")
    val base = (1 to 20).map(i => s"b$i").mkString(" ")
    val edited = (1 to 19).map(i => s"b$i").mkString(" ") + " zz"
    val rows = Seq(
      (1L, t, "s1"), (2L, t, "s1"), (3L, t, "s2"),
      (4L, base, "s1"), (5L, edited, "s2"))
    val dir = Files.createTempDirectory("graft_matrix").toString
    rows.map { case (i, x, s) => (i, x, "en", s, x.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = TextOps.q417SourceCopyMatrix(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("s1", "s1", 1L, 1L),
      ("s1", "s2", 2L, 3L)))
  }

  test("q418 chain audit: a 3-doc chain is 1/3 chained, an exact pair 0") {
    import spark.implicits._
    // A=a1..a5 m6..m20, B=m1..m20, C=m1..m15 c1..c5: 18 shingles each,
    // A∩B = B∩C = 13 (jac 13/23 ≥ 0.5), A∩C = 8 (8/28 < 0.5) — a chain
    // cluster {A,B,C} with direct=2 of closure=3 → chained_ppm 333333.
    // Docs 4/5 are exact copies: k=2, direct=1=closure, chained 0.
    val m = (1 to 20).map(i => s"m$i")
    val a = ((1 to 5).map(i => s"a$i") ++ m.drop(5)).mkString(" ")
    val b = m.mkString(" ")
    val c = (m.take(15) ++ (1 to 5).map(i => s"c$i")).mkString(" ")
    val t = (1 to 10).map(i => s"t$i").mkString(" ")
    val rows = Seq((1L, a), (2L, b), (3L, c), (4L, t), (5L, t))
    val dir = Files.createTempDirectory("graft_chain").toString
    rows.map { case (i, x) => (i, x, "en", "s", x.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val got = TextOps.q418ChainAudit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (2L, 1L, 1L, 1L, 0L),
      (3L, 1L, 2L, 3L, 333333L)))
  }

  test("MinHash-LSH recovers every exact-Jaccard pair on the corpus (full recall here)") {
    val exact = TextOps.q31NgramJaccard(spark, corpusDir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TextOps.q32MinhashLsh(spark, corpusDir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))  // verification step guarantees precision
    assert(exact.subsetOf(lsh), s"LSH missed: ${exact.diff(lsh)}")
  }

  test("SimHash: identical texts at hamming 0; near-dup within 3 bits") {
    val out = TextOps.q33Simhash(spark, corpusDir)
      .collect().map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")), r.getAs[Long]("hamming"))).toMap
    assert(out(0L -> 1L) === 0L)
    assert(!out.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("language ID votes by stopword sets") {
    val byDoc = TextOps.q34LangId(spark, corpusDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("guess"), r.getAs[Long]("n")))
    assert(byDoc.contains(("en", "en", 4L)))
    assert(byDoc.contains(("es", "es", 1L)))
  }

  test("quality metrics are exact integer ratios") {
    val r = TextOps.q35Quality(spark, corpusDir).filter(col("doc_id") === 0L).collect()(0)
    assert(r.getAs[Int]("n_tokens") === 15)
    assert(r.getAs[Double]("stop_ratio") === math.rint(3.0 / 15 * 1e6) / 1e6)
  }

  test("fuzzy match finds edit-distance-1 neighbors and no self/dup pairs") {
    val dir = "/root/testdata/sf0.001"
    val rows = TextOps.q72FuzzyMatch(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("name_a"), r.getAs[String]("name_b"))
      assert(a < b, s"pair not canonical: $a / $b")
      assert(r.getAs[Int]("dist") >= 1 && r.getAs[Int]("dist") <= 2)
    }
    // a known distance-1 pair in the 8x8 name vocabulary
    assert(rows.exists(r => r.getAs[String]("name_a") == "cold widget" &&
      r.getAs[String]("name_b") == "old widget"))
  }

  test("repetition shares are valid ratios and keep-flag matches thresholds") {
    val dir = "/root/testdata/sf0.001"
    val rows = TextOps.q73Repetition(spark, dir).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val ws = r.getAs[Double]("top_word_share")
      val bs = r.getAs[Double]("top_bigram_share")
      assert(ws > 0.0 && ws <= 1.0)
      assert(bs > 0.0 && bs <= 1.0)
      // shares are rounded to 6dp for the oracle; skip the (theoretical)
      // boundary sliver where rounding could flip the comparison
      if (math.abs(ws - 0.10) > 1e-5 && math.abs(bs - 0.04) > 1e-5) {
        val expected = if (ws <= 0.10 && bs <= 0.04) 1 else 0
        assert(r.getAs[Int]("keep") === expected)
      }
    }
  }

  test("mixture sampling downsamples only the majority language, deterministically") {
    val dir = "/root/testdata/sf0.01"
    val docs = graft.Tables.documents(spark, dir)
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = TextOps.q75MixtureSample(spark, dir).collect()
    val keptByLang = kept.groupBy(_.getAs[String]("lang")).view.mapValues(_.length).toMap
    // non-en languages keep every doc at weight 1.0
    (totals.keySet - "en").foreach { l =>
      assert(keptByLang(l).toLong === totals(l), l)
    }
    // en keeps roughly 25% (binomial-ish tolerance on ~218 docs)
    val enRate = keptByLang("en").toDouble / totals("en")
    assert(enRate > 0.10 && enRate < 0.40, s"en keep rate $enRate")
    kept.foreach { r =>
      val w = r.getAs[Double]("weight")
      assert(if (r.getAs[String]("lang") == "en") w === 4.0 else w === 1.0)
    }
    // deterministic: same rows on rerun
    val again = TextOps.q75MixtureSample(spark, dir).collect().map(_.toSeq)
    assert(again.toSeq === kept.map(_.toSeq).toSeq)
  }

  test("connected components on an empty edge set returns no labels (and terminates)") {
    import spark.implicits._
    val none = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(TextOps.connectedComponents(none).collect().isEmpty)
  }

  test("text cleaning canonicalizes formatting variants to one hash") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello,  World!"),
      (2L, "hello world"),
      (3L, "different text")).toDF("doc_id", "text")
    val cleaned = docs.select(
      org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.regexp_replace(
          org.apache.spark.sql.functions.regexp_replace(
            org.apache.spark.sql.functions.lower(org.apache.spark.sql.functions.col("text")),
            "[^a-z0-9 ]", ""),
          " +", " ")).as("h"))
      .collect().map(_.getString(0))
    assert(cleaned(0) === cleaned(1)) // variants collapse
    assert(cleaned(0) !== cleaned(2))
  }

  test("connected components: min label propagates across multi-hop chains") {
    import spark.implicits._
    // two components: a 4-node chain 10-20-30-40 (diameter 3) and a pair 50-60
    val edges = Seq((20L, 10L), (20L, 30L), (40L, 30L), (60L, 50L)).toDF("a", "b")
    val labels = TextOps.connectedComponents(edges).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
    assert(labels === Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 10L,
      50L -> 50L, 60L -> 50L))
  }

  test("q82 clusters are consistent with q31 pairs (every pair same cluster, sizes match)") {
    val dir = "/root/testdata/sf0.001"
    val pairs = TextOps.q31NgramJaccard(spark, dir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    val rows = TextOps.q82DedupClusters(spark, dir).collect()
    val cluster = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    assert(pairs.nonEmpty && rows.nonEmpty)
    pairs.foreach { case (a, b) => assert(cluster(a) === cluster(b), s"pair ($a,$b)") }
    // every clustered doc appears in at least one pair
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(cluster.keySet === paired)
    // cluster id is the min member, size matches the member count
    rows.groupBy(_.getAs[Long]("cluster")).foreach { case (c, members) =>
      assert(members.map(_.getAs[Long]("doc_id")).min === c)
      members.foreach(m => assert(m.getAs[Long]("cluster_size") === members.length.toLong))
    }
  }

  test("bm25 ranks term-bearing docs and never scores a doc lacking both terms") {
    val dir = "/root/testdata/sf0.001"
    val rows = TextOps.q81Bm25(spark, dir).collect()
    assert(rows.length === 20)
    val scores = rows.map(_.getAs[Double]("bm25"))
    assert(scores.toSeq === scores.sortBy(-_).toSeq) // descending
    assert(scores.forall(_ > 0.0))
  }

  test("blocked fuzzy match (q105) reproduces the exact all-pairs result") {
    val dir = "/root/testdata/sf0.001"
    val exact = TextOps.q72FuzzyMatch(spark, dir).collect().map(_.toSeq).toSet
    val blocked = TextOps.q105FuzzyBlocked(spark, dir).collect().map(_.toSeq).toSet
    assert(exact.nonEmpty)
    assert(blocked === exact)
  }

  test("q-gram count filter is exact on a vocabulary spanning the short/long branch boundary") {
    import spark.implicits._
    // short strings (≤5, the vacuous-bound class), boundary lengths 5/6/7,
    // repeated-gram strings (occurrence tagging), and a distance-3 decoy
    val vocab = Seq(
      "cat", "cot", "ct", "dog", "dg", "aaaa", "aaab", "abab",
      "gear5", "gears6", "gearbox", "gearbux", "wholly-unrelated")
      .toDF("p_name").withColumn("n", lit(1L))
    val got = TextOps.fuzzyBlockedPairs(vocab).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // sequential reference: brute-force levenshtein over all pairs
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = Seq(d(i - 1)(j) + 1, d(i)(j - 1) + 1,
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)).min
      d(a.length)(b.length)
    }
    val names = vocab.collect().map(_.getString(0))
    val want = (for {
      a <- names; b <- names
      if a < b && math.abs(a.length - b.length) <= 2 && lev(a, b) <= 2
    } yield (a, b, lev(a, b))).toSet
    assert(want.exists { case (a, b, _) => a.length <= 5 && b.length <= 5 }) // short branch live
    assert(want.exists { case (a, b, _) => math.max(a.length, b.length) >= 6 }) // gram branch live
    assert(got === want)
  }

  test("fingerprint is stable across runs and differs for different content") {
    val fp1 = TextOps.q37Fingerprint(spark, corpusDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fingerprint")).toMap
    val fp2 = TextOps.q37Fingerprint(spark, corpusDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fingerprint")).toMap
    assert(fp1 === fp2)
    assert(fp1(0L) === fp1(1L))   // identical docs, identical fingerprint
    assert(fp1(0L) !== fp1(3L))
  }

  test("q152 survivors: one per cluster, a member, with the cluster's max length") {
    val dir = "/root/testdata/sf0.001"
    val members = TextOps.q82DedupClusters(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster"))
    val lens = graft.Tables.documents(spark, dir)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_chars")).toMap
    val reps = TextOps.q152ClusterReps(spark, dir).collect()
    assert(reps.map(_.getAs[Long]("cluster")).distinct.length === reps.length)
    assert(reps.map(_.getAs[Long]("cluster")).toSet === members.map(_._2).toSet)
    reps.foreach { r =>
      val cl = r.getAs[Long]("cluster")
      val rep = r.getAs[Long]("rep_doc_id")
      val clMembers = members.filter(_._2 == cl).map(_._1)
      assert(clMembers.contains(rep), s"cluster $cl rep not a member")
      assert(lens(rep) === clMembers.map(lens).max, s"cluster $cl rep not longest")
      assert(r.getAs[Long]("n_dropped") === clMembers.length - 1)
    }
  }
}
