package graft.ops

import graft.SparkSpec
import java.nio.file.Files

/** Batch-B round-6 operators: PQ, triangles, winsorize, RRF, chunking,
  * mixture planning — planted fixtures with hand-computable expectations.
  */
class RagOpsSpec extends SparkSpec {

  private def dirWith(write: String => Unit): String = {
    val d = Files.createTempDirectory("graft_rag").toString
    write(d)
    d
  }

  test("q205 PQ: vectors equal to a codeword get that code with zero error") {
    import spark.implicits._
    // 8 vectors; the first 4 are the init codewords. Vectors 4-7 repeat
    // codeword patterns exactly, so after one Lloyd step each centroid is
    // the mean of identical members == the codeword, and every vector
    // encodes with rec_err == 0.
    def v(fill: Float): Array[Float] = Array.fill(64)(fill)
    val rows = (0 until 4).map(i => (i.toLong, v(i.toFloat), 0)) ++
      (0 until 4).map(i => (i + 4L, v(i.toFloat), 0))
    val d = dirWith { d =>
      rows.toDF("vec_id", "embedding", "label")
        .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    }
    val got = RagOps.q205PqEncode(spark, d).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Int]("c0"), r.getAs[Int]("c1"), r.getAs[Int]("c2"), r.getAs[Int]("c3"),
          r.getAs[Double]("rec_err")))).toMap
    for (i <- 0 until 4) {
      assert(got(i.toLong) === ((i, i, i, i, 0.0)))
      assert(got(i + 4L) === ((i, i, i, i, 0.0)))
    }
  }

  test("q217 RVQ: vectors equal to stage-1 codewords encode with zero residual and zero error") {
    import spark.implicits._
    // q205's planted shape: the first 4 vectors are the stage-1 init
    // codewords and vectors 4-7 repeat them exactly, so cb1 converges to
    // the codewords, every residual is the zero vector, and stage 2
    // assigns everything to code 0 (tie-break) with rec_err == 0
    def v(fill: Float): Array[Float] = Array.fill(64)(fill)
    val rows = (0 until 4).map(i => (i.toLong, v(i.toFloat), 0)) ++
      (0 until 4).map(i => (i + 4L, v(i.toFloat), 0))
    val d = dirWith { d =>
      rows.toDF("vec_id", "embedding", "label")
        .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    }
    val got = RagOps.q217RvqEncode(spark, d).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Int]("c1"), r.getAs[Int]("c2"), r.getAs[Double]("rec_err")))).toMap
    for (i <- 0 until 4) {
      assert(got(i.toLong) === ((i, 0, 0.0)))
      assert(got(i + 4L) === ((i, 0, 0.0)))
    }
  }

  test("q206 triangle count: one planted triangle plus a dangling edge") {
    import spark.implicits._
    // co-purchase >= 2 edges: (1,2),(2,3),(1,3) form a triangle; (3,4)
    // dangles. Each pair appears in two orders to clear the support floor.
    val baskets = Seq(
      Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), // triangle edges twice
      Seq(3L, 4L), Seq(3L, 4L)) // dangling edge twice
    val d = dirWith { d =>
      baskets.zipWithIndex
        .flatMap { case (parts, ok) => parts.map(p => (ok.toLong, p)) }
        .toDF("l_orderkey", "l_partkey")
        .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    }
    val r = CurateOps.q206TriangleCount(spark, d).collect().head
    assert(r.getAs[Long]("n_nodes") === 4L)
    assert(r.getAs[Long]("n_edges") === 4L)
    assert(r.getAs[Long]("n_triangles") === 1L)
    // degrees 2,2,3,1 -> wedges 1+1+3+0 = 5; coeff = 3*1/5 = 0.6
    assert(r.getAs[Long]("n_wedges") === 5L)
    assert(r.getAs[Double]("clustering_coeff") === 0.6)
  }

  test("q207 winsorized stats clamp the planted outlier") {
    import spark.implicits._
    // 17 values: 16 at 1.00..16.00 + one 10000.00 outlier in segment A.
    // n=17: lo idx h=(16)*0.0625=1.0 -> p_lo = 2.00 exactly; hi idx
    // h=16*0.9375=15.0 -> p_hi = 16.00 (0-based sorted: the outlier is
    // index 16). The outlier clamps to 16.00.
    val d = dirWith { d =>
      ((1 to 16).map(i => (i.toLong, "A", i.toDouble)) :+ ((99L, "A", 10000.0)))
        .toDF("c_custkey", "c_mktsegment", "c_acctbal")
        .coalesce(1).write.parquet(s"$d/customer.parquet")
    }
    val r = CurateOps.q207WinsorStats(spark, d).collect().head
    assert(r.getAs[Long]("n") === 17L)
    assert(r.getAs[Double]("p_lo") === 2.0)
    assert(r.getAs[Double]("p_hi") === 16.0)
    // winsorized values: 2,2,3..16,16 -> mean = (2 + sum(2..16) + 16)/17
    val w = Seq(2.0, 16.0) ++ (2 to 16).map(_.toDouble)
    val mean = w.sum / 17
    assert(math.abs(r.getAs[Double]("mean_w") - mean) < 1e-6)
    val ex2 = w.map(x => x * x).sum / 17
    val std = math.sqrt((ex2 - mean * mean) * 17 / 16)
    assert(math.abs(r.getAs[Double]("std_w") - std) < 1e-6)
  }

  test("q208 RRF: a doc ranked 1st by both retrievers fuses first") {
    import spark.implicits._
    // 'cat' hits 3 of 4 docs (df < N keeps idf > 0 — with df = N the
    // tf-idf ranking degenerates to all-zero ties). doc 3 has the highest
    // tf AND is shortest -> rank 1 on both bm25 and tfidf.
    val d = dirWith { d =>
      Seq(
        (1L, "cat dog bird fish wolf deer", "en", "s", 1L),
        (2L, "cat dog dog dog dog dog bird bird bird wolf wolf deer", "en", "s", 1L),
        (3L, "cat cat cat cat", "en", "s", 1L),
        (4L, "dog bird wolf deer", "en", "s", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$d/documents.parquet")
    }
    val got = RagOps.q208RrfFusion(spark, d)
      .filter($"term" === "cat").collect()
      .map(r => r.getAs[Int]("r_fused") ->
        ((r.getAs[Long]("doc_id"), r.getAs[Int]("r_bm25"), r.getAs[Int]("r_tfidf"))))
      .toMap
    assert(got(1)._1 === 3L)
    assert(got(1)._2 === 1) // best bm25
    assert(got(1)._3 === 1) // best tfidf
    // fused score of rank-1 doc = 2/61 rounded
    val top = RagOps.q208RrfFusion(spark, d)
      .filter($"term" === "cat" && $"r_fused" === 1).collect().head
    assert(top.getAs[Double]("rrf") === BigDecimal(2.0 / 61)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("q209 chunking: spans tile the doc with stride 4 and cap at the end") {
    import spark.implicits._
    val text = (1 to 14).map(i => s"w$i").mkString(" ") // 14 tokens
    val d = dirWith { d =>
      Seq((1L, text, "en", "s", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$d/documents.parquet")
    }
    val got = RagOps.q209ChunkOverlap(spark, d).collect()
      .map(r => (r.getAs[Int]("chunk_id"), r.getAs[Int]("start_tok"), r.getAs[Int]("end_tok")))
    // starts at 1 and 5 (greatest(14-7,1)=7 -> stride hits 1,5; next would
    // be 9 > 7): chunks [1,8] and [5,12]... sequence(1,7,4) = 1,5
    assert(got.toSeq === Seq((1, 1, 8), (2, 5, 12)))
  }

  test("q213 IVF-PQ: a query identical to a corpus vector retrieves it at ADC 0") {
    import spark.implicits._
    // Corpus: vectors 0..7 = fill(i) are the 8 IVF seeds (each its own
    // list); queries 100..102 duplicate fills 0,1,2. PQ init (vec_id<4)
    // plus one Lloyd step gives codebooks {0,1,2,5} per subspace (code 3's
    // centroid absorbs fills 3..7 -> mean 5), so fills 0/1/2 encode
    // exactly. Probing 2 lists per query, every ADC distance is
    // 64*(fill diff)^2 — hand-computable end to end.
    def v(fill: Float): Array[Float] = Array.fill(64)(fill)
    val rows = (0 until 8).map(i => (i.toLong, v(i.toFloat), 0)) ++
      Seq((100L, v(0f), 0), (101L, v(1f), 0), (102L, v(2f), 0))
    val d = dirWith { d =>
      rows.toDF("vec_id", "embedding", "label")
        .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    }
    val got = RagOps.q213IvfPqSearch(spark, d).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank")) ->
        ((r.getAs[Long]("vec_id"), r.getAs[Double]("adc_dist")))).toMap
    // qid 100 (fill 0) probes lists {0,1}: exact twin vec 0 first (id
    // tie-break), itself second, then the fill-1 pair at 64.0
    assert(got((100L, 1)) === ((0L, 0.0)))
    assert(got((100L, 2)) === ((100L, 0.0)))
    assert(got((100L, 3)) === ((1L, 64.0)))
    assert(got((100L, 4)) === ((101L, 64.0)))
    // qid 101 (fill 1) probes lists {1,0} (cid tie-break 0 < 2)
    assert(got((101L, 1)) === ((1L, 0.0)))
    assert(got((101L, 2)) === ((101L, 0.0)))
    assert(got((101L, 3)) === ((0L, 64.0)))
    // qid 102 (fill 2) probes lists {2,1}
    assert(got((102L, 1)) === ((2L, 0.0)))
    assert(got((102L, 2)) === ((102L, 0.0)))
    assert(got((102L, 3)) === ((1L, 64.0)))
  }

  test("q210 mixture plan: rates follow the weight table and budget") {
    import spark.implicits._
    // two sources, 100 tokens each; src0 weight 3, srcX default 1.
    // budget = 100; src0 target = 75, srcX = 25.
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val d = dirWith { d =>
      Seq((1L, words(100), "en", "src0", 1L), (2L, words(100), "en", "srcX", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$d/documents.parquet")
    }
    val got = CurateOps.q210MixturePlan(spark, d).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("tokens"), r.getAs[Long]("w"), r.getAs[Long]("target_tokens"),
          r.getAs[Double]("epochs")))).toMap
    assert(got("src0") === ((100L, 3L, 75L, 0.75)))
    assert(got("srcX") === ((100L, 1L, 25L, 0.25)))
  }
}
