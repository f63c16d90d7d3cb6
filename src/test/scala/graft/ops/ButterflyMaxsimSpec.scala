package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q442 butterfly census + q443 MaxSim retrieval — fixture-level truth. */
class ButterflyMaxsimSpec extends SparkSpec {
  import spark.implicits._

  test("butterfly census counts wedges, pairs, and butterflies exactly") {
    // c1 buys {a,b,c}; c2 and c3 buy {a,b}:
    //   m(a,b)=3, m(a,c)=1, m(b,c)=1 → wedges 5, pairs 3,
    //   butterflies C(3,2)=3, max support 3, no hubs
    val edges = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L)).toDF("ck", "pk")
    val r = GraphMiningOps.butterflyCensus(edges, cap = 10).head()
    assert(r.getAs[Long]("wedges") === 5L)
    assert(r.getAs[Long]("part_pairs") === 3L)
    assert(r.getAs[Long]("butterflies") === 3L)
    assert(r.getAs[Long]("max_pair_support") === 3L)
    assert(r.getAs[Long]("n_hubs_dropped") === 0L)
  }

  test("butterfly cap drops hub customers whole, never partially") {
    // c1 is a hub (4 parts > cap 3): its wedges must vanish entirely —
    // a PARTIAL expansion would bias the census toward the prefix parts
    val edges = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L)).toDF("ck", "pk")
    val r = GraphMiningOps.butterflyCensus(edges, cap = 3).head()
    assert(r.getAs[Long]("n_hubs_dropped") === 1L)
    assert(r.getAs[Long]("wedges") === 2L)       // only c2, c3
    assert(r.getAs[Long]("butterflies") === 1L)  // m(1,2)=2 → C(2,2)=1
  }

  test("butterfly census is defined on an empty graph") {
    val r = GraphMiningOps.butterflyCensus(
      Seq.empty[(Long, Long)].toDF("ck", "pk"), cap = 5).head()
    assert(r.getAs[Long]("butterflies") === 0L)
    assert(r.getAs[Long]("n_hubs_dropped") === 0L)
  }

  // 64-dim one-hot tokens; docs of TokensPerMsDoc=8 rows. Query docs are
  // 0..2. Doc 3 repeats doc 0's first 4 directions (4 exact token hits,
  // including dim 0 = doc 0's CLS direction), doc 4 repeats only 2.
  private lazy val plantedDir: String = {
    def oneHot(dim: Int): Seq[Float] =
      Seq.tabulate(64)(i => if (i == dim) 1.0f else 0.0f)
    val rows = (0 until 5).flatMap { d =>
      (0 until 8).map { t =>
        val dim = d match {
          case 3 => if (t < 4) t else 32 + t       // 4 hits on qdoc 0
          case 4 => if (t < 2) t else 40 + t       // 2 hits on qdoc 0
          case q => q * 8 + t                      // qdocs: disjoint dims
        }
        (d * 8L + t, oneHot(dim), d)
      }
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft_maxsim").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("maxsim ranks the doc sharing more query-token directions first") {
    val dir = plantedDir
    val out = VectorOps.q443MaxsimRetrieval(spark, dir)
      .filter(col("qdoc") === 0).orderBy(col("rank")).collect()
    assert(out.head.getAs[Long]("doc_id") === 3L)
    assert(out(1).getAs[Long]("doc_id") === 4L)
    // 4 exact hits × 1e6 plus 4 orthogonal zeros = 4_000_000
    assert(out.head.getAs[Long]("maxsim_e6") === 4000000L)
    assert(out(1).getAs[Long]("maxsim_e6") === 2000000L)
  }

  test("wedge-sample estimator is internally consistent with its own census") {
    val r = GraphMiningOps.q445ButterflySample(spark, "/root/testdata/sf0.001").head()
    val (bf, est, err) = (r.getAs[Long]("butterflies"),
      r.getAs[Long]("butterflies_est"), r.getAs[Long]("err_ppm"))
    // est = 16·ΣC(k,2) is a multiple of 16; err_ppm is the integer
    // floor-div of the reported pair — the row must be self-consistent
    assert(est % 16 === 0L)
    if (bf > 0) assert(err === math.abs(est - bf) * 1000000L / bf)
    // the exact side must equal q442's census on the same corpus
    val census = GraphMiningOps.q442ButterflyCensus(spark, "/root/testdata/sf0.001").head()
    assert(bf === census.getAs[Long]("butterflies"))
    assert(r.getAs[Long]("wedges") === census.getAs[Long]("wedges"))
  }

  test("pooling audit: CLS and MaxSim agree on the planted top doc") {
    // doc 3 shares qdoc 0's CLS direction (dim 0) AND is the MaxSim
    // winner, so both rankings must put it first and agree
    val out = VectorOps.q446PoolingAudit(spark, plantedDir)
      .filter(col("qdoc") === 0).head()
    assert(out.getAs[Long]("m_top1") === 3L)
    assert(out.getAs[Long]("c_top1") === 3L)
    assert(out.getAs[Boolean]("top1_agree"))
    assert(out.getAs[Long]("overlap_at5") >= 2L) // docs 3 and 4 in both
  }

  test("two-stage ANN rerank scores agree with exact MaxSim on shared pairs") {
    val dir = "/root/testdata/sf0.001"
    val exact = VectorOps.q443MaxsimRetrieval(spark, dir)
      .select(col("qdoc"), col("doc_id"), col("maxsim_e6").as("e"))
    val staged = VectorOps.q444MaxsimAnnRerank(spark, dir)
      .select(col("qdoc"), col("doc_id"), col("maxsim_e6").as("s"))
    // stage 2 IS the exact scorer, so every candidate the banding
    // surfaces must carry the identical integer score
    val mismatched = staged.join(exact, Seq("qdoc", "doc_id"))
      .filter(col("s") =!= col("e")).count()
    assert(mismatched === 0L)
    assert(staged.count() > 0L)
  }
}
