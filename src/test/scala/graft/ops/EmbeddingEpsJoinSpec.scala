package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** q448's grid invariant: the ε-sized-cell HALF-neighborhood probe must
  * produce the EXACT set of projected-close pairs a brute-force all-pairs
  * filter produces — each unordered pair found exactly once (self cell
  * deduped by id order; cross-cell pairs because the reverse offset is
  * never probed), none missed (a pair within ε spans at most one cell
  * step on each axis), none duplicated. Random clustered corpora push
  * pairs across cell boundaries in every direction.
  */
class EmbeddingEpsJoinSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64

  private def writeFixture(vecs: Seq[(Long, Seq[Float])]): String = {
    val out = java.nio.file.Files.createTempDirectory("graft_eps_spec").toString
    vecs.toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
      .write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")
    out
  }

  // small clustered corpora: a few anchor directions with jittered copies,
  // so projections land in dense clumps that straddle cell boundaries
  private val corpusGen: Gen[Seq[(Long, Seq[Float])]] = for {
    nAnchors <- Gen.choose(2, 5)
    perAnchor <- Gen.choose(3, 10)
    anchors <- Gen.listOfN(nAnchors,
      Gen.listOfN(dim, Gen.choose(-1.0f, 1.0f)))
    jitters <- Gen.listOfN(nAnchors * perAnchor,
      Gen.listOfN(dim, Gen.choose(-0.02f, 0.02f)))
  } yield jitters.zipWithIndex.map { case (j, i) =>
    val a = anchors(i % nAnchors)
    (i.toLong, a.zip(j).map { case (x, d) => x + d }: Seq[Float])
  }

  test("grid half-neighborhood = brute force on the projected plane (property)") {
    val prop = Prop.forAll(corpusGen) { vecs =>
      val dir = writeFixture(vecs)
      val grid = SpatialOps.q448EmbeddingEpsJoin(spark, dir)
        .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSeq
      // brute force over the SAME projection exprs
      def wArr(tag: String): String =
        s"transform(sequence(0, 63), i -> cast(conv(substring(md5(concat('$tag:', cast(i as string))), 1, 8), 16, 10) as double) / 2147483648.0d - 1.0d)"
      val proj = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), expr("transform(embedding, t -> cast(t as double))").as("v"))
        .withColumn("x", expr(
          s"aggregate(zip_with(v, ${wArr("wx")}, (a, b) -> a * b), 0.0d, (acc, t) -> acc + t)"))
        .withColumn("y", expr(
          s"aggregate(zip_with(v, ${wArr("wy")}, (a, b) -> a * b), 0.0d, (acc, t) -> acc + t)"))
        .select(col("vec_id"), col("x"), col("y"))
      val brute = proj.as("a").crossJoin(proj.as("b"))
        .filter(col("a.vec_id") < col("b.vec_id"))
        .filter((col("a.x") - col("b.x")) * (col("a.x") - col("b.x")) +
          (col("a.y") - col("b.y")) * (col("a.y") - col("b.y")) <= 0.0025)
        .select(col("a.vec_id"), col("b.vec_id")).as[(Long, Long)].collect().toSeq
      val noDups = grid.size == grid.distinct.size
      val sameSet = grid.toSet == brute.toSet
      Checkpoints.releaseAll(spark)
      noDups && sameSet
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, result.status.toString)
  }
}
