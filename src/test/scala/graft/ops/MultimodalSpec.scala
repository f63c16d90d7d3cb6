package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("encode → decode roundtrip recovers header metadata and payload stats") {
    val media = Multimodal.mediaTable(spark, dir)
    val meta = Multimodal.decodeMeta(media).collect()
    assert(meta.length === 500)
    meta.foreach { m =>
      assert(m.width >= 1 && m.width <= 64)
      assert(m.height >= 1 && m.height <= 48)
      assert(m.n_bytes > 8)
      assert(m.mean_byte > 0.0 && m.mean_byte < 256.0)
      assert(m.format === "fakeimg")
    }
  }

  test("binaryFile source loads on-disk media blobs into the same decode path") {
    import spark.implicits._
    // write a handful of media blobs as loose files — the media-lake
    // layout — then read them back through the DataFrame binaryFile
    // source and run the standard decoder on the loaded bytes
    val tmp = java.nio.file.Files.createTempDirectory("graft_media").toFile
    try {
      val blobs = Multimodal.mediaTable(spark, dir).limit(5).collect()
      blobs.foreach { m =>
        java.nio.file.Files.write(
          new java.io.File(tmp, s"doc_${m.doc_id}.fakeimg").toPath, m.media)
      }
      val loaded = spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.fakeimg")
        .load(tmp.getAbsolutePath)
        .select(
          regexp_extract(col("path"), "doc_(\\d+)\\.fakeimg$", 1).cast("long").as("doc_id"),
          lit("fakeimg").as("format"), col("content").as("media"))
        .as[Multimodal.MediaRow]
      val meta = Multimodal.decodeMeta(loaded).collect()
        .map(m => m.doc_id -> ((m.width, m.height, m.n_bytes))).toMap
      val ids = blobs.map(_.doc_id).toSet
      val direct = Multimodal.decodeMeta(
          Multimodal.mediaTable(spark, dir).filter(r => ids(r.doc_id))).collect()
        .map(m => m.doc_id -> ((m.width, m.height, m.n_bytes))).toMap
      assert(meta === direct)
    } finally {
      tmp.listFiles().foreach(_.delete()); tmp.delete()
    }
  }

  test("resize clamps dimensions and shrinks payload deterministically") {
    val media = Multimodal.mediaTable(spark, dir)
    val resized = Multimodal.decodeMeta(Multimodal.resize(media, maxDim = 16)).collect()
    resized.foreach { m =>
      assert(m.width <= 16 && m.height <= 16)
      assert(m.width >= 1 && m.height >= 1)
    }
    // deterministic: same input → same bytes
    val a = Multimodal.resize(media, 16).collect().map(r => r.doc_id -> r.media.toSeq).toMap
    val b = Multimodal.resize(media, 16).collect().map(r => r.doc_id -> r.media.toSeq).toMap
    assert(a === b)
  }

  test("resize handles header-only media (empty payload) without crashing") {
    import spark.implicits._
    val headerOnly = {
      val buf = java.nio.ByteBuffer.allocate(8)
      buf.putInt(32).putInt(24)
      Seq(Multimodal.MediaRow(99L, "fakeimg", buf.array())).toDS()
    }
    val out = Multimodal.resize(headerOnly, maxDim = 16).collect()
    assert(out.length === 1)
    assert(out(0).media.length === 8)
    val meta = Multimodal.decodeMeta(Multimodal.resize(headerOnly, 16)).collect()(0)
    assert(meta.width <= 16 && meta.mean_byte === 0.0)
  }

  test("stub feature extractor emits fixed-dim deterministic embeddings that feed vector ops") {
    val media = Multimodal.mediaTable(spark, dir)
    val f1 = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[scala.collection.Seq[Float]]("features")).toMap
    assert(f1.nonEmpty)
    f1.values.foreach { v =>
      assert(v.length === 8)
      v.foreach(x => assert(x >= 0f && x <= 1.5f, x)) // byte-stripe means land near [0,1]
    }
    // deterministic across runs (a real encoder must be too, given fixed weights)
    val f2 = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[scala.collection.Seq[Float]]("features")).toMap
    assert(f1 === f2)
    // plugs into the existing vector machinery unchanged: cosine of a
    // feature vector with itself is 1
    import org.apache.spark.sql.functions._
    graft.functions.CosineSimilarity.register(spark)
    val sims = Multimodal.extractFeatures(media, dim = 8)
      .select(expr("cosine_sim(cast(features as array<double>), cast(features as array<double>))").as("s"))
      .collect().map(_.getDouble(0))
    sims.foreach(s => assert(math.abs(s - 1.0) < 1e-9))
  }

  test("frame sampling keeps every k-th fixed-size frame") {
    val one = Multimodal.mediaTable(spark, dir).filter(col("doc_id") === 0L)
    val payloadLen = Multimodal.decodeMeta(one).collect()(0).n_bytes - 8
    val frames = Multimodal.sampleFrames(one, frameBytes = 32, everyK = 3).collect()
    val totalFrames = (payloadLen + 31) / 32
    val expected = (0L until totalFrames).count(_ % 3 == 0)
    assert(frames.length === expected)
    assert(frames.map(_.getAs[Int]("frame_idx")).forall(_ % 3 == 0))
  }
}
