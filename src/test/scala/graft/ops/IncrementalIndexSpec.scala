package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q447's persisted band-signature index: the maintenance contract a
  * growing corpus needs — ingest cost O(batch), index upsert idempotent,
  * candidates generated against the INDEX rather than the corpus. */
class IncrementalIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("re-ingesting the same batch is idempotent on the index") {
    val root = java.nio.file.Files.createTempDirectory("graft_idx_spec").toString
    val docs = graft.Tables.documents(spark, dir).withColumn("batch",
      expr("cast(conv(substring(md5(concat('batch:', cast(doc_id as string))), 1, 4), 16, 10) as bigint) % 4"))
    TextOps.bandedSignatures(docs.filter(col("batch") === 0))
      .write.parquet(s"$root/seed")
    val batch1 = docs.filter(col("batch") === 1)
    val r1 = TextOps.ingestBatch(spark, s"$root/seed", s"$root/i1", batch1, docs)
    // ingest the SAME batch against the index that already contains it
    val r2 = TextOps.ingestBatch(spark, s"$root/i1", s"$root/i2", batch1, docs)
    assert(r2.indexDocs == r1.indexDocs,
      s"re-ingest grew the index: ${r1.indexDocs} -> ${r2.indexDocs}")
    // the index CONTENT is identical, not just the doc count
    val a = spark.read.parquet(s"$root/i1")
    val b = spark.read.parquet(s"$root/i2")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "re-ingest changed index rows")
    assert(r2.incoming == r1.incoming)
    Checkpoints.releaseAll(spark)
  }

  test("candidates come from the index state, not the whole corpus") {
    val root = java.nio.file.Files.createTempDirectory("graft_idx_spec2").toString
    // seed with doc A; batch carries a near-dup of A (B) and a near-dup
    // pair (C, D) that is NOT in the index — C/D must NOT flag each
    // other (only index collisions count), so near_dup = 1 (just B)
    val mk = (id: Long, text: String) => (id, text)
    val common = (1 to 40).map(i => s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"zz$i").mkString(" ")
    val seedDocs = Seq(mk(1L, common)).toDF("doc_id", "text")
    val batchDocs = Seq(
      mk(2L, common + " extra"),
      mk(3L, other),
      mk(4L, other + " tail")).toDF("doc_id", "text")
    TextOps.bandedSignatures(seedDocs).write.parquet(s"$root/seed")
    val all = seedDocs.unionByName(batchDocs)
    val r = TextOps.ingestBatch(spark, s"$root/seed", s"$root/i1", batchDocs, all)
    assert(r.incoming == 3L)
    assert(r.nearDup == 1L,
      s"expected only the index near-dup (doc 2), got ${r.nearDup} — intra-batch pairs must not count")
    assert(r.indexDocs == 4L)
    Checkpoints.releaseAll(spark)
  }
}
