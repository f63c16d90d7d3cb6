package graft.ops

import scala.collection.mutable.ArrayBuffer

import graft.SparkSpec
import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution, SparkPlan}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** q447's persisted band-signature index (BandIndex): the maintenance
  * contract a growing corpus needs — ingest WRITE IO O(batch) (append +
  * tombstone, never a full-index rewrite — the round-13 `weak`),
  * idempotent re-ingest, census maintained incrementally, candidates
  * generated against the INDEX rather than the corpus. */
class IncrementalIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("re-ingesting the same batch is idempotent on the index") {
    val root = java.nio.file.Files.createTempDirectory("graft_idx_spec").toString
    val docs = graft.Tables.documents(spark, dir).withColumn("batch",
      expr("cast(conv(substring(md5(concat('batch:', cast(doc_id as string))), 1, 4), 16, 10) as bigint) % 4"))
    val st0 = BandIndex.seed(spark, root, docs.filter(col("batch") === 0))
    val batch1 = docs.filter(col("batch") === 1)
    val r1 = BandIndex.ingest(spark, root, batch1, docs, prev = Some(st0))
    val live1 = BandIndex.read(spark, root)
      .select("doc_id", "band", "band_sig").localCheckpoint(true)
    // ingest the SAME batch against the index that already contains it
    val r2 = BandIndex.ingest(spark, root, batch1, docs, prev = Some(r1.state))
    assert(r2.indexDocs == r1.indexDocs,
      s"re-ingest grew the census: ${r1.indexDocs} -> ${r2.indexDocs}")
    assert(r2.novel == 0L, s"re-ingest reported ${r2.novel} novel docs")
    // the LIVE index content (tombstone-resolved) is identical, not just
    // the doc count — the old generation is dead, the new one replaces it
    val live2 = BandIndex.read(spark, root).select("doc_id", "band", "band_sig")
    assert(live2.exceptAll(live1).isEmpty && live1.exceptAll(live2).isEmpty,
      "re-ingest changed live index rows")
    assert(r2.incoming == r1.incoming)
    // census matches a ground-truth distinct count over the live rows
    assert(live2.select("doc_id").distinct().count() == r2.indexDocs)
    Checkpoints.releaseAll(spark)
    BandIndex.deleteRoot(spark, root)
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
    val st0 = BandIndex.seed(spark, root, seedDocs)
    val all = seedDocs.unionByName(batchDocs)
    val r = BandIndex.ingest(spark, root, batchDocs, all, prev = Some(st0))
    assert(r.incoming == 3L)
    assert(r.nearDup == 1L,
      s"expected only the index near-dup (doc 2), got ${r.nearDup} — intra-batch pairs must not count")
    assert(r.indexDocs == 4L)
    Checkpoints.releaseAll(spark)
    BandIndex.deleteRoot(spark, root)
  }

  test("upsert write plans scan NOTHING under the index root (O(batch) IO)") {
    // the round-13 weak: the old upsert read + rewrote the FULL index per
    // batch. The LSM layout's delta/tombstone/ids/meta writes must be
    // built from batch-side frames only — capture every write execution
    // during an ingest and assert no file scan under the index root.
    val captured = ArrayBuffer[(String, SparkPlan)]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        captured.synchronized { captured += ((funcName, qe.executedPlan)); () }
      override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()
    }
    val root = java.nio.file.Files.createTempDirectory("graft_idx_spec3").toString
    val docs = graft.Tables.documents(spark, dir).withColumn("batch",
      expr("cast(conv(substring(md5(concat('batch:', cast(doc_id as string))), 1, 4), 16, 10) as bigint) % 4"))
    val st0 = BandIndex.seed(spark, root, docs.filter(col("batch") === 0))
    // re-ingest a 50/50 mix of already-present and new docs so BOTH the
    // tombstone and the novel-ids paths are exercised
    val mixed = docs.filter(col("batch") === 0 || col("batch") === 1)
    spark.listenerManager.register(listener)
    try {
      BandIndex.ingest(spark, root, mixed, docs, prev = Some(st0))
      // listener delivery is async — poll until the write commands land
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      def writes() = captured.synchronized {
        captured.filter(_._2.toString.contains("InsertIntoHadoopFsRelationCommand")).toVector
      }
      // rows delta + tombs + ids = 3 write commands (meta is a plain
      // filesystem file since r14 — no Spark write job at all)
      while (writes().size < 3 && System.nanoTime() < deadline) Thread.sleep(50)
      val w = writes()
      assert(w.size >= 3, s"expected >=3 write executions, saw ${w.size}")
      w.foreach { case (fn, plan) =>
        val idxScans = plan.collectWithSubqueries {
          case f: FileSourceScanExec
              if f.relation.location.rootPaths.exists(_.toString.contains(root)) => f
        }
        assert(idxScans.isEmpty,
          s"write execution '$fn' scans the index it is upserting:\n$plan")
      }
    } finally {
      spark.listenerManager.unregister(listener)
      Checkpoints.releaseAll(spark)
      BandIndex.deleteRoot(spark, root)
    }
  }

  test("vector index (q452): readout equals the exact cross-batch cosine baseline") {
    // the LSH candidate path + exact-cosine verify must reproduce what a
    // brute-force per-batch sweep finds — same recall argument as q104's
    // oracle, checked here in-engine over the full sf0.001 corpus
    graft.functions.CosineSimilarity.register(spark)
    val got = VectorOps.q452IncrementalVectorIndex(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    val corpus = VectorOps.plantedTwinCorpus(spark, dir)
      .withColumn("batch", expr(VectorOps.viBatchExpr)).localCheckpoint(true)
    val a = corpus.select(col("vec_id"), col("embedding").as("va"), col("batch"))
    val ex = corpus.select(col("vec_id").as("id_ex"), col("embedding").as("vb"),
      col("batch").as("batch_ex"))
    val exact = a.filter(col("batch") >= 1).crossJoin(ex)
      .filter(col("batch_ex") < col("batch"))
      .filter(expr("cosine_sim(va, vb)") >= 0.9)
      .select(col("batch"), col("vec_id")).distinct()
      .groupBy(col("batch")).agg(count(lit(1)).as("nd"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
    val sizes = corpus.groupBy(col("batch")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var cum = sizes(0L)
    (1L to 3L).zip(got).foreach { case (b, (gb, gInc, gNd, gIdx)) =>
      cum += sizes(b)
      assert(gb == b)
      assert(gInc == sizes(b), s"batch $b incoming: $gInc != ${sizes(b)}")
      assert(gNd == exact(b), s"batch $b near_dup: LSH path $gNd != exact ${exact(b)}")
      assert(gIdx == cum, s"batch $b census: $gIdx != $cum")
    }
    Checkpoints.releaseAll(spark)
  }

  test("vector index (q452): re-ingesting the same signature batch is idempotent") {
    // the shared LSM storage must honor its contract under the vector
    // signature schema too (int band_sig, no text verify)
    val root = java.nio.file.Files.createTempDirectory("graft_vecidx_spec").toString
    val corpus = VectorOps.plantedTwinCorpus(spark, dir)
      .withColumn("batch", expr(VectorOps.viBatchExpr))
    val noPairs = (cand: org.apache.spark.sql.DataFrame) => cand.filter(lit(false))
    val st0 = BandIndex.seedSigs(spark, root,
      VectorOps.vecSignatures(spark, corpus.filter(col("batch") === 0)))
    val sig1 = VectorOps.vecSignatures(spark, corpus.filter(col("batch") === 1))
    val r1 = BandIndex.ingestSigs(spark, root, sig1, noPairs, incoming = 0L, prev = Some(st0))
    val live1 = BandIndex.read(spark, root)
      .select("doc_id", "band", "band_sig").localCheckpoint(true)
    val r2 = BandIndex.ingestSigs(spark, root, sig1, noPairs, incoming = 0L, prev = Some(r1.state))
    assert(r2.novel == 0L, s"re-ingest reported ${r2.novel} novel vectors")
    assert(r2.indexDocs == r1.indexDocs,
      s"re-ingest grew the census: ${r1.indexDocs} -> ${r2.indexDocs}")
    val live2 = BandIndex.read(spark, root).select("doc_id", "band", "band_sig")
    assert(live2.exceptAll(live1).isEmpty && live1.exceptAll(live2).isEmpty,
      "re-ingest changed live vector index rows")
    assert(live2.select("doc_id").distinct().count() == r2.indexDocs)
    Checkpoints.releaseAll(spark)
    BandIndex.deleteRoot(spark, root)
  }

  test("compaction preserves live content and clears tombstones") {
    val root = java.nio.file.Files.createTempDirectory("graft_idx_spec4").toString
    val docs = graft.Tables.documents(spark, dir).withColumn("batch",
      expr("cast(conv(substring(md5(concat('batch:', cast(doc_id as string))), 1, 4), 16, 10) as bigint) % 4"))
    val st0 = BandIndex.seed(spark, root, docs.filter(col("batch") === 0))
    // two ingests, the second re-ingesting the first (tombstones exist),
    // with compactEvery=2 so the second ingest triggers compaction
    val b1 = docs.filter(col("batch") === 1)
    val r1 = BandIndex.ingest(spark, root, b1, docs, prev = Some(st0), compactEvery = 2)
    val liveBefore = BandIndex.read(spark, root)
      .select("doc_id", "band", "band_sig").localCheckpoint(true)
    val r2 = BandIndex.ingest(spark, root, b1, docs, prev = Some(r1.state), compactEvery = 2)
    assert(r2.state.deltasSinceCompact == 0L, "compaction did not trigger")
    assert(!BandIndex.parquetDirExists(spark, s"$root/tombs"),
      "compaction left tombstones behind")
    val liveAfter = BandIndex.read(spark, root).select("doc_id", "band", "band_sig")
    assert(liveAfter.exceptAll(liveBefore).isEmpty && liveBefore.exceptAll(liveAfter).isEmpty,
      "compaction changed live index content")
    assert(r2.indexDocs == r1.indexDocs)
    Checkpoints.releaseAll(spark)
    BandIndex.deleteRoot(spark, root)
  }
}
