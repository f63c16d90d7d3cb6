package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED band-signature index with SUB-LINEAR ingest (q447, SURVEY
  * §8.28) — the storage layer the round-13 verdict flagged: the previous
  * upsert read and rewrote the ENTIRE index every batch, O(corpus) IO per
  * ingest, exactly the cost the operator exists to eliminate. This is the
  * LSM-shaped replacement. Layout under one root:
  *
  *   - `rows/`  — append-only parquet deltas (doc_id, band, band_sig,
  *     ver). Each ingest APPENDS its batch's signatures stamped with the
  *     generation number; nothing is rewritten. Write IO = O(batch).
  *   - `ids/`   — slim doc-census sidecar (doc_id), one row per indexed
  *     doc, appended NOVEL ids only. Membership probes read THIS (1
  *     narrow column, 1/16th the rows of `rows/`), never the wide index.
  *   - `tombs/` — tombstones (doc_id, dead_below): rows for doc_id with
  *     ver < dead_below are dead. Written only when a batch RE-ingests
  *     existing doc_ids (upsert-by-replacement). Bounded by the re-ingest
  *     volume since the last compaction, so reads resolve them with a
  *     BROADCAST filter — the big `rows/` side never shuffles.
  *   - `meta/`  — one tiny row per generation (gen, n_docs,
  *     deltas_since_compact). The doc census is maintained INCREMENTALLY
  *     (prev + novel), never by re-scanning the index.
  *
  * Every `compactEvery` generations the live rows are rewritten once and
  * tombstones cleared — classic LSM amortization: per-batch cost stays
  * O(batch) + O(corpus / compactEvery).
  *
  * What still touches the index per batch, by design: (a) the candidate
  * join reads `rows/` BY KEY (band, band_sig) — on a cluster that table
  * is bucketed by its key so the probe is a co-located join, and locally
  * it is a column-pruned scan; (b) the membership probe reads the slim
  * `ids/` sidecar under a broadcast semi-join (batch ids broadcast, ids
  * stream — no shuffle). Neither WRITES anything corpus-sized; the
  * upsert plans scan no index file at all (spec-asserted in
  * IncrementalIndexSpec).
  */
object BandIndex {

  /** Threaded generation state — pass the previous ingest's `state` back
    * in to skip the (tiny) meta read. */
  case class State(gen: Long, nDocs: Long, deltasSinceCompact: Long)

  case class IngestResult(incoming: Long, nearDup: Long, novel: Long,
      indexDocs: Long, state: State)

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private[graft] def parquetDirExists(spark: SparkSession, p: String): Boolean = {
    val path = new Path(p)
    val f = fs(spark, p)
    f.exists(path) && f.listStatus(path).exists(s =>
      s.getLen > 0 || s.getPath.getName.endsWith(".parquet"))
  }

  /** Seed the index from an initial document set. */
  def seed(spark: SparkSession, root: String, docs: DataFrame): State =
    seedSigs(spark, root, TextOps.bandedSignatures(docs))

  /** Generic seed from a prebuilt (doc_id, band, band_sig) signature
    * frame — the storage layer is signature-family-agnostic (tombstones,
    * census, and compaction only ever touch doc_id/ver), so the SAME LSM
    * index serves minhash-banded text (q447) and hyperplane-bucketed
    * vectors (q452). */
  def seedSigs(spark: SparkSession, root: String, sigs: DataFrame): State =
      LoopConf.withSizedCoalesce(spark) {
    val sig = sigs.withColumn("ver", lit(0L))
    sig.write.mode(SaveMode.Overwrite).parquet(s"$root/rows")
    // one distinct over the written rows feeds the sidecar write AND the
    // census count — checkpointed so the census is not a third pass, and
    // the two consumers run as concurrent jobs (one scheduler latency)
    val ids = spark.read.parquet(s"$root/rows").select("doc_id").distinct()
      .localCheckpoint(true)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val nF = Future { ids.count() }
    ids.write.mode(SaveMode.Overwrite).parquet(s"$root/ids")
    val st = State(0L, Await.result(nF, Duration.Inf), 0L)
    writeMeta(spark, root, st)
    Checkpoints.release(ids)
    st
  }

  // The generation metadata is THREE LONGS — writing it through a Spark
  // parquet job cost one full job latency per generation (and reading it
  // back another); it is now one plain filesystem file per generation
  // (`meta/gen-<n>`, content "gen nDocs deltasSinceCompact"), written
  // and read with Hadoop FS calls only. Still one immutable file per
  // generation (same append-only discipline as `rows/`), no Spark job.
  private def writeMeta(spark: SparkSession, root: String, st: State): Unit = {
    val f = fs(spark, root)
    val out = f.create(new Path(s"$root/meta/gen-${st.gen}"), true)
    try out.write(s"${st.gen} ${st.nDocs} ${st.deltasSinceCompact}\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def readState(spark: SparkSession, root: String): State = {
    val f = fs(spark, root)
    val latest = f.listStatus(new Path(s"$root/meta"))
      .filter(_.getPath.getName.startsWith("gen-"))
      .maxBy(_.getPath.getName.stripPrefix("gen-").toLong)
    val in = f.open(latest.getPath)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val Array(g, n, d) = txt.trim.split(" ").map(_.toLong)
    State(g, n, d)
  }

  /** Live index rows: union of deltas with tombstoned generations
    * filtered out under a BROADCAST anti-condition (tombs are bounded by
    * re-ingest volume since the last compaction). */
  def read(spark: SparkSession, root: String): DataFrame = {
    val rows = spark.read.parquet(s"$root/rows")
    if (!parquetDirExists(spark, s"$root/tombs")) rows
    else {
      val tomb = spark.read.parquet(s"$root/tombs")
        .groupBy("doc_id").agg(max(col("dead_below")).as("dead_below"))
      rows.join(broadcast(tomb), Seq("doc_id"), "left_outer")
        .filter(col("dead_below").isNull || col("ver") >= col("dead_below"))
        .drop("dead_below")
    }
  }

  /** One incremental-ingest step against the persisted index at `root`:
    * near-dup `batchDocs` against the INDEX (never the corpus), then
    * upsert by APPENDING a delta + tombstoning any replaced doc_ids.
    * `allDocs` supplies text for exact-Jaccard verification — only
    * candidate ids are ever shingled from it. Write IO is O(batch);
    * every `compactEvery` generations one compaction rewrites live rows.
    */
  def ingest(spark: SparkSession, root: String, batchDocs: DataFrame,
      allDocs: DataFrame, prev: Option[State] = None,
      incomingHint: Option[Long] = None, compactEvery: Int = 8): IngestResult = {
    // exact-Jaccard verification over CANDIDATE docs only: semi-join the
    // raw docs to the candidate id set before shingling, so the verify
    // grind is O(candidates) at any corpus size
    def verify(cand: DataFrame): DataFrame = {
      val needIds = cand.select(col("doc_id").as("vid"))
        .union(cand.select(col("id_ex").as("vid"))).distinct()
      val vsh = TextOps.shingleArrays(
          allDocs.join(needIds, col("doc_id") === col("vid"), "left_semi"))
        .localCheckpoint(true)
      broadcast(cand)
        .join(vsh.select(col("doc_id"), col("sh").as("sh_a")), "doc_id")
        .join(vsh.select(col("doc_id").as("id_ex"), col("sh").as("sh_b")), "id_ex")
        .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
        .filter(col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")) >= 0.5)
    }
    ingestSigs(spark, root, TextOps.bandedSignatures(batchDocs), verify,
      incomingHint.getOrElse(batchDocs.count()), prev, compactEvery)
  }

  /** Generic incremental-ingest step from a prebuilt (doc_id, band,
    * band_sig) signature frame. `verify` maps the band-collision
    * candidate pairs (doc_id, id_ex) to the CONFIRMED near-dup pairs —
    * exact Jaccard for text signatures, exact cosine for vector buckets
    * — and must touch only candidate ids, never the corpus. The storage
    * flow (append-only deltas, tombstones, incremental census,
    * compaction) is identical for every signature family.
    */
  def ingestSigs(spark: SparkSession, root: String, batchSigs: DataFrame,
      verify: DataFrame => DataFrame, incoming: Long,
      prev: Option[State] = None, compactEvery: Int = 8): IngestResult =
      LoopConf.withSizedCoalesce(spark) {
    val st = prev.getOrElse(readState(spark, root))
    val gen = st.gen + 1
    val idx = read(spark, root)
    // batch signatures feed the candidate join AND the delta — one build
    val bsig = batchSigs.localCheckpoint(true)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    // the delta append depends ONLY on the materialized bsig — start it
    // now so its write IO overlaps the candidate/verify jobs below (the
    // per-batch chain was 8 sequential job latencies; overlapping the
    // independent ones cuts it to ~5).
    // UPSERT = append-only: delta rows stamped with this generation; any
    // REPLACED doc gets a tombstone killing its older generations. No
    // index file is read or rewritten here (IncrementalIndexSpec asserts
    // the delta plans scan nothing under the index root).
    val rowsAppendF = Future {
      bsig.withColumn("ver", lit(gen)).write.mode(SaveMode.Append)
        .parquet(s"$root/rows")
    }
    // candidates: batch × index band collisions (self excluded: on
    // re-ingest the batch's own rows are already in the index)
    val cand = bsig.join(idx.select(col("band"), col("band_sig"),
        col("doc_id").as("id_ex")), Seq("band", "band_sig"))
      .filter(col("doc_id") =!= col("id_ex"))
      .select(col("doc_id"), col("id_ex")).dropDuplicates("doc_id", "id_ex")
      .localCheckpoint(true)
    val pairs = verify(cand)
    // the three readout counts are INDEPENDENT jobs over already-
    // materialized (or slim) inputs — submit them concurrently so the
    // per-batch scheduler floor pays one latency, not three
    val nearDupF = Future { pairs.select(col("doc_id")).distinct().count() }
    val batchIds = bsig.select("doc_id").distinct()
    // membership probe: batch ids (slim, broadcast) semi-join the ids
    // SIDECAR — a 1-column stream, no shuffle, and NOT the wide index
    val batchDistinctF = Future { batchIds.count() }
    val presentCnt = spark.read.parquet(s"$root/ids")
      .join(broadcast(batchIds), Seq("doc_id"), "left_semi").count()
    Await.result(rowsAppendF, Duration.Inf)
    val idsAppendF = if (presentCnt > 0) Future {
      // slow path (re-ingest): materialize the replaced ids once for the
      // tombstone delta and the novel-ids anti-join
      val presentIds = spark.read.parquet(s"$root/ids")
        .join(broadcast(batchIds), Seq("doc_id"), "left_semi")
        .localCheckpoint(true)
      presentIds.withColumn("dead_below", lit(gen))
        .write.mode(SaveMode.Append).parquet(s"$root/tombs")
      batchIds.join(broadcast(presentIds), Seq("doc_id"), "left_anti")
        .write.mode(SaveMode.Append).parquet(s"$root/ids")
      Checkpoints.release(presentIds)
    } else Future {
      // fast path (pure append — the common ingest case): every batch id
      // is novel, no tombstones
      batchIds.write.mode(SaveMode.Append).parquet(s"$root/ids")
    }
    // census maintained incrementally — no full-index re-scan. The
    // sidecar/tombstone appends overlap these awaits; everything is
    // joined before the meta row commits the generation.
    val novel = Await.result(batchDistinctF, Duration.Inf) - presentCnt
    val nearDup = Await.result(nearDupF, Duration.Inf)
    Await.result(idsAppendF, Duration.Inf)
    var next = State(gen, st.nDocs + novel, st.deltasSinceCompact + 1)
    if (next.deltasSinceCompact >= compactEvery) next = compact(spark, root, next)
    writeMeta(spark, root, next)
    // pairs' plan reaches every checkpoint the verify closure made (vsh
    // for text, the candidate-vector fetch for vectors) — release via the
    // plan so the closure needs no lifecycle protocol of its own
    Checkpoints.release(pairs); Checkpoints.release(bsig); Checkpoints.release(cand)
    IngestResult(incoming, nearDup, novel, next.nDocs, next)
  }

  /** LSM compaction: rewrite live rows once, dedup the ids sidecar,
    * clear tombstones. Amortized over `compactEvery` ingests. */
  def compact(spark: SparkSession, root: String, st: State): State = {
    val f = fs(spark, root)
    read(spark, root).write.mode(SaveMode.Overwrite).parquet(s"$root/rows_c")
    spark.read.parquet(s"$root/ids").distinct()
      .write.mode(SaveMode.Overwrite).parquet(s"$root/ids_c")
    Seq("rows", "ids").foreach { d =>
      f.delete(new Path(s"$root/$d"), true)
      f.rename(new Path(s"$root/${d}_c"), new Path(s"$root/$d"))
    }
    f.delete(new Path(s"$root/tombs"), true)
    State(st.gen, st.nDocs, 0L)
  }

  /** Recursive local cleanup for temp index roots (ADVICE r13: q447 used
    * to leave ~4 index snapshots under /tmp per Verify/Bench run). */
  def deleteRoot(spark: SparkSession, root: String): Unit = {
    fs(spark, root).delete(new Path(root), true); ()
  }
}
