package graft

import org.apache.spark.sql.functions._

/** Dev-side decade probe for the INCREMENTAL BAND-INDEX path (q447,
  * SURVEY §8.28): the production claim is that dedup cost per ingest
  * batch is O(batch) with corpus-independent constants — the candidate
  * join touches the persisted index by KEY, the verification shingles
  * candidate docs only, and the upsert APPENDS an O(batch) delta
  * (BandIndex's LSM layout; the pre-r14 upsert rewrote the full index,
  * which this probe's corpus axis would have exposed).
  *
  * Two axes, one JSON line per point (not part of the driver contract):
  *
  *   - `batches` (default 1,10,100): split the non-seed docs into N
  *     sequential ingest batches over a fixed corpus. Total wall should
  *     be roughly linear in N (per-batch floor = scheduler constant ×
  *     a handful of jobs) with per-batch compute shrinking as batches
  *     shrink — the cost driver is the batch, not the corpus. Batch
  *     assignment uses an INDEPENDENT md5 tag from the seed split (the
  *     r13 probe's `slot % n` aliased with the `slot % 5` seed split,
  *     leaving 1/5 of batches empty at n ∈ {10, 100} — ADVICE r13).
  *   - `corpus` (multipliers 1,10,100): ingest the SAME fixed ~100-doc
  *     batch 5 times against an index seeded at 500 / 5k / 50k docs
  *     (real seed + synthetic collision-free md5-token filler, so the
  *     candidate mass stays constant and the axis isolates index-size
  *     IO). Flat per_batch_sec across the decades IS the sub-linear
  *     upsert claim. A forced compaction is timed separately — that is
  *     the O(corpus / compactEvery) amortized piece.
  *   - `vec` (multipliers 1,4,16): the q452 VECTOR index — ingest the
  *     same fixed embedding batch against an index seeded at m× size
  *     (real seed + synthetic md5-derived near-orthogonal filler, so no
  *     filler vector is ever a true near-dup). Unlike the text axis,
  *     collision-FREE filler is impossible here: hyperplane buckets are
  *     2^r per band, so ANY corpus occupies them and candidate mass
  *     grows ~linearly with index size (random 64-dim pairs collide in
  *     ≥1 of 16 bands w.p. ≈ 16/2^8 ≈ 6%). The probe therefore reports
  *     candidates alongside per_batch_sec to ATTRIBUTE the slope: write
  *     IO and near-dups stay flat (the LSM claim holds); the candidate
  *     verify term is the intrinsic LSH cost, and the production lever
  *     is raising planesPerBand with corpus size (collision 2^-r — the
  *     q273 planner logic) or moving to the IVF route (q45/q213).
  */
object IndexProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val mode = args.lift(1).getOrElse("batches")
    val decades = args.lift(2).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 10, 100))
    val spark = GraftSession.localBuilder(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(8)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs0 = Tables.documents(spark, dir)
    val docs = docs0.withColumn("slot",
      expr("cast(conv(substring(md5(concat('probe:', cast(doc_id as string))), 1, 6), 16, 10) as bigint)"))

    if (mode == "batches") for (n <- decades) {
      val root = java.nio.file.Files.createTempDirectory(s"graft_idxprobe_$n").toString
      // seed = a fixed ~20% slice; the rest splits into n batches by an
      // INDEPENDENT hash so no batch is empty (no slot%5 aliasing)
      val seed = docs.filter(col("slot") % 5 === 0)
      val rest = docs.filter(col("slot") % 5 =!= 0).withColumn("batch",
        expr(s"cast(conv(substring(md5(concat('bat:', cast(doc_id as string))), 1, 6), 16, 10) as bigint) % $n"))
      var st = ops.BandIndex.seed(spark, root, seed)
      val t0 = System.nanoTime()
      var nears = 0L
      (0 until n).foreach { b =>
        val r = ops.BandIndex.ingest(spark, root,
          rest.filter(col("batch") === b), docs0, prev = Some(st))
        nears += r.nearDup
        st = r.state
      }
      val total = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"band_index","axis":"batches","batches":$n,"total_sec":$total%.3f,"""
        + f""""per_batch_sec":${total / n}%.4f,"near_dups":$nears,"index_docs":${st.nDocs}}""")
      ops.Checkpoints.releaseAll(spark)
      ops.BandIndex.deleteRoot(spark, root)
    }

    if (mode == "corpus") for (m <- decades) {
      val root = java.nio.file.Files.createTempDirectory(s"graft_idxprobe_c$m").toString
      // fixed batch: ~1/5 of the real docs, chosen by the seed-split hash
      val batch = docs.filter(col("slot") % 5 === 1).drop("slot")
      // corpus = the real remainder + synthetic collision-free filler so
      // the index is m× bigger but the candidate mass is unchanged
      val realSeed = docs.filter(col("slot") % 5 > 1).select("doc_id", "text")
      val target = 500L * m
      val synth = spark.range(target).select(
        (col("id") + 10000000L).as("doc_id"),
        concat_ws(" ", (0 until 40).map(i =>
          substring(md5(concat(col("id").cast("string"), lit(s":tok$i"))), 1, 8)): _*)
          .as("text"))
      var st = ops.BandIndex.seed(spark, root, realSeed.unionByName(synth))
      val rounds = 5
      val t0 = System.nanoTime()
      var nears = 0L
      (0 until rounds).foreach { _ =>
        val r = ops.BandIndex.ingest(spark, root, batch, docs0, prev = Some(st),
          compactEvery = rounds + 1)
        nears += r.nearDup
        st = r.state
      }
      val ingestSec = (System.nanoTime() - t0) / 1e9
      val tc = System.nanoTime()
      ops.BandIndex.compact(spark, root, st)
      val compactSec = (System.nanoTime() - tc) / 1e9
      println(f"""{"probe":"band_index","axis":"corpus","multiplier":$m,"index_docs":${st.nDocs},"""
        + f""""per_batch_sec":${ingestSec / rounds}%.4f,"ingest_sec":$ingestSec%.3f,"""
        + f""""compact_sec":$compactSec%.3f,"near_dups":$nears}""")
      ops.Checkpoints.releaseAll(spark)
      ops.BandIndex.deleteRoot(spark, root)
    }
    if (mode == "vec") for (m <- decades) {
      val root = java.nio.file.Files.createTempDirectory(s"graft_idxprobe_v$m").toString
      val emb = Tables.embeddings(spark, dir)
        .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("embedding"))
        .withColumn("slot",
          expr("cast(conv(substring(md5(concat('vprobe:', cast(vec_id as string))), 1, 6), 16, 10) as bigint)"))
      val batch = emb.filter(col("slot") % 5 === 1).drop("slot")
      val realSeed = emb.filter(col("slot") % 5 =!= 1).drop("slot")
      val baseN = realSeed.count()
      // synthetic filler: 64 md5-derived components in [-1, 1] per vector
      // — near-orthogonal to everything (cosine ~N(0, 1/64-ish)), so the
      // filler adds bucket occupancy without adding true near-dups
      val synth = spark.range(baseN * (m - 1).max(0)).select(
        (col("id") + 10000000L).as("vec_id"),
        expr("""transform(sequence(0, 63), i ->
                cast(conv(substring(md5(concat(cast(id as string), ':', cast(i as string))), 1, 6), 16, 10) as double)
                  / 8388608.0d - 1.0d)""").as("embedding"))
      val corpus = realSeed.unionByName(synth)
      graft.functions.CosineSimilarity.register(spark)
      val verify = (cand: org.apache.spark.sql.DataFrame) => {
        val needIds = cand.select(col("doc_id").as("vid"))
          .union(cand.select(col("id_ex").as("vid"))).distinct()
        val all = corpus.unionByName(batch)
        val vecs = all.join(needIds, col("vec_id") === col("vid"), "left_semi")
          .select(col("vec_id"), col("embedding")).localCheckpoint(true)
        broadcast(cand)
          .join(vecs.select(col("vec_id").as("doc_id"), col("embedding").as("va")), "doc_id")
          .join(vecs.select(col("vec_id").as("id_ex"), col("embedding").as("vb")), "id_ex")
          .filter(expr("cosine_sim(va, vb)") >= 0.9)
      }
      var st = ops.BandIndex.seedSigs(spark, root, ops.VectorOps.vecSignatures(spark, corpus))
      // candidate mass, measured once per multiplier: the term that may
      // legitimately scale with index size (bucket occupancy)
      val cands = ops.VectorOps.vecSignatures(spark, batch)
        .join(ops.BandIndex.read(spark, root)
          .select(col("band"), col("band_sig"), col("doc_id").as("id_ex")),
          Seq("band", "band_sig"))
        .filter(col("doc_id") =!= col("id_ex"))
        .select("doc_id", "id_ex").distinct().count()
      // the documented production lever, demonstrated: doubling
      // planesPerBand (16×16 vs the shipped 16×8) cuts per-band
      // collision from 2^-8 toward 2^-16 — candidate mass should
      // collapse by orders of magnitude on the same corpus
      val fn16 = "lsh_bands_16x16_probe"
      graft.functions.LshBands.register(spark, fn16,
        ops.VectorOps.ndPlanesFor(16, 16), 16)
      def sig16(df: org.apache.spark.sql.DataFrame) =
        df.select(col("vec_id"), posexplode(expr(s"$fn16(embedding)")))
          .toDF("doc_id", "band", "band_sig")
      val cands16 = sig16(batch)
        .join(sig16(corpus).select(col("band"), col("band_sig"),
          col("doc_id").as("id_ex")), Seq("band", "band_sig"))
        .filter(col("doc_id") =!= col("id_ex"))
        .select("doc_id", "id_ex").distinct().count()
      val rounds = 5
      val nBatch = batch.count()
      val t0 = System.nanoTime()
      var nears = 0L
      (0 until rounds).foreach { _ =>
        val r = ops.BandIndex.ingestSigs(spark, root,
          ops.VectorOps.vecSignatures(spark, batch), verify, incoming = nBatch,
          prev = Some(st), compactEvery = rounds + 1)
        nears += r.nearDup
        st = r.state
      }
      val ingestSec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"vec_index","axis":"corpus","multiplier":$m,"index_docs":${st.nDocs},"""
        + f""""per_batch_sec":${ingestSec / rounds}%.4f,"ingest_sec":$ingestSec%.3f,"""
        + f""""candidates":$cands,"candidates_r16":$cands16,"near_dups":$nears}""")
      ops.Checkpoints.releaseAll(spark)
      ops.BandIndex.deleteRoot(spark, root)
    }
    spark.stop()
  }
}
