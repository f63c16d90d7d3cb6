package graft

import org.apache.spark.sql.functions._

/** Dev-side decade probe for the INCREMENTAL BAND-INDEX path (q447,
  * SURVEY §8.27): the production claim is that dedup cost per ingest
  * batch is O(batch) with corpus-independent constants — the candidate
  * join touches the persisted index by KEY, the verification shingles
  * candidate docs only, and the upsert rewrites the index file set.
  *
  * Probe: split the sf0.01 documents table into N ingest batches for
  * N = 1, 10, 100 (decades of batch count → decades of per-batch size in
  * the opposite direction) over a fixed seed, ingest them sequentially,
  * and report total wall plus per-batch marginal. The curve should show
  * total time roughly linear in N (per-batch floor = a handful of jobs ×
  * scheduler constant, the same floor the report-ingest probe measures)
  * with per-batch compute shrinking as batches shrink — i.e. the cost
  * driver is the batch, not the corpus. Output: one JSON line per N.
  * Not part of the driver contract.
  */
object IndexProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val decades = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 10, 100))
    val spark = GraftSession.localBuilder(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(8)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs0 = Tables.documents(spark, dir)
    for (n <- decades) {
      val root = java.nio.file.Files.createTempDirectory(s"graft_idxprobe_$n").toString
      // seed = a fixed ~20% slice; the rest splits into n batches
      val docs = docs0.withColumn("slot",
        expr("cast(conv(substring(md5(concat('probe:', cast(doc_id as string))), 1, 6), 16, 10) as bigint)"))
      val seed = docs.filter(col("slot") % 5 === 0)
      val rest = docs.filter(col("slot") % 5 =!= 0)
        .withColumn("batch", col("slot") % n)
      var idx = s"$root/seed"
      ops.TextOps.bandedSignatures(seed).write.parquet(idx)
      val t0 = System.nanoTime()
      var nears = 0L
      (0 until n).foreach { b =>
        val out = s"$root/i$b"
        val r = ops.TextOps.ingestBatch(spark, idx, out,
          rest.filter(col("batch") === b), docs0)
        nears += r.nearDup
        idx = out
      }
      val total = (System.nanoTime() - t0) / 1e9
      val idxDocs = spark.read.parquet(idx).select(col("doc_id")).distinct().count()
      println(f"""{"probe":"band_index","batches":$n,"total_sec":$total%.3f,"""
        + f""""per_batch_sec":${total / n}%.4f,"near_dups":$nears,"index_docs":$idxDocs}""")
      ops.Checkpoints.releaseAll(spark)
    }
    spark.stop()
  }
}
