package graft

/** Dev-side decade probe for the deep BPE merge loop (q450, SURVEY
  * §8.28): per-merge marginal cost as the merge count grows 4 → 16 → 64.
  * The trainer's claim is that each round is ONE vocab-sized aggregate
  * job plus a row-local literal replace, with state checkpointed every 6
  * rounds — so total wall should be ~linear in the round count with a
  * per-round floor of one job-latency, and the marginal should be FLAT
  * (the word-type state never grows; it only shrinks as merges land).
  * Output: one JSON line per decade. Not part of the driver contract.
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val decades = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(4, 16, 64))
    val spark = GraftSession.localBuilder(
      sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(8)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir)
    for (k <- decades) {
      val t0 = System.nanoTime()
      val res = ops.TokenizerOps.bpeMergeLoop(docs, rounds = k).collect()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"bpe_merge_loop","rounds":$k,"emitted":${res.length},"""
        + f""""total_sec":$total%.3f,"per_merge_sec":${total / k}%.4f,"""
        + f""""last_cnt":${res.lastOption.map(_.getLong(2)).getOrElse(0L)}}""")
      ops.Checkpoints.releaseAll(spark)
    }
    spark.stop()
  }
}
