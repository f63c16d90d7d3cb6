package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Pins the WATERMARK-EVICTION contract of the streaming state operators
  * (SURVEY §8.10): over a time-ordered multi-batch replay, peak state
  * must be a watermark-window slice of the stream, never the whole
  * stream, and the streamed result must still equal its batch twin.
  * StreamProbe measures the same topologies at 1×/3×/10×; this spec is
  * the CI-fast guard that eviction keeps happening at all.
  */
class StreamStateSpec extends SparkSpec {

  private lazy val zone: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_streamstate").toString
    // 6000 events / 30 days / 12 files → 6 ordered micro-batches of ~5
    // days each at 2 files/trigger; watermark (10 min) « batch span, so
    // join/dedup state should hold ~1-2 batches, never all 6
    StreamProbe.genEventsZone(spark, dir, 6000L, 30, 12)
  }

  private def runAndMeasure(stream: org.apache.spark.sql.DataFrame, mode: String,
      qname: String): (org.apache.spark.sql.streaming.StreamingQuery, Long, Long) = {
    val query = ops.StreamingOps.withStatePartitions(spark, 4) {
      val q = stream.writeStream.format("memory").queryName(qname)
        .outputMode(mode).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(); q
    }
    val progs = query.recentProgress
    val peak = progs.map(p => p.stateOperators.map(_.numRowsTotal).sum)
      .foldLeft(0L)(math.max)
    val rowsIn = progs.map(_.numInputRows).sum
    (query, peak, rowsIn)
  }

  test("interval-join state is watermark-evicted over an ordered replay, result equals batch twin") {
    val (_, peak, _) = runAndMeasure(
      ops.StreamingOps.intervalJoined(spark, zone, "inner", 2),
      "append", "graft_sss_join")
    val sideRows = spark.read.parquet(zone)
      .filter(col("event_type").isin("click", "purchase")).count()
    assert(peak > 0, "join must have buffered some state")
    assert(peak < (sideRows * 7) / 10,
      s"peak join state $peak should be a batch-window slice of the $sideRows side rows, not the whole stream")

    // the streamed match set must equal the batch interval join exactly
    val streamed = spark.table("graft_sss_join").count()
    val ev = spark.read.parquet(zone)
    val c = ev.filter(col("event_type") === "click").select(
      col("user_id"), col("event_id").as("cid"), col("ts").as("cts"))
    val p = ev.filter(col("event_type") === "purchase").select(
      col("user_id"), col("event_id").as("pid"), col("ts").as("pts"))
    val batch = c.join(p, Seq("user_id"))
      .filter(col("pts") >= col("cts") &&
        col("pts") <= col("cts") + expr("INTERVAL 30 MINUTES")).count()
    assert(streamed === batch)
  }

  test("transformWithState holds exactly one state row per user") {
    val (query, peak, _) = ops.StreamingOps.withRocksDb(spark) {
      val (q, pk, ri) = runAndMeasure(
        ops.StreamingOps.userTotalsUpdates(spark, zone, 2),
        "update", "graft_sss_tws")
      (q, pk, ri)
    }
    val users = spark.read.parquet(zone).select("user_id").distinct().count()
    val finalState = query.recentProgress.last.stateOperators.map(_.numRowsTotal).sum
    assert(finalState === users,
      s"per-user ValueState must be |users|=$users rows, got $finalState")
    assert(peak === users, s"state never exceeds |users|, got peak $peak")
  }

  test("dropDuplicatesWithinWatermark evicts seen-key state behind the watermark") {
    val (_, peak, _) = runAndMeasure(
      ops.StreamingOps.dedupWithinWmStream(spark, zone, 2)
        .select("event_id", "event_type", "value"),
      "append", "graft_sss_dedup")
    val n = spark.read.parquet(zone).count()
    assert(peak > 0)
    assert(peak < n / 2,
      s"dedup state $peak should be a watermark-window set, not all $n keys (plain dropDuplicates would hold $n)")
    // every event arrives twice (double feed); exactly one copy survives
    assert(spark.table("graft_sss_dedup").count() === n)
  }
}
