package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev-side decade probe for the STREAMING STATE path (SURVEY §8.10) —
  * the one operator family ScaleProbe's batch curves can't see. Replays
  * the q157/q211 interval-join, q184 transformWithState, and q188
  * dedup-within-watermark topologies over a TIME-ORDERED landing zone at
  * 1×/3×/10× the sf0.1 event volume and records, per run: wall seconds,
  * micro-batch count, total input rows, PEAK state rows
  * (StreamingQueryProgress.stateOperators.numRowsTotal), and sink rows.
  *
  * The scaling axis is STREAM LENGTH at constant rate: rows 100k·m over
  * 30·m days, fixed 1500-user base — the shape of "the pipeline ran m×
  * longer". A watermark-correct operator's peak state must track the
  * watermark window (constant here), NOT the stream length; linear peak
  * state is exactly the leak this probe exists to catch.
  *
  * Unlike the catalog entries' hash-partitioned 4-file zone (sliced into
  * 2 batches so the finite AvailableNow replay is oracle-exact), the
  * probe zone is range-partitioned on ts with one file per ~2.5-day
  * slice and explicitly increasing file mod-times, so the file source
  * replays in event-time order, the watermark advances every batch, and
  * state EVICTION actually runs — production topology, measured.
  *
  * Not part of the driver contract.
  */
object StreamProbe {

  /** 100000·m events over 30·m days (constant ~25.9 s/event arrival
    * rate), 1500 users, 5 types, ts strictly increasing in event_id.
    * Written as 12·m range-partitioned files (per-batch time span and
    * row volume are then CONSTANT across m at 2 files/trigger).
    */
  private[graft] def genEvents(spark: SparkSession, dir: String, m: Int): String =
    genEventsZone(spark, dir, 100000L * m, 30 * m, 12 * m)

  /** Parameterized zone generator (StreamStateSpec uses a tiny instance). */
  private[graft] def genEventsZone(spark: SparkSession, dir: String, n: Long,
      spanDays: Int, nFiles: Int): String = {
    val startUs = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli * 1000L
    val stepUs = (spanDays * 86400L * 1000000L) / n // span / rows
    val zone = s"$dir/events_zone"
    spark.range(n).select(
      col("id").as("event_id"),
      timestamp_micros(lit(startUs) + col("id") * lit(stepUs) +
        pmod(xxhash64(col("id"), lit(3)), lit(stepUs))).as("ts"),
      pmod(xxhash64(col("id"), lit(7)), lit(1500)).as("user_id"),
      element_at(array(Seq("click", "view", "purchase", "signup", "error").map(lit): _*),
        (pmod(xxhash64(col("id"), lit(11)), lit(5)) + 1).cast("int")).as("event_type"),
      round(pmod(xxhash64(col("id"), lit(13)), lit(19999)).cast("double") / 100.0 + 1.0, 2)
        .as("value"))
      .repartitionByRange(nFiles, col("ts"))
      .sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(zone)
    // file-source replay order is (modificationTime, path) oldest-first;
    // task completion order is arbitrary, so pin increasing mod-times in
    // part order (range partition i = i-th time slice)
    val parts = new java.io.File(zone).listFiles()
      .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
    val base = System.currentTimeMillis() - (parts.length + 10) * 1000L
    parts.zipWithIndex.foreach { case (f, i) => f.setLastModified(base + i * 1000L) }
    zone
  }

  private case class Probe(name: String, mode: String,
      build: (SparkSession, String) => DataFrame)

  def main(args: Array[String]): Unit = {
    val scales = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 3, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.localBuilder(cpus.toInt).appName("graft-streamprobe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val probes = Seq(
      Probe("stream_join_inner", "append",
        (s, z) => ops.StreamingOps.intervalJoined(s, z, "inner", 2)),
      Probe("stream_join_outer", "append",
        (s, z) => ops.StreamingOps.intervalJoined(s, z, "leftOuter", 2)),
      Probe("transform_with_state", "update",
        (s, z) => ops.StreamingOps.userTotalsUpdates(s, z, 2)),
      Probe("dedup_within_wm", "append",
        (s, z) => ops.StreamingOps.dedupWithinWmStream(s, z, 2)
          .select("event_id", "event_type", "value")),
      // round-7 topologies: chained multi-stateful (dedup state + window
      // state in ONE query — both must stay watermark-bounded) and
      // timer-based sessions (state = one row + one timer per ACTIVE user;
      // closed sessions must leave state via timer eviction)
      Probe("dedup_then_window", "append",
        (s, z) => ops.StreamingOps.dedupThenWindowStream(s, z, 2)),
      Probe("timer_sessions", "append",
        (s, z) => ops.StreamingOps.timerSessionStream(s, z, 2)),
      // round-7b: MapState top-k — state must stay ≤ 3 map entries per
      // user (≈ |users|·3 rows) no matter how long the stream runs
      Probe("mapstate_topk", "update",
        (s, z) => ops.StreamingOps.topValuesUpdates(s, z, 2)))

    scales.foreach { m =>
      val dir = java.nio.file.Paths.get("target", "tmp", s"streamprobe_x$m")
        .toAbsolutePath.toString
      val zone = genEvents(spark, dir, m)
      probes.foreach { p =>
        val qname = s"graft_probe_${p.name}"
        val t0 = System.nanoTime()
        val run = () => {
          val q = p.build(spark, zone).writeStream.format("memory")
            .queryName(qname).outputMode(p.mode)
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
          q
        }
        val query = ops.StreamingOps.withStatePartitions(spark, 8) {
          if (p.name == "transform_with_state" || p.name == "timer_sessions" ||
              p.name == "mapstate_topk")
            ops.StreamingOps.withRocksDb(spark)(run())
          else run()
        }
        val sec = (System.nanoTime() - t0) / 1e9
        val progs = query.recentProgress
        val batches = progs.length
        val rowsIn = progs.map(_.numInputRows).sum
        val peakState = progs
          .map(pr => pr.stateOperators.map(_.numRowsTotal).sum).foldLeft(0L)(math.max)
        val sinkRows = spark.table(qname).count()
        println(java.lang.String.format(java.util.Locale.ROOT,
          """{"probe":"%s","scale_x":%d,"sec":%.2f,"batches":%d,"rows_in":%d,"peak_state_rows":%d,"sink_rows":%d}""",
          p.name, Int.box(m), Double.box(sec), Int.box(batches),
          Long.box(rowsIn), Long.box(peakState), Long.box(sinkRows)))
      }
    }
    spark.stop()
  }
}
