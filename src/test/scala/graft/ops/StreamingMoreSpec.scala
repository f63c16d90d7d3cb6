package graft.ops

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Planted fixtures for q190 (foreachBatch incremental upsert) and q191
  * (HLL inclusion-exclusion): batch-slicing invariance of the argmax
  * merge, crash-safe versioning layout, and the sketch estimate bound.
  */
class StreamingMoreSpec extends SparkSpec {

  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_smore").toString
    rows.map { case (id, ts, uid, et, v) => (id, ts, uid, et, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  private val ns = 1000000000L
  private val t0 = 1704067200L * ns

  test("q215 stream-static enrichment equals the batch join, stateless across batches") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingOps.q215StreamStaticEnrich(spark, dir)
      .collect().map(_.toSeq)
    val batch = graft.Tables.events(spark, dir)
      .join(graft.Tables.customer(spark, dir),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.ops.Num.moneySum(col("value")).as("sum_value"))
      .orderBy(col("c_mktsegment"), col("event_type"))
      .collect().map(_.toSeq)
    assert(streamed.nonEmpty)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("q190 upsert keeps the per-user LATEST row; ts ties break on event_id") {
    // user 1: later ts wins regardless of event_id order; user 2: two
    // events at the SAME ts — the higher event_id must win (the total
    // order that makes incremental merge ≡ global argmax).
    val d = eventsDir(Seq(
      (10L, t0 + 5 * ns, 1L, "click", 1.0),
      (11L, t0, 1L, "click", 2.0),
      (20L, t0, 2L, "view", 3.0),
      (21L, t0, 2L, "view", 4.0)))
    val got = StreamingOps.q190ForeachBatchUpsert(spark, d).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("last_event_id"), r.getAs[Double]("last_value")))).toMap
    assert(got === Map(1L -> ((10L, 1.0)), 2L -> ((21L, 4.0))))
    // versioned layout: at least v0 exists and the slot is self-contained
    val base = Staging.pathFor("q190_target", d)
    assert(new java.io.File(s"$base/v0").exists())
  }

  test("q191 raw HLL inclusion-exclusion estimate is within 5% of the exact overlap") {
    val r = SketchOps.q191Raw(spark, "/root/testdata/sf0.001").collect()(0)
    val exact = r.getAs[Long]("n_both")
    val est = r.getAs[Long]("approx_both")
    assert(exact > 0)
    assert(math.abs(est - exact) <= exact * 0.05,
      s"est $est vs exact $exact beyond 5%")
  }

  test("q211 left-outer stream join: null rows emit only for watermark-closed clicks") {
    val min = 60L * ns
    // u1: matched pair. u2: unmatched click whose 30-min window closes
    // well before the watermark (wm = min(maxClick, maxPurchase) - 10min
    // = t0 + 90min). u3: unmatched click AT t0+100min — its window is
    // still open at drain time, so it must stay in state and NOT appear.
    // u4: purchase with no click — the left-outer join never emits it.
    val d = eventsDir(Seq(
      (1L, t0, 1L, "click", 1.0),
      (2L, t0 + 10 * min, 1L, "purchase", 5.0),
      (3L, t0, 2L, "click", 1.0),
      (4L, t0 + 100 * min, 3L, "click", 1.0),
      (5L, t0 + 100 * min, 4L, "purchase", 9.0)))
    val got = StreamingOps.q211StreamOuterJoin(spark, d).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_matched"), r.getAs[Long]("n_unmatched_closed")))).toMap
    assert(got === Map(1L -> ((1L, 0L)), 2L -> ((0L, 1L))))
  }
}
