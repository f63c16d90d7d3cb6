package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Planted-fixture tests for the round-8 batch (q279-q284): known inputs
  * with hand-computable selection weights, SCD versions, pattern matches,
  * and sample invariants.
  */
class DsirQuantScd2ReservoirSpec extends SparkSpec {

  private def eventsDir(rows: Seq[(Long, Timestamp, Long, String, Double, String)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_r8_ev").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  test("q279 DSIR: target-like documents score above off-target documents") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_r8_dsir").toString
    // en docs repeat the target phrase; de docs a disjoint phrase. The
    // en bigrams dominate the target LM, the de bigrams only the source
    // LM — so every en doc's importance must exceed every de doc's, and
    // the de docs must land negative (their bigrams have ct = 0).
    val docs =
      (1L to 3L).map(i => (i, "alpha beta alpha beta alpha", "en", "s")) ++
        (4L to 6L).map(i => (i, "gamma delta gamma delta gamma", "de", "s"))
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val got = CorpusStatOps.q279DsirWeighting(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.size === 6)
    val (_, enW, enKeep) = got(1L)
    val (_, deW, deKeep) = got(4L)
    assert(got(1L)._1 === 4L) // 5 tokens -> 4 bigrams
    assert(enW > deW)
    assert(enKeep && enW > 0)
    assert(!deKeep && deW < 0)
    // symmetric docs score identically (pure function of content)
    assert(got(1L) === got(2L) && got(2L) === got(3L))
    assert(got(4L) === got(5L))
  }

  test("q280 int8 sq8 recall@10 is near-exact on the driver corpus") {
    val rows = VectorOps.q280Int8Quant(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keySet === Set(0L, 1L, 2L, 3L))
    // symmetric tensor-wide int8 preserves the inner product up to one
    // constant — recall@10 of 64-dim unit vectors should be essentially
    // perfect (observed 10/10; allow 8 for future data drops)
    rows.values.foreach(v => assert(v >= 8, s"recall@10 too low: $rows"))
  }

  test("q281 SCD2 collapses consecutive duplicates and versions the changes") {
    val t = (m: Int) => Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val d = eventsDir(Seq(
      (1L, t(0), 7L, "view", 1.0, "{}"),
      (2L, t(5), 7L, "view", 1.0, "{}"),     // same value: no new version
      (3L, t(10), 7L, "view", 2.0, "{}"),    // change -> v2
      (4L, t(20), 7L, "view", 1.0, "{}")))   // change back -> v3
    val got = RelationalMore.q281Scd2History(spark, d).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.isNullAt(4), r.getBoolean(5)))
    assert(got.toSeq === Seq(
      (1, 100L, false, false),
      (2, 200L, false, false),
      (3, 100L, true, true)))
    // validity ranges chain: v1 ends where v2 begins
    val rows = RelationalMore.q281Scd2History(spark, d).collect()
    assert(rows(0).getLong(4) === rows(1).getLong(3))
    assert(rows(1).getLong(4) === rows(2).getLong(3))
  }

  test("q282 pattern match honours the 30-minute window and the negation") {
    val t = (m: Int) => Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")
    val d = eventsDir(Seq(
      // user 1: view -> purchase in 10 min, clean => match
      (1L, t(0), 1L, "view", 1.0, "{}"),
      (2L, t(10), 1L, "purchase", 1.0, "{}"),
      // user 2: error between view and purchase => no match
      (3L, t(0), 2L, "view", 1.0, "{}"),
      (4L, t(5), 2L, "error", 1.0, "{}"),
      (5L, t(10), 2L, "purchase", 1.0, "{}"),
      // user 3: purchase 40 min after the view => outside window
      (6L, t(0), 3L, "view", 1.0, "{}"),
      (7L, t(40), 3L, "purchase", 1.0, "{}"),
      // user 4: error BEFORE the view does not negate
      (8L, t(0), 4L, "error", 1.0, "{}"),
      (9L, t(5), 4L, "view", 1.0, "{}"),
      (10L, t(10), 4L, "purchase", 1.0, "{}")))
    val got = EventOps.q282PatternFunnel(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 4L -> 1L))
  }

  test("q283 weighted reservoir: 5 ranked distinct docs per source, deterministic") {
    val dir = "/root/testdata/sf0.001"
    val got = PipelineOps.q283WeightedReservoir(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val bySource = got.groupBy(_._1)
    val sourceSizes = graft.Tables.documents(spark, dir)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySource.foreach { case (src, rows) =>
      assert(rows.length === math.min(5L, sourceSizes(src)).toInt)
      assert(rows.map(_._2).sorted.toSeq === (1 to rows.length))
      assert(rows.map(_._3).distinct.length === rows.length)
    }
    // fully deterministic: a second run reproduces the sample exactly
    val again = PipelineOps.q283WeightedReservoir(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(again.toSeq === got.toSeq)
  }

  test("q283 weighting pulls heavy documents into the sample") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_r8_wr").toString
    // one 10^9-weight doc among 40 weight-1 docs: its A-ES priority
    // ln(u)/w is ~10^9 closer to zero than any light doc's unless that
    // doc draws u astronomically close to 1 — it must sample at rank 1
    val docs = (1L to 40L).map(i => (i, "light", "s0", 1)) :+ (99L, "heavy", "s0", 1000000000)
    docs.toDF("doc_id", "text", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val top = PipelineOps.q283WeightedReservoir(spark, d).collect()
      .filter(_.getInt(1) === 1).map(_.getLong(2))
    assert(top.toSeq === Seq(99L))
  }

  test("q284 stream semi join emits each converting click once") {
    val t = (m: Int) => Timestamp.valueOf(f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")
    val d = eventsDir(Seq(
      // user 1: one click with TWO purchases in-window -> still 1 row
      (1L, t(0), 1L, "click", 1.0, "{}"),
      (2L, t(5), 1L, "purchase", 1.0, "{}"),
      (3L, t(10), 1L, "purchase", 1.0, "{}"),
      // user 2: click with purchase 40 min later -> no conversion
      (4L, t(0), 2L, "click", 1.0, "{}"),
      (5L, t(40), 2L, "purchase", 1.0, "{}"),
      // user 3: two clicks, one purchase covering both windows
      (6L, t(0), 3L, "click", 1.0, "{}"),
      (7L, t(10), 3L, "click", 1.0, "{}"),
      (8L, t(20), 3L, "purchase", 1.0, "{}")))
    val got = StreamingOps.q284StreamSemiJoin(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 3L -> 2L))
  }
}
