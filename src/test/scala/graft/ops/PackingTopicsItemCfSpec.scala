package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Planted-fixture tests for the round-8b batch (q285-q288): block
  * manifests with hand-computed interval overlaps, a two-topic document,
  * a designed z-crossing, and an exactly-solvable co-occurrence matrix.
  */
class PackingTopicsItemCfSpec extends SparkSpec {

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_r8b_docs").toString
    rows.map { case (id, text) => (id, text, "en", "s", text.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("q285 block manifest: interval overlaps and loss masks are exact") {
    // docs of 600/300/200 tokens -> global stream of 1100 tokens over
    // blocks [0,512), [512,1024), [1024,1536). Loss starts at ceil(len/4).
    val d = docsDir(Seq(
      (1L, Seq.fill(600)("w").mkString(" ")),
      (2L, Seq.fill(300)("w").mkString(" ")),
      (3L, Seq.fill(200)("w").mkString(" "))))
    val got = CorpusOps.q285PackedBlocks(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // block 0: doc1 only, loss span [150,600) clipped to [0,512) = 362
    // block 1: doc1 tail 88 (all loss) + doc2 300 (loss 225) + doc3 head
    //          124 (loss [950,1024) = 74) -> 512 toks, 387 loss
    // block 2: doc3 tail 76, all loss; pad 436
    assert(got.toSeq === Seq(
      (0L, 1L, 512L, 362L, 0L),
      (1L, 3L, 512L, 387L, 0L),
      (2L, 1L, 76L, 76L, 436L)))
  }

  test("q286 topic segmentation: a hard topic shift scores the maximal L1") {
    // doc 1: 20x aaa then 20x bbb -> one boundary at 20, L1 = 40 (full
    // swap; buckets 60 vs 56, no collision), split. doc 2: uniform ccc ->
    // L1 = 0, no split.
    val d = docsDir(Seq(
      (1L, (Seq.fill(20)("aaa") ++ Seq.fill(20)("bbb")).mkString(" ")),
      (2L, Seq.fill(40)("ccc").mkString(" "))))
    val got = TextOps.q286TopicSegments(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 1L, 1L, 40L), (2L, 1L, 0L, 0L)))
  }

  test("q287 sequential monitor: a designed lift crosses the 2.5 boundary") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_r8b_sq").toString
    val t = (day: Int, k: Int) => Timestamp.valueOf(f"2024-01-$day%02d 10:00:${k % 60}%02d")
    var id = 0L
    // day 1: A converts 5/10, B 0/10 -> z ~ 2.58, crossed
    // day 2: B catches up (5/10 each cumulative) -> z = 0, not crossed
    val rows =
      (1 to 10).map { k => id += 1; (id, t(1, k), 0L, if (k <= 5) "purchase" else "view", 1.0, "{}") } ++
      (1 to 10).map { k => id += 1; (id, t(1, k), 1L, "view", 1.0, "{}") } ++
      (1 to 10).map { k => id += 1; (id, t(2, k), 0L, "view", 1.0, "{}") } ++
      (1 to 10).map { k => id += 1; (id, t(2, k), 1L, if (k <= 5) "purchase" else "view", 1.0, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val got = InferenceTestOps.q287SequentialTest(spark, d).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getBoolean(6)))
    val z1 = math.floor((0.5 - 0.0) /
      math.sqrt(0.25 * 0.75 * (1.0 / 10 + 1.0 / 10)) * 1e6 + 0.5).toLong
    assert(got(0) === ((10L, 5L, 10L, 0L, z1, true)))
    assert(z1 === 2581989L)
    // day 2 cumulative: 5/20 vs 5/20 -> z exactly 0, not crossed
    assert(got(1) === ((20L, 5L, 20L, 5L, 0L, false)))
  }

  test("q290 sink publishes exactly the written rows through the commit protocol") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_r8b_sink").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
      .repartition(3)
      .write.format("graft-sink").option("path", out).mode("append").save()
    // manifest exists and lists the published parts; this job's staging
    // subtree is gone (the shared _staging parent may remain, but EMPTY —
    // deleting it would race a concurrent job's mkdir, round-9 advice)
    assert(new java.io.File(s"$out/_SUCCESS").exists())
    val stagingLeft = Option(new java.io.File(s"$out/_staging").listFiles())
      .map(_.toSeq).getOrElse(Nil)
    assert(stagingLeft.isEmpty, s"staging not cleaned: $stagingLeft")
    val back = spark.read.schema("k LONG, s STRING").option("sep", "|")
      .csv(s"$out/*.part.csv").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(back.toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("q290 sink manifest: _SUCCESS names only the latest job's files (reader contract)") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_r8b_sink2").toString
    Seq((1L, "a")).toDF("k", "s").coalesce(1)
      .write.format("graft-sink").option("path", out).mode("append").save()
    Seq((2L, "b"), (3L, "c")).toDF("k", "s").repartition(2)
      .write.format("graft-sink").option("path", out).mode("append").save()
    // the dir accretes parts across jobs, but the manifest is the pointer
    // swap: it must list exactly the SECOND job's files, and a manifest
    // reader must see only the second job's rows
    val listed = java.nio.file.Files.readString(
      java.nio.file.Path.of(out, "_SUCCESS")).split("\n").filter(_.nonEmpty)
    val onDisk = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.endsWith(".part.csv"))
    assert(onDisk.length === 3, "parts accrete append-only across jobs")
    assert(listed.length === 2, "manifest lists only the latest job")
    assert(listed.forall(onDisk.contains))
    val back = spark.read.schema("k LONG, s STRING").option("sep", "|")
      .csv(listed.map(n => s"$out/$n").toIndexedSeq: _*).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(back.toSeq === Seq((2L, "b"), (3L, "c")))
    assert(Option(new java.io.File(s"$out/_staging").listFiles())
      .map(_.toSeq).getOrElse(Nil).isEmpty) // job subtrees cleaned; empty parent OK
  }

  test("q290 sink abort: a poisoned job publishes nothing") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_r8b_sinkab").toString
    val poison = udf((x: Long) => {
      if (x == 50) throw new RuntimeException("poison"); x
    })
    val df = spark.range(100).repartition(4).select(col("id"), poison(col("id")).as("v"))
    intercept[Exception] {
      df.write.format("graft-sink").option("path", out).mode("append").save()
    }
    // no published parts, no manifest; abort cleans this job's staging
    // subtree (the empty shared _staging parent is the one allowed leftover)
    val left = Option(new java.io.File(out).listFiles()).map(_.toSeq).getOrElse(Nil)
      .filterNot(f => f.getName == "_staging" &&
        Option(f.listFiles()).map(_.isEmpty).getOrElse(true))
    assert(left.isEmpty, s"abort left behind: ${left.mkString(",")}")
  }

  test("q288 item CF recovers the exact co-occurrence cosine ranking") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_r8b_cf").toString
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    // baskets: {a,b,c}, {a,b}, {a,b} with a=101, b=102, c=103
    val rows = Seq(
      (1L, 101L), (1L, 102L), (1L, 103L),
      (2L, 101L), (2L, 102L),
      (3L, 101L), (3L, 102L)).zipWithIndex.map { case ((ok, pk), k) =>
      (ok, pk, 1L, k + 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts)
    }
    rows.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    val got = GraphMiningOps.q288ItemCf(spark, d).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // sim(a,b) = 3/sqrt(3*3) = 1.0; sim(a,c) = 1/sqrt(3) = 0.577350;
    // sim(b,c) identical
    val s577 = math.floor(1.0 / math.sqrt(3.0) * 1e6 + 0.5).toLong
    assert(got.toSeq === Seq(
      (101L, 1, 102L, 3L, 1000000L), (101L, 2, 103L, 1L, s577),
      (102L, 1, 101L, 3L, 1000000L), (102L, 2, 103L, 1L, s577),
      (103L, 1, 101L, 1L, s577), (103L, 2, 102L, 1L, s577)))
  }
}
