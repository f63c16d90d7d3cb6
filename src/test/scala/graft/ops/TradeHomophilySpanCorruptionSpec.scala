package graft.ops

import graft.SparkSpec
import java.nio.file.Files

/** Planted-fixture tests for the round-8p batch (q337-q338). */
class TradeHomophilySpanCorruptionSpec extends SparkSpec {

  test("q337 homophily: planted trade edges give the exact kappa-form coefficient") {
    import spark.implicits._
    // edges (cn, sn): (0,0), (0,1), (1,1), (1,1) -> r = 4e6 // 8 = 500000
    val d = Files.createTempDirectory("graft_r8p").toString
    Seq((1L, 0), (2L, 1)).toDF("c_custkey", "c_nationkey")
      .coalesce(1).write.parquet(s"$d/customer.parquet")
    Seq((10L, 0), (11L, 1)).toDF("s_suppkey", "s_nationkey")
      .coalesce(1).write.parquet(s"$d/supplier.parquet")
    Seq((100L, 1L), (101L, 2L)).toDF("o_orderkey", "o_custkey")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    Seq((100L, 10L), (100L, 11L), (101L, 11L), (101L, 11L))
      .toDF("l_orderkey", "l_suppkey")
      .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    val got = GraphMiningOps.q337TradeHomophily(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (0L, 0L, 1L, 4L, 500000L),
      (0L, 1L, 1L, 4L, 500000L),
      (1L, 1L, 2L, 4L, 500000L)))
  }

  test("q338 span plan: modulus 1 floods to one full-doc island; budgets stay sane") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g"), (2L, "x y")).toDF("doc_id", "text")
    // every position starts a span -> one merged island covering the doc
    val full = GraphMiningOps.spanCorruptionPlan(docs, spanLen = 3, modulus = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(full.toSeq === Seq(
      (1L, 7L, 1L, 7L, 1000000L),
      (2L, 2L, 1L, 2L, 1000000L)))
    // hash-sparse plan: accounting invariants hold for every doc
    val sparse = GraphMiningOps.spanCorruptionPlan(docs, spanLen = 3, modulus = 3).collect()
    sparse.foreach { r =>
      val (m, spans, masked, ratio) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(masked >= spans && masked <= m)
      assert(ratio === 1000000L * masked / m)
    }
  }
}
