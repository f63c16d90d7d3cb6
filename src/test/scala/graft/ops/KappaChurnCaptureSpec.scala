package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Planted-fixture tests for the round-8j batch (q324-q326). */
class KappaChurnCaptureSpec extends SparkSpec {

  test("q324 Cohen's kappa: the textbook 2x2 table gives kappa_ppm = 400000") {
    import spark.implicits._
    // contingency [[20,5],[10,15]]: po=0.7, pe=0.5 -> kappa = 0.4
    val labels = (Seq.fill(20)((0L, 0L)) ++ Seq.fill(5)((0L, 1L)) ++
      Seq.fill(10)((1L, 0L)) ++ Seq.fill(15)((1L, 1L))).toDF("a", "b")
    val got = EvalReplayOps.cohenKappa(labels).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (0L, 0L, 20L, 50L, 400000L), (0L, 1L, 5L, 50L, 400000L),
      (1L, 0L, 10L, 50L, 400000L), (1L, 1L, 15L, 50L, 400000L)))
  }

  test("q325 top-k churn: planted day sets give exact Jaccard trajectory") {
    import spark.implicits._
    // day1 {1,2}, day2 {2,3}, day3 {4,5}: J(1,2)=1/3, J(2,3)=0
    val d = Files.createTempDirectory("graft_r8j").toString
    Seq((1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-01-03"))
      .map { case (k, day) => (k, Timestamp.valueOf(s"$day 00:00:00")) }
      .toDF("o_orderkey", "o_orderdate")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 4L), (3L, 5L))
      .map { case (ok, p) => (ok, p, 1.00) }
      .toDF("l_orderkey", "l_partkey", "l_extendedprice")
      .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    val got = EvalReplayOps.q325TopkChurn(spark, d).collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      ("2024-01-01", 2L, 2L, 1L, 333333L),
      ("2024-01-02", 2L, 2L, 0L, 0L)))
  }

  test("q326 capture-recapture: one planted pair caught by both detectors") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_r8j_docs").toString
    Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // exact twin: caught by both
      (3L, "zeta eta theta iota kappa lambda mu"))
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val got = EvalReplayOps.q326CaptureRecapture(spark, d).collect()
    assert(got.length === 1)
    val r = got.head
    // n1=n2=m=1 -> chapman = 4/2 - 1 = 1, nothing estimated missed
    assert(r.toSeq === Seq(1L, 1L, 1L, 1L, 0L, 1000000L, 1000000L))
  }
}
