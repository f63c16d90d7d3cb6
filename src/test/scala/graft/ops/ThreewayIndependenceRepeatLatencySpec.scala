package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8av batch (q401-q402). */
class ThreewayIndependenceRepeatLatencySpec extends SparkSpec {

  test("q401 three-way independence: a product design gives exactly zero") {
    import spark.implicits._
    val rows = for {
      a <- Seq("a1", "a2"); b <- Seq("b1", "b2", "b3")
      c <- Seq("c1", "c2"); _ <- 1 to 5
    } yield (a, b, c)
    val r = CapacityAuditOps.threewayIndependence(rows.toDF("a", "b", "c"))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((60L, 2L, 3L, 2L, 7L)))
    assert(r.getLong(5) === 0L)
  }

  test("q401 matches an independent BigInt reference on skewed data") {
    import spark.implicits._
    val rows = (1 to 500).map(i =>
      (s"a${i % 3}", s"b${(i * i) % 2}", s"c${(i * 7) % 4}"))
    val r = CapacityAuditOps.threewayIndependence(rows.toDF("a", "b", "c"))
      .collect()(0)
    val cells = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val na = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nb = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nc = rows.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val nn = rows.size.toLong
    val chi2 = cells.toSeq.map { case ((a, b, c), obs) =>
      (BigInt(1000000) * obs * obs * nn * nn) /
        (BigInt(na(a)) * nb(b) * nc(c))
    }.sum - BigInt(1000000) * nn
    assert(r.getLong(5) === chi2.toLong)
  }

  test("q402 repeat latency: hand-computed per-segment quartiles") {
    import spark.implicits._
    val orders = Seq(
      (1L, 1L, "2024-01-01"), (2L, 1L, "2024-01-11"), (3L, 1L, "2024-01-21"),
      (4L, 2L, "2024-02-01"), (5L, 2L, "2024-03-12"))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val cust = Seq((1L, "S"), (2L, "S")).toDF("c_custkey", "c_mktsegment")
    val r = CapacityAuditOps.repeatLatency(orders, cust).collect()(0)
    // gaps: 10, 10, 40 -> q1 10, median 10, q3 40
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === (("S", 3L, 10L, 10L, 40L)))
  }

  test("q402 repeat latency: single-order customers contribute no gaps") {
    import spark.implicits._
    val orders = Seq((1L, 1L, "2024-01-01"), (2L, 2L, "2024-01-01"),
      (3L, 2L, "2024-01-08"))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val cust = Seq((1L, "A"), (2L, "B")).toDF("c_custkey", "c_mktsegment")
    val got = CapacityAuditOps.repeatLatency(orders, cust).collect()
    assert(got.length === 1)
    assert((got(0).getString(0), got(0).getLong(1), got(0).getLong(3))
      === (("B", 1L, 7L)))
  }
}
