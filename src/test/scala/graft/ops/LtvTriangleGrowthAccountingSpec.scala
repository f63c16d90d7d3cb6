package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8aw batch (q403-q404). */
class LtvTriangleGrowthAccountingSpec extends SparkSpec {

  test("q403 LTV triangle: hand-built two-cohort cumulative curve") {
    import spark.implicits._
    // cohort Jan-2024 (m=409): c1 spends $10 in Jan, $5 in Mar (age 2);
    // c2 spends $20 in Jan only. cohort Feb (m=410): c3 spends $7.
    val orders = Seq(
      (1L, "2024-01-05", 10.0), (1L, "2024-03-05", 5.0),
      (2L, "2024-01-20", 20.0),
      (3L, "2024-02-10", 7.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = CapacityAuditOps.ltvTriangle(orders).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val jan = (2024L - 1990L) * 12 + 1
    assert(got((jan, 0L)) === ((2L, 2L, 3000L, 1500L)))
    assert(got((jan, 2L)) === ((1L, 2L, 3500L, 1750L)))
    assert(got((jan + 1, 0L)) === ((1L, 1L, 700L, 700L)))
    assert(got.size === 3)
  }

  test("q404 growth accounting: the additivity invariant and every class") {
    import spark.implicits._
    // m1: c1, c2 (both new). m2: c1 (retained), c3 (new); c2 churns.
    // m3: c2 (resurrected), c1 churns... c3 churns too.
    val orders = Seq(
      (1L, "2024-01-05"), (2L, "2024-01-06"),
      (1L, "2024-02-03"), (3L, "2024-02-04"),
      (2L, "2024-03-07"))
      .toDF("o_custkey", "o_orderdate")
    val got = CapacityAuditOps.growthAccounting(orders).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    val m1 = (2024L - 1990L) * 12 + 1
    assert(got(m1) === ((2L, 2L, 0L, 0L, 0L)))
    assert(got(m1 + 1) === ((2L, 1L, 1L, 0L, 1L)))   // c2 churned
    assert(got(m1 + 2) === ((1L, 0L, 0L, 1L, 2L)))   // c2 back, c1+c3 churn
    // additivity: new + retained + resurrected = active, every month
    got.values.foreach { case (a, n, r, z, _) => assert(n + r + z === a) }
  }

  test("q404 growth accounting: a zero-active month gets its own row and carries its churn") {
    import spark.implicits._
    // c1 active Jan and Mar, nobody in Feb — the round-8 advice edge:
    // the old lag(active)-retained skipped the empty month and charged
    // Mar's churn against Jan. The densified grid emits Feb explicitly
    // (active 0, churned 1 — c1 went silent INTO Feb), and Mar shows c1
    // resurrected with zero churn (nobody was active in Feb to lose).
    val orders = Seq((1L, "2024-01-05"), (1L, "2024-03-07"))
      .toDF("o_custkey", "o_orderdate")
    val got = CapacityAuditOps.growthAccounting(orders).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    val m1 = (2024L - 1990L) * 12 + 1
    assert(got(m1) === ((1L, 1L, 0L, 0L, 0L)))
    assert(got(m1 + 1) === ((0L, 0L, 0L, 0L, 1L)))   // empty month, c1 churned
    assert(got(m1 + 2) === ((1L, 0L, 0L, 1L, 0L)))   // c1 resurrected
    assert(got.size === 3)
    got.values.foreach { case (a, n, r, z, _) => assert(n + r + z === a) }
  }
}
