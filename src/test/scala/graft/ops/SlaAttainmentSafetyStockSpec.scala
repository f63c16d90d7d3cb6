package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8ap batch (q389-q390). */
class SlaAttainmentSafetyStockSpec extends SparkSpec {

  private def pround(x: Double, n: Int): Double = {
    val p = math.pow(10, n); math.floor(x * p + 0.5) / p
  }

  private def wilson(hits: Long, n: Long): (Double, Double) = {
    val p = hits.toDouble / n
    val z2 = 1.959964 * 1.959964
    val center = (p + z2 / (2.0 * n)) / (1.0 + z2 / n)
    val half = (1.959964 * math.sqrt(p * (1.0 - p) / n +
      z2 / (4.0 * n * n))) / (1.0 + z2 / n)
    (pround(center - half, 6), pround(center + half, 6))
  }

  test("q389 SLA attainment: exact ratio and replicated Wilson bounds") {
    import spark.implicits._
    // priority P1: 3 of 4 lineitems inside 60 days; P2: all 2 inside
    val li = Seq(
      (1L, "2024-01-10"), (1L, "2024-01-20"), (1L, "2024-02-25"),
      (2L, "2024-06-01"),
      (3L, "2024-03-05"), (3L, "2024-03-06"))
      .toDF("l_orderkey", "l_shipdate")
    val ord = Seq((1L, "2024-01-01", "P1"), (2L, "2024-01-01", "P1"),
      (3L, "2024-03-01", "P2"))
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val got = CapacityAuditOps.slaAttainment(li, ord, slaDays = 60).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5)))).toMap
    val (lo1, hi1) = wilson(3, 4)
    assert(got("P1") === ((4L, 3L, 750000L, lo1, hi1)))
    val (lo2, hi2) = wilson(2, 2)
    assert(got("P2") === ((2L, 2L, 1000000L, lo2, hi2)))
    assert(hi2 <= 1.0 && lo2 < 1.0)   // Wilson stays inside [0,1]
  }

  test("q390 safety stock: zero-filled variance over the global calendar") {
    import spark.implicits._
    // brand A sells on 2 of the 4 active calendar days (zeros count):
    // S=30, Q2=500, nd=4 -> var = (4*500-900)/12 = 91.666...
    val li = Seq(
      (1L, 1L, 10.0), (2L, 1L, 20.0), (3L, 2L, 5.0), (4L, 2L, 5.0))
      .toDF("l_orderkey", "l_partkey", "l_quantity")
    val ord = Seq((1L, "2024-01-01"), (2L, "2024-01-02"),
      (3L, "2024-01-03"), (4L, "2024-01-04"))
      .toDF("o_orderkey", "o_orderdate")
    val part = Seq((1L, "A"), (2L, "B")).toDF("p_partkey", "p_brand")
    val got = CapacityAuditOps.safetyStock(li, ord, part).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    val varA = (4.0 * 500.0 - 900.0) / (4.0 * 3.0)
    val ssA = 1.644854 * math.sqrt(varA) * math.sqrt(7.0)
    val muA = 30.0 / 4.0
    assert(got("A") === ((4L, 2L, 30L, pround(muA, 4), pround(ssA, 2),
      pround(muA * 7.0 + ssA, 2))))
    // brand B is flatter: lower variance -> smaller safety stock
    assert(got("B")._5 < got("A")._5)
  }
}
