package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8ao batch (q387-q388). */
class VarianceBridgeAgingReportSpec extends SparkSpec {

  test("q387 variance bridge: pure price move lands in price_eff exactly") {
    import spark.implicits._
    // brand B1: 10 units at $1 -> 10 units at $2: delta 1000c,
    // price = (10*2000)//10 - 1000 = 1000, volume = 0, residual 0
    val li = Seq(
      (1L, 1L, 10.0, 10.0), (2L, 1L, 10.0, 20.0))
      .toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val ord = Seq((1L, "2024-01-01"), (2L, "2024-03-01"))
      .toDF("o_orderkey", "o_orderdate")
    val part = Seq((1L, "B1")).toDF("p_partkey", "p_brand")
    val r = CapacityAuditOps.varianceBridge(li, ord, part).collect()(0)
    assert((r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))
      === ((1000L, 1000L, 0L, 0L)))
  }

  test("q387 variance bridge: pure volume move + reconciliation invariant") {
    import spark.implicits._
    // brand B1: 10 units at $1 -> 30 units at $1:
    // delta 2000, price 0, volume ((30-10)*1000)//10 = 2000, residual 0
    // brand B2 mixes both; its rows must still reconcile exactly
    val li = Seq(
      (1L, 1L, 10.0, 10.0), (2L, 1L, 30.0, 30.0),
      (1L, 2L, 5.0, 35.0), (2L, 2L, 7.0, 21.0))
      .toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val ord = Seq((1L, "2024-01-01"), (2L, "2024-03-01"))
      .toDF("o_orderkey", "o_orderdate")
    val part = Seq((1L, "B1"), (2L, "B2")).toDF("p_partkey", "p_brand")
    val got = CapacityAuditOps.varianceBridge(li, ord, part).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))).toMap
    assert(got("B1") === ((2000L, 0L, 2000L, 0L)))
    // reconciliation: delta = price + volume + residual on every row
    got.values.foreach { case (d, p, v, res) => assert(d === p + v + res) }
  }

  test("q388 aging report: exact band cut-offs and shares") {
    import spark.implicits._
    // snapshot = 2024-12-31; open orders at ages 10, 60, 200, 400 days
    val orders = Seq(
      ("2024-12-31", "F", 999.0),     // finished: excluded, sets snapshot
      ("2024-12-21", "O", 10.0),      // age 10  -> a_0_30
      ("2024-11-01", "O", 20.0),      // age 60  -> b_31_90
      ("2024-06-14", "P", 30.0),      // age 200 -> c_91_365
      ("2023-11-27", "O", 40.0))      // age 400 -> d_over_365
      .toDF("o_orderdate", "o_orderstatus", "o_totalprice")
    val got = CapacityAuditOps.agingReport(orders).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got("a_0_30") === ((1L, 1000L, 100000L)))
    assert(got("b_31_90") === ((1L, 2000L, 200000L)))
    assert(got("c_91_365") === ((1L, 3000L, 300000L)))
    assert(got("d_over_365") === ((1L, 4000L, 400000L)))
  }
}
