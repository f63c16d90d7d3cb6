package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8ax batch (q405-q406). */
class AbcClassificationSupplyConcentrationSpec extends SparkSpec {

  test("q405 ABC: band-level cut puts the heavy band in A, the tail in C") {
    import spark.implicits._
    // part 1: $800 revenue (band 800); part 2: $150 (band 150);
    // part 3: $50 (band 50). cum desc: 800 (80% <= 80 -> A),
    // 950 (95% <= 95 -> B), 1000 (-> C)
    val li = Seq((1L, 800.0), (2L, 150.0), (3L, 50.0))
      .toDF("l_partkey", "l_extendedprice")
    val got = CapacityAuditOps.abcClassification(li).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("A") === ((1L, 80000L, 800000L)))
    assert(got("B") === ((1L, 15000L, 150000L)))
    assert(got("C") === ((1L, 5000L, 50000L)))
  }

  test("q406 supply concentration: top shares, census, and ordering") {
    import spark.implicits._
    // part 1: sup 10 carries $70 of $100 (700000 ppm, 2 suppliers);
    // part 2: sup 20 is the only source ($40 -> 1e6 ppm)
    val li = Seq(
      (1L, 10L, 70.0), (1L, 20L, 30.0),
      (2L, 20L, 40.0))
      .toDF("l_partkey", "l_suppkey", "l_extendedprice")
    val got = CapacityAuditOps.supplyConcentration(li).collect()
    assert(got.length === 2)
    val top = got(0)
    assert((top.getLong(0), top.getLong(1), top.getLong(2), top.getLong(3))
      === ((2L, 20L, 1L, 1000000L)))
    val second = got(1)
    assert((second.getLong(0), second.getLong(1), second.getLong(2),
      second.getLong(3)) === ((1L, 10L, 2L, 700000L)))
    // census rides on every row: 2 parts, 1 single-source, mean 850000
    assert(got.forall(r =>
      (r.getLong(4), r.getLong(5), r.getLong(6)) === ((2L, 1L, 850000L))))
  }
}
