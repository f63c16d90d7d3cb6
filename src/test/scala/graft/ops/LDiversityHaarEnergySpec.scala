package graft.ops

import graft.SparkSpec
import java.sql.Date

/** Planted-fixture tests for the round-8w batch (q351-q352). */
class LDiversityHaarEnergySpec extends SparkSpec {

  test("q351 l-diversity: homogeneous group fails the gate, diverse passes") {
    import spark.implicits._
    val rows = Seq(
      (1, "S", 100.0), (1, "S", 2100.0), (1, "S", 4100.0),   // bands 0,1,2
      (2, "S", 100.0), (2, "S", 150.0), (2, "S", 300.0))     // all band 0
      .toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val got = EvalReplayOps.lDiversity(rows, l = 3).collect()
    assert(got.length === 2)
    val g1 = got(0); val g2 = got(1)
    assert((g1.getLong(0), g1.getLong(2), g1.getLong(3), g1.getLong(4), g1.getBoolean(5))
      === ((1L, 3L, 3L, 333333L, true)))
    assert((g2.getLong(0), g2.getLong(2), g2.getLong(3), g2.getLong(4), g2.getBoolean(5))
      === ((2L, 3L, 1L, 1000000L, false)))
  }

  test("q352 Haar energy: ramp series has hand-computable level energies") {
    import spark.implicits._
    // 8 consecutive days, x = 1..8
    val rows = (1 to 8).flatMap { i =>
      Seq.fill(i)(Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i - 1)))
    }
    val got = EvalReplayOps.haarEnergy(rows.toDF("o_orderdate"), spark).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // L1: four d=-1 blocks -> raw 4, ppm 2e6; L2: two d=-4 -> raw 32, ppm 8e6;
    // L3: one d=-16 -> raw 256, ppm 32e6
    assert(got.toSeq === Seq((1L, 4L, 4L, 2000000L), (2L, 2L, 32L, 8000000L),
      (3L, 1L, 256L, 32000000L)))
  }

  test("q352 incomplete dyadic blocks are dropped, not padded") {
    import spark.implicits._
    // days at offsets 0..3 and 5..8 (offset 4 missing)
    val offs = Seq(0, 1, 2, 3, 5, 6, 7, 8)
    val rows = offs.map(o => Date.valueOf(java.time.LocalDate.of(2024, 2, 1).plusDays(o)))
    val got = EvalReplayOps.haarEnergy(rows.toDF("o_orderdate"), spark).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // L1 keeps blocks {0,1},{2,3},{6,7}; L2 keeps {0..3}; L3 has no complete block
    assert(got.toSeq === Seq((1L, 3L), (2L, 1L)))
  }
}
