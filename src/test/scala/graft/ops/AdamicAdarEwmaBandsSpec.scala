package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8s batch (q343-q344). */
class AdamicAdarEwmaBandsSpec extends SparkSpec {

  test("q343 Adamic-Adar: star + one closed edge leaves exactly the open pairs") {
    import spark.implicits._
    // edges: 1-2, 1-3, 1-4, 2-3 (canonical p1<p2). deg: 1->3, 2->2, 3->2, 4->1
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L)).toDF("p1", "p2")
    val got = GraphMiningOps.adamicAdar(edges, degCap = 256, topK = 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // wedges through center 1 propose (2,4) and (3,4) with w = floor(1e6/ln 3);
    // (2,3)/(1,3)/(1,2) are existing edges and must be excluded
    val w = math.floor(1e6 / math.log(3)).toLong
    assert(got.toSeq === Seq((2L, 4L, w, 1L), (3L, 4L, w, 1L)))
  }

  test("q343 degree cap drops super-connector centers") {
    import spark.implicits._
    // star center 1 with 5 leaves; cap 4 excludes it -> no predictions
    val edges = (2L to 6L).map(n => (1L, n)).toDF("p1", "p2")
    assert(GraphMiningOps.adamicAdar(edges, degCap = 4, topK = 20).count() === 0L)
  }

  test("q344 EWMA bands: a spike day tops the alert ranking") {
    import spark.implicits._
    // 40 days alternating 4/6 around level 5, then a 50-order spike
    val rows = (1 to 41).flatMap { i =>
      val x = if (i == 41) 50 else if (i % 2 == 0) 6 else 4
      Seq.fill(x)(java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i - 1).toString))
    }
    val orders = rows.toDF("o_orderdate")
    val got = GraphMiningOps.ewmaBands(orders, spark, topK = 5).collect()
    assert(got.nonEmpty)
    val top = got(0)
    assert(top.getDate(0).toString === "2024-02-10") // day 41
    assert(top.getLong(1) === 50L)
    val lev = top.getLong(2)
    assert(lev > 5000000L && lev < 5700000L, lev) // near 16/3 million ppm
    assert(top.getLong(3) === 50000000L - lev)    // dev = |50e6 - lev|
    assert(top.getLong(4) > 0L)
    // every listed day has a positive band and ratios are non-increasing
    assert(got.forall(_.getLong(4) > 0L))
    val ratios = got.map(_.getLong(5)).toSeq
    assert(ratios === ratios.sorted.reverse)
  }

  test("q344 constant series has zero bands everywhere -> empty alert set") {
    import spark.implicits._
    val rows = (1 to 30).flatMap { i =>
      Seq.fill(5)(java.sql.Date.valueOf(java.time.LocalDate.of(2024, 3, 1).plusDays(i - 1).toString))
    }
    assert(GraphMiningOps.ewmaBands(rows.toDF("o_orderdate"), spark, topK = 5).count() === 0L)
  }
}
