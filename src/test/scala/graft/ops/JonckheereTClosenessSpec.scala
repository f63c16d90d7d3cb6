package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8ac batch (q363-q364). */
class JonckheereTClosenessSpec extends SparkSpec {

  test("q363 Jonckheere-Terpstra: hand-computed tie fixture") {
    import spark.implicits._
    // G1 = {1,2}, G2 = {2,3}: cross pairs <,<,=,< -> jt_x4 = 14 (JT = 3.5)
    // E_x4 = 16 - 8 = 8; tie-corrected Var = 102/72 + 8/96 = 1.5
    // z = 6 / (4*sqrt(1.5)) = 1.224745
    val rows = Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L)).toDF("g", "v")
    val r = EvalReplayOps.histJt(rows).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((4L, 2L, 14L, 8L)))
    assert(r.getDouble(4) === 1.224745)
  }

  test("q363 pooled prefix-sum path equals histJt on fixtures") {
    import spark.implicits._
    val fixtures = Seq(
      Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L)),
      (1 to 90).map(i => ((i % 3 + 1).toLong, ((i * 7) % 5).toLong)).toSeq,
      (1 to 60).map(i => ((i % 5 + 1).toLong, ((i * 11) % 7).toLong)).toSeq)
    fixtures.foreach { rows =>
      val df = rows.toDF("g", "v")
      val a = EvalReplayOps.histJt(df).collect()(0)
      val b = EvalReplayOps.pooledJt5(df).collect()(0)
      assert(a.toSeq === b.toSeq)
    }
  }

  test("q363 matches a brute-force pair count on generated rows") {
    import spark.implicits._
    val rows = (1 to 90).map(i => ((i % 3 + 1).toLong, ((i * 7) % 5).toLong))
    val r = EvalReplayOps.histJt(rows.toDF("g", "v")).collect()(0)
    val jtX4 = (for {
      (gi, vi) <- rows; (gj, vj) <- rows if gi < gj
    } yield 2L * (if (vi < vj) 2L else if (vi == vj) 1L else 0L)).sum
    val n = rows.size.toLong
    val ni = rows.groupBy(_._1).view.mapValues(_.size.toLong).values.toSeq
    val eX4 = n * n - ni.map(x => x * x).sum
    assert((r.getLong(0), r.getLong(2), r.getLong(3)) === ((n, jtX4, eX4)))
  }

  test("q364 t-closeness: single-group population has t = 0") {
    import spark.implicits._
    val cust = (1 to 30).map(i => (1L, "SEG", i * 37.0 % 5000))
      .toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val r = EvalReplayOps.tCloseness(cust, 200000L).collect()
    assert(r.length === 1)
    assert(r(0).getLong(3) === 0L)
    assert(r(0).getBoolean(4))
  }

  test("q364 t-closeness: disjoint-band groups hit the EMD ceiling for k=2") {
    import spark.implicits._
    // group (1,A) all in band 1, group (2,B) all in band 2, equal sizes:
    // t_ppm = 1e6 * nA^2 / (1 * nA * 2nA) = 500000 for both
    val cust = ((1 to 10).map(_ => (1L, "A", 100.0)) ++
      (1 to 10).map(_ => (2L, "B", 1500.0)))
      .toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val r = EvalReplayOps.tCloseness(cust, 200000L).collect()
    assert(r.length === 2)
    assert(r.forall(_.getLong(3) === 500000L))
    assert(r.forall(!_.getBoolean(4)))
  }

  test("q364 matches an independent BigInt EMD reference") {
    import spark.implicits._
    val rows = (1 to 200).map { i =>
      ((i % 3).toLong, if (i % 2 == 0) "X" else "Y", (i * 131) % 4000 - 500.0)
    }
    val got = EvalReplayOps.tCloseness(
      rows.toDF("c_nationkey", "c_mktsegment", "c_acctbal"), 200000L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(3)).toMap
    def band(b: Double): Long =
      (math.floor(b * 100 + 0.5).toLong + 100000L) / 100000L
    val banded = rows.map { case (n, s, b) => ((n, s), band(b)) }
    val bands = banded.map(_._2).distinct.sorted
    val k = bands.size.toLong
    val nn = banded.size.toLong
    val want = banded.groupBy(_._1).map { case (g, rs) =>
      val ng = rs.size.toLong
      val num = bands.map { b =>
        val cumG = rs.count(_._2 <= b).toLong
        val cumAll = banded.count(_._2 <= b).toLong
        (BigInt(cumG) * nn - BigInt(cumAll) * ng).abs
      }.sum
      g -> ((BigInt(1000000) * num) / (BigInt(k - 1) * ng * nn)).toLong
    }
    assert(got === want)
  }
}
