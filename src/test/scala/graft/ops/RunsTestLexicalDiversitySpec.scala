package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8aa batch (q359-q360). */
class RunsTestLexicalDiversitySpec extends SparkSpec {

  test("q359 runs test: alternating series, hand-computed moments") {
    import spark.implicits._
    // 7 days, revenues 1,10,2,9,3,8,4 dollars; low median = 4 (dropped)
    // remaining signs by day: 0,1,0,1,0,1 -> runs = 6, n1 = n2 = 3
    val orders = Seq(
      ("2024-01-01", 1.0), ("2024-01-02", 10.0), ("2024-01-03", 2.0),
      ("2024-01-04", 9.0), ("2024-01-05", 3.0), ("2024-01-06", 8.0),
      ("2024-01-07", 4.0))
      .toDF("o_orderdate", "o_totalprice")
    val r = InferenceTestOps.runsTest(orders).collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getLong(0) === 3L)            // n_above
    assert(row.getLong(1) === 3L)            // n_below
    assert(row.getLong(2) === 6L)            // runs
    assert(row.getLong(3) === 400L)          // median_cents
    assert(row.getLong(4) === 6L)            // n
    // E[R] = (6 + 2*3*3)/6 = 4
    assert(row.getLong(5) === 4000000L)      // e_runs_ppm
    // Var[R] = 18*(18-6)/(36*5) = 1.2
    assert(row.getLong(6) === 1200000L)      // var_ppm
    // z = (6-4)/sqrt(1.2) = 1.825742 (pround 6)
    assert(row.getDouble(7) === 1.825742)
  }

  test("q359 runs test: perfectly blocked series gets minimal runs") {
    import spark.implicits._
    // low block then high block: 2 runs after the median day drops
    val orders = (1 to 9).map(i => (f"2024-02-0$i", i * 1.0))
      .toDF("o_orderdate", "o_totalprice")
    val row = InferenceTestOps.runsTest(orders).collect()(0)
    assert(row.getLong(2) === 2L)            // runs
    assert(row.getLong(0) === 4L && row.getLong(1) === 4L)
    assert(row.getDouble(7) < 0.0)           // z negative: too few runs
  }

  test("q360 lexical diversity: exact panel on a planted two-source corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a b c", "s1"),
      (2L, "x y", "s2"))
      .toDF("doc_id", "text", "source")
    val got = InferenceTestOps.lexicalDiversity(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    // s1: N=4 V=3 hapax=2 S2=6 -> ttr 750000, hapax 666666,
    //     K*1000 = 1e7*(6-4)/16 = 1250000
    assert(got("s1") === ((4L, 3L, 2L, 750000L, 666666L, 1250000L)))
    // s2: N=2 V=2 hapax=2 S2=2 -> ttr 1000000, hapax 1000000, K = 0
    assert(got("s2") === ((2L, 2L, 2L, 1000000L, 1000000L, 0L)))
  }

  test("q360 matches an independent BigInt reference on a generated corpus") {
    import spark.implicits._
    val words = Vector("alpha", "beta", "gamma", "delta", "eps")
    val docs = (1L to 40L).map { i =>
      val body = (0 until (i % 7 + 1).toInt)
        .map(j => words(((i * 31 + j * 17) % 5).toInt)).mkString(" ")
      (i, body, if (i % 2 == 0) "even" else "odd")
    }
    val got = InferenceTestOps.lexicalDiversity(docs.toDF("doc_id", "text", "source"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    val want = docs.groupBy(_._3).view.mapValues { ds =>
      val freq = ds.flatMap(_._2.split(" ").filter(_.nonEmpty))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = freq.values.sum
      val v = freq.size.toLong
      val hapax = freq.values.count(_ == 1L).toLong
      val s2 = freq.values.map(f => BigInt(f) * f).sum
      ((n, v, hapax,
        (BigInt(1000000) * v / n).toLong,
        (BigInt(1000000) * hapax / v).toLong,
        (BigInt(10000000) * (s2 - n) / (BigInt(n) * n)).toLong))
    }.toMap
    assert(got === want)
  }
}
