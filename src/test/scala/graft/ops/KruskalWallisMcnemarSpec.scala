package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8r batch (q341-q342). */
class KruskalWallisMcnemarSpec extends SparkSpec {

  test("q341 Kruskal-Wallis: hand-computed H on a 2-group fixture with one tie") {
    import spark.implicits._
    // A: 1.00 2.00 3.00; B: 4.00 5.00 2.00 -> cents 100..500, 200 tied x2
    // avg ranks: 1, 2.5, 4, 5, 6 -> doubled: 2, 5, 8, 10, 12
    // S_A = 2+5+8 = 15, S_B = 10+12+5 = 27 (sum 42 = 2*21), N=6, TT = 2^3-2 = 6
    // A4 = 15^2/3 + 27^2/3 = (225+729)/3 = 318
    // H0 = 3*318/(6*7) - 3*7 = 22.714285... - 21 = 1.714285...
    // C = 1 - 6/210; H = 1.7647...
    val rows = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0),
      ("B", 4.0), ("B", 5.0), ("B", 2.0)).toDF("g", "bal")
    val got = InferenceTestOps.kruskalWallis(rows, "bal", "g").collect()
    assert(got.length === 2)
    val a = got(0); val b = got(1)
    assert(a.getString(0) === "A" && a.getLong(1) === 3L && a.getLong(2) === 15L)
    assert(b.getString(0) === "B" && b.getLong(1) === 3L && b.getLong(2) === 27L)
    assert(a.getLong(3) === 6L && a.getLong(4) === 6L)
    val h = 3.0 * (225.0 / 3 + 729.0 / 3) / 42.0 - 21.0
    val hc = h / (1.0 - 6.0 / 210.0)
    assert(math.abs(a.getDouble(5) - hc) < 1e-6)
    assert(math.abs(a.getDouble(6) - hc / 5.0) < 1e-6)
  }

  test("q341 identical groups give H ~ 0") {
    import spark.implicits._
    val rows = (1 to 40).flatMap(i => Seq(("A", i.toDouble), ("B", i.toDouble)))
      .toDF("g", "bal")
    val got = InferenceTestOps.kruskalWallis(rows, "bal", "g").collect()
    assert(math.abs(got(0).getDouble(5)) < 1e-6)
  }

  test("q342 McNemar: planted discordant cells") {
    import spark.implicits._
    val long = ("w " * 60).trim                  // 60 tokens len1 -> A pass, B fail
    val short = "wide " * 10                      // 10 tokens len4 -> A fail, B pass
    val good = ("word " * 55).trim                // 55 tokens len4 -> both
    val bad = "xx"                                // 1 token len2 -> A fail, B fail? len 2 < 3 -> B fail
    val docs = (Seq.fill(3)(long) ++ Seq.fill(5)(short.trim) ++
      Seq.fill(2)(good) ++ Seq.fill(4)(bad)).toDF("text")
    val r = InferenceTestOps.mcNemar(docs).collect()(0)
    assert(r.getLong(0) === 14L)
    assert(r.getLong(1) === 2L)  // both
    assert(r.getLong(2) === 3L)  // only A
    assert(r.getLong(3) === 5L)  // only B
    assert(r.getLong(4) === 4L)  // neither
    // chi2 = (3-5)^2/(3+5) = 0.5 -> 500000 ppm
    assert(r.getLong(5) === 500000L)
    // discordant = 8/14 -> 571428 ppm
    assert(r.getLong(6) === 571428L)
  }
}
