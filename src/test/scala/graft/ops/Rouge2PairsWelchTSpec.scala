package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8t batch (q345-q346). */
class Rouge2PairsWelchTSpec extends SparkSpec {

  test("q345 ROUGE-2: clipped counts punish phrase repetition that sets ignore") {
    import spark.implicits._
    // doc 1: "a b" x3 -> bigrams: (a b)x3, (b a)x2 -> tb=5
    // doc 2: "a b c"  -> bigrams: (a b), (b c)     -> tb=2
    // clip = min(3,1)[a b] = 1; p = 1/5, r = 1/2, f1 = 2/7
    val docs = Seq((1L, "a b a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val got = InferenceTestOps.rouge2Pairs(docs, pairs).collect()
    assert(got.length === 1)
    val r = got(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === ((1L, 2L, 1L, 5L, 2L)))
    assert(r.getLong(5) === 200000L)
    assert(r.getLong(6) === 500000L)
    assert(r.getLong(7) === 285714L)
  }

  test("q345 pair with no shared bigram keeps a zero-clip row") {
    import spark.implicits._
    val docs = Seq((1L, "x y z"), (2L, "p q r")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = InferenceTestOps.rouge2Pairs(docs, pairs).collect()(0)
    assert(r.getLong(2) === 0L && r.getLong(7) === 0L)
  }

  test("q346 Welch t: hand-computed unequal-variance fixture") {
    import spark.implicits._
    // A: 1.00 2.00 3.00 (mean 2, var 1); B: 10.00 20.00 30.00 40.00 (mean 25, var 166.6667)
    // cents: A var = 10000, B var = 1666666.6667
    // se2 = 10000/3 + 1666666.666/4 = 3333.33 + 416666.67 = 420000.0
    // t = (200 - 2500)/sqrt(420000) = -2300/648.074 = -3.54898
    // df = 420000^2 / (3333.33^2/2 + 416666.67^2/3) = 1.764e11/(5.5556e6+5.787e10)
    val rows = (Seq(("A", 1.0), ("A", 2.0), ("A", 3.0)) ++
      Seq(("B", 10.0), ("B", 20.0), ("B", 30.0), ("B", 40.0))).toDF("g", "bal")
    val r = InferenceTestOps.welchT(rows, "bal", "g", "A", "B").collect()(0)
    assert(r.getLong(0) === 3L && r.getLong(1) === 4L)
    assert(r.getLong(2) === 200L && r.getLong(3) === 2500L)
    assert(math.abs(r.getDouble(4) - 100.0) < 0.01)      // sd_a = 100 cents
    assert(math.abs(r.getDouble(5) - 1290.99) < 0.01)    // sd_b = sqrt(1666666.67)
    val se2 = 10000.0 / 3 + (1666666.0 + 2.0 / 3) / 4
    val t = (200.0 - 2500.0) / math.sqrt(se2)
    assert(math.abs(r.getDouble(6) - t) < 1e-5)
    val df = se2 * se2 /
      ((10000.0 / 3) * (10000.0 / 3) / 2 + (1666666.6666666667 / 4) * (1666666.6666666667 / 4) / 3)
    assert(math.abs(r.getDouble(7) - df) < 1e-3)
  }
}
