package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

/** Planted-fixture tests for the round-8u batch (q347-q348). */
class FriedmanSourceDivergenceSpec extends SparkSpec {

  private def ev(day: Int, t: String, n: Int) = (1 to n).map { i =>
    (day * 1000L + i, Timestamp.valueOf(f"2024-03-$day%02d 10:00:00"), 1L, t)
  }

  test("q347 Friedman: perfectly consistent ranking gives the T1 maximum") {
    import spark.implicits._
    // per-day counts: A < B < C every day; day 3 has no A rows (grid fills 0)
    val rows = (ev(1, "A", 1) ++ ev(1, "B", 2) ++ ev(1, "C", 3) ++
      ev(2, "A", 2) ++ ev(2, "B", 3) ++ ev(2, "C", 4) ++
      ev(3, "B", 5) ++ ev(3, "C", 6))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = InferenceTestOps.friedman(rows).collect()
    assert(got.map(_.getString(0)).toSeq === Seq("A", "B", "C"))
    // doubled ranks 2/4/6 each day -> R2 = 6, 12, 18; T1 = 6 (= untied chi2)
    assert(got.map(_.getLong(1)).toSeq === Seq(6L, 12L, 18L))
    assert(got(0).getLong(2) === 3L && got(0).getLong(3) === 3L)
    assert(got(0).getDouble(4) === 6.0)
  }

  test("q347 tie-day fixture matches the hand-computed tie-corrected T1") {
    import spark.implicits._
    // day1: X=1, Y=1 (tied, dr=3 each); day2: X=1, Y=2 (dr 2 and 4)
    val rows = (ev(1, "X", 1) ++ ev(1, "Y", 1) ++
      ev(2, "X", 1) ++ ev(2, "Y", 2))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = InferenceTestOps.friedman(rows).collect()
    // R2: X=5, Y=7; rr=74, a2=38; T1 = (74-72)/(38-36) = 1
    assert(got.map(_.getLong(1)).toSeq === Seq(5L, 7L))
    assert(got(0).getDouble(4) === 1.0)
  }

  test("q348 source divergence: two tiny sources, exact integer delta") {
    import spark.implicits._
    // s1: a a b (A=3); s2: a c c c (B=4)
    // shared {a}: x=8, y=3 -> floor(25/11)=2; sigma = 2 + 1*4 + 3*3 = 15
    // delta_ppm = 15e6 // 12 = 1250000
    val docs = Seq((1L, "a a b", "s1"), (2L, "a c c c", "s2"))
      .toDF("doc_id", "text", "source")
    val got = InferenceTestOps.sourceDivergence(docs).collect()
    assert(got.length === 1)
    val r = got(0)
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
      === (("s1", "s2", 1L, 1250000L)))
  }

  test("q348 identical sources diverge by zero") {
    import spark.implicits._
    val docs = Seq((1L, "a b c a", "s1"), (2L, "a b c a", "s2"))
      .toDF("doc_id", "text", "source")
    val r = InferenceTestOps.sourceDivergence(docs).collect()(0)
    assert(r.getLong(3) === 0L)
  }
}
