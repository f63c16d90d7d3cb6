package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

/** Planted-fixture tests for the round-8x batch (q353-q354). */
class EnergyDistanceFanoDispersionSpec extends SparkSpec {

  test("q353 energy distance: hand-computed two-sample fixture with a tie value") {
    import spark.implicits._
    // A = {1.00, 2.00}, B = {2.00, 4.00}; Txy=600, Txx=200, Tyy=400 (cents,
    // ordered pairs); E = 300 - 50 - 100 = 150 cents
    val rows = Seq(("A", 1.0), ("A", 2.0), ("B", 2.0), ("B", 4.0))
      .toDF("g", "bal")
    val r = InferenceTestOps.energyDistance(rows, "bal", "g", "A", "B").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === ((2L, 2L, 600L, 200L, 400L)))
    assert(r.getLong(5) === 150000000L)
    // stat = (2*2/4) * 1.50 dollars = 1.5
    assert(r.getDouble(6) === 1.5)
  }

  test("q353 identical distributions have zero energy distance") {
    import spark.implicits._
    val rows = Seq("A", "B").flatMap(g => Seq(1.0, 2.0, 3.0).map((g, _)))
      .toDF("g", "bal")
    val r = InferenceTestOps.energyDistance(rows, "bal", "g", "A", "B").collect()(0)
    assert(r.getLong(5) === 0L && r.getDouble(6) === 0.0)
  }

  test("q354 Fano: poisson-like vs overdispersed planted types") {
    import spark.implicits._
    def ev(day: Int, t: String, n: Int) = (1 to n).map { i =>
      (day * 100L + i, Timestamp.valueOf(f"2024-04-$day%02d 09:00:00"), 1L, t)
    }
    // X: counts (3, 1) -> Fano = (2*10-16)/(1*4) = 1 -> poisson-like
    // Y: counts (2, 0 via grid fill) -> (2*4-4)/(1*2) = 2 -> overdispersed
    val rows = (ev(1, "X", 3) ++ ev(2, "X", 1) ++ ev(1, "Y", 2))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = InferenceTestOps.fanoDispersion(rows).collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getString(4))).toSeq ===
      Seq(("X", 2L, 4L, 1000000L, "poisson-like"),
        ("Y", 2L, 2L, 2000000L, "overdispersed")))
  }
}
