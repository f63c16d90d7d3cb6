package graft.plans

import java.sql.Timestamp

import graft.SparkSpec
import graft.ops.{Relational, RelationalMore}
import org.apache.spark.sql.functions._

/** The custom as-of merge operator: result equality with the windowed
  * formulation (q21), plan shape, tie/no-match semantics on handcrafted
  * timelines.
  */
class AsOfJoinSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("custom as-of join returns exactly the window formulation's rows") {
    val custom = RelationalMore.q96AsofCustom(spark, dir).collect().map(_.toSeq)
    val windowed = Relational.q21AsofJoin(spark, dir).collect().map(_.toSeq)
    assert(custom.toSeq === windowed.toSeq)
  }

  test("physical plan is the merge operator: AsOfJoinExec, one shuffle per side") {
    val df = RelationalMore.q96AsofCustom(spark, dir)
    df.collect()
    // AQE's toString repeats the tree under "== Initial Plan ==" — count
    // shuffles in the executed (final) section only
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("AsOfJoin"), p)
    val hashEx = "hashpartitioning\\(".r.findAllIn(p).size
    assert(hashEx === 2, s"expected one shuffle per side, got $hashEx:\n$p")
    assert(!p.contains("Window"), p) // the point: no window frame at all
  }

  test("ties and no-match rows: latest tie-break order wins; leading events get null") {
    import spark.implicits._
    val evs = Seq((1L, 10L, ts(5)), (2L, 10L, ts(50)), (3L, 10L, ts(100)), (4L, 99L, ts(50)))
      .toDF("event_id", "user_id", "ts")
    val ords = Seq(
      (10L, ts(40), 101L), (10L, ts(40), 107L), // same instant: 107 must win
      (10L, ts(60), 103L),
      (55L, ts(1), 999L)) // other key, never visible to user 10
      .toDF("o_custkey", "o_orderdate", "o_orderkey")
    val out = AsOf.join(evs, ords, "user_id", "ts", "o_custkey", "o_orderdate",
      values = Seq("o_orderkey"), tieBreak = Seq("o_orderkey"))
      .select(col("event_id"), col("o_orderkey"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out === Map(1L -> -1L, 2L -> 107L, 3L -> 103L, 4L -> -1L))
  }
}
