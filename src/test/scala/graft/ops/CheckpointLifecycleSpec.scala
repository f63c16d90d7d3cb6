package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** localCheckpoint lifecycle: loops free superseded rounds as they
  * advance, and the post-action [[Checkpoints.releaseAll]] sweep leaves
  * the session with ZERO persistent RDDs — the round-11 finding was that
  * ~130 checkpoint sites never unpersisted, so a full 440-query bench run
  * accumulated hundreds of pinned MEMORY_AND_DISK blocks and unrelated
  * queries inflated 3-20x under the GC pressure. */
class CheckpointLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def pinned: Int = spark.sparkContext.getPersistentRDDs.size

  test("connectedComponents frees superseded label rounds as the loop advances") {
    Checkpoints.releaseAll(spark)
    // a diameter-6 chain forces several propagation rounds; without the
    // per-round release the loop would leave ~2+rounds frames pinned
    val edges = (0 until 6).map(i => (i.toLong, i.toLong + 1)).toDF("a", "b")
    val cc = TextOps.connectedComponents(edges, maxPropagationRounds = 10)
    assert(cc.agg(countDistinct(col("label"))).as[Long].head() == 1L)
    // still pinned: the symmetric edge list + the FINAL label frame the
    // returned DataFrame depends on — but no superseded round frames
    assert(pinned <= 3, s"loop left $pinned persistent RDDs pinned")
    Checkpoints.releaseAll(spark)
    assert(pinned == 0)
  }

  test("connectedComponentsStar frees superseded contraction rounds") {
    Checkpoints.releaseAll(spark)
    val edges = (0 until 12).map(i => (i.toLong, i.toLong + 1)).toDF("a", "b")
    val cc = TextOps.connectedComponentsStar(edges)
    assert(cc.agg(countDistinct(col("label"))).as[Long].head() == 1L)
    assert(pinned <= 2, s"star contraction left $pinned persistent RDDs pinned")
    Checkpoints.releaseAll(spark)
    assert(pinned == 0)
  }

  test("releaseAll sweeps an iterative catalog query clean after its action") {
    Checkpoints.releaseAll(spark)
    // q315 LPA: lazy per-round checkpoints by design (single final action
    // with stage reuse) — every pinned block must be reclaimable once the
    // action has run, which is exactly what Bench/Verify do per query
    val df = graft.SparkEntry.queries("q315_lpa_communities")(spark, "/root/testdata/sf0.001")
    assert(df.count() > 0)
    assert(pinned > 0, "expected the LPA loop to have checkpointed frames")
    Checkpoints.releaseAll(spark)
    assert(pinned == 0, s"sweep left $pinned persistent RDDs pinned")
  }

  // the caller contract documented on kcorePeel/lpaCommunities/hits/
  // btFromWins/pageRank: every checkpoint a call pins is either
  // reachable from the returned plan or [[Checkpoints.link]]ed to it,
  // so a non-harness session (which has no releaseAll sweep between
  // queries) frees everything with one targeted release of the frame
  // it consumed
  // q368 left this list in r14: its MM fixed point runs driver-locally
  // over the dimension-bounded wins grid and pins no checkpoints at all
  for (q <- Seq("q315_lpa_communities", "q300_kcore_peel", "q350_hits",
      "q120_pagerank")) {
    test(s"library consumers: release(result) alone drains $q — no global sweep") {
      Checkpoints.releaseAll(spark)
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      assert(df.count() > 0)
      assert(pinned > 0, s"expected $q's loop to have checkpointed frames")
      Checkpoints.release(df)
      assert(pinned == 0,
        s"release(result) left $pinned persistent RDDs — a frame $q pinned is neither reachable from nor linked to the returned plan")
    }
  }

  test("releaseAllExcept keeps a frame the caller still needs") {
    Checkpoints.releaseAll(spark)
    val kept = (1 to 100).toDF("x").localCheckpoint(true)
    val dropped = (1 to 100).toDF("y").localCheckpoint(true)
    Checkpoints.releaseAllExcept(spark, kept)
    assert(Checkpoints.pinnedIds(kept).forall(
      spark.sparkContext.getPersistentRDDs.contains))
    assert(!Checkpoints.pinnedIds(dropped).exists(
      spark.sparkContext.getPersistentRDDs.contains))
    // the kept frame is still readable after the sweep
    assert(kept.count() == 100)
    Checkpoints.releaseAll(spark)
    assert(pinned == 0)
  }
}
