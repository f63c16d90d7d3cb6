package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8ae batch (q367-q368). */
class IsotonicBradleyTerrySpec extends SparkSpec {

  private def pavaRef(bins: Seq[(Long, Long, Long)]): Map[Long, Long] = {
    // classic stack PAVA with exact rational pooling, then floor-ppm
    case class Block(pos: BigInt, n: BigInt, bins: List[Long])
    val stack = bins.sortBy(_._1).foldLeft(List.empty[Block]) {
      case (acc, (b, n, pos)) =>
        var st = Block(BigInt(pos), BigInt(n), List(b)) :: acc
        while (st.size >= 2 &&
          st.head.pos * st(1).n <= st(1).pos * st.head.n) {
          val h = st.head; val t = st(1)
          st = Block(h.pos + t.pos, h.n + t.n, h.bins ++ t.bins) :: st.drop(2)
        }
        st
    }
    stack.flatMap(bl => bl.bins.map(_ ->
      (BigInt(1000000) * bl.pos / bl.n).toLong)).toMap
  }

  test("q367 isotonic: violating middle bin pools to a flat 0.5 fit") {
    import spark.implicits._
    val binned = Seq((0L, 10L, 8L), (1L, 10L, 2L), (2L, 10L, 5L))
      .toDF("bin", "n", "pos")
    val got = EvalReplayOps.isotonicFromBinned(binned).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq((0L, 800000L, 500000L), (1L, 200000L, 500000L),
      (2L, 500000L, 500000L)))
  }

  test("q367 isotonic: already-monotone bins are untouched") {
    import spark.implicits._
    val binned = Seq((0L, 10L, 2L), (1L, 10L, 5L), (2L, 10L, 8L))
      .toDF("bin", "n", "pos")
    val got = EvalReplayOps.isotonicFromBinned(binned).collect()
    assert(got.forall(r => r.getLong(3) === r.getLong(4)))
  }

  test("q367 matches a stack-PAVA BigInt reference on generated bins") {
    import spark.implicits._
    val bins = (0L until 20L).map { b =>
      val n = 5L + (b * 7L) % 11L
      val pos = (b * b * 13L) % (n + 1L)
      (b, n, pos)
    }
    val got = EvalReplayOps.isotonicFromBinned(bins.toDF("bin", "n", "pos"))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(got === pavaRef(bins))
    // monotone non-decreasing by construction
    val sorted = got.toSeq.sortBy(_._1).map(_._2)
    assert(sorted === sorted.sorted)
  }

  private def btRef(wins: Seq[(Long, Long, Long)], iters: Int)
  : Map[Long, Long] = {
    val m = collection.mutable.Map.empty[(Long, Long), BigInt]
      .withDefaultValue(BigInt(0))
    wins.foreach { case (w, l, c) =>
      m((w, l)) += c; m((l, w)) += c
    }
    val wtot = wins.groupBy(_._1).view
      .mapValues(x => BigInt(x.map(_._3).sum)).toMap.withDefaultValue(BigInt(0))
    val items = m.keys.map(_._1).toSeq.distinct.sorted
    val k = BigInt(items.size)
    var p = items.map(_ -> BigInt(1000000)).toMap
    for (_ <- 1 to iters) {
      val raw = items.map { i =>
        val d = items.filter(j => m((i, j)) > 0).map { j =>
          (m((i, j)) * BigInt("1000000000000")) / (p(i) + p(j)).max(BigInt(1))
        }.sum
        i -> (wtot(i) * BigInt("1000000000000")) / d
      }.toMap
      val sraw = raw.values.sum
      p = items.map(i => i -> (raw(i) * k * 1000000) / sraw).toMap
    }
    p.map { case (i, v) => i -> v.toLong }
  }

  test("q368 Bradley-Terry matches a BigInt fixed-point reference exactly") {
    import spark.implicits._
    val wins = Seq((1L, 2L, 3L), (2L, 1L, 1L), (2L, 3L, 2L), (3L, 2L, 2L),
      (1L, 3L, 4L))
    val got = EvalReplayOps.btFromWins(wins.toDF("w", "l", "c"), iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === btRef(wins, 8))
  }

  test("q368 Bradley-Terry: dominant item strongest, never-winner at zero") {
    import spark.implicits._
    val wins = Seq((1L, 2L, 10L), (1L, 3L, 10L), (2L, 3L, 5L), (3L, 2L, 5L))
    val got = EvalReplayOps.btFromWins(wins.toDF("w", "l", "c"), iters = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(got(1L)._2 > got(2L)._2 && got(1L)._2 > got(3L)._2)
    // item 3 never beats 1 but does beat 2 -> nonzero; all wins sum right
    assert(got.values.map(_._1).sum === 30L)
  }
}
