package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8as batch (q395-q396). */
class ReplayEstimatorsProvenanceSpec extends SparkSpec {

  private def md5Mod2(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_))
      .mkString.take(4)
    java.lang.Long.parseLong(hex, 16) % 2
  }

  test("q395 DR replay matches a replicated double dag on q392's fixture") {
    import spark.implicits._
    val events = (1L to 400L).map { i =>
      val a = if (i % 4 == 0) "buy" else "view"
      (i, 8L, a, if (a == "buy") 100.0 else 1.0)
    }.toDF("event_id", "user_id", "event_type", "value")
    val r = EvalReplayOps.drReplay(events).collect()(0)
    assert(r.getString(1) === "buy")
    // replicate
    val tagged = (1L to 400L).map { i =>
      val a = if (i % 4 == 0) "buy" else "view"
      val cents = if (a == "buy") 10000L else 100L
      (a, cents, md5Mod2(s"ope:$i") == 0)
    }
    val train = tagged.filter(_._3)
    val nSeg = train.size.toLong
    val buyTrain = train.filter(_._1 == "buy")
    val nPi = buyTrain.size.toLong
    val mPi = buyTrain.map(_._2).sum / nPi
    val ev = tagged.filterNot(_._3)
    val nEval = ev.size.toLong
    val nMatched = ev.count(_._1 == "buy").toLong
    val centsMatched = ev.filter(_._1 == "buy").map(_._2).sum
    val dr = mPi.toDouble +
      (centsMatched.toDouble - nMatched.toDouble * mPi) *
        nSeg.toDouble / nPi.toDouble / nEval.toDouble
    assert(r.getLong(5) === mPi)
    assert(r.getDouble(6) === math.floor(dr * 1e4 + 0.5) / 1e4)
    assert(r.getLong(4) === ev.map(_._2).sum / nEval)
  }

  test("q396 dup provenance: same/cross census and top source pairs") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L))
      .toDF("id_a", "id_b")
    val docs = Seq(
      (1L, "A"), (2L, "A"),                 // same-source pair
      (3L, "A"), (4L, "B"),                 // cross A-B
      (5L, "B"), (6L, "A"),                 // cross A-B (order-insensitive)
      (7L, "A"), (8L, "C"))                 // cross A-C
      .toDF("doc_id", "source")
    val got = EvalReplayOps.dupProvenance(pairs, docs).collect()
    assert(got.length === 2)
    val r0 = got(0)
    assert((r0.getString(0), r0.getString(1), r0.getLong(2)) === (("A", "B", 2L)))
    assert((r0.getLong(3), r0.getLong(4), r0.getLong(5)) === ((4L, 1L, 3L)))
    assert(r0.getLong(6) === 666666L)
    val r1 = got(1)
    assert((r1.getString(0), r1.getString(1), r1.getLong(2), r1.getLong(6))
      === (("A", "C", 1L, 333333L)))
  }
}
