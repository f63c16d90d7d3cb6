package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8aq batch (q391-q392). */
class SampledJoinSizeIpsReplaySpec extends SparkSpec {

  private def md5Mod(s: String, m: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_))
      .mkString.take(4)
    java.lang.Long.parseLong(hex, 16) % m
  }

  test("q391 sampled join size matches an independent md5 reference") {
    import spark.implicits._
    val rows = (1 to 2000).map(i => (i % 97).toLong)
    val r = EvalReplayOps.sampledJoinSize(rows.toDF("k"), "k", invRate = 8)
      .collect()(0)
    val freq = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val truePairs = freq.values.map(f => f * f).sum
    val sampledKeys = freq.keys.filter(k => md5Mod(s"smp:$k", 8) == 0).toSeq
    val est = 8L * sampledKeys.map(k => freq(k) * freq(k)).sum
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((97L, sampledKeys.size.toLong, truePairs, est)))
    assert(r.getLong(4) ===
      1000000L * (est - truePairs) / math.max(truePairs, 1L))
  }

  test("q392 IPS replay: planted dominant action is picked and reweighted") {
    import spark.implicits._
    // one segment (user 8 -> seg 0); actions: 'buy' pays 100, 'view'
    // pays 1. Enough events that both halves see both actions.
    val events = (1L to 400L).map { i =>
      val a = if (i % 4 == 0) "buy" else "view"
      (i, 8L, a, if (a == "buy") 100.0 else 1.0)
    }.toDF("event_id", "user_id", "event_type", "value")
    val r = EvalReplayOps.ipsReplay(events).collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getLong(0) === 0L)
    assert(row.getString(1) === "buy")
    // IPS reweights matched 'buy' rewards by n_seg/n_buy(train) > 1;
    // estimate must exceed the behavior average (mostly 'view' traffic)
    assert(row.getLong(5) > row.getLong(4))
    // independent replication of the floors
    val tagged = (1L to 400L).map { i =>
      val a = if (i % 4 == 0) "buy" else "view"
      val cents = if (a == "buy") 10000L else 100L
      (a, cents, md5Mod(s"ope:$i", 2) == 0)
    }
    val train = tagged.filter(_._3)
    val nSeg = train.size.toLong
    val nBuy = train.count(_._1 == "buy").toLong
    val ev = tagged.filterNot(_._3)
    val nEval = ev.size.toLong
    val centsMatched = ev.filter(_._1 == "buy").map(_._2).sum
    val want = (BigInt(centsMatched) * nSeg / nBuy / nEval).toLong
    assert(row.getLong(5) === want)
    assert(row.getLong(2) === nEval)
    assert(row.getLong(3) === ev.count(_._1 == "buy").toLong)
  }
}
