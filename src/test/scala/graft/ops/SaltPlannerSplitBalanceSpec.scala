package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8z batch (q357-q358). */
class SaltPlannerSplitBalanceSpec extends SparkSpec {

  test("q357 salt planner: hot key splits, cold keys stay unsalted") {
    import spark.implicits._
    val rows = (Seq.fill(250)(1L) ++ Seq.fill(100)(2L) ++ Seq.fill(10)(3L))
      .toDF("k")
    val got = CapacityAuditOps.saltPlanner(rows, "k", target = 100L, topK = 20)
      .collect()
    assert(got.length === 3)
    val r = got.map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq === Seq((1L, 250L, 3L, 84L), (2L, 100L, 1L, 100L),
      (3L, 10L, 1L, 10L)))
    // summary columns identical on every row
    val s = got(0)
    assert((s.getLong(4), s.getLong(5), s.getLong(6), s.getLong(7), s.getLong(8))
      === ((3L, 1L, 5L, 250L, 100L)))
  }

  test("q358 split balance: single-source corpus has exactly zero chi2") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, s"text $i", "only"))
      .toDF("doc_id", "text", "source")
    val got = CapacityAuditOps.splitBalance(docs).collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getLong(3) === 0L))
    assert(got.map(_.getLong(1)).sum === 200L)
  }

  test("q358 matches an independent JVM md5 + chi2 reference") {
    import spark.implicits._
    val docs = (1L to 300L).map(i => (i, "t", if (i % 3 == 0) "s1" else "s2"))
    val got = CapacityAuditOps.splitBalance(docs.toDF("doc_id", "text", "source"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    def split(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"split:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      val u = java.lang.Long.parseLong(hex, 16) % 10
      if (u < 8) "train" else if (u < 9) "val" else "test"
    }
    val cells = docs.map { case (id, _, src) => (split(id), src) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ns = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nr = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val nn = cells.values.sum
    val want = ns.keys.map { sp =>
      val terms = cells.collect { case ((s, src), obs) if s == sp =>
        val d = BigInt(obs) * nn - BigInt(ns(sp)) * nr(src)
        ((BigInt(1000000) * d * d) / (BigInt(ns(sp)) * nr(src) * nn)).toLong
      }
      sp -> ((ns(sp), terms.size.toLong, terms.sum))
    }.toMap
    assert(got === want)
  }
}
