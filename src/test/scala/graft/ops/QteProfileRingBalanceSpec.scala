package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8am batch (q383-q384). */
class QteProfileRingBalanceSpec extends SparkSpec {

  test("q383 QTE: a uniform +$5 shift moves every decile by exactly 5") {
    import spark.implicits._
    val orders =
      ((1 to 10).map(i => ("1-URGENT", i * 1.0)) ++
        (1 to 10).map(i => ("5-LOW", i * 1.0 + 5.0)))
        .toDF("o_orderpriority", "o_totalprice")
    val got = CapacityAuditOps.qteProfile(orders).collect()
    assert(got.length === 9)
    assert(got.forall(_.getLong(3) === 5L))
    assert(got.map(r => (r.getInt(0), r.getLong(1))).toSeq ===
      (1 to 9).map(d => (d, d.toLong)))
  }

  test("q383 QTE: a pure tail effect shows only in the top decile") {
    import spark.implicits._
    val orders =
      ((1 to 9).map(i => ("1-URGENT", i * 1.0)) ++
        ((1 to 8).map(i => ("5-LOW", i * 1.0)) :+ (("5-LOW", 100.0))))
        .toDF("o_orderpriority", "o_totalprice")
    val got = CapacityAuditOps.qteProfile(orders).collect()
      .map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert((1 to 8).forall(got(_) === 0L))
    assert(got(9) === 91L)
  }

  private def md5Pos(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_))
      .mkString.take(13)
    java.lang.Long.parseLong(hex, 16)
  }

  test("q384 ring balance matches an independent clockwise reference") {
    import spark.implicits._
    val nNodes = 2; val nV = 4
    val keys = (1L to 50L)
    val got = CapacityAuditOps.ringBalance(keys.toDF("k"), nNodes, nV)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vnodes = (0 until nNodes * nV).map(i =>
      (i % nNodes, md5Pos(s"ring:$i") * 128 + i)).sortBy(_._2)
    def owner(k: Long): Int = {
      val kp = md5Pos(s"key:$k") * 128
      vnodes.find(_._2 >= kp).getOrElse(vnodes.head)._1
    }
    val want = keys.groupBy(k => owner(k).toLong).view
      .mapValues(_.size.toLong).toMap
    assert(got === want)
    assert(got.values.sum === 50L)
  }
}
