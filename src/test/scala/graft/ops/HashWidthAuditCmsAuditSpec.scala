package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8ar batch (q393-q394). */
class HashWidthAuditCmsAuditSpec extends SparkSpec {

  private def md5Head13(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_))
      .mkString.take(13)
    java.lang.Long.parseLong(hex, 16)
  }

  test("q393 hash-width audit matches an independent md5 bucket census") {
    import spark.implicits._
    val words = (1 to 40).map(i => s"tok$i")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val got = CapacityAuditOps.hashWidthAudit(docs, Seq(4, 64)).collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    Seq(4, 64).foreach { w =>
      val buckets = words.groupBy(t => md5Head13(s"fh:$t") % w)
      val singles = buckets.values.count(_.size == 1).toLong
      val collided = buckets.values.filter(_.size > 1).map(_.size).sum.toLong
      assert(got(w) === ((40L, buckets.size.toLong, singles, collided,
        1000000L * collided / 40L)))
    }
  }

  test("q394 CMS audit matches a replicated sketch; estimates never undershoot") {
    import spark.implicits._
    // skewed corpus: 'hot' x 50, 30 singletons
    val words = Seq.fill(50)("hot") ++ (1 to 30).map(i => s"cold$i")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val got = CapacityAuditOps.cmsAudit(docs, depth = 4, width = 8, topK = 5)
      .collect()
    assert(got.length === 5)
    // replicate the 4x8 sketch
    val freq = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cells = collection.mutable.Map.empty[(Long, Long), Long]
      .withDefaultValue(0L)
    for ((w, f) <- freq; d <- 0L until 4L)
      cells((d, md5Head13(s"cms$d:$w") % 8)) += f
    def est(w: String): Long =
      (0L until 4L).map(d => cells((d, md5Head13(s"cms$d:$w") % 8))).min
    got.foreach { r =>
      val (tok, f, e, over) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(f === freq(tok))
      assert(e === est(tok))
      assert(e >= f)
      assert(over === 1000000L * (e - f) / f)
    }
    assert(got(0).getString(0) === "hot")
  }
}
