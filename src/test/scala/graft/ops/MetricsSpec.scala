package graft.ops

import graft.SparkSpec
import java.nio.file.Files

/** Planted-fixture test for q193: the two-pass bucketed Mann–Whitney AUC
  * must equal the brute-force pairwise definition
  * AUC = #(score⁺ > score⁻) / (n⁺ · n⁻) computed by an independent JVM
  * replica of the md5-prefix score. The fixture has no score ties (the
  * 32-bit md5 prefixes of 120 distinct ids don't collide), so the rank
  * identity and the pair count agree exactly.
  */
class MetricsSpec extends SparkSpec {

  private def score(id: Long, purchase: Boolean): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) +
      (if (purchase) 1500000000L else 0L)
  }

  test("q193 bucketed rank-sum AUC equals the brute-force pairwise AUC") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_auc_ev").toString
    val ns = 1000000000L
    val rows = (1L to 120L).map { i =>
      val et = if (i % 5 == 0) "purchase" else "view"
      (i, (1704067200L + i) * ns, i % 7, et, 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")

    val scored = rows.map { case (id, _, _, et, _, _) => (score(id, et == "purchase"), et == "purchase") }
    assert(scored.map(_._1).distinct.size === scored.size, "fixture has score ties")
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filterNot(_._2).map(_._1)
    val wins = (for (p <- pos; n <- neg) yield if (p > n) 1L else 0L).sum
    val want = BigDecimal(wins.toDouble / (pos.size.toDouble * neg.size))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    val r = Metrics.q193ExactAuc(spark, d).collect()(0)
    assert(r.getAs[Long]("n_pos") === pos.size.toLong)
    assert(r.getAs[Long]("n_neg") === neg.size.toLong)
    assert(r.getAs[Double]("auc") === want)
  }
}
