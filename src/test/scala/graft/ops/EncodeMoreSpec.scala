package graft.ops

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Planted-fixture tests for q186-q189: WOE odds arithmetic, JL projection
  * determinism/linearity, watermarked streaming dedup, and the
  * moment-merge identity.
  */
class EncodeMoreSpec extends SparkSpec {

  test("q186 WOE: smoothed odds ratio per segment, exact counts") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_woe").toString
    // AUTO: 3 pos 1 neg; BUILDING: 1 pos 3 neg. Totals: 4 pos, 4 neg.
    val rows = Seq(
      (1L, "AUTO", 10.0), (2L, "AUTO", 10.0), (3L, "AUTO", 10.0), (4L, "AUTO", -1.0),
      (5L, "BUILDING", 10.0), (6L, "BUILDING", -1.0), (7L, "BUILDING", -1.0),
      (8L, "BUILDING", -1.0))
    rows.map { case (k, seg, bal) => (k, s"c$k", seg, 1L, bal) }
      .toDF("c_custkey", "c_name", "c_mktsegment", "c_nationkey", "c_acctbal")
      .coalesce(1).write.parquet(s"$d/customer.parquet")
    val got = EncodeOps.q186WoeEncoding(spark, d).collect()
      .map(r => r.getAs[String]("c_mktsegment") ->
        ((r.getAs[Long]("p_s"), r.getAs[Long]("n_s"), r.getAs[Double]("woe")))).toMap
    val woeAuto = math.log(((3 + 0.5) / 5.0) / ((1 + 0.5) / 5.0))
    assert(got("AUTO")._1 === 3L && got("AUTO")._2 === 1L)
    assert(got("AUTO")._3 === math.rint(woeAuto * 1e4) / 1e4)
    // symmetry of the planted design: BUILDING is AUTO with labels flipped
    assert(got("BUILDING")._3 === -got("AUTO")._3)
  }

  private def embDir(rows: Seq[(Long, Array[Float], Int)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_jl").toString
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("q187 JL projection: basis vector picks out its matrix row; scaling is linear") {
    // e_0 → proj[j] = m[0*16+j] = ±0.25 with sign = parity of
    // md5("0_j") first byte — recomputed here with JVM md5 (the same
    // derivation both engines use). 2·e_0 must give exactly 2× that.
    def sign(i: Int, j: Int): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${i}_$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 2)
      if (Integer.parseInt(hex, 16) % 2 == 0) 0.25 else -0.25
    }
    val e0 = Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)
    val e0x2 = e0.map(_ * 2)
    val d = embDir(Seq((1L, e0, 0), (2L, e0x2, 0)))
    val got = EncodeOps.q187JlProjection(spark, d).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (0 until 16).map(j => r.getAs[Double](s"p$j"))).toMap
    val expected = (0 until 16).map(j => sign(0, j))
    assert(got(1L) === expected)
    assert(got(2L) === expected.map(_ * 2))
  }

  test("q188 watermarked streaming dedup collapses the doubled feed to single copies") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_ddww").toString
    val ns = 1000000000L
    val t0 = 1704067200L * ns
    Seq(
      (1L, t0, 1L, "click", 1.25, "{}"),
      (2L, t0 + ns, 1L, "click", 2.25, "{}"),
      (3L, t0 + 2 * ns, 2L, "view", 4.50, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val got = StreamingOps.q188DedupWithinWatermark(spark, d).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("sum_value")))).toMap
    // the zone is consumed twice upstream; dedup must halve it exactly
    assert(got === Map("click" -> ((2L, 3.50)), "view" -> ((1L, 4.50))))
  }

  test("q189 moment merge: merge(old, delta) equals the direct mean/variance") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft_incstats").toString
    // keys 1,2 land before the 1999 cutoff, key 3 after: prices
    // 100, 200, 300 → mean 200.0, sample var 10000.0
    Seq((1L, "1998-01-01", 100.0), (2L, "1998-06-01", 200.0), (3L, "2000-01-01", 300.0))
      .map { case (k, day, p) =>
        (k, 1L, "O", p, java.sql.Timestamp.valueOf(s"$day 00:00:00"), "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    val r = RelationalMore.q189IncrementalStats(spark, d).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n") === 3L)
    assert(r(0).getAs[Double]("mean_price") === 200.0)
    assert(r(0).getAs[Double]("var_price") === 10000.0)
  }

  test("q195 sorted dictionary: dense order-preserving ids across many buckets") {
    import spark.implicits._
    // 400 distinct words spread over buckets a..t, shuffled and duplicated
    // on input — ids must come back 0..399 in exact lexicographic order
    // even though no global sort window ever runs
    val words = (0 until 400).map(i => f"${('a' + i % 20).toChar}%cword${i / 20}%02d")
    val input = scala.util.Random.shuffle(words ++ words.take(100)).toDF("w")
    val got = EncodeOps.sortedDictionary(input)
      .collect().map(r => (r.getAs[String]("w"), r.getAs[Long]("id")))
      .sortBy(_._2)
    val want = words.distinct.sorted.zipWithIndex.map { case (w, i) => (w, i.toLong) }
    assert(got.toSeq === want)
  }
}
