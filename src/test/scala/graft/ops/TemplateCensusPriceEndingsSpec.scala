package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8au batch (q399-q400). */
class TemplateCensusPriceEndingsSpec extends SparkSpec {

  test("q399 template census: shared openings form a family, short docs drop") {
    import spark.implicits._
    val opening = (1 to 8).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, s"$opening alpha beta", "s1"),
      (2L, s"$opening gamma", "s2"),
      (3L, s"$opening delta eps zeta", "s1"),
      (4L, (1 to 9).map(i => s"u$i").mkString(" "), "s1"),
      (5L, "too short", "s1"))
      .toDF("doc_id", "text", "source")
    val got = CorpusStatOps.templateCensus(docs, minFamily = 2L).collect()
    assert(got.length === 1)
    val r = got(0)
    assert(r.getString(0) === opening)
    assert((r.getLong(1), r.getLong(2)) === ((3L, 2L)))
    // eligible = 4 docs (the 2-token doc drops); share = 3/4
    assert(r.getLong(3) === 750000L)
    assert((r.getLong(4), r.getLong(5), r.getLong(6)) === ((4L, 1L, 3L)))
  }

  test("q400 price endings: exact uniform-chi2 identity on a planted skew") {
    import spark.implicits._
    // endings: 99 x2, 50 x1, 25 x1 -> chi2 = (1e8*6)//4 - 4e6 = 146e6
    val orders = Seq(1.99, 2.99, 3.50, 4.25).toDF("o_totalprice")
    val got = CorpusStatOps.priceEndings(orders).collect()
    assert(got.length === 3)
    val top = got(0)
    assert((top.getLong(0), top.getLong(1), top.getLong(2))
      === ((99L, 2L, 500000L)))
    assert(got.forall(r => (r.getLong(3), r.getLong(4), r.getLong(5))
      === ((4L, 3L, 146000000L))))
  }

  test("q400 price endings: perfectly uniform endings give zero chi2") {
    import spark.implicits._
    val orders = (0 until 100).map(e => 10.0 + e / 100.0).toDF("o_totalprice")
    val got = CorpusStatOps.priceEndings(orders).collect()
    assert(got.forall(_.getLong(5) === 0L))
    assert(got.forall(_.getLong(1) === 1L))
  }
}
