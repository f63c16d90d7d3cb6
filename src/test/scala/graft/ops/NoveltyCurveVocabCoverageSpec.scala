package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8o batch (q335-q336). */
class NoveltyCurveVocabCoverageSpec extends SparkSpec {

  test("q335 novelty curve rises with n exactly as planted") {
    import spark.implicits._
    // eval doc 0: "a b c d e f"; train: "a b c x y z", "d e f g h".
    // novel_ppm by n: 0 / 200000 (1 of 5) / 500000 (2 of 4) / 1e6 / 1e6
    val docs = Seq(
      (0L, "a b c d e f"),
      (101L, "a b c x y z"),
      (102L, "d e f g h")).toDF("doc_id", "text")
    val got = CorpusStatOps.noveltyCurve(docs, maxN = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, 6L, 6L, 0L),
      (2L, 5L, 4L, 200000L),
      (3L, 4L, 2L, 500000L),
      (4L, 3L, 0L, 1000000L),
      (5L, 2L, 0L, 1000000L)))
  }

  test("q336 vocab coverage: exact ceil-div crossing on a 3-class Zipf toy") {
    import spark.implicits._
    // freqs a:6, b:3, c:1 (T=10): 90% -> 2 types @900000; 95%/99% -> 3 @1e6
    val docs = Seq((1L, "a a a a a a b b b c")).toDF("doc_id", "text")
    val got = CorpusStatOps.vocabCoverage(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (90L, 3L, 2L, 900000L),
      (95L, 1L, 3L, 1000000L),
      (99L, 1L, 3L, 1000000L)))
  }
}
