package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8k batch (q327-q328). */
class EvalContaminationSerpentineShardsSpec extends SparkSpec {

  test("q327 contamination: half-covered eval doc lands in decile 5 with mean 500000") {
    import spark.implicits._
    // doc 0 is the eval slice (0 % 50 == 0); its grams are {"a b c","b c d"};
    // train doc 101 shares exactly "a b c" -> coverage 1/2.
    val docs = Seq(
      (0L, "a b c d"),
      (101L, "a b c x"),
      (102L, "p q r s t")).toDF("doc_id", "text")
    val got = CorpusStatOps.evalContamination(docs, modulus = 50L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((5L, 1L, 1L, 500000L)))
  }

  test("q328 serpentine: 4 sizes over 2 shards balance exactly") {
    import spark.implicits._
    // size ranks 40,30,20,10 -> serpentine 0,1,1,0 -> both shards sum 50
    val docs = Seq((1L, 40L), (2L, 30L), (3L, 20L), (4L, 10L))
      .toDF("doc_id", "n_chars")
    val got = CorpusStatOps.serpentineShards(docs, shards = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((0L, 2L, 50L, 0L), (1L, 2L, 50L, 0L)))
  }
}
