package graft.ops

import graft.SparkSpec

/** Planted-fixture tests for the round-8m batch (q331-q332). */
class DedupSaturationTokenSetGroupsSpec extends SparkSpec {

  test("q331 saturation: dup rate rises across prefixes exactly as planted") {
    import spark.implicits._
    // ids 0..7; texts: 0-4 unique, 5-7 all copies of doc 0's text.
    // quarters end at ids 1,3,5,7: docs 2/4/6/8, distinct 2/4/5/5 ->
    // dup_ppm 0 / 0 / 1e6-5e6//6 = 166667 / 1e6-625000 = 375000
    val docs = (0L to 7L).map { i =>
      (i, if (i <= 4L) s"text $i" else "text 0")
    }.toDF("doc_id", "text")
    val got = CorpusStatOps.dedupSaturation(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (1L, 1L, 2L, 2L, 0L),
      (2L, 3L, 4L, 4L, 0L),
      (3L, 5L, 6L, 5L, 166667L),
      (4L, 7L, 8L, 5L, 375000L)))
  }

  test("q332 token-set groups: permutations, padded repeats and byte dups sub-counted") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma alpha beta"),  // permutation of doc 1: same bag, new text
      (3L, "delta delta echo"),
      (4L, "delta delta echo"),  // byte dup of doc 3: same text
      (5L, "delta echo"),        // same SET as 3/4, different multiset
      (6L, "zeta unique")        // singleton -> filtered out
    ).toDF("doc_id", "text")
    val got = CorpusStatOps.tokenSetGroups(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, 2L, 2L, 1L),   // two texts, one bag: pure reorder
      (3L, 3L, 2L, 2L)))  // template family: two bags, byte dup inside
  }
}
