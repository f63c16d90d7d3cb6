package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Null-JOIN-KEY sweep over the FULL catalog — the third degenerate-input
  * fixture (after EmptyInputSpec's 0-row tables and NullPayloadSpec's
  * null payloads). At 100 TB, a null key (a failed id extraction, an
  * orphaned foreign key) is routine data, and its semantics are a
  * CONTRACT, not an accident. Fixture: sf0.001 with every 20th row's KEY
  * columns nulled — lineitem.l_orderkey, orders.o_custkey,
  * documents.doc_id, events.user_id, embeddings.vec_id, and the
  * dimension keys supplier.s_suppkey / part.p_partkey /
  * customer.c_custkey (the graph/star-join families key on these, and
  * the contract must not depend on which side of the join the null
  * lands).
  *
  * Per-family contracts (what a null key MEANS, verified by this sweep
  * returning a defined result and by the hash-unchanged oracle runs on
  * the real tables):
  *
  *   - **Equi-joins** (inner/semi/anti/left): SQL semantics — a null key
  *     never equals anything, so null-key rows drop from inner/semi
  *     matches and survive left/anti sides as unmatched. No operator may
  *     NPE on them.
  *   - **Aggregations / windows**: a null grouping or partition key forms
  *     its own group (SQL GROUP BY semantics); results stay defined.
  *   - **Dedup / clustering (CC, LSH, SimHash)**: a null doc_id cannot
  *     participate in pair generation (pairs come from equi-joins on
  *     doc_id or band keys, where nulls never match) — null-key documents
  *     are singletons by construction, never merged into a cluster.
  *   - **Graph loops (CC / LPA / PageRank / k-core)**: edges are built by
  *     equi-joins, so a null endpoint never produces an edge; the vertex
  *     set is edge-derived, so null vertices simply don't exist in the
  *     graph. Label propagation's min/least over bigint ids is
  *     null-safe because no null ever enters.
  *   - **As-of / range joins**: a null time or bin key falls out of the
  *     bin equi-join exactly like any other equi-join.
  *   - **Packing / cumsum (globalCumsum)**: bucket = hash(key) % 256 —
  *     hash(null) is defined (seed), so null-key rows land in a bucket
  *     deterministically and are packed like any row.
  *   - **Typed stateful streaming (groupByKey on user_id)**: the typed
  *     boundary requires a non-null primitive key; null-user events drop
  *     at the boundary, mirrored in the oracle (the same convention as
  *     NullPayloadSpec's null-value contract).
  *
  * Every entry must return a DEFINED result. Oracle hashes on the real
  * (null-free) tables are unchanged by any hardening done for this sweep
  * — re-verified by the round's full Verify + selfcheck runs.
  */
class NullKeySpec extends SparkSpec {

  private lazy val fixtureDir: String = {
    val src = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft_nullkeys").toString
    val nullable = Map(
      "lineitem" -> Seq("l_orderkey"),
      "orders" -> Seq("o_custkey"),
      "documents" -> Seq("doc_id"),
      "events" -> Seq("user_id"),
      "embeddings" -> Seq("vec_id"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "customer" -> Seq("c_custkey"))
    Tables.names.foreach { t =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      // the victim key may BE the first column; salt the row hash with a
      // second column when present so the nulled 5% is deterministic but
      // not aligned with the key's own value grid
      val hashCols = df.columns.take(2).map(col).toSeq
      val mutated = nullable.getOrElse(t, Nil).foldLeft(df) { (d, c) =>
        // fail LOUDLY on a key the table doesn't have — a silent skip
        // here once excluded the whole embeddings family from the sweep
        require(d.columns.contains(c), s"NullKeySpec fixture: $t has no column $c")
        d.withColumn(c,
          when(abs(hash(hashCols: _*)) % 20 === 0, lit(null)).otherwise(col(c)))
      }
      mutated.write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
    }
    out
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name survives 5% null join keys") {
      assert(fn(spark, fixtureDir).count() >= 0)
      ops.Checkpoints.releaseAll(spark)
    }
  }
}
