package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Null-payload sweep over the FULL catalog — the EmptyInputSpec
  * companion: at 100 TB, NULL payload fields (failed extractions, missing
  * embeddings, unparsed values) are routine rows, not corruption. Fixture:
  * sf0.001 with every 10th row's PAYLOAD columns nulled — documents.text,
  * embeddings.embedding, events.value/event_type, part.p_comment,
  * customer.c_comment — keys, timestamps, and measures stay intact (a
  * null join key is a different semantic question; payload nulls must
  * simply flow through). Every entry must return a DEFINED result.
  */
class NullPayloadSpec extends SparkSpec {

  private lazy val fixtureDir: String = {
    val src = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft_nulls").toString
    val nullable = Map(
      "documents" -> Seq("text"),
      "embeddings" -> Seq("embedding"),
      "events" -> Seq("value", "event_type"),
      "part" -> Seq("p_comment"),
      "customer" -> Seq("c_comment"))
    Tables.names.foreach { t =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      val keyCol = col(df.columns.head)
      val mutated = nullable.getOrElse(t, Nil).foldLeft(df) { (d, c) =>
        if (!d.columns.contains(c)) d
        else d.withColumn(c,
          when(abs(hash(keyCol)) % 10 === 0, lit(null)).otherwise(col(c)))
      }
      mutated.write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
    }
    out
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name survives 10% null payload columns") {
      assert(fn(spark, fixtureDir).count() >= 0)
      ops.Checkpoints.releaseAll(spark)
    }
  }
}
