package graft

import org.apache.spark.sql.SaveMode

/** Degenerate-input sweep over the FULL catalog: at 100 TB, empty
  * partitions, empty sources, and blank text are routine operating
  * conditions, not edge cases. Every `SparkEntry.queries` entry must
  * return a DEFINED (possibly empty) result — never throw — against
  *
  *  - fixture A: a 0-row copy of every table (schemas preserved), and
  *  - fixture B: fixture A plus a `documents` table that KEEPS its rows
  *    but blanks every `text` to "" (the all-empty-text corpus — zero
  *    tokens, zero shingles, zero-length everything downstream).
  *
  * Known hazard classes this guards: driver-side `.head()` probes of
  * nullable aggregates (sketch bytes), `require`-guarded iterative ops,
  * and ppm/ratio arithmetic whose denominators collapse to 0.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val fixtures: (String, String) = {
    val src = "/root/testdata/sf0.001"
    val base = java.nio.file.Files.createTempDirectory("graft_empty").toString
    val (a, b) = (s"$base/zero_rows", s"$base/empty_text")
    Tables.names.foreach { t =>
      val zero = spark.read.parquet(s"$src/$t.parquet").limit(0)
      zero.write.mode(SaveMode.Overwrite).parquet(s"$a/$t.parquet")
      if (t == "documents") {
        import org.apache.spark.sql.functions._
        spark.read.parquet(s"$src/$t.parquet")
          .withColumn("text", lit(""))
          .write.mode(SaveMode.Overwrite).parquet(s"$b/$t.parquet")
      } else zero.write.mode(SaveMode.Overwrite).parquet(s"$b/$t.parquet")
    }
    (a, b)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name survives 0-row tables and an all-empty-text corpus") {
      // count() forces full execution; the contract is "defined result",
      // not a particular row count — many entries legitimately return
      // 1-row aggregates (with zero/null fields) on empty input
      assert(fn(spark, fixtures._1).count() >= 0)
      assert(fn(spark, fixtures._2).count() >= 0)
      ops.Checkpoints.releaseAll(spark)
    }
  }
}
