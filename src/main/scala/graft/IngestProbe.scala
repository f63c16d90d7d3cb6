package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Dev-side decade probe for the REPORT-INGEST path (SURVEY §8.26): q50
  * and the ingest specs exercise KB-scale fixtures only, while the
  * reference's real operating mode (Proof.scala:99-133) is a directory of
  * many small report files. This probes `ReportPipeline.ingest` — the
  * wholetext read + per-file line window + kv pivot + normalize chain —
  * at 10^2..10^4 files (one decade past any fixture), plus the
  * zip-wrapped ISU path (`ingestZipped`, one task per archive) at the
  * same block counts packed 100-entries-per-archive.
  *
  * Scale question probed: file-granular ingest costs one listing entry +
  * one task per file (wholetext is unsplittable by design — report files
  * are KB-scale, the FILE is the parallelism unit), so the curve should
  * be linear in file count with a per-file constant dominated by task
  * scheduling, and the zip path should amortize that constant 100× by
  * batching entries per archive. Output: one JSON line per (shape, n).
  * Not part of the driver contract.
  */
object IngestProbe {

  /** Deterministic ERP report text: `blocks` status-terminated blocks of
    * the 20 reference keys (ReportPipeline.demoQuery's field set). */
  private def reportText(fileId: Int, blocks: Int): String =
    ingest.ReportPipeline.renderReport((1 to blocks).map { b =>
      val i = fileId * 31 + b
      Seq(
        "file" -> s"data_$i.csv", "tableNameFromFile" -> s"tbl_$i",
        "tableNameFromJson" -> s"tbl_json_$i", "headersFromJson" -> "a,b,c",
        "countHeadersFromJson" -> "3", "countHeadersFromFile" -> "3",
        "headersFromFile" -> "a,b,c",
        "equalsHeaders" -> (if (i % 2 == 0) "true" else "false"),
        "fileDirectory" -> s"/landing/dir_$i",
        "filePath" -> s"hdfs://nn:8020/landing/raw/data_$i.csv",
        "fileSize" -> s"${1000 + i}", "fileValidSha" -> "OK",
        "fileColForSchema" -> "parquet", "fileTableName" -> s"official_tbl_$i",
        "fileColForPathTable" -> s"/landing/raw/official/tbl_$i",
        "fileAntColForCountColumns" -> "10", "fileAntColForCountRows" -> "1000",
        "fileColForCountColumns" -> "10",
        "fileColForCountRows" -> (1000 + i * 7).toString,
        "status" -> "FINISHED")
    })

  private def writeFlat(dir: String, n: Int): Unit = {
    val d = Paths.get(dir); Files.createDirectories(d)
    (0 until n).foreach { f =>
      Files.writeString(
        d.resolve(f"REPORT_$f%06d[04-08-2019T13_51_30].TXT"),
        reportText(f, blocks = 8))
    }
  }

  private def writeZipped(dir: String, nEntries: Int, perArchive: Int): Unit = {
    val d = Paths.get(dir); Files.createDirectories(d)
    (0 until (nEntries + perArchive - 1) / perArchive).foreach { a =>
      val zos = new java.util.zip.ZipOutputStream(
        Files.newOutputStream(d.resolve(f"reports_$a%04d.zip")))
      try {
        val lo = a * perArchive
        (lo until math.min(lo + perArchive, nEntries)).foreach { f =>
          zos.putNextEntry(new java.util.zip.ZipEntry(
            f"REPORT_$f%06d[04-08-2019T13_51_30].TXT"))
          zos.write(reportText(f, blocks = 8).getBytes("UTF-8"))
          zos.closeEntry()
        }
      } finally zos.close()
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.localBuilder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = Files.createTempDirectory("graft_ingest_probe").toString
    val scales = Seq(100, 1000, 3000, 10000)

    def probe(name: String, n: Int)(run: => Long): Unit = {
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val rows = try run catch { case e: Throwable =>
          System.err.println(s"[probe] $name n=$n FAILED: ${e.getMessage}"); -1L }
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (s1, r1) = once(); val (s2, _) = once()
      val sec = math.min(s1, s2)
      println(f"""{"probe":"$name","files":$n,"sec":$sec%.2f,"rows":$r1}""")
    }

    scales.foreach { n =>
      val dir = s"$base/flat_$n"
      writeFlat(dir, n)
      probe("ingest_flat", n) {
        ingest.ReportPipeline.ingest(spark, dir, "ERP",
          generationDate = lit("2026-01-01 00:00:00")).count()
      }
    }
    scales.foreach { n =>
      val dir = s"$base/zip_$n"
      writeZipped(dir, n, perArchive = 100)
      probe("ingest_zipped", n) {
        ingest.ReportPipeline.ingestZipped(spark,
          dir, generationDate = lit("2026-01-01 00:00:00")).count()
      }
    }
    spark.stop()
  }
}
