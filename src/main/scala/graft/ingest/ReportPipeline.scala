package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end report ingestion: directory of `*.TXT` report files →
  * normalized records → CSV + parquet (the reference's whole program,
  * Proof.scala:50-154, as one declarative pipeline).
  */
object ReportPipeline {

  /** Module dispatch (reference Proof.scala:80-81). */
  private val normalizers: Map[String, (DataFrame, Column) => DataFrame] = Map(
    "ERP" -> ((b, ts) => Normalize.erpRecords(b, "ERP", ts)),
    "ISU" -> ((b, ts) => Normalize.isuRecords(b, "ISU", ts)))

  def ingest(spark: SparkSession, inputDir: String, module: String = "ERP",
             ext: String = ".TXT",
             generationDate: Column = date_format(current_timestamp(), "yyyy-MM-dd HH:mm:ss")): DataFrame = {
    val normalize = normalizers.getOrElse(module,
      throw new IllegalArgumentException(s"unknown module '$module' (expected ${normalizers.keys.mkString("/")})"))
    normalize(ReportFormat.parseDirectory(spark, inputDir, ext), generationDate)
  }

  /** Zip-wrapped ISU ingest: archives of report TXT entries → 32-column
    * ISU records with wrapper metadata (zip name/dir/path/size).
    */
  def ingestZipped(spark: SparkSession, inputDir: String,
                   generationDate: Column = date_format(current_timestamp(), "yyyy-MM-dd HH:mm:ss")): DataFrame =
    Normalize.isuRecords(ReportFormat.parseZippedDirectory(spark, inputDir), "ISU", generationDate)

  /** Run ingest and persist to both sinks; returns #records newly appended
    * to parquet (idempotent across re-runs of the same input files).
    */
  def run(spark: SparkSession, inputDir: String, csvOut: String, parquetOut: String,
          module: String = "ERP"): Long = {
    val records = ingest(spark, inputDir, module).cache()
    try {
      Sinks.writeCsv(records, csvOut)
      Sinks.appendNewReportsOnly(spark, records, parquetOut)
    } finally { records.unpersist(); () }
  }

  /** Render blocks back to report-file text — fixture generator for tests
    * and the self-contained demo query (inverse of the parser; property
    * tests roundtrip through it).
    */
  def renderReport(blocks: Seq[Seq[(String, String)]]): String =
    blocks.map(_.map { case (k, v) => s"$k: $v" }.mkString("\n")).mkString("\n")

  /** Self-contained driver-contract query: writes a deterministic ERP
    * fixture to a temp dir, ingests it, returns the typed records — so the
    * reference-parity pipeline is exercised by the driver's rows>0 check
    * (no DuckDB oracle: input is report text, not the shared tables).
    */
  def demoQuery(spark: SparkSession): DataFrame = {
    import java.nio.file.{Files, Paths}
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), "graft_demo_reports")
    Files.createDirectories(dir)
    val blocks = (1 to 5).map { i =>
      Seq(
        "file" -> s"data_$i.csv", "tableNameFromFile" -> s"tbl_$i",
        "tableNameFromJson" -> s"tbl_json_$i", "headersFromJson" -> "a,b,c",
        "countHeadersFromJson" -> "3", "countHeadersFromFile" -> "3",
        "headersFromFile" -> "a,b,c", "equalsHeaders" -> (if (i % 2 == 0) "true" else "false"),
        "fileDirectory" -> s"/landing/dir_$i",
        "filePath" -> s"hdfs://nn:8020/landing/raw/data_$i.csv",
        "fileSize" -> s"${1000 + i}", "fileValidSha" -> "OK",
        "fileColForSchema" -> "parquet", "fileTableName" -> s"official_tbl_$i",
        "fileColForPathTable" -> s"/landing/raw/official/tbl_$i",
        "fileAntColForCountColumns" -> "10", "fileAntColForCountRows" -> "1000",
        "fileColForCountColumns" -> "10", "fileColForCountRows" -> (1000 + i * 7).toString,
        "status" -> "FINISHED")
    }
    Files.writeString(dir.resolve("DEMO_REPORT[04-08-2019T13_51_30].TXT"), renderReport(blocks))
    Normalize.typedErp(ingest(spark, dir.toString, "ERP", generationDate = lit("2026-01-01 00:00:00")))
      .orderBy(col("ARCHIVO_PROCESADO"))
  }
}
