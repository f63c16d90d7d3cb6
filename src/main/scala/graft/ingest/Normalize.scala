package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Block map → normalized report record (reference Proof.scala:157-214
  * `splitInfoERP` + `getFields` :236-274, with the intended — not the
  * buggy — semantics; every deviation is a documented SURVEY §2.4 quirk fix).
  */
object Normalize {

  /** The reference re-encodes the `equalsHeaders` boolean as localized
    * strings (Proof.scala:113-123). Value-based check (Q4 fix: one site
    * checked the KEY not the value), trimmed, null→NO.
    */
  def siNo(c: Column): Column =
    when(trim(c) === "true", lit("SI")).otherwise(lit("NO"))

  /** Timestamp from the report filename pattern
    * `..._PROCESSS[04-08-2019T13_51_30].TXT` (reference Main.scala:18) —
    * the intended value of FECHA_DE_GENERACION_DE_REPORTE, which the
    * reference fills with the placeholder "cualquier cosa" (Q1,
    * Proof.scala:250).
    */
  def fileNameTimestamp(fileCol: Column): Column =
    // try_to_timestamp: filenames without the pattern yield null, not an
    // ANSI parse error (Spark 4 runs ANSI mode by default)
    try_to_timestamp(
      regexp_extract(fileCol, """\[(\d{2}-\d{2}-\d{4}T\d{2}_\d{2}_\d{2})\]""", 1),
      lit("dd-MM-yyyy'T'HH_mm_ss"))

  /** Normalize assembled blocks into the ERP record shape.
    *
    * @param blocks         output of [[ReportFormat.assembleBlocks]]
    * @param module         config module tag (reference `properties("module")`)
    * @param generationDate run timestamp; injectable for deterministic tests
    *                       (reference ships the literal "Generate Date" — Q1)
    */
  def erpRecords(blocks: DataFrame, module: String = "ERP",
                 generationDate: Column = date_format(current_timestamp(), "yyyy-MM-dd HH:mm:ss")): DataFrame =
    records(blocks, ReportSchemas.erpColumns, module, generationDate)

  /** ISU variant: same pipeline, 32-column shape (reference declares but
    * never implements it — Proof.scala:215-224).
    */
  def isuRecords(blocks: DataFrame, module: String = "ISU",
                 generationDate: Column = date_format(current_timestamp(), "yyyy-MM-dd HH:mm:ss")): DataFrame =
    records(blocks, ReportSchemas.isuColumns, module, generationDate)

  /** The 20-column prototype shape (reference Main.scala:16-26,109-112):
    * pure keyed extraction, no metadata columns, no SI/NO re-encoding
    * (the prototype's `splitInfo` passes values through raw), and the
    * `TAMANO_DE_ARCHIVO_(BYTES)` paren spelling. A consumer replaying old
    * prototype outputs byte-compares against exactly this header set.
    */
  def protoRecords(blocks: DataFrame): DataFrame =
    blocks.select(ReportSchemas.protoColumns.map { case (name, key) =>
      coalesce(element_at(col("kv"), key), lit("")).as(name)
    }: _*)

  /** Rename to the reference's exact legacy header spelling
    * (`GEBERATION_DATE`, Proof.scala:27) for byte-identical output
    * fidelity — apply just before [[Sinks.writeCsv]] when a downstream
    * consumer diffs headers byte-for-byte.
    */
  def withLegacyHeader(records: DataFrame): DataFrame =
    records.withColumnRenamed("GENERATION_DATE",
      ReportSchemas.legacyGenerationDateSpelling)

  private def records(blocks: DataFrame, shape: Seq[(String, Option[String])],
                      module: String, generationDate: Column): DataFrame = {
    def kv(key: String): Column = element_at(col("kv"), key)

    // Real count diffs (Q1 fix: reference ships placeholders "Proof"/"Proof2"
    // where official-vs-prepared column/row count differences belong).
    // try_cast: a missing/garbage count line yields null, not an ANSI
    // NumberFormat crash of the whole batch.
    def tryLong(c: Column): Column = c.try_cast("long")
    def diff(official: String, prepared: String): Column =
      (tryLong(kv(official)) - tryLong(kv(prepared))).cast("string")

    val cols: Seq[Column] = shape.map {
      case (name, Some("equalsHeaders")) => siNo(kv("equalsHeaders")).as(name)
      case (name, Some(key)) => coalesce(kv(key), lit("")).as(name)
      case ("MODULO", None) => lit(module).as("MODULO")
      // Observable reference output is the literal matchType "parquet"
      // (Q2: the intended "Generación de Parquet" assignment is dead code).
      case ("TIPO_DE_REPORTE", None) => lit("parquet").as("TIPO_DE_REPORTE")
      case ("RUTA_DE_REPORTE", None) => col("file").as("RUTA_DE_REPORTE")
      case ("FECHA_DE_GENERACION_DE_REPORTE", None) =>
        date_format(fileNameTimestamp(col("file")), "yyyy-MM-dd HH:mm:ss")
          .as("FECHA_DE_GENERACION_DE_REPORTE")
      case ("DIFERENCIA_TOTAL_COLUMNAS", None) =>
        diff("fileColForCountColumns", "fileAntColForCountColumns").as("DIFERENCIA_TOTAL_COLUMNAS")
      case ("DIFERENCIA_TOTAL_REGISTROS", None) =>
        diff("fileColForCountRows", "fileAntColForCountRows").as("DIFERENCIA_TOTAL_REGISTROS")
      case ("GENERATION_DATE", None) => generationDate.cast("string").as("GENERATION_DATE")
      case (name, None) => lit("").as(name)
    }
    blocks.select(cols: _*)
  }

  /** Typed "official" layer on top of the all-string raw records: counts →
    * long (try_cast — empty/garbage values become null instead of an ANSI
    * crash), dates → timestamp, SI/NO → boolean (SURVEY §1.4 mapping).
    */
  def typedErp(records: DataFrame): DataFrame =
    records
      .withColumn("CONTEO_CABECERA_ASIGNADO_ENVIADO_POR_EL_SISTEMA",
        col("CONTEO_CABECERA_ASIGNADO_ENVIADO_POR_EL_SISTEMA").try_cast("long"))
      .withColumn("CONTEO_CABECERA_POR_ARCHIVO", col("CONTEO_CABECERA_POR_ARCHIVO").try_cast("long"))
      .withColumn("TAMANO_DE_ARCHIVO_BYTES", col("TAMANO_DE_ARCHIVO_BYTES").try_cast("long"))
      .withColumn("TOTAL_COLUMNAS_PREPARACION_DE_MARCO_DE_DATOS",
        col("TOTAL_COLUMNAS_PREPARACION_DE_MARCO_DE_DATOS").try_cast("long"))
      .withColumn("TOTAL_REGISTROS_PREPARACION_DE_MARCO_DE_DATOS",
        col("TOTAL_REGISTROS_PREPARACION_DE_MARCO_DE_DATOS").try_cast("long"))
      .withColumn("DIFERENCIA_TOTAL_COLUMNAS", col("DIFERENCIA_TOTAL_COLUMNAS").try_cast("long"))
      .withColumn("DIFERENCIA_TOTAL_REGISTROS", col("DIFERENCIA_TOTAL_REGISTROS").try_cast("long"))
      .withColumn("TOTAL_COLUMNAS_OFICIAL", col("TOTAL_COLUMNAS_OFICIAL").try_cast("long"))
      .withColumn("TOTAL_REGISTROS_OFICIAL", col("TOTAL_REGISTROS_OFICIAL").try_cast("long"))
      .withColumn("CABECERAS_IGUALES", (col("CABECERAS_IGUALES") === "SI").as("CABECERAS_IGUALES"))
      .withColumn("FECHA_DE_GENERACION_DE_REPORTE",
        try_to_timestamp(col("FECHA_DE_GENERACION_DE_REPORTE"), lit("yyyy-MM-dd HH:mm:ss")))
      .withColumn("GENERATION_DATE",
        try_to_timestamp(col("GENERATION_DATE"), lit("yyyy-MM-dd HH:mm:ss")))
}
