package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query catalogs live in graft.ops.* ; each catalog contributes
  * (name, builder, optional DuckDB oracle SQL) triples that are merged here.
  */
object SparkEntry {

  /** All catalogs, in presentation order. */
  private def catalogs: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    ops.Relational.catalog ++ ops.RelationalExt.catalog ++
      ops.RelationalMore.catalog ++ ops.SketchOps.catalog ++
      ops.TextOps.catalog ++ ops.CorpusOps.catalog ++ ops.EventOps.catalog ++
      ops.VectorOps.catalog ++
      ops.SeriesOps.catalog ++ ops.EncodeOps.catalog ++ ops.PrepOps.catalog ++
      ops.TokenizerOps.catalog ++ ops.CurateOps.catalog ++ ops.RagOps.catalog ++
      ops.PipelineOps.catalog ++ ops.Skew.catalog ++ ops.Metrics.catalog ++
      ops.SpatialOps.catalog ++ ops.Round8Ops.catalog ++ ops.Round8bOps.catalog ++
      ops.Round8cOps.catalog ++ ops.Round8dOps.catalog ++ ops.Round8eOps.catalog ++
      ops.Round8fOps.catalog ++ ops.Round8gOps.catalog ++ ops.Round8hOps.catalog ++ ops.Round8iOps.catalog ++ ops.Round8jOps.catalog ++ ops.Round8kOps.catalog ++ ops.Round8lOps.catalog ++ ops.Round8mOps.catalog ++ ops.Round8nOps.catalog ++ ops.Round8oOps.catalog ++ ops.Round8pOps.catalog ++ ops.Round8qOps.catalog ++ ops.Round8rOps.catalog ++ ops.Round8sOps.catalog ++ ops.Round8tOps.catalog ++ ops.Round8uOps.catalog ++ ops.Round8vOps.catalog ++ ops.Round8wOps.catalog ++ ops.Round8xOps.catalog ++ ops.Round8yOps.catalog ++ ops.Round8zOps.catalog ++ ops.Round8aaOps.catalog ++ ops.Round8abOps.catalog ++ ops.Round8acOps.catalog ++ ops.Round8adOps.catalog ++ ops.Round8aeOps.catalog ++ ops.Round8afOps.catalog ++ ops.Round8agOps.catalog ++ ops.Round8ahOps.catalog ++ ops.Round8aiOps.catalog ++ ops.Round8ajOps.catalog ++ ops.Round8akOps.catalog ++ ops.Round8alOps.catalog ++ ops.Round8amOps.catalog ++ ops.Round8anOps.catalog ++ ops.Round8aoOps.catalog ++ ops.Round8apOps.catalog ++ ops.Round8aqOps.catalog ++ ops.Round8arOps.catalog ++ ops.Round8asOps.catalog ++ ops.Round8atOps.catalog ++ ops.Round8auOps.catalog ++ ops.Round8avOps.catalog ++ ops.Round8awOps.catalog ++ ops.Round8axOps.catalog ++
      ops.StreamingOps.catalog ++ ops.Multimodal.catalog ++ Seq(
      ("q50_report_ingest", (s: SparkSession, _: String) => ingest.ReportPipeline.demoQuery(s),
        Some(ingest.ReportPipeline.q50Sql)))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q01Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalogs.map { case (n, f, _) => n -> f }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver records a weaker rows-only check).
    */
  def oracleSql: Map[String, String] =
    catalogs.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
