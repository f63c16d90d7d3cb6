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
      ops.VectorOps.catalog ++ ops.SeriesOps.catalog ++
      ops.EncodeOps.catalog ++ ops.PrepOps.catalog ++
      ops.TokenizerOps.catalog ++ ops.CurateOps.catalog ++
      ops.RagOps.catalog ++ ops.PipelineOps.catalog ++ ops.Skew.catalog ++
      ops.Metrics.catalog ++ ops.SpatialOps.catalog ++
      ops.GraphMiningOps.catalog ++
      ops.CorpusStatOps.catalog ++ ops.TrendStatOps.catalog ++
      ops.EvalReplayOps.catalog ++ ops.InferenceTestOps.catalog ++
      ops.CapacityAuditOps.catalog ++ ops.StreamingOps.catalog ++
      ops.Multimodal.catalog ++ Seq(
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
