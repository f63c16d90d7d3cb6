package graft
import org.scalatest.funsuite.AnyFunSuite
class CatalogCountSpec extends AnyFunSuite {
  test("count") {
    val names = Seq(
      ops.Relational.catalog, ops.RelationalExt.catalog,
      ops.RelationalMore.catalog, ops.SketchOps.catalog,
      ops.TextOps.catalog, ops.CorpusOps.catalog, ops.EventOps.catalog,
      ops.VectorOps.catalog, ops.SeriesOps.catalog, ops.EncodeOps.catalog,
      ops.PrepOps.catalog, ops.TokenizerOps.catalog, ops.CurateOps.catalog,
      ops.RagOps.catalog, ops.PipelineOps.catalog, ops.Skew.catalog,
      ops.Metrics.catalog, ops.SpatialOps.catalog,
      ops.GraphMiningOps.catalog, ops.CorpusStatOps.catalog,
      ops.TrendStatOps.catalog, ops.EvalReplayOps.catalog,
      ops.InferenceTestOps.catalog, ops.CapacityAuditOps.catalog,
      ops.StreamingOps.catalog, ops.Multimodal.catalog).flatten.map(_._1) :+ "q50_report_ingest"
    info(s"total entries: ${names.size}, distinct: ${names.distinct.size}")
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    info(s"dups: ${dups.mkString(",")}")
    assert(names.size === names.distinct.size)
  }
}
