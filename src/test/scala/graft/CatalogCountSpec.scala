package graft
import org.scalatest.funsuite.AnyFunSuite
class CatalogCountSpec extends AnyFunSuite {
  test("count") {
    val names = Seq(
      ops.Relational.catalog, ops.RelationalExt.catalog, ops.RelationalMore.catalog,
      ops.SketchOps.catalog, ops.TextOps.catalog, ops.CorpusOps.catalog,
      ops.EventOps.catalog, ops.VectorOps.catalog, ops.SeriesOps.catalog,
      ops.EncodeOps.catalog, ops.PrepOps.catalog, ops.TokenizerOps.catalog,
      ops.CurateOps.catalog, ops.RagOps.catalog, ops.PipelineOps.catalog,
      ops.Skew.catalog, ops.Metrics.catalog, ops.SpatialOps.catalog,
      ops.Round8Ops.catalog, ops.Round8bOps.catalog, ops.Round8cOps.catalog,
      ops.Round8dOps.catalog, ops.Round8eOps.catalog, ops.Round8fOps.catalog,
      ops.Round8gOps.catalog, ops.Round8hOps.catalog, ops.Round8iOps.catalog, ops.Round8jOps.catalog, ops.Round8kOps.catalog, ops.Round8lOps.catalog, ops.Round8mOps.catalog, ops.Round8nOps.catalog, ops.Round8oOps.catalog, ops.Round8pOps.catalog, ops.Round8qOps.catalog, ops.Round8rOps.catalog, ops.Round8sOps.catalog, ops.Round8tOps.catalog, ops.Round8uOps.catalog, ops.Round8vOps.catalog, ops.Round8wOps.catalog, ops.Round8xOps.catalog, ops.Round8yOps.catalog, ops.Round8zOps.catalog, ops.Round8aaOps.catalog, ops.Round8abOps.catalog, ops.Round8acOps.catalog, ops.Round8adOps.catalog, ops.Round8aeOps.catalog, ops.Round8afOps.catalog, ops.Round8agOps.catalog, ops.Round8ahOps.catalog, ops.Round8aiOps.catalog, ops.Round8ajOps.catalog, ops.Round8akOps.catalog, ops.Round8alOps.catalog, ops.Round8amOps.catalog, ops.Round8anOps.catalog, ops.Round8aoOps.catalog, ops.Round8apOps.catalog, ops.Round8aqOps.catalog, ops.Round8arOps.catalog, ops.Round8asOps.catalog, ops.Round8atOps.catalog, ops.Round8auOps.catalog, ops.Round8avOps.catalog, ops.Round8awOps.catalog, ops.Round8axOps.catalog,
      ops.StreamingOps.catalog, ops.Multimodal.catalog).flatten.map(_._1) :+ "q50_report_ingest"
    info(s"total entries: ${names.size}, distinct: ${names.distinct.size}")
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    info(s"dups: ${dups.mkString(",")}")
    assert(names.size === names.distinct.size)
  }
}
