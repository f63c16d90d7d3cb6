package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-flight data-quality counters via `Dataset.observe` — the
  * production-pipeline surface for "how many rows / nulls / out-of-range
  * values flowed through this stage" WITHOUT a second pass over the data:
  * the accumulators piggyback on whatever action already runs. At 100 TB a
  * separate quality-count job doubles the scan cost; observe() is free.
  *
  * Read the counters after any action via
  * `df.queryExecution.observedMetrics(name)` (batch) or a
  * `QueryExecutionListener` / streaming progress events in a long-lived
  * pipeline.
  */
object Metrics {

  /** Attach row/null/min/max counters for `valueCol` under `name`. */
  def observeQuality(df: DataFrame, name: String, valueCol: String): DataFrame =
    df.observe(name,
      count(lit(1)).as("n_rows"),
      count_if(col(valueCol).isNull).as("n_null"),
      min(col(valueCol)).as("min_v"),
      max(col(valueCol)).as("max_v"))

  // --------------------------------------------------------------------------
  // q124 — observe() as a CATALOG operator: run the instrumented scan of
  // lineitem.l_extendedprice, then surface the OBSERVED METRICS THEMSELVES
  // as the query result, so the DuckDB oracle hash-checks the counters the
  // accumulators produced (not a re-computed aggregate). The scan is
  // executed through its own QueryExecution so the CollectMetrics
  // accumulators fill without a second pass; all four counters are
  // order-free (count/min/max), hence partition-deterministic.
  def q124ObserveQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val observed = observeQuality(
      Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_extendedprice")),
      "q124_quality", "l_extendedprice")
    val qe = observed.queryExecution
    qe.toRdd.foreach(_ => ()) // execute THIS plan; fills the metric accumulators
    val m = qe.observedMetrics("q124_quality")
    Seq((m.getAs[Long]("n_rows"), m.getAs[Long]("n_null"),
        m.getAs[Double]("min_v"), m.getAs[Double]("max_v")))
      .toDF("n_rows", "n_null", "min_v", "max_v")
  }

  val q124Sql: String =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(COUNT(*) FILTER (l_extendedprice IS NULL) AS BIGINT) AS n_null,
      |  MIN(l_extendedprice) AS min_v, MAX(l_extendedprice) AS max_v
      |FROM lineitem""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q124_observe_quality", q124ObserveQuality _, Some(q124Sql)))
}
