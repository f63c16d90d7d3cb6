package graft.ops

import org.apache.spark.sql.DataFrame
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
}
