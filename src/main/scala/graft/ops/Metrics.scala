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

  // --------------------------------------------------------------------------
  // q193 — exact distributed ROC-AUC via the Mann–Whitney rank-sum
  // identity: AUC = (Σ_{i∈pos} rank_i − n⁺(n⁺+1)/2) / (n⁺·n⁻). The naive
  // formulation ranks every score through ONE task
  // (row_number().over(Window.orderBy(score))) — the exact plan class
  // PlanLintSpec bans — so the global rank is q169's two-pass bucketed
  // shape: range-bucket the score, per-bucket counts → exclusive prefix
  // sum over the BOUNDED bucket grid (allowlisted), broadcast offsets
  // back, rank within bucket partitioned. Sampling-free and exact at any
  // scale — the usual sklearn-on-a-sample detour is unnecessary.
  //
  // Determinism: the score is an INTEGER (md5-prefix uniform + a fixed
  // class shift so the ranking is non-trivial, AUC ≈ 0.73); ties broken by
  // (score, event_id) identically in both engines; everything stays in
  // integer arithmetic until the single final division.
  private val scoreExpr =
    "cast(conv(substring(md5(cast(event_id as string)), 1, 8), 16, 10) as bigint)" +
      " + if(event_type = 'purchase', 1500000000L, 0L)"

  def q193ExactAuc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = Tables.events(spark, dir)
      .select(col("event_id"),
        (col("event_type") === "purchase").as("pos"),
        expr(scoreExpr).as("score"))
    val mx = scored.agg(max(col("score")).as("mx"))
    val bucketed = scored.crossJoin(broadcast(mx))
      .withColumn("bucket", expr("score div (mx div 256 + 1)")).drop("mx")
    val offsets = bucketed.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
      .withColumn("offset",
        coalesce(sum(col("cnt")).over(
          Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("offset"))
    bucketed.join(broadcast(offsets), Seq("bucket"))
      .select(col("pos"),
        (col("offset") + row_number().over(
          Window.partitionBy(col("bucket")).orderBy(col("score"), col("event_id"))))
          .as("rk"))
      .agg(
        count_if(col("pos")).as("n_pos"),
        count_if(!col("pos")).as("n_neg"),
        round(
          (lit(2) * sum(when(col("pos"), col("rk")).otherwise(0L))
            - count_if(col("pos")) * (count_if(col("pos")) + 1)).cast("double")
            / (lit(2.0) * count_if(col("pos")) * count_if(!col("pos"))), 6).as("auc"))
  }

  val q193Sql: String =
    """WITH sc AS (
      |  SELECT event_id, event_type = 'purchase' AS pos,
      |    ('0x' || substr(md5(event_id::VARCHAR), 1, 8))::BIGINT
      |      + CASE WHEN event_type = 'purchase' THEN 1500000000 ELSE 0 END AS score
      |  FROM events),
      |r AS (SELECT pos, ROW_NUMBER() OVER (ORDER BY score, event_id) AS rk FROM sc)
      |SELECT CAST(COUNT(*) FILTER (pos) AS BIGINT) AS n_pos,
      |  CAST(COUNT(*) FILTER (NOT pos) AS BIGINT) AS n_neg,
      |  ROUND(CAST(2 * SUM(CASE WHEN pos THEN rk ELSE 0 END)
      |             - COUNT(*) FILTER (pos) * (COUNT(*) FILTER (pos) + 1) AS DOUBLE)
      |        / (2.0 * COUNT(*) FILTER (pos) * COUNT(*) FILTER (NOT pos)), 6) AS auc
      |FROM r""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q124_observe_quality", q124ObserveQuality _, Some(q124Sql)),
    ("q193_exact_auc", q193ExactAuc _, Some(q193Sql)))
}
