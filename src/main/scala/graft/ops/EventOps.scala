package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over the `events` stream table: cohort retention
  * and event-sequence transition statistics — the two standard product /
  * engagement reports an analytics engine is expected to produce from a
  * raw event log (the reference has no event analytics at all; this is
  * [EXT] north-star surface, see SURVEY.md §2.2).
  *
  * Scale shape shared by both: ONE shuffle on `user_id` collapses the
  * event log to per-user state (a bounded set of active weeks, or the
  * lead-ordered event chain), after which everything is arithmetic on a
  * cohort×offset / type×type grid that is orders of magnitude smaller
  * than the log. No driver-side iteration, no second scan of the log.
  */
object EventOps {

  /** ISO-week index of a timestamp: whole weeks since Monday 1970-01-05.
    * Integer floor-division on a positive day count — bit-identical in
    * Spark (`div`) and DuckDB (`//`), no timezone or week-rule ambiguity
    * (sessions run UTC; DATE truncation happens before the arithmetic).
    */
  private val weekIdx: Column =
    expr("cast(datediff(to_date(ts), date'1970-01-05') div 7 as bigint)")

  // --------------------------------------------------------------------------
  // q131 — weekly cohort retention matrix: users are cohorted by the week
  // of their FIRST event; for every (cohort, week_offset) cell, how many
  // of that cohort's users were active, and what fraction of the cohort
  // that is. The offset-0 cell is by construction the cohort size (every
  // user is active in their own first week), so the rate denominator is a
  // window max over the tiny result grid — no extra pass over the log.
  //
  // Scale: groupBy(user_id) with collect_set(week) is ONE map-side-partial
  // hash aggregate over the log (weeks-per-user is bounded by the calendar
  // span, not the event count — collect_set dedups in the partial);
  // explode + the (cohort, offset) aggregate then run on |users|·|weeks|
  // rows, and the rate window runs on |weeks|² rows. Determinism: counts
  // are exact longs; rate is an int/int double ratio (bit-exact) rounded.
  def q131CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .select(col("user_id"), weekIdx.as("wk"))
      .groupBy(col("user_id"))
      .agg(min(col("wk")).as("cohort"), collect_set(col("wk")).as("wks"))
    val grid = perUser
      .select(col("cohort"), explode(col("wks")).as("wk"))
      .groupBy(col("cohort"), (col("wk") - col("cohort")).as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
    val cohortSize =
      max(when(col("week_offset") === 0, col("active_users")))
        .over(Window.partitionBy(col("cohort")))
    grid
      .withColumn("cohort_size", cohortSize)
      .select(
        col("cohort"), col("week_offset"), col("active_users"), col("cohort_size"),
        round(col("active_users").cast("double") / col("cohort_size"), 6)
          .as("retention_rate"))
      .orderBy(col("cohort"), col("week_offset"))
  }

  val q131Sql: String =
    """WITH wks AS (
      |  SELECT DISTINCT user_id,
      |    CAST(DATE_DIFF('day', DATE '1970-01-05', CAST(ts AS DATE)) // 7 AS BIGINT) AS wk
      |  FROM events),
      |coh AS (SELECT user_id, MIN(wk) AS cohort FROM wks GROUP BY user_id),
      |act AS (
      |  SELECT c.cohort, w.wk - c.cohort AS week_offset, COUNT(*) AS active_users
      |  FROM wks w JOIN coh c ON w.user_id = c.user_id
      |  GROUP BY 1, 2),
      |sized AS (
      |  SELECT cohort, week_offset, active_users,
      |    MAX(CASE WHEN week_offset = 0 THEN active_users END)
      |      OVER (PARTITION BY cohort) AS cohort_size
      |  FROM act)
      |SELECT cohort, week_offset, active_users, cohort_size,
      |  ROUND(CAST(active_users AS DOUBLE) / cohort_size, 6) AS retention_rate
      |FROM sized ORDER BY cohort, week_offset""".stripMargin

  // --------------------------------------------------------------------------
  // q132 — event-type transition matrix (first-order Markov estimate): for
  // each user's event chain in (ts, event_id) order, count every adjacent
  // (from → to) pair and normalize per origin type. The per-user ORDER is
  // made total with the unique event_id tie-break, so rows with equal
  // timestamps cannot flip the chain between runs/engines/partitionings.
  //
  // Scale: the lead() window is one shuffle+sort on user_id — the same
  // exchange a sessionizer already pays; the transition aggregate reduces
  // to a |types|² grid and the probability normalizer is a window over
  // that grid. Probabilities are exact-int ratios rounded at 6.
  def q132EventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
      .withColumn("p",
        round(col("n_trans").cast("double") /
          sum(col("n_trans")).over(Window.partitionBy(col("from_type"))), 6))
      .orderBy(col("from_type"), col("to_type"))
  }

  val q132Sql: String =
    """WITH chain AS (
      |  SELECT event_type AS from_type,
      |    LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |cnt AS (
      |  SELECT from_type, to_type, COUNT(*) AS n_trans
      |  FROM chain WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n_trans,
      |  ROUND(CAST(n_trans AS DOUBLE) /
      |        SUM(n_trans) OVER (PARTITION BY from_type), 6) AS p
      |FROM cnt ORDER BY from_type, to_type""".stripMargin

  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q131_cohort_retention", q131CohortRetention _, Some(q131Sql)),
    ("q132_event_transitions", q132EventTransitions _, Some(q132Sql)))
}
