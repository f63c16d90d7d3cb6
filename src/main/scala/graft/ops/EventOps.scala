package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Behavioral analytics over the `events` stream table: cohort retention,
  * transition/path mining, sessionization, A/B readout, rolling active
  * users, interval-overlap joins, and attribution — the standard product /
  * engagement reports an analytics engine produces from a raw event log
  * (the reference has no event analytics at all; this is [EXT] north-star
  * surface, see SURVEY.md §2.2 and §8.6).
  *
  * Scale shape shared across the family: ONE shuffle on `user_id`
  * collapses the log to per-user state (active-week sets, the ordered
  * event chain, session islands), after which everything is arithmetic on
  * a grid orders of magnitude smaller than the log. No driver-side
  * iteration; replicate-to-window and bin joins keep the remaining
  * operators linear.
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
        Num.pround(col("active_users").cast("double") / col("cohort_size"), 6)
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
      |  FLOOR((CAST(active_users AS DOUBLE) / cohort_size) * 1e6 + 0.5) / 1e6 AS retention_rate
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
        Num.pround(col("n_trans").cast("double") /
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
      |  FLOOR((CAST(n_trans AS DOUBLE) /
      |        SUM(n_trans) OVER (PARTITION BY from_type)) * 1e6 + 0.5) / 1e6 AS p
      |FROM cnt ORDER BY from_type, to_type""".stripMargin

  // --------------------------------------------------------------------------
  // q137 — sessionization: assign every event to a session (30-minute
  // inactivity gap rule) and emit the per-session summary table — the
  // batch twin of q62's session_window aggregate, in the "session table"
  // form downstream joins expect (id, bounds, length, duration).
  // Gaps-and-islands: a lag() gap flag over the (ts, event_id)-total-
  // ordered per-user chain, running-sum'd into a session index.
  //
  // Scale: one shuffle+sort on user_id feeds BOTH windows and the final
  // per-session aggregate (same partitioning, no second exchange);
  // session durations are exact epoch-microsecond longs, so nothing here
  // compares or rounds a double.
  /** (user_id, session_idx, start_ts, end_ts, n_events) session table —
    * the shared gaps-and-islands core of q137/q140. One shuffle+sort on
    * user_id serves the lag flag, the running index, and the aggregate.
    */
  private[ops] def sessions(spark: SparkSession, dir: String): DataFrame = {
    val chain = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val running = chain.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = 1800L * 1000000L
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("new_sess",
        when(unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(chain)) > gapUs
          || lag(col("ts"), 1).over(chain).isNull, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_sess")).over(running))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
        count(lit(1)).as("n_events"))
  }

  def q137Sessionize(spark: SparkSession, dir: String): DataFrame =
    sessions(spark, dir)
      .select(
        col("user_id"), col("session_idx"),
        date_format(col("start_ts"), "yyyy-MM-dd HH:mm:ss").as("start_s"),
        date_format(col("end_ts"), "yyyy-MM-dd HH:mm:ss").as("end_s"),
        col("n_events"),
        ((unix_micros(col("end_ts")) - unix_micros(col("start_ts"))) / lit(1000000L))
          .cast("long").as("duration_sec"))
      .orderBy(col("user_id"), col("session_idx"))

  val q137Sql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                        ROWS UNBOUNDED PRECEDING) AS session_idx
      |  FROM flagged)
      |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
      |  STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS start_s,
      |  STRFTIME(MAX(ts), '%Y-%m-%d %H:%M:%S') AS end_s,
      |  COUNT(*) AS n_events,
      |  (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS duration_sec
      |FROM sess GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin

  // --------------------------------------------------------------------------
  // q138 — A/B experiment readout: users hash-split into variants (q27's
  // portable md5 policy — deterministic, engine-independent, no RNG
  // state), per-user conversion = "ever purchased", and the two-proportion
  // pooled z-test on the conversion rates. The analytics-engine form of
  // "did the experiment move the metric". Conversion is a HIGH-VALUE
  // purchase (value ≥ 150, ~45% of users at every SF) — a plain
  // "ever purchased" metric saturates at p = 1 on this dense log and
  // the pooled variance (and the z denominator) collapses to zero.
  //
  // Scale: one hash aggregate to per-user flags (map-side partial), one
  // conditional aggregate to the 4 experiment counters, then scalar
  // arithmetic on a 1-row frame. Counters are exact longs; the z formula
  // is a single fixed-order double expression mirrored token-for-token in
  // the oracle (q118/q119's accepted determinism class).
  def q138AbTest(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("value"))
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("value") >= 150.0, 1L)
        .otherwise(0L)).as("conv"))
      .withColumn("variant",
        when(substring(md5(col("user_id").cast("string")), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"), lit("A")).otherwise(lit("B")))
    perUser
      .groupBy(lit(1).as("g"))
      .agg(
        count_if(col("variant") === "A").as("n_a"),
        sum(when(col("variant") === "A", col("conv")).otherwise(0L)).as("x_a"),
        count_if(col("variant") === "B").as("n_b"),
        sum(when(col("variant") === "B", col("conv")).otherwise(0L)).as("x_b"))
      .withColumn("p_a", col("x_a").cast("double") / col("n_a"))
      .withColumn("p_b", col("x_b").cast("double") / col("n_b"))
      .withColumn("pp", (col("x_a") + col("x_b")).cast("double") / (col("n_a") + col("n_b")))
      .withColumn("z", (col("p_a") - col("p_b")) /
        sqrt(col("pp") * (lit(1.0) - col("pp")) *
          (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))))
      .select(
        col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        Num.pround(col("p_a"), 6).as("p_a"), Num.pround(col("p_b"), 6).as("p_b"),
        Num.pround(col("z"), 6).as("z"),
        (abs(col("z")) > 1.96).as("significant"))
  }

  val q138Sql: String =
    """WITH pu AS (
      |  SELECT user_id,
      |    MAX(CASE WHEN event_type = 'purchase' AND value >= 150 THEN 1 ELSE 0 END) AS conv,
      |    CASE WHEN SUBSTR(md5(CAST(user_id AS VARCHAR)), 1, 1)
      |           IN ('0','1','2','3','4','5','6','7') THEN 'A' ELSE 'B' END AS variant
      |  FROM events GROUP BY user_id),
      |c AS (
      |  SELECT
      |    COUNT(*) FILTER (variant = 'A') AS n_a,
      |    SUM(CASE WHEN variant = 'A' THEN conv ELSE 0 END) AS x_a,
      |    COUNT(*) FILTER (variant = 'B') AS n_b,
      |    SUM(CASE WHEN variant = 'B' THEN conv ELSE 0 END) AS x_b
      |  FROM pu),
      |s AS (
      |  SELECT n_a, x_a, n_b, x_b,
      |    CAST(x_a AS DOUBLE) / n_a AS p_a,
      |    CAST(x_b AS DOUBLE) / n_b AS p_b,
      |    CAST(x_a + x_b AS DOUBLE) / (n_a + n_b) AS pp
      |  FROM c)
      |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(x_a AS BIGINT) AS x_a,
      |  CAST(n_b AS BIGINT) AS n_b, CAST(x_b AS BIGINT) AS x_b,
      |  FLOOR((p_a) * 1e6 + 0.5) / 1e6 AS p_a, FLOOR((p_b) * 1e6 + 0.5) / 1e6 AS p_b,
      |  FLOOR(((p_a - p_b) / SQRT(pp * (1.0 - pp) * (1.0 / n_a + 1.0 / n_b))) * 1e6 + 0.5) / 1e6 AS z,
      |  ABS((p_a - p_b) / SQRT(pp * (1.0 - pp) * (1.0 / n_a + 1.0 / n_b))) > 1.96 AS significant
      |FROM s""".stripMargin

  // --------------------------------------------------------------------------
  // q139 — rolling 7-day active users (DAU / WAU / stickiness): for every
  // calendar day, the distinct users active that day, the distinct users
  // active in the trailing 7-day window, and their ratio — the standard
  // engagement report.
  //
  // Scale shape: a sliding-window DISTINCT count can't ride an ordinary
  // window frame (distinct isn't decomposable), and the naive day-range
  // self-join is quadratic in the window width. The exact linear shape is
  // REPLICATE-TO-WINDOW: dedup to (user, day) pairs first (bounding the
  // fan-out), explode each pair to the ≤7 window-END days it contributes
  // to (row-local), then ONE hash aggregate per day — count(distinct
  // user) for WAU, and the offset-0 rows (unique per (user, day) after
  // the dedup) counted directly for DAU. For much wider windows (28/90
  // day) replication×width stops being free — switch to the q99 HLL
  // sketch-merge rollup and accept the ±% error.
  // Windows ending past the last active day are clipped by a broadcast
  // 1-row max; leading windows are legitimately partial.
  def q139RollingActive(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(spark, dir)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01")).as("d"))
      .distinct()
    val mx = ud.agg(max(col("d")).as("mx"))
    ud.select(col("user_id"), col("d"), explode(sequence(lit(0), lit(6))).as("k"))
      .withColumn("day", col("d") + col("k"))
      .crossJoin(broadcast(mx))
      .filter(col("day") <= col("mx"))
      .groupBy(col("day"))
      .agg(
        countDistinct(col("user_id")).as("wau"),
        count_if(col("k") === 0).as("dau"))
      .select(
        date_format(date_add(to_date(lit("1970-01-01")), col("day")), "yyyy-MM-dd")
          .as("date_s"),
        col("dau"), col("wau"),
        Num.pround(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
      .orderBy(col("date_s"))
  }

  val q139Sql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id,
      |    DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
      |  FROM events),
      |b AS (SELECT MAX(d) AS mx FROM ud),
      |r AS (
      |  SELECT user_id, d + k AS day, k
      |  FROM ud, UNNEST(generate_series(0, 6)) AS t(k)),
      |agg AS (
      |  SELECT day, COUNT(DISTINCT user_id) AS wau,
      |         COUNT(*) FILTER (k = 0) AS dau
      |  FROM r, b WHERE day <= mx GROUP BY day)
      |SELECT STRFTIME(DATE '1970-01-01' + CAST(day AS INTEGER), '%Y-%m-%d') AS date_s,
      |  CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
      |  FLOOR((CAST(dau AS DOUBLE) / wau) * 1e6 + 0.5) / 1e6 AS stickiness
      |FROM agg ORDER BY date_s""".stripMargin


  // --------------------------------------------------------------------------
  // q140 — interval-overlap JOIN: user sessions (derived in-plan by the
  // q137 core) × 20 synthetic 36-hour campaign windows spaced every 33
  // hours from the first event day; per window, how many sessions
  // overlapped and for how long. The interval×interval generalization of
  // q128's point-in-interval join.
  //
  // Scale shape: both interval sets replicate to the DAY BINS they span
  // (row-local explode, fan-out = interval length in days), the join is
  // an EQUI-join on bin with the exact strict-overlap predicate in-join,
  // and a pair spanning several shared bins is counted exactly once by
  // the FIRST-SHARED-BIN predicate (bin = max(first_bin_a, first_bin_b))
  // — no post-join distinct shuffle, the standard dedup-free binned
  // interval join. Overlap durations are exact epoch-microsecond longs.
  // (At this window count a broadcast theta join would also work — the
  // binned shape is the one that survives both sides growing to 100 TB.)
  def q140IntervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val sess = sessions(spark, dir)
      .select(col("user_id"), col("session_idx"),
        unix_micros(col("start_ts")).as("su"), unix_micros(col("end_ts")).as("eu"))
      .withColumn("bin", explode(expr(s"sequence(su div $dayUs, eu div $dayUs)")))
    val win = Tables.events(spark, dir)
      .agg(unix_micros(date_trunc("day", min(col("ts")))).as("d0us"))
      .select(explode(sequence(lit(0L), lit(19L))).as("w_id"), col("d0us"))
      .withColumn("ws", col("d0us") + col("w_id") * lit(118800000000L)) // 33 h
      .withColumn("we", col("ws") + lit(129600000000L))                 // 36 h
      .withColumn("bin", explode(expr(s"sequence(ws div $dayUs, we div $dayUs)")))
    sess.join(win, Seq("bin"))
      .filter(greatest(col("su"), col("ws")) < least(col("eu"), col("we")))
      .filter(col("bin") === greatest(
        expr(s"su div $dayUs"), expr(s"ws div $dayUs")))
      .groupBy(col("w_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(expr(s"(least(eu, we) - greatest(su, ws)) div 1000000"))
          .as("total_overlap_sec"))
      .orderBy(col("w_id"))
  }

  val q140Sql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                        ROWS UNBOUNDED PRECEDING) AS session_idx
      |  FROM flagged),
      |sessions AS (
      |  SELECT user_id, session_idx,
      |         epoch_us(MIN(ts)) AS su, epoch_us(MAX(ts)) AS eu
      |  FROM sess GROUP BY user_id, session_idx),
      |b0 AS (SELECT epoch_us(date_trunc('day', MIN(ts))) AS d0us FROM events),
      |win AS (
      |  SELECT k AS w_id,
      |         d0us + k * 118800000000 AS ws,
      |         d0us + k * 118800000000 + 129600000000 AS we
      |  FROM b0, UNNEST(generate_series(0, 19)) AS t(k)),
      |ov AS (
      |  SELECT w_id, (LEAST(eu, we) - GREATEST(su, ws)) // 1000000 AS osec
      |  FROM sessions JOIN win ON GREATEST(su, ws) < LEAST(eu, we))
      |SELECT w_id, COUNT(*) AS n_sessions,
      |  CAST(SUM(osec) AS BIGINT) AS total_overlap_sec
      |FROM ov GROUP BY w_id ORDER BY w_id""".stripMargin

  // --------------------------------------------------------------------------
  // q144 — last-touch marketing attribution: every purchase is credited to
  // the most recent click/view touch by the same user within the prior 7
  // days (channel = props.k mod 5); purchases with no eligible touch are
  // 'organic'. Per channel: attributed conversions and exact revenue.
  //
  // Shape: the q21 as-of pattern on the SINGLE user timeline — last(
  // channel, ignoreNulls) and last(touch time) carried forward by one
  // (ts, event_id)-ordered window per user (a purchase and a touch at the
  // SAME timestamp order by event_id: larger id wins the "most recent"
  // slot — deterministic, mirrored in the oracle). One shuffle on
  // user_id, then a 5-row channel aggregate. Revenue sums are exact
  // DECIMAL (SURVEY §8.4); the 7-day window is exact microseconds.
  def q144Attribution(spark: SparkSession, dir: String): DataFrame = {
    val tl = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isTouch = col("event_type").isin("click", "view")
    val channel = concat(lit("ch"),
      (get_json_object(col("props"), "$.k").cast("long") % 5).cast("string"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value"), col("props"))
      .withColumn("t_ch", when(isTouch, channel))
      .withColumn("t_us", when(isTouch, unix_micros(col("ts"))))
      .withColumn("last_ch", last(col("t_ch"), ignoreNulls = true).over(tl))
      .withColumn("last_us", last(col("t_us"), ignoreNulls = true).over(tl))
      .filter(col("event_type") === "purchase")
      .withColumn("channel",
        when(col("last_us").isNotNull &&
          unix_micros(col("ts")) - col("last_us") <= 604800000000L, col("last_ch"))
          .otherwise(lit("organic")))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        Num.moneySum(col("value")).as("revenue"))
      .orderBy(col("channel"))
  }

  val q144Sql: String =
    """WITH tl AS (
      |  SELECT user_id, ts, event_id, event_type, value,
      |    LAST_VALUE(CASE WHEN event_type IN ('click', 'view')
      |      THEN 'ch' || CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 5 AS VARCHAR)
      |      END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS UNBOUNDED PRECEDING) AS last_ch,
      |    LAST_VALUE(CASE WHEN event_type IN ('click', 'view')
      |      THEN epoch_us(ts) END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS UNBOUNDED PRECEDING) AS last_us
      |  FROM events)
      |SELECT
      |  CASE WHEN last_us IS NOT NULL AND epoch_us(ts) - last_us <= 604800000000
      |       THEN last_ch ELSE 'organic' END AS channel,
      |  COUNT(*) AS n_conversions,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM tl WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY channel""".stripMargin

  // --------------------------------------------------------------------------
  // q154 — sequential pattern mining, the n-gram extension of q132's
  // transition matrix: the top-20 length-3 event paths (trigrams) across
  // all user chains, by support. Same single (ts, event_id)-total-ordered
  // window shuffle as q132/q137 — lead(1) and lead(2) ride one sort —
  // then a hash aggregate to the |types|³ grid and a TakeOrderedAndProject
  // top-k (count desc, path asc: fully tie-broken).
  def q154EventPaths(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e3").isNotNull)
      .groupBy(col("event_type").as("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(20)
  }

  val q154Sql: String =
    """WITH chain AS (
      |  SELECT event_type AS e1,
      |    LEAD(event_type, 1) OVER w AS e2,
      |    LEAD(event_type, 2) OVER w AS e3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT e1, e2, e3, COUNT(*) AS n
      |FROM chain WHERE e3 IS NOT NULL
      |GROUP BY 1, 2, 3
      |ORDER BY n DESC, e1, e2, e3 LIMIT 20""".stripMargin

  // --------------------------------------------------------------------------
  // q162 — seasonality profile: the hour-of-day × day-of-week activity
  // grid (counts + exact revenue), the standard traffic-shape heatmap
  // behind capacity planning and anomaly baselines. Time-dimension
  // extraction is row-local (UTC sessions, so dayofweek/hour are
  // unambiguous); ONE hash aggregate to a 7×24 grid.
  def q162Seasonality(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(dayofweek(col("ts")).as("dow"), hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("n"),
        graft.ops.Num.moneySum(col("value")).as("sum_value"))
      .orderBy(col("dow"), col("hod"))
  }

  val q162Sql: String =
    """SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hod, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY dow, hod""".stripMargin

  // --------------------------------------------------------------------------
  // q165 — session-scoped ORDERED funnel: within each q137 session, did
  // the user view, then click after the view, then purchase after the
  // click? Reports per step: sessions reaching it, conversion vs the
  // previous step, and overall — the product-funnel table (q64 is the
  // two-step signup→purchase pair; this is the general in-session ordered
  // chain). Step order is enforced on FIRST-occurrence times (min ts per
  // type per session; a click before any view doesn't count), which makes
  // the whole funnel ONE conditional aggregate over the sessionized
  // stream — same single user_id exchange as q137, then a 3-row summary.
  // Rates are exact-int ratios rounded at 6.
  def q165SessionFunnel(spark: SparkSession, dir: String): DataFrame = {
    val chain = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val running = chain.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = 1800L * 1000000L
    def firstTs(t: String) = min(when(col("event_type") === t, col("ts")))
    val perSession = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("new_sess",
        when(unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(chain)) > gapUs
          || lag(col("ts"), 1).over(chain).isNull, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_sess")).over(running))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(firstTs("view").as("tv"), firstTs("click").as("tc"),
        firstTs("purchase").as("tp"))
    val f = perSession.select(
      lit(1L).as("n_sessions"),
      when(col("tv").isNotNull, 1L).otherwise(0L).as("s1"),
      when(col("tv").isNotNull && col("tc") > col("tv"), 1L).otherwise(0L).as("s2"),
      when(col("tv").isNotNull && col("tc") > col("tv") && col("tp") > col("tc"), 1L)
        .otherwise(0L).as("s3"))
      .agg(sum(col("n_sessions")).as("n_total"), sum(col("s1")).as("n1"),
        sum(col("s2")).as("n2"), sum(col("s3")).as("n3"))
    f.select(explode(array(
        struct(lit(1).as("step"), lit("view").as("name"), col("n1").as("n_reached"),
          col("n_total").as("n_prev")),
        struct(lit(2).as("step"), lit("click_after_view").as("name"), col("n2").as("n_reached"),
          col("n1").as("n_prev")),
        struct(lit(3).as("step"), lit("purchase_after_click").as("name"), col("n3").as("n_reached"),
          col("n2").as("n_prev")))).as("x"), col("n_total"))
      .select(col("x.step").as("step"), col("x.name").as("name"),
        col("x.n_reached").as("n_reached"),
        Num.pround(col("x.n_reached").cast("double") / col("x.n_prev"), 6).as("step_rate"),
        Num.pround(col("x.n_reached").cast("double") / col("n_total"), 6).as("overall_rate"))
      .orderBy(col("step"))
  }

  val q165Sql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts, event_type,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                        ROWS UNBOUNDED PRECEDING) AS session_idx
      |  FROM flagged),
      |ps AS (
      |  SELECT user_id, session_idx,
      |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS tv,
      |    MIN(CASE WHEN event_type = 'click' THEN ts END) AS tc,
      |    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
      |  FROM sess GROUP BY user_id, session_idx),
      |agg AS (
      |  SELECT COUNT(*) AS n_total,
      |    SUM(CASE WHEN tv IS NOT NULL THEN 1 ELSE 0 END) AS n1,
      |    SUM(CASE WHEN tv IS NOT NULL AND tc > tv THEN 1 ELSE 0 END) AS n2,
      |    SUM(CASE WHEN tv IS NOT NULL AND tc > tv AND tp > tc THEN 1 ELSE 0 END) AS n3
      |  FROM ps)
      |SELECT step, name, CAST(n_reached AS BIGINT) AS n_reached,
      |  FLOOR((CAST(n_reached AS DOUBLE) / n_prev) * 1e6 + 0.5) / 1e6 AS step_rate,
      |  FLOOR((CAST(n_reached AS DOUBLE) / n_total) * 1e6 + 0.5) / 1e6 AS overall_rate
      |FROM agg, LATERAL (VALUES
      |  (1, 'view', n1, n_total),
      |  (2, 'click_after_view', n2, n1),
      |  (3, 'purchase_after_click', n3, n2)) AS t(step, name, n_reached, n_prev)
      |ORDER BY step""".stripMargin

  // --------------------------------------------------------------------------
  // q228 — WATERMARK-DELAY / OUT-OF-ORDERNESS AUDIT: for each candidate
  // watermark delay, how many events would arrive LATE (event time behind
  // the per-user running max at their arrival position) and be dropped by
  // a streaming job with that delay? Arrival order is pinned to event_id
  // (the generator's monotone ingest id). This is the measurement that
  // SIZES the `withWatermark` delay for q60/q157/q188/q226 — pick the
  // smallest delay whose drop count is acceptable.
  //
  // Scale: ONE window partitioned by user_id (the stream's key — never a
  // global single-partition sort), lateness in exact integer micros, then
  // a ×4 bounded literal delay-grid explode and one hash aggregate to 4
  // rows. Percentages are integer-ratio doubles rounded at output.
  def q228LatenessAudit(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("late_us", max(col("us")).over(w) - col("us"))
      .withColumn("delay_s", explode(array(Seq(60L, 300L, 600L, 3600L).map(lit): _*)))
      .groupBy(col("delay_s"))
      .agg(count(lit(1)).as("n_events"),
        count_if(col("late_us") > col("delay_s") * 1000000L).as("n_dropped"),
        Num.pround(count_if(col("late_us") > col("delay_s") * 1000000L).cast("double") * 100
          / count(lit(1)), 6).as("pct_dropped"),
        max(col("late_us")).as("max_late_us"))
      .orderBy(col("delay_s"))
  }

  val q228Sql: String =
    """WITH l AS (
      |  SELECT user_id, event_id,
      |    MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
      |      ROWS UNBOUNDED PRECEDING) - epoch_us(ts) AS late_us
      |  FROM events),
      |g AS (SELECT late_us, delay_s FROM l
      |  CROSS JOIN (VALUES (60::BIGINT), (300::BIGINT), (600::BIGINT), (3600::BIGINT)) AS d(delay_s))
      |SELECT CAST(delay_s AS BIGINT) AS delay_s, COUNT(*) AS n_events,
      |  CAST(COUNT(*) FILTER (late_us > delay_s * 1000000) AS BIGINT) AS n_dropped,
      |  FLOOR((CAST(COUNT(*) FILTER (late_us > delay_s * 1000000) AS DOUBLE) * 100
      |    / COUNT(*)) * 1e6 + 0.5) / 1e6 AS pct_dropped,
      |  MAX(late_us) AS max_late_us
      |FROM g GROUP BY delay_s ORDER BY delay_s""".stripMargin

  // --------------------------------------------------------------------------
  // q237 — KAPLAN-MEIER SURVIVAL CURVE for user churn: per user, duration
  // = days between first and last event; a user whose last event precedes
  // the study end (global max ts) by >14 days is a churn EVENT, otherwise
  // right-CENSORED (still active at observation end — the distinction
  // naive "avg lifetime" metrics get wrong, biasing lifetime low). The KM
  // estimator S(t) = Π_{u≤t} (1 − d_u/n_u) handles censoring correctly:
  // censored users leave the risk set without counting as deaths.
  //
  // Scale: ONE shuffle on user_id collapses the log to per-user (t0, t1);
  // the curve lives on the bounded distinct-duration DAY grid (calendar-
  // span-bounded — the global cum window over it is the PlanLint
  // allowlisted bounded-grid case). The survival product is computed as
  // exp(Σ ln·) so it stays a windowed SUM (no product aggregate in
  // Spark); factors are exact rationals rounded only at output (6 dp; the
  // §8.4 ln/exp-at-output policy, q204's precedent). d_u = n_u (everyone
  // at risk dies at the max duration) would hit ln(0), so that term is
  // excluded and a windowed zero-flag pins survival to exactly 0.0 —
  // identical CASE in the oracle.
  def q237KaplanMeier(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
    val g = perUser.agg(max(col("t1")).as("tend"), count(lit(1)).as("total"))
    val durs = perUser.crossJoin(broadcast(g))
      .withColumn("dur", datediff(to_date(col("t1")), to_date(col("t0"))))
      .withColumn("churn",
        (col("t1") < col("tend") - expr("INTERVAL 14 DAYS")).cast("int"))
    val byDur = durs.groupBy(col("dur"))
      .agg(sum(col("churn")).as("d"),
        (count(lit(1)) - sum(col("churn"))).as("c"),
        first(col("total")).as("total"))
    val wPrev = Window.orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDur
      .withColumn("n_risk",
        col("total") - coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
      .withColumn("lnf",
        when(col("d") < col("n_risk"),
          log((col("n_risk") - col("d")).cast("double") / col("n_risk")))
          .otherwise(lit(0.0)))
      .withColumn("dead",
        max(when(col("d") === col("n_risk"), 1).otherwise(0)).over(wCum))
      .select(col("dur"), col("n_risk"), col("d"), col("c"),
        when(col("dead") === 1, lit(0.0))
          .otherwise(Num.pround(exp(sum(col("lnf")).over(wCum)), 6)).as("survival"))
      .orderBy(col("dur"))
  }

  val q237Sql: String =
    """WITH peru AS (
      |  SELECT user_id, MIN(ts) AS t0, MAX(ts) AS t1 FROM events GROUP BY 1),
      |g AS (SELECT MAX(t1) AS tend, COUNT(*) AS total FROM peru),
      |d AS (
      |  SELECT datediff('day', CAST(t0 AS DATE), CAST(t1 AS DATE)) AS dur,
      |    CASE WHEN t1 < tend - INTERVAL 14 DAY THEN 1 ELSE 0 END AS churn,
      |    total
      |  FROM peru, g),
      |byd AS (
      |  SELECT dur, CAST(SUM(churn) AS BIGINT) AS d,
      |    CAST(COUNT(*) - SUM(churn) AS BIGINT) AS c,
      |    ANY_VALUE(total) AS total
      |  FROM d GROUP BY 1),
      |w AS (
      |  SELECT dur, d, c,
      |    total - COALESCE(SUM(d + c) OVER (ORDER BY dur
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
      |  FROM byd)
      |SELECT dur, CAST(n_risk AS BIGINT) AS n_risk, d, c,
      |  CASE WHEN MAX(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER cum = 1 THEN 0.0
      |    ELSE FLOOR((EXP(SUM(CASE WHEN d < n_risk
      |      THEN LN(CAST(n_risk - d AS DOUBLE) / n_risk) ELSE 0 END) OVER cum)) * 1e6 + 0.5) / 1e6
      |  END AS survival
      |FROM w
      |WINDOW cum AS (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY dur""".stripMargin

  // --------------------------------------------------------------------------
  // q246 — BOT-LIKENESS SCORING from inter-arrival regularity + behavioral
  // diversity: humans arrive bursty (inter-event gap cv² ≈ 1, the Poisson
  // signature) and mix event types; schedulers arrive metronomically
  // (cv² → 0) with narrow type repertoires. Per user: gap cv² =
  // (n·Σg² − (Σg)²) / (Σg)² over millisecond gaps, and the Gini-Simpson
  // type diversity 1 − Σ(c/n)² = (n² − Σc²)/n² — BOTH exact integer
  // rationals with one double division each (no entropy/ln, so no libm
  // cross-engine risk). Flag = cv² < 0.75 (the sf0.01 5th-percentile
  // region; Poisson media sits at ≈ 0.95).
  //
  // Scale: ONE shuffle on user_id for the lag window; gap moments ride
  // DECIMAL(38) (ms gaps square past int64 at month-long idles); the
  // diversity aggregate is a second map-side-combinable pass; the final
  // join is per-user slim rows.
  def q246BotScore(spark: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val gaps = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("gap", expr("(us - lag(us) over (partition by user_id order by us, event_id)) div 1000"))
      .filter(col("gap").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap").cast(d38)).cast(d38).as("sg"),
        sum((col("gap").cast(d38) * col("gap"))).cast(d38).as("sg2"))
      .filter(col("n_gaps") >= 19)
    val div = Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      .agg(sum(col("c")).as("n_ev"), sum(col("c") * col("c")).as("sc2"))
    gaps.join(div, Seq("user_id"))
      .select(col("user_id"), col("n_gaps"),
        Num.pround((col("sg2") * col("n_gaps") - col("sg") * col("sg")).cast("double") /
          (col("sg") * col("sg")).cast("double"), 6).as("cv2"),
        Num.pround((col("n_ev") * col("n_ev") - col("sc2")).cast("double") /
          (col("n_ev") * col("n_ev")).cast("double"), 6).as("simpson"),
        ((col("sg2") * col("n_gaps") - col("sg") * col("sg")).cast("double") <
          (col("sg") * col("sg")).cast("double") * 0.75).as("is_bot"))
      .orderBy(col("user_id"))
  }

  val q246Sql: String =
    """WITH g AS (
      |  SELECT user_id,
      |    (epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)) // 1000 AS gap
      |  FROM events),
      |m AS (
      |  SELECT user_id, COUNT(*) AS n_gaps,
      |    SUM(CAST(gap AS HUGEINT)) AS sg, SUM(CAST(gap AS HUGEINT) * gap) AS sg2
      |  FROM g WHERE gap IS NOT NULL GROUP BY 1 HAVING COUNT(*) >= 19),
      |tc AS (SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2),
      |dv AS (SELECT user_id, SUM(c) AS n_ev, SUM(c * c) AS sc2 FROM tc GROUP BY 1)
      |SELECT m.user_id, n_gaps,
      |  FLOOR((CAST(sg2 * n_gaps - sg * sg AS DOUBLE) / CAST(sg * sg AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS cv2,
      |  FLOOR((CAST(n_ev * n_ev - sc2 AS DOUBLE) / CAST(n_ev * n_ev AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS simpson,
      |  CAST(sg2 * n_gaps - sg * sg AS DOUBLE) < CAST(sg * sg AS DOUBLE) * 0.75 AS is_bot
      |FROM m JOIN dv ON m.user_id = dv.user_id
      |ORDER BY m.user_id""".stripMargin

  // --------------------------------------------------------------------------
  // q250 — INCREMENTAL SESSIONIZATION: merge a new event batch into an
  // existing sessions table WITHOUT reprocessing history — the lakehouse
  // pattern for daily session jobs at 100 TB, where q137's full recompute
  // is unaffordable. The split point T (80% of the log's time span,
  // integer-exact micros) stands in for "yesterday's watermark": old
  // events ≤ T were already sessionized; the new batch is events > T with
  // NO late data (the same closure assumption the streaming entries pin).
  // Only each AFFECTED user's LAST stored session can interact with new
  // events, so the merge re-runs islands over {that one carried session +
  // the user's new events}; every other stored session passes through
  // untouched.
  //
  // Correctness is proven by construction: the ORACLE sessionizes the
  // FULL log in one pass — the incremental path must reproduce it
  // exactly (hash compare), which is the incremental-algebra equivalence
  // a production job relies on.
  def q250IncrementalSessions(spark: SparkSession, dir: String): DataFrame = {
    val gapUs = 1800000000L // 30 min, q137's rule
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
    val span = ev.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
      .select(expr("lo + (hi - lo) * 8 div 10").as("t_split"))
    val staged = ev.crossJoin(broadcast(span))
    val old = staged.filter(col("us") <= col("t_split"))
    val fresh = staged.filter(col("us") > col("t_split"))

    def islands(rows: DataFrame): DataFrame = {
      // rows: (user_id, us, start_us, end_us, cnt) — weighted islands
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("start_us"))
      rows
        .withColumn("new_sess",
          when(col("us") - lag(col("end_us"), 1).over(w) > gapUs || lag(col("end_us"), 1).over(w).isNull, 1)
            .otherwise(0))
        .withColumn("grp", sum(col("new_sess")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("grp"))
        .agg(min(col("start_us")).as("start_us"), max(col("end_us")).as("end_us"),
          sum(col("cnt")).as("n_events"))
    }

    val oldSessions = islands(old.select(col("user_id"), col("us"),
      col("us").as("start_us"), col("us").as("end_us"), lit(1L).as("cnt")))
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
    val affected = fresh.select(col("user_id")).distinct()
    val untouchedUsers = oldSessions.join(affected, Seq("user_id"), "left_anti")
    val affectedOld = oldSessions.join(affected, Seq("user_id"), "left_semi")
    val wLast = Window.partitionBy(col("user_id")).orderBy(col("start_us").desc)
    val lastSession = affectedOld
      .withColumn("rk", row_number().over(wLast)).filter(col("rk") === 1).drop("rk")
    val earlierSessions = affectedOld
      .withColumn("rk", row_number().over(wLast)).filter(col("rk") > 1).drop("rk")
    val mergedInput =
      lastSession.select(col("user_id"), col("end_us").as("us"),
        col("start_us"), col("end_us"), col("n_events").as("cnt"))
        .unionByName(fresh.select(col("user_id"), col("us"),
          col("us").as("start_us"), col("us").as("end_us"), lit(1L).as("cnt")))
    val merged = islands(mergedInput)
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
    untouchedUsers.unionByName(earlierSessions).unionByName(merged)
      .withColumn("session_idx", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("start_us"))))
      .select(col("user_id"), col("session_idx"),
        col("start_us"), col("end_us"), col("n_events"),
        ((col("end_us") - col("start_us")) / 1000000L).cast("long").as("duration_sec"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** Oracle: FULL-LOG sessionization — the incremental path must equal it. */
  val q250Sql: String =
    """WITH flagged AS (
      |  SELECT user_id, epoch_us(ts) AS us,
      |    CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      |sess AS (
      |  SELECT user_id, us,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us
      |      ROWS UNBOUNDED PRECEDING) AS grp
      |  FROM flagged),
      |agg AS (
      |  SELECT user_id, grp, MIN(us) AS start_us, MAX(us) AS end_us,
      |    COUNT(*) AS n_events
      |  FROM sess GROUP BY 1, 2)
      |SELECT user_id,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY start_us) AS INT)
      |    AS session_idx,
      |  start_us, end_us, CAST(n_events AS BIGINT) AS n_events,
      |  (end_us - start_us) // 1000000 AS duration_sec
      |FROM agg ORDER BY user_id, session_idx""".stripMargin

  // --------------------------------------------------------------------------
  // q254 — SHAPLEY-VALUE CHANNEL ATTRIBUTION: the game-theoretic upgrade
  // over q144's rule-based attribution. Each user's touched channel SET
  // (click/signup/error/view as a 4-bit mask) defines the coalition; the
  // characteristic function v(S) = observed conversion rate of users
  // whose set is exactly S (unobserved coalitions contribute 0 — the
  // standard data-driven MTA formulation). The Shapley value
  //   φ_i = Σ_{S ∌ i} |S|!·(k−|S|−1)!·[v(S∪{i}) − v(S)] / k!
  // runs ENTIRELY on the dense 16-row subset lattice: the corpus
  // collapses to per-mask (n, conversions) in one shuffle, the lattice
  // and weights are literals, and the only floats are the v ratios and
  // the pinned-order φ fold (sorted-subset array reduce, q201's rule).
  //
  // Scale: corpus-size-independent after the first aggregate — the
  // lattice is 2^k rows with k = |channels|, never user-count.
  def q254ShapleyAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val bit = when(col("event_type") === "click", 1)
      .when(col("event_type") === "signup", 2)
      .when(col("event_type") === "error", 4)
      .when(col("event_type") === "view", 8).otherwise(0)
    val perUser = ev.select(col("user_id"), bit.as("b"),
        (col("event_type") === "purchase").cast("int").as("conv"))
      .groupBy(col("user_id"))
      .agg(expr("bit_or(b)").as("mask"), max(col("conv")).as("converted"))
    val byMask = perUser.groupBy(col("mask"))
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("c"))
    // v(S) = MONOTONE CLOSURE max over observed coalitions T ⊆ S of
    // rate(T) (0 if none): raw "v = 0 for unobserved" leaks negative
    // credit to never-touched channels (their marginals hit v = 0
    // supersets); the closure keeps v monotone so marginals are ≥ 0 and
    // untouched channels get EXACTLY zero. One 16×|observed| subset join.
    val lattice = spark.range(16).select(col("id").cast("int").as("s"))
      .join(byMask, expr("(mask & s) = mask"), "left")
      .groupBy(col("s"))
      .agg(coalesce(max(col("c").cast("double") / col("n")), lit(0.0)).as("v"))
    val channels = Seq(("click", 1), ("signup", 2), ("error", 4), ("view", 8))
    val chan = channels.map { case (nm, b) => struct(lit(nm).as("ch"), lit(b).as("bit")) }
    val pairs = spark.range(16).select(col("id").cast("int").as("s"))
      .withColumn("c", explode(array(chan: _*)))
      .select(col("s"), col("c.ch").as("ch"), col("c.bit").as("bit"))
      .filter(expr("(s & bit) = 0"))
      .withColumn("w", // |S|!·(k−|S|−1)! for k = 4
        element_at(array(lit(6), lit(2), lit(2), lit(6)),
          expr("bit_count(s)") + 1))
    val scored = pairs
      .join(lattice.select(col("s").as("s0"), col("v").as("v0")), col("s") === col("s0"))
      .join(lattice.select(col("s").as("s1"), col("v").as("v1")),
        expr("(s | bit) = s1"))
      .withColumn("term", col("w") * (col("v1") - col("v0")))
    scored.groupBy(col("ch"))
      .agg(expr("aggregate(sort_array(collect_list(struct(s, term))), 0.0d, (a, t) -> a + t.term)")
        .as("num"))
      .select(col("ch"), Num.pround(col("num") / 24.0, 6).as("shapley"))
      .orderBy(col("ch"))
  }

  val q254Sql: String =
    """WITH pu AS (
      |  SELECT user_id,
      |    bit_or(CASE event_type WHEN 'click' THEN 1 WHEN 'signup' THEN 2
      |      WHEN 'error' THEN 4 WHEN 'view' THEN 8 ELSE 0 END) AS mask,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      |  FROM events GROUP BY 1),
      |bm AS (SELECT mask, COUNT(*) AS n, SUM(converted) AS c FROM pu GROUP BY 1),
      |lat AS (
      |  SELECT s, COALESCE(MAX(CAST(c AS DOUBLE) / n), 0.0) AS v
      |  FROM (SELECT unnest(range(16)) AS s) g LEFT JOIN bm ON (mask & s) = mask
      |  GROUP BY s),
      |ch AS (SELECT * FROM (VALUES ('click', 1), ('signup', 2), ('error', 4),
      |  ('view', 8)) AS t(ch, bit)),
      |pairs AS (
      |  SELECT g.s, ch.ch, ch.bit,
      |    ([6, 2, 2, 6])[bit_count(g.s) + 1] AS w
      |  FROM (SELECT unnest(range(16)) AS s) g CROSS JOIN ch
      |  WHERE (g.s & ch.bit) = 0),
      |terms AS (
      |  SELECT p.ch, p.s, p.w * (v1.v - v0.v) AS term
      |  FROM pairs p
      |  JOIN lat v0 ON p.s = v0.s
      |  JOIN lat v1 ON (p.s | p.bit) = v1.s)
      |SELECT ch,
      |  FLOOR((list_reduce(list(term ORDER BY s), (a, b) -> a + b) / 24.0) * 1e6 + 0.5) / 1e6 AS shapley
      |FROM terms GROUP BY ch ORDER BY ch""".stripMargin

  // --------------------------------------------------------------------------
  // q264 — MARKOV NEXT-EVENT BASELINE with held-out evaluation: the
  // first model every sequence task needs beaten. Train users (odd ids)
  // fit the bigram transition matrix; for test users (even ids), each
  // transition's prediction is the train-argmax next type given the
  // previous, and the readout is per-previous-type accuracy. Both the
  // matrix and the eval are exact counts on the |types|² grid — the
  // model "fits" in one aggregate, evaluation in one join.
  //
  // Determinism: argmax ties break lexically (rank by count desc, next
  // asc); transitions order by (ts, event_id) — q132's rule.
  def q264MarkovEval(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("user_id"), col("prev"), col("event_type").as("next"))
    val train = trans.filter(col("user_id") % 2 === 1)
      .groupBy(col("prev"), col("next")).agg(count(lit(1)).as("c"))
    val pred = train
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("prev")).orderBy(col("c").desc, col("next"))))
      .filter(col("rk") === 1)
      .select(col("prev"), col("next").as("predicted"))
    trans.filter(col("user_id") % 2 === 0)
      .join(broadcast(pred), Seq("prev"))
      .groupBy(col("prev"), col("predicted"))
      .agg(count(lit(1)).as("n_test"),
        count_if(col("next") === col("predicted")).as("n_correct"))
      .withColumn("accuracy",
        Num.pround(col("n_correct").cast("double") / col("n_test"), 6))
      .orderBy(col("prev"))
  }

  val q264Sql: String =
    """WITH t AS (
      |  SELECT user_id, event_type AS next,
      |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events QUALIFY prev IS NOT NULL),
      |tr AS (
      |  SELECT prev, next, COUNT(*) AS c FROM t WHERE user_id % 2 = 1 GROUP BY 1, 2),
      |p AS (
      |  SELECT prev, next AS predicted FROM (
      |    SELECT prev, next, ROW_NUMBER() OVER (PARTITION BY prev
      |      ORDER BY c DESC, next) AS rk FROM tr) WHERE rk = 1)
      |SELECT t.prev, predicted, COUNT(*) AS n_test,
      |  CAST(COUNT(*) FILTER (WHERE next = predicted) AS BIGINT) AS n_correct,
      |  FLOOR((CAST(COUNT(*) FILTER (WHERE next = predicted) AS DOUBLE) / COUNT(*)) * 1e6 + 0.5) / 1e6
      |    AS accuracy
      |FROM t JOIN p ON t.prev = p.prev
      |WHERE user_id % 2 = 0
      |GROUP BY 1, 2 ORDER BY t.prev""".stripMargin

  // --------------------------------------------------------------------------
  // q278 — WEEKDAY×HOUR ACTIVITY HEATMAP with per-weekday peak: the
  // capacity-planning grid behind batch-window scheduling — one hash
  // aggregate to the 7×24 UTC grid, per-cell share of the weekday's
  // traffic (exact integer ratio), and each weekday's peak hour (max
  // count, earliest-hour tie-break) flagged in place. Weekday indexing
  // uses q131's epoch arithmetic (days-since-Monday-1970-01-05 mod 7) —
  // bit-identical in both engines, no locale week rules.
  def q278ActivityHeatmap(spark: SparkSession, dir: String): DataFrame = {
    val grid = Tables.events(spark, dir)
      .select(
        expr("cast(pmod(datediff(to_date(ts), date'1970-01-05'), 7) as int)").as("dow"),
        hour(col("ts")).as("hr"))
      .groupBy(col("dow"), col("hr")).agg(count(lit(1)).as("n"))
    val wDow = Window.partitionBy(col("dow"))
    grid
      .withColumn("dow_total", sum(col("n")).over(wDow))
      .withColumn("mx", max(struct(col("n"), (-col("hr")).cast("long").as("nh"))).over(wDow))
      .select(col("dow"), col("hr"), col("n"),
        Num.pround(col("n").cast("double") / col("dow_total"), 6).as("share_of_dow"),
        (col("n") === col("mx.n") && col("hr") === -col("mx.nh")).as("is_peak"))
      .orderBy(col("dow"), col("hr"))
  }

  val q278Sql: String =
    """WITH g AS (
      |  SELECT CAST((DATE_DIFF('day', DATE '1970-01-05', CAST(ts AS DATE)) % 7 + 7) % 7 AS INT) AS dow,
      |    CAST(EXTRACT(hour FROM ts) AS INT) AS hr, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT dow, hr, n,
      |    SUM(n) OVER (PARTITION BY dow) AS dow_total,
      |    MAX(n) OVER (PARTITION BY dow) AS mx_n
      |  FROM g),
      |p AS (
      |  SELECT dow, MIN(hr) AS peak_hr FROM w WHERE n = mx_n GROUP BY dow)
      |SELECT w.dow, hr, n,
      |  FLOOR((CAST(n AS DOUBLE) / dow_total) * 1e6 + 0.5) / 1e6 AS share_of_dow,
      |  (n = mx_n AND hr = peak_hr) AS is_peak
      |FROM w JOIN p ON w.dow = p.dow
      |ORDER BY w.dow, hr""".stripMargin

  // ═════════════════ formerly Round8Ops (consolidated round 10) ═════════════════

  // --------------------------------------------------------------------------
  // q282 — SEQUENCE-PATTERN MATCH WITH NEGATION (MATCH_RECOGNIZE-lite):
  // per user, count purchases preceded by a view within 30 minutes with
  // NO error event between that view and the purchase — the "A then B
  // within T, unless C intervenes" shape funnels (q165) and transition
  // counts (q132) cannot express, because the negation needs the
  // BETWEEN-events condition.
  //
  // Scale: two running-max windows partitioned by user_id over the same
  // (ts, event_id) order — one shuffle, row-local predicate after.
  // Determinism: all comparisons on integer epoch-micros; same-instant
  // view/error collisions resolve identically in both engines (strict <).
  def q282PatternFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev
      .withColumn("last_view_us",
        max(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("last_err_us",
        max(when(col("event_type") === "error", col("us"))).over(w))
      .filter(col("event_type") === "purchase" &&
        col("last_view_us").isNotNull &&
        col("last_view_us") >= col("us") - lit(1800000000L) &&
        (col("last_err_us").isNull || col("last_err_us") < col("last_view_us")))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_matches"))
      .orderBy(col("user_id"))
  }

  val q282Sql: String =
    """WITH e AS (
      |  SELECT user_id, ts, event_id, event_type, epoch_us(ts) AS us
      |  FROM events),
      |m AS (
      |  SELECT user_id, event_type, us,
      |    MAX(CASE WHEN event_type = 'view' THEN us END) OVER w AS last_view_us,
      |    MAX(CASE WHEN event_type = 'error' THEN us END) OVER w AS last_err_us
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT user_id, COUNT(*) AS n_matches
      |FROM m
      |WHERE event_type = 'purchase' AND last_view_us IS NOT NULL
      |  AND last_view_us >= us - 1800000000
      |  AND (last_err_us IS NULL OR last_err_us < last_view_us)
      |GROUP BY user_id ORDER BY user_id""".stripMargin


  // ═════════════════ formerly Round8cOps (consolidated round 10) ═════════════════

  // --------------------------------------------------------------------------
  // q294 — RATE-LIMIT AUDIT: per user, count events that exceed a
  // 2-events-per-trailing-24h quota (RANGE frame on event time) — the
  // throttling/abuse readout an API gateway logs, and the windowed-rate
  // primitive q246's bot score approximates with fixed buckets. Emits
  // per-user violation counts and the worst trailing-window burst. (The
  // quota matches the synthetic feed's density — the operator is the
  // RANGE-frame shape, the constant is config.)
  //
  // Scale: ONE range-frame window partitioned by user_id (a single
  // shuffle); the frame is time-bounded so state per row is the 60-second
  // slice, independent of history length. All cells exact integers.
  def q294RateLimitAudit(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-86400000000L, 0L)
    Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"))
      .withColumn("in_window", count(lit(1)).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        count_if(col("in_window") > 2).as("n_violations"),
        max(col("in_window")).as("worst_burst"))
      .filter(col("n_violations") > 0)
      .orderBy(col("user_id"))
  }

  val q294Sql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us FROM events),
      |m AS (
      |  SELECT user_id,
      |    COUNT(*) OVER (PARTITION BY user_id ORDER BY us
      |      RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) AS in_window
      |  FROM e)
      |SELECT user_id, COUNT(*) AS n_events,
      |  CAST(COUNT(*) FILTER (in_window > 2) AS BIGINT) AS n_violations,
      |  CAST(MAX(in_window) AS BIGINT) AS worst_burst
      |FROM m GROUP BY user_id HAVING COUNT(*) FILTER (in_window > 2) > 0
      |ORDER BY user_id""".stripMargin


  val catalog: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q237_kaplan_meier", q237KaplanMeier _, Some(q237Sql)),
    ("q246_bot_score", q246BotScore _, Some(q246Sql)),
    ("q250_incremental_sessions", q250IncrementalSessions _, Some(q250Sql)),
    ("q254_shapley_attribution", q254ShapleyAttribution _, Some(q254Sql)),
    ("q264_markov_eval", q264MarkovEval _, Some(q264Sql)),
    ("q278_activity_heatmap", q278ActivityHeatmap _, Some(q278Sql)),
    ("q228_lateness_audit", q228LatenessAudit _, Some(q228Sql)),
    ("q131_cohort_retention", q131CohortRetention _, Some(q131Sql)),
    ("q132_event_transitions", q132EventTransitions _, Some(q132Sql)),
    ("q137_sessionize", q137Sessionize _, Some(q137Sql)),
    ("q138_ab_test", q138AbTest _, Some(q138Sql)),
    ("q139_rolling_active", q139RollingActive _, Some(q139Sql)),
    ("q140_interval_overlap", q140IntervalOverlap _, Some(q140Sql)),
    ("q144_attribution", q144Attribution _, Some(q144Sql)),
    ("q154_event_paths", q154EventPaths _, Some(q154Sql)),
    ("q162_seasonality", q162Seasonality _, Some(q162Sql)),
    ("q165_session_funnel", q165SessionFunnel _, Some(q165Sql)),
    // formerly Round8Ops / Round8cOps
    ("q282_pattern_funnel", q282PatternFunnel _, Some(q282Sql)),
    ("q294_rate_limit_audit", q294RateLimitAudit _, Some(q294Sql)))
}
