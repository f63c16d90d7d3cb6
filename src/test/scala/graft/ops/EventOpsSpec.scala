package graft.ops

import java.nio.file.Files

import graft.SparkSpec

/** Handcrafted event log for the behavioral-analytics operators: known
  * cohort/active-week structure for the retention matrix, and a planted
  * equal-timestamp pair to pin the event_id tie-break in the transition
  * chain. `ts` is written as nanos-since-epoch longs — the same physical
  * shape `Tables.events` reads from the driver-generated parquet.
  */
class EventOpsSpec extends SparkSpec {

  // Mon 2024-01-01 00:00:00 UTC
  private val w0 = 1704067200L * 1000000000L
  private val day = 86400L * 1000000000L

  private def ev(id: Long, tsNanos: Long, user: Long, typ: String): (Long, Long, Long, String, Double, String) =
    (id, tsNanos, user, typ, 1.0, "{}")

  private lazy val dir: String = {
    import spark.implicits._
    val rows = Seq(
      // user 1: active weeks 0, 1, 3 (cohort = week 0)
      ev(1, w0, 1, "view"),
      ev(2, w0, 1, "click"), // same ts as id=1: id order decides the chain
      ev(3, w0 + 7 * day, 1, "purchase"),
      ev(4, w0 + 22 * day, 1, "view"),
      // user 2: two events in week 0 only (collect_set dedups the week)
      ev(5, w0 + 1 * day, 2, "view"),
      ev(6, w0 + 3 * day, 2, "view"),
      // user 3: first seen week 1, also active week 2 (cohort = week 1)
      ev(7, w0 + 9 * day, 3, "signup"),
      ev(8, w0 + 15 * day, 3, "purchase"))
    val d = Files.createTempDirectory("graft_events").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  // week index of w0 under the q131 epoch (Mon 1970-01-05)
  private val wk0 = java.time.temporal.ChronoUnit.DAYS.between(
    java.time.LocalDate.of(1970, 1, 5), java.time.LocalDate.of(2024, 1, 1)) / 7

  test("q131 cohort retention: cohorts, offsets, sizes, and rates") {
    val got = EventOps.q131CohortRetention(spark, dir).collect()
      .map(r => (r.getAs[Long]("cohort"), r.getAs[Long]("week_offset")) ->
        ((r.getAs[Long]("active_users"), r.getAs[Long]("cohort_size"),
          r.getAs[Double]("retention_rate")))).toMap
    assert(got.size === 5)
    // cohort week0: users 1 and 2; only user 1 returns (weeks 1 and 3)
    assert(got((wk0, 0L)) === ((2L, 2L, 1.0)))
    assert(got((wk0, 1L)) === ((1L, 2L, 0.5)))
    assert(got((wk0, 3L)) === ((1L, 2L, 0.5)))
    // cohort week1: user 3 alone, retained in its week 1 (= offset 1)
    assert(got((wk0 + 1, 0L)) === ((1L, 1L, 1.0)))
    assert(got((wk0 + 1, 1L)) === ((1L, 1L, 1.0)))
  }

  test("q132 transitions: equal-ts events chain by event_id; probabilities normalize per origin") {
    val got = EventOps.q132EventTransitions(spark, dir).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        ((r.getAs[Long]("n_trans"), r.getAs[Double]("p")))).toMap
    // user1 chain: view →(tie: id 1 before 2) click → purchase → view
    // user2 chain: view → view;  user3 chain: signup → purchase
    assert(got(("view", "click")) === ((1L, 0.5)))   // view fans out 1/2, 1/2
    assert(got(("view", "view")) === ((1L, 0.5)))
    assert(got(("click", "purchase")) === ((1L, 1.0)))
    assert(got(("purchase", "view")) === ((1L, 1.0)))
    assert(got(("signup", "purchase")) === ((1L, 1.0)))
    assert(got.size === 5)
  }

  test("q137 sessionize splits on the 30-minute gap and measures durations exactly") {
    import spark.implicits._
    val min = 60L * 1000000000L
    // user 7: events at 0, +10min (same session), +50min (gap 40min > 30 → new)
    val rows = Seq(
      ev(1, w0, 7, "view"), ev(2, w0 + 10 * min, 7, "click"),
      ev(3, w0 + 50 * min, 7, "view"),
      // user 8: single event → one session of duration 0
      ev(4, w0 + 5 * min, 8, "view"))
    val d = Files.createTempDirectory("graft_sess").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val got = EventOps.q137Sessionize(spark, d).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_idx")) ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("duration_sec")))).toMap
    assert(got === Map(
      (7L, 1L) -> ((2L, 600L)), (7L, 2L) -> ((1L, 0L)), (8L, 1L) -> ((1L, 0L))))
  }

  test("q139 rolling-active: trailing windows carry users forward, clipped at the last day") {
    import spark.implicits._
    // user 1 active on days 0 and 3, user 2 on day 3 only
    val rows = Seq(
      ev(1, w0, 1, "view"), ev(2, w0 + 3 * day, 1, "view"),
      ev(3, w0 + 3 * day, 2, "view"))
    val d = Files.createTempDirectory("graft_roll").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val got = EventOps.q139RollingActive(spark, d).collect()
      .map(r => r.getAs[String]("date_s") ->
        ((r.getAs[Long]("dau"), r.getAs[Long]("wau")))).toMap
    assert(got === Map(
      "2024-01-01" -> ((1L, 1L)), "2024-01-02" -> ((0L, 1L)),
      "2024-01-03" -> ((0L, 1L)), "2024-01-04" -> ((2L, 2L))))
  }

  test("q140 interval overlap: bin-spanning pairs count once, zero-length sessions never") {
    import spark.implicits._
    val min = 60L * 1000000000L
    val rows = Seq(
      // session [10:00, 10:20] — inside window 0 → 1200s
      ev(1, w0 + 600 * min, 1, "view"), ev(2, w0 + 620 * min, 1, "view"),
      // session [23:50, 00:10] — CROSSES the day-bin edge but must count once
      ev(3, w0 + 1430 * min, 2, "view"), ev(4, w0 + 1450 * min, 2, "view"),
      // single-event session: zero length, strict overlap excludes it
      ev(5, w0 + 720 * min, 3, "view"))
    val d = Files.createTempDirectory("graft_iv").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val got = EventOps.q140IntervalOverlap(spark, d).collect()
      .map(r => r.getAs[Long]("w_id") ->
        ((r.getAs[Long]("n_sessions"), r.getAs[Long]("total_overlap_sec")))).toMap
    // window 0 = [day0 00:00, day0+36h): both real sessions fall inside
    assert(got(0L) === ((2L, 2400L)))
    // window 1 = [33h, 69h): only the bin-crossing session's tail? no —
    // [23:50, 24:10] ends before 33h, so window 1 sees nothing
    assert(!got.contains(1L))
  }

  test("q144 attribution: 7-day expiry, same-ts id ordering, organic fallback") {
    import spark.implicits._
    def evp(id: Long, ts: Long, u: Long, typ: String, v: Double, k: Int) =
      (id, ts, u, typ, v, s"""{"k": $k}""")
    val rows = Seq(
      // u1: view(ch2) then purchase next day → attributed to ch2
      evp(1, w0, 1, "view", 0.0, 7), evp(2, w0 + day, 1, "purchase", 10.0, 0),
      // u2: click(ch3) then purchase 8 days later → window expired → organic
      evp(3, w0, 2, "click", 0.0, 3), evp(4, w0 + 8 * day, 2, "purchase", 20.0, 0),
      // u3: purchase with no touch at all → organic
      evp(5, w0, 3, "purchase", 5.0, 0),
      // u4: touch and purchase at the SAME ts — touch has the lower id, so
      // the ordered window sees it first → attributed to ch0
      evp(6, w0, 4, "view", 0.0, 0), evp(7, w0, 4, "purchase", 8.0, 0))
    val d = Files.createTempDirectory("graft_attr").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val got = EventOps.q144Attribution(spark, d).collect()
      .map(r => r.getAs[String]("channel") ->
        ((r.getAs[Long]("n_conversions"), r.getAs[Double]("revenue")))).toMap
    assert(got === Map(
      "ch2" -> ((1L, 10.0)), "ch0" -> ((1L, 8.0)), "organic" -> ((2L, 25.0))))
  }

  test("q165 funnel: order-enforced steps over handcrafted sessions") {
    import spark.implicits._
    val min = 60L * 1000000000L
    // 4 single-session users: A full funnel; B view only; C click with NO
    // prior view (must not count as step 2); D view→purchase, no click
    val rows = Seq(
      ev(1, w0, 1, "view"), ev(2, w0 + min, 1, "click"), ev(3, w0 + 2 * min, 1, "purchase"),
      ev(4, w0, 2, "view"),
      ev(5, w0, 3, "click"), ev(6, w0 + min, 3, "purchase"),
      ev(7, w0, 4, "view"), ev(8, w0 + min, 4, "purchase"))
    val d = Files.createTempDirectory("graft_funnel").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val got = EventOps.q165SessionFunnel(spark, d).collect()
      .map(r => r.getAs[Int]("step") ->
        ((r.getAs[Long]("n_reached"), r.getAs[Double]("step_rate"),
          r.getAs[Double]("overall_rate")))).toMap
    assert(got(1) === ((3L, 0.75, 0.75)))      // A, B, D of 4 sessions
    assert(got(2) === ((1L, 0.333333, 0.25)))  // only A clicked after viewing
    assert(got(3) === ((1L, 1.0, 0.25)))       // A purchased after the click
  }

  test("q138 z-statistic matches a sequential reference on the real sf0.001 log") {
    val sfDir = "/root/testdata/sf0.001"
    val events = graft.Tables.events(spark, sfDir)
      .select("user_id", "event_type", "value").collect()
    def variant(u: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      if (h.charAt(0) <= '7') "A" else "B"
    }
    val conv = events.groupBy(_.getAs[Long]("user_id")).toSeq.map { case (u, es) =>
      variant(u) -> es.exists(e =>
        e.getAs[String]("event_type") == "purchase" && e.getAs[Double]("value") >= 150.0)
    }
    val (na, xa) = (conv.count(_._1 == "A"), conv.count(c => c._1 == "A" && c._2))
    val (nb, xb) = (conv.count(_._1 == "B"), conv.count(c => c._1 == "B" && c._2))
    val (pa, pb) = (xa.toDouble / na, xb.toDouble / nb)
    val pp = (xa + xb).toDouble / (na + nb)
    val z = (pa - pb) / math.sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb))
    val r = EventOps.q138AbTest(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_a") === na.toLong && r.getAs[Long]("x_a") === xa.toLong)
    assert(r.getAs[Long]("n_b") === nb.toLong && r.getAs[Long]("x_b") === xb.toLong)
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-5)
    assert(r.getAs[Boolean]("significant") === (math.abs(z) > 1.96))
  }
}
