package graft

import org.scalatest.funsuite.AnyFunSuite

/** Hand-built fixtures pinning the SEMANTICS of the event-analytics
  * queries — the DuckDB oracle proves engine parity on the shared
  * testdata, these pin intent on crafted edge cases: the funnel's stage
  * boundaries (inclusive 24 h step bound, order sensitivity, missing
  * stages) and the as-of tolerance's no-resurrection rule (a too-old
  * latest match nulls out, it never falls back to an even older one).
  */
class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** Stage one crafted event log into a temp sf dir and run a declared
    * events query over it.
    */
  private def run(name: String,
                  events: Seq[(Long, java.sql.Timestamp, Long, String)]) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"graft-ev-$name").toString
    events.map { case (id, t, u, ty) => (id, t, u, ty, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    SparkEntry.queries(name)(spark, dir)
  }

  test("funnel stages: order-sensitive, 24h bound inclusive, missing stages cap") {
    val events = Seq[(Long, java.sql.Timestamp, Long, String)](
      // user 1: full funnel inside the bounds -> stage 3
      (1L, ts("2024-01-01 00:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 12:00:00"), 1L, "click"),
      (3L, ts("2024-01-02 00:00:00"), 1L, "purchase"),
      // user 2: purchase 24h + 1s after the click -> stage 2
      (4L, ts("2024-01-01 00:00:00"), 2L, "view"),
      (5L, ts("2024-01-01 01:00:00"), 2L, "click"),
      (6L, ts("2024-01-02 01:00:01"), 2L, "purchase"),
      // user 3: view only -> stage 1
      (7L, ts("2024-01-01 00:00:00"), 3L, "view"),
      // user 4: click BEFORE the first view (order-sensitive) -> stage 1
      (8L, ts("2024-01-01 06:00:00"), 4L, "click"),
      (9L, ts("2024-01-01 12:00:00"), 4L, "view"),
      // user 5: no view at all -> stage 0, whatever else happened
      (10L, ts("2024-01-01 00:00:00"), 5L, "click"),
      (11L, ts("2024-01-01 01:00:00"), 5L, "purchase"),
      // user 6: click exactly 24h after the view (inclusive) -> stage 2
      (12L, ts("2024-01-01 00:00:00"), 6L, "view"),
      (13L, ts("2024-01-02 00:00:00"), 6L, "click"))
    val got = run("ev_funnel", events)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(3 -> 1L, 2 -> 2L, 1 -> 2L, 0 -> 1L))
  }

  test("tolerance as-of: inclusive bound, no resurrection of older matches") {
    val events = Seq[(Long, java.sql.Timestamp, Long, String)](
      // user 1: click exactly 1800s before the purchase -> matches
      (100L, ts("2024-01-01 10:00:00"), 1L, "click"),
      (101L, ts("2024-01-01 10:30:00"), 1L, "purchase"),
      // user 2: latest click 1801s old -> null; the 09:00 click is within
      // nothing (older still) and must NOT be picked instead
      (199L, ts("2024-01-01 09:00:00"), 2L, "click"),
      (200L, ts("2024-01-01 10:00:00"), 2L, "click"),
      (201L, ts("2024-01-01 10:30:01"), 2L, "purchase"),
      // user 3: purchase with no click at all -> null
      (301L, ts("2024-01-01 10:00:00"), 3L, "purchase"),
      // user 4: two in-tolerance clicks -> the LATEST one wins
      (400L, ts("2024-01-01 09:50:00"), 4L, "click"),
      (401L, ts("2024-01-01 10:00:00"), 4L, "click"),
      (402L, ts("2024-01-01 10:15:00"), 4L, "purchase"))
    val got = run("ev_asof_tolerance", events)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toSet
    assert(got == Set(
      (1L, 101L, Some(100L)),
      (2L, 201L, None),
      (3L, 301L, None),
      (4L, 402L, Some(401L))))
  }

  test("retention cells: cohort = first-event week, offsets count distinct active weeks") {
    val w0 = ts("2024-01-04 00:00:00") // all within one epoch-week bucket
    def plusWeeks(n: Int) = new java.sql.Timestamp(w0.getTime + n * 7L * 86400 * 1000)
    val events = Seq[(Long, java.sql.Timestamp, Long, String)](
      // user 1: cohort w0, active weeks 0, 1, 3; two events in week 1
      // must count ONCE (distinct weeks, not events)
      (1L, plusWeeks(0), 1L, "view"),
      (2L, plusWeeks(1), 1L, "click"),
      (3L, plusWeeks(1), 1L, "view"),
      (4L, plusWeeks(3), 1L, "purchase"),
      // user 2: cohort w0+1, active weeks 0 and 2 relative to ITS cohort
      (5L, plusWeeks(1), 2L, "view"),
      (6L, plusWeeks(3), 2L, "view"),
      // user 3: single event -> one (cohort, 0) cell
      (7L, plusWeeks(0), 3L, "view"))
    val got = run("ev_retention", events)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val w0wk = w0.getTime / 1000 / 604800
    assert(got == Map(
      (w0wk, 0L) -> 2L,      // users 1 and 3 in cohort w0, week 0
      (w0wk, 1L) -> 1L,      // user 1 active in offset 1 (once, not twice)
      (w0wk, 3L) -> 1L,      // user 1 active in offset 3
      (w0wk + 1, 0L) -> 1L,  // user 2's own cohort, week 0
      (w0wk + 1, 2L) -> 1L)) // user 2 active two weeks later
  }

  test("sessionize: >=30min gap starts a session, <30min keeps it, ties are deterministic") {
    val events = Seq[(Long, java.sql.Timestamp, Long, String)](
      // user 1: three events 29:59 apart -> ONE session of 3
      (1L, ts("2024-01-01 00:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 00:29:59"), 1L, "click"),
      (3L, ts("2024-01-01 00:59:58"), 1L, "view"),
      // user 2: gap of EXACTLY 1800s -> new session (matches the
      // half-open streaming session_window; [t, t+30min) excludes t+30min)
      (4L, ts("2024-01-01 00:00:00"), 2L, "view"),
      (5L, ts("2024-01-01 00:30:00"), 2L, "view"),
      // user 3: single event -> one session, zero duration
      (6L, ts("2024-01-01 12:00:00"), 3L, "purchase"),
      // user 4: identical timestamps -> one session, event_id tie-break
      // keeps the numbering deterministic
      (7L, ts("2024-01-01 08:00:00"), 4L, "view"),
      (8L, ts("2024-01-01 08:00:00"), 4L, "click"))
    val got = run("ev_sessions", events)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(5)))
      .toMap
    assert(got == Map(
      (1L, 1L) -> (3L, 3598L),
      (2L, 1L) -> (1L, 0L), (2L, 2L) -> (1L, 0L),
      (3L, 1L) -> (1L, 0L),
      (4L, 1L) -> (2L, 0L)))
  }

  test("transitions count consecutive same-user pairs only, in timeline order") {
    val events = Seq[(Long, java.sql.Timestamp, Long, String)](
      // user 1: view -> click -> view
      (1L, ts("2024-01-01 00:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 00:10:00"), 1L, "click"),
      (3L, ts("2024-01-01 00:20:00"), 1L, "view"),
      // user 2: view -> view; no cross-user pair with user 1's tail
      (4L, ts("2024-01-01 00:00:00"), 2L, "view"),
      (5L, ts("2024-01-01 00:05:00"), 2L, "view"),
      // user 3: single event contributes no transition
      (6L, ts("2024-01-01 00:00:00"), 3L, "purchase"))
    val got = run("ev_transitions", events)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("view", "click") -> 1L,
      ("click", "view") -> 1L,
      ("view", "view") -> 1L))
  }

  test("session paths: per-session ordered journeys, counted and top-k'd with a total tiebreak") {
    val events = Seq[(Long, java.sql.Timestamp, Long, String)](
      // user 1, one session: view > click > purchase
      (1L, ts("2024-01-01 00:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 00:10:00"), 1L, "click"),
      (3L, ts("2024-01-01 00:20:00"), 1L, "purchase"),
      // user 1, SECOND session after a 31-min gap: view > click > purchase again
      (4L, ts("2024-01-01 01:00:00"), 1L, "view"),
      (5L, ts("2024-01-01 01:01:00"), 1L, "click"),
      (6L, ts("2024-01-01 01:02:00"), 1L, "purchase"),
      // user 2, one session: view > view
      (7L, ts("2024-01-01 00:00:00"), 2L, "view"),
      (8L, ts("2024-01-01 00:05:00"), 2L, "view"),
      // user 3: identical timestamps -> event_id orders the path
      (9L, ts("2024-01-01 02:00:00"), 3L, "click"),
      (10L, ts("2024-01-01 02:00:00"), 3L, "view"))
    val got = run("ev_session_paths", events)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "view>click>purchase" -> 2L,
      "view>view" -> 1L,
      "click>view" -> 1L), s"got $got")
  }

  test("split leakage flags exactly the normalized-dup groups that straddle splits") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-leak").toString
    // pairs 10/11 and 20/21 normalize to identical text (case/punct only);
    // 30 is unique — its leaked flag must be 0 regardless of split
    Seq(
      (10L, "Hello World Again.", "en", "web", 18L),
      (11L, "hello world again", "en", "web", 17L),
      (20L, "Spark At Scale!", "en", "web", 15L),
      (21L, "spark at scale", "en", "web", 14L),
      (30L, "completely unique text", "en", "web", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("tp_split_leakage")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    // the unique doc never leaks
    assert(out(30L)._2 == 0)
    // each normalized-dup pair leaks iff its two members landed in
    // different splits (split assignment itself is pinned by the
    // tp_hash_split oracle), and both members carry the same flag
    Seq(10L -> 11L, 20L -> 21L).foreach { case (a, b) =>
      val expected = if (out(a)._1 != out(b)._1) 1 else 0
      assert(out(a)._2 == expected && out(b)._2 == expected,
        s"docs $a/$b: splits ${out(a)._1}/${out(b)._1}, " +
          s"flags ${out(a)._2}/${out(b)._2}")
    }
  }

  test("active users: trailing windows include exactly the last 7/30 days, multi-visits dedup") {
    val events = Seq[(Long, java.sql.Timestamp, Long, String)](
      // user 1 active on day 1 (twice — must count once)
      (1L, ts("2024-01-01 08:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 20:00:00"), 1L, "click"),
      // user 2 active on days 1 and 8 (day 8 is just past day 1's WAU)
      (3L, ts("2024-01-01 09:00:00"), 2L, "view"),
      (4L, ts("2024-01-08 09:00:00"), 2L, "view"),
      // user 3 active on day 7 only (inside day 8's WAU? window is
      // [day-6, day] -> day 7 IS inside day 8's; day 1's window ends day 1)
      (5L, ts("2024-01-07 12:00:00"), 3L, "view"))
    val got = run("ev_active_users", events)
      .collect().map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // only days with activity appear
    assert(got.keySet == Set("2024-01-01", "2024-01-07", "2024-01-08"))
    assert(got("2024-01-01") == ((2L, 2L, 2L))) // users 1,2; dup visits dedup
    assert(got("2024-01-07") == ((1L, 3L, 3L))) // day 1 within 7-day window
    // day 8: WAU = [Jan 2..8] -> users 2 (Jan 8) and 3 (Jan 7); user 1's
    // Jan 1 visit aged out of the 7-day window but stays in the 30-day
    assert(got("2024-01-08") == ((1L, 2L, 3L)))
  }
}
