package graft.ml

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.sum

/** Semantics + plan-shape tests for the event-stream relational operators.
  * Values are hand-computed on a tiny fixture; the sf-scale equivalence is
  * covered by the DuckDB oracle rows (evt_sessionize / evt_asof /
  * evt_range_join).
  */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // (event_id, ts, user_id, event_type, value)
  private def fixture: DataFrame = Seq(
    (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
    (2L, ts("2024-01-01 10:10:00"), 1L, "purchase", 50.0),
    (3L, ts("2024-01-01 10:10:00"), 1L, "click", 2.0), // same-second as purchase
    (4L, ts("2024-01-01 11:30:00"), 1L, "click", 3.0), // > 30 min gap: session 2
    (5L, ts("2024-01-01 10:05:00"), 2L, "click", 4.0), // user 2: never purchased
    (6L, ts("2024-01-01 12:00:00"), 2L, "purchase", 150.0),
    (7L, ts("2024-01-01 12:59:59"), 2L, "view", 5.0), // inside u2's big window
    (8L, ts("2024-01-01 13:00:00"), 2L, "view", 6.0)  // exactly at hi: excluded
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  test("sessionize: gap starts a new session, aggregates per session") {
    val out = Events.sessionize(fixture, gapSec = 1800L)
      .orderBy("user_id", "session_idx")
      .collect()
    val rows = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getDouble(5)))
    assert(rows.toSeq == Seq(
      (1L, 1L, 3L, 53.0), // events 1,2,3
      (1L, 2L, 1L, 3.0),  // event 4 after the 80-min gap
      (2L, 1L, 1L, 4.0),  // event 5
      (2L, 2L, 1L, 150.0), // event 6 (59:59 to event 7 exceeds the gap)
      (2L, 3L, 2L, 11.0)  // events 7,8 (1-second gap)
    ))
    val s11 = out.find(r => r.getLong(0) == 1L && r.getLong(1) == 1L).get
    assert(s11.getTimestamp(2) == ts("2024-01-01 10:00:00"))
    assert(s11.getTimestamp(3) == ts("2024-01-01 10:10:00"))
  }

  test("typeTransitions: per-user ordered pairs, row-normalized probabilities") {
    // user 1 timeline: click→purchase→click→click; user 2: click→purchase→view→view
    val out = Events.typeTransitions(fixture)
      .orderBy("from_type", "to_type")
      .select("from_type", "to_type", "n", "p")
      .as[(String, String, Long, Double)].collect().toSeq
    // u1 order (ts, id): click,purchase,click,click → c→p, p→c, c→c
    // u2: click,purchase,view,view → c→p, p→v, v→v
    assert(out === Seq(
      ("click", "click", 1L, 0.333333),
      ("click", "purchase", 2L, 0.666667),
      ("purchase", "click", 1L, 0.5),
      ("purchase", "view", 1L, 0.5),
      ("view", "view", 1L, 1.0)))
  }

  test("attributionLinear: purchase value splits equally across window clicks") {
    // user 1's purchase (50.0) has two in-window clicks (events 1, 3) →
    // 25.0 credit each; user 2's purchase (150.0) has no click within
    // 30 min (event 5 is 115 min before) → no credited rows for user 2
    val out = Events.attributionLinear(fixture, winSec = 1800L)
      .orderBy("click_id")
      .select("click_id", "user_id", "n_purchases", "credited_value")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq((1L, 1L, 1L, 25.0), (3L, 1L, 1L, 25.0)))
  }

  test("attributionLinear: total credited value equals attributed purchase mass") {
    // widen the window so user 2's click catches its purchase too; the
    // invariant of linear attribution: Σ credit = Σ attributed purchases
    val out = Events.attributionLinear(fixture, winSec = 7200L)
    val total = out.agg(sum("credited_value")).as[Double].head()
    assert(math.abs(total - (50.0 + 150.0)) < 1e-6)
  }

  test("sessionize: window + final aggregation share one shuffle") {
    val p = Events.sessionize(fixture).queryExecution.executedPlan.toString
    // HashPartitioning(user_id) must satisfy groupBy(user_id, session_idx):
    // exactly one exchange in the whole plan
    assert("Exchange".r.findAllIn(p).size == 1,
      s"expected a single shuffle, plan:\n$p")
  }

  test("sessionizeSkew: identical to sessionize, incl. boundary merges") {
    // bucketSec=3600 puts a boundary at 13:00:00 — u2's 12:59:59→13:00:00
    // 1-second pair is split locally and must be re-merged
    val plain = Events.sessionize(fixture, gapSec = 1800L)
      .orderBy("user_id", "session_idx").collect().toSeq
    val skew = Events.sessionizeSkew(fixture, gapSec = 1800L, bucketSec = 3600L)
      .orderBy("user_id", "session_idx").collect().toSeq
    assert(skew == plain)
  }

  test("sessionizeSkew: many forced splits still merge back exactly") {
    // bucket barely above the gap: nearly every session straddles
    // boundaries, exercising multi-bucket chain merges
    val plain = Events.sessionize(fixture, gapSec = 1800L)
      .orderBy("user_id", "session_idx").collect().toSeq
    val skew = Events.sessionizeSkew(fixture, gapSec = 1800L, bucketSec = 1801L)
      .orderBy("user_id", "session_idx").collect().toSeq
    assert(skew == plain)
  }

  test("sessionizeSkew: two exchanges — fact on (user,bucket), sessions on user") {
    val p = Events.sessionizeSkew(fixture).queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size == 2,
      s"expected exactly two shuffles, plan:\n$p")
    assert(p.contains("bucket"), s"fact shuffle must key on the time bucket:\n$p")
  }

  test("asof: clicks see the latest prior-or-equal purchase, else null") {
    val out = Events.asofPurchase(fixture)
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(out.toSeq == Seq(
      (1L, None),        // before any purchase
      (3L, Some(50.0)),  // equal-ts purchase IS visible
      (4L, Some(50.0)),  // later click still sees the 10:10 purchase
      (5L, None)         // user 2 purchase is later
    ))
  }

  test("asof tolerance: stale matches null out, fresh carry staleness") {
    // tolerance 3600 s: click 3 (same second) staleness 0, click 4 is
    // 4800 s after the 10:10 purchase → nulled; clicks 1/5 unmatched
    val out = Events.asofPurchaseTolerance(fixture, toleranceSec = 3600L)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(out.toSeq == Seq(
      (1L, None, None),
      (3L, Some(50.0), Some(0L)),
      (4L, None, None), // a match exists but is 4800 s stale
      (5L, None, None)
    ))
    // tightened tolerance nulls the equal-ts match's sibling too
    val wide = Events.asofPurchaseTolerance(fixture, toleranceSec = 5000L)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(wide.toSeq == Seq(
      (1L, None), (3L, Some(0L)), (4L, Some(4800L)), (5L, None)))
  }

  test("asof tolerance: still a joinless windowed scan") {
    val p = Events.asofPurchaseTolerance(fixture)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"tolerated asof must not compile to a join:\n$p")
  }

  test("asof: plan is a windowed scan — no join operator at all") {
    val p = Events.asofPurchase(fixture).queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"asof must not compile to a join:\n$p")
  }

  test("range join: bucketed equi-join counts exact containment") {
    val out = Events.rangeJoinCount(fixture, threshold = 100.0, winSec = 3600L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // only event 6 (value 150) opens a window [12:00, 13:00): events 6,7
    // are inside (event 8 at exactly 13:00 is out), both user 2
    assert(out.toSeq == Seq((6L, 2L, 1L)))
  }

  test("range join: no cartesian / nested-loop in the physical plan") {
    val p = Events.rangeJoinCount(fixture).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian in range join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"NLJ in range join:\n$p")
  }

  test("funnel: stages require strict temporal order") {
    val df = Seq(
      // user 1: full ordered funnel
      (1L, ts("2024-01-01 09:00:00"), 1L, "signup", 0.0),
      (2L, ts("2024-01-01 10:00:00"), 1L, "click", 0.0),
      (3L, ts("2024-01-01 11:00:00"), 1L, "purchase", 0.0),
      // user 2: purchase BEFORE the first post-signup click → stage 2 only
      (4L, ts("2024-01-01 09:00:00"), 2L, "signup", 0.0),
      (5L, ts("2024-01-01 09:30:00"), 2L, "purchase", 0.0),
      (6L, ts("2024-01-01 10:00:00"), 2L, "click", 0.0),
      // user 3: click precedes signup → stage 1 only
      (7L, ts("2024-01-01 08:00:00"), 3L, "click", 0.0),
      (8L, ts("2024-01-01 09:00:00"), 3L, "signup", 0.0),
      // user 4: never signed up → not in the funnel at all
      (9L, ts("2024-01-01 09:00:00"), 4L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.funnel(df).collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2)) === ((3L, 2L, 1L)))
  }

  test("retention: cohort day from first event, weekly offsets floor-divided") {
    val df = Seq(
      (1L, ts("2024-01-01 23:00:00"), 1L, "view", 0.0), // cohort Jan 1
      (2L, ts("2024-01-07 01:00:00"), 1L, "view", 0.0), // day 6 → week 0
      (3L, ts("2024-01-08 01:00:00"), 1L, "view", 0.0), // day 7 → week 1
      (4L, ts("2024-01-03 05:00:00"), 2L, "view", 0.0)  // cohort Jan 3
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.retention(df)
      .collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1), r.getLong(2)))
      .sortBy(r => (r._1, r._2))
    assert(out.toSeq === Seq(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 1L, 1L),
      ("2024-01-03", 0L, 1L)))
  }

  test("range join: straddling window is found via its second bucket") {
    // window [10:30, 11:30) crosses the 11:00 bucket boundary; the event
    // at 11:29:59 lives in bucket 11 while the interval starts in bucket 10
    val df = Seq(
      (1L, ts("2024-01-01 10:30:00"), 1L, "purchase", 200.0),
      (2L, ts("2024-01-01 11:29:59"), 2L, "view", 1.0),
      (3L, ts("2024-01-01 11:30:00"), 2L, "view", 1.0) // at hi: excluded
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.rangeJoinCount(df, threshold = 100.0, winSec = 3600L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L))) // purchase itself + event 2
  }

  test("propsAgg extracts the JSON field and skips rows without it") {
    val dir = java.nio.file.Files.createTempDirectory("evtprops").toString
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, """{"k": 10}"""),
      (2L, ts("2024-01-01 10:01:00"), 1L, "click", 1.0, """{"k": 4}"""),
      (3L, ts("2024-01-01 10:02:00"), 2L, "view", 1.0, """{"other": 9}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Events.propsAgg(spark, dir)
      .select("event_type", "n", "sum_k", "avg_k")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out === Seq(("click", 2L, 14L, 7.0))) // view row has no k
  }
}
