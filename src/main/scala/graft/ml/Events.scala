package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream relational operators a large-scale pipeline needs beyond
  * plain joins/aggregations: gap-based sessionization, as-of (most recent
  * prior fact) joins, and interval/range joins — each expressed so the
  * physical plan stays shuffle-hash/sort-merge on equi keys and never
  * degrades to a nested-loop or cartesian product at scale.
  *
  * All three read the synthetic `events` table. Timestamps are truncated
  * to whole seconds on BOTH engines (the parquet carries ns, Spark works
  * in µs — second truncation is the proven common grid, see
  * [[graft.Tables.eventsAsCounts]]), and every ordering carries an
  * `event_id` tiebreak so results are deterministic under ties.
  */
object Events {

  /** Canonical second-truncated event view: (event_id, ts, user_id,
    * event_type, value).
    */
  def canonical(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.Tables.load(spark, sfDir, "events")
    val tsCol = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_seconds(expr("ts DIV 1000000000"))
      case _ => date_trunc("second", col("ts"))
    }
    ev.select(col("event_id"), tsCol.as("ts"), col("user_id"),
      col("event_type"), col("value"))
  }

  val canonicalSql: String =
    """SELECT event_id, date_trunc('second', ts) AS ts, user_id,
      |       event_type, value FROM events""".stripMargin

  // ---------------------------------------------------------------------
  // Sessionization
  // ---------------------------------------------------------------------

  /** Gap-based sessionization: a new session starts when a user is idle
    * longer than `gapSec`. Output one row per session:
    * (user_id, session_idx, session_start, session_end, n_events,
    * total_value).
    *
    * Scale shape: ONE shuffle on user_id feeds both the lag window and
    * the running-sum window (same partitioning + ordering), and the final
    * groupBy(user_id, session_idx) is satisfied by the existing
    * HashPartitioning(user_id) — Catalyst recognizes the subset clustering,
    * so no second exchange. total_value is rounded to 6 dp because
    * partial-aggregation order is partition-dependent.
    */
  def sessionize(events: DataFrame, gapSec: Long = 1800L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("is_new",
        (col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapSec * 1000000L)
          .cast("long"))
      .withColumn("session_idx", sum(col("is_new")).over(run))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("total_value"))
  }

  /** Skew-proof sessionization: identical output to [[sessionize]], built
    * for the whale-key regime the 1000× scale run measured (one user with
    * ~1.8M events makes the per-user window sort a single-partition
    * bottleneck — evt_sessionize ran 1.52× vs linear there).
    *
    * Two-level shape:
    *   1. sessionize WITHIN (user_id, time-bucket) partitions — the sort
    *      is bounded by a bucket's events, so a whale key splits across
    *      ~(span/bucketSec) partitions instead of one;
    *   2. merge at the SESSION level: per-user ordered pass over local
    *      sessions (rows ≪ events) re-joining exactly the sessions the
    *      bucket boundaries artificially split (boundary gap ≤ gapSec).
    *
    * Equivalence argument: buckets partition time, so per-user local
    * sessions are disjoint ordered intervals; the event-level gap rule is
    * violated only at bucket boundaries, and the session-level gap rule
    * re-merges precisely those chains (a running sum handles multi-bucket
    * spans). Two consecutive local sessions inside one bucket always have
    * gap > gapSec, so the merge never over-joins. session_idx equals the
    * session's rank in time order in both formulations.
    *
    * Cost: one shuffle of the fact table on (user_id, bucket) — both the
    * local window and the local groupBy share it — plus one session-level
    * shuffle on user_id that also satisfies the final groupBy: two
    * exchanges total, the second over session-count rows (PlanSpec-pinned).
    */
  def sessionizeSkew(events: DataFrame, gapSec: Long = 1800L,
                     bucketSec: Long = 86400L): DataFrame = {
    require(bucketSec > gapSec, "bucket must exceed the session gap")
    val bUs = bucketSec * 1000000L
    val wLocal = Window.partitionBy("user_id", "bucket").orderBy("ts", "event_id")
    val runLocal = wLocal.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = events
      .withColumn("bucket", expr(s"unix_micros(ts) DIV ${bUs}L"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wLocal))
      .withColumn("is_new",
        (col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapSec * 1000000L)
          .cast("long"))
      .withColumn("local_idx", sum(col("is_new")).over(runLocal))
      .groupBy(col("user_id"), col("bucket"), col("local_idx"))
      .agg(
        min(col("ts")).as("s_start"),
        max(col("ts")).as("s_end"),
        count(lit(1)).as("n_ev"),
        sum(col("value")).as("v_sum"))
    val wUser = Window.partitionBy("user_id").orderBy("s_start")
    val runUser = wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local
      .withColumn("prev_end_us", lag(unix_micros(col("s_end")), 1).over(wUser))
      .withColumn("is_new",
        (col("prev_end_us").isNull ||
          unix_micros(col("s_start")) - col("prev_end_us") > gapSec * 1000000L)
          .cast("long"))
      .withColumn("session_idx", sum(col("is_new")).over(runUser))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("s_start")).as("session_start"),
        max(col("s_end")).as("session_end"),
        sum(col("n_ev")).as("n_events"),
        round(sum(col("v_sum")), 6).as("total_value"))
  }

  /** DuckDB oracle for [[sessionize]]. */
  def sessionizeOracleSql(gapSec: Long = 1800L): String =
    s"""WITH ev AS ($canonicalSql),
       |lagged AS (
       |  SELECT *, lag(epoch_us(ts)) OVER
       |           (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
       |  FROM ev),
       |flagged AS (
       |  SELECT *, CASE WHEN prev_us IS NULL
       |                   OR epoch_us(ts) - prev_us > ${gapSec}000000
       |                 THEN 1 ELSE 0 END AS is_new
       |  FROM lagged),
       |sess AS (
       |  SELECT *, sum(is_new) OVER
       |           (PARTITION BY user_id ORDER BY ts, event_id
       |            ROWS UNBOUNDED PRECEDING) AS session_idx
       |  FROM flagged)
       |SELECT user_id, session_idx::BIGINT AS session_idx,
       |       min(ts) AS session_start, max(ts) AS session_end,
       |       count(*)::BIGINT AS n_events,
       |       round(sum(value), 6) AS total_value
       |FROM sess GROUP BY user_id, session_idx""".stripMargin

  // ---------------------------------------------------------------------
  // As-of join
  // ---------------------------------------------------------------------

  /** As-of join: every `click` event annotated with the value of the most
    * recent prior-or-equal `purchase` by the same user (NULL when none).
    * Purchases are first deduplicated to one row per (user_id, ts) via
    * max(value) so ties are well-defined on both engines.
    *
    * Spark-first shape: instead of a join (Spark has no ASOF operator and
    * an inequality join would be a nested loop), the two sides are
    * UNIONed with a kind tag and scanned by ONE window — carrying the
    * last non-null purchase value forward per user. One shuffle on
    * user_id, linear scan, no join at all; the DuckDB oracle uses its
    * native ASOF LEFT JOIN, so the two implementations are independent.
    */
  def asofPurchase(events: DataFrame): DataFrame = {
    val purchases = events.where(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max("value").as("pval"))
      .select(lit(-1L).as("event_id"), col("ts"), col("user_id"),
        lit(null).cast("double").as("value"), lit(0).as("kind"), col("pval"))
    val clicks = events.where(col("event_type") === "click")
      .select(col("event_id"), col("ts"), col("user_id"), col("value"),
        lit(1).as("kind"), lit(null).cast("double").as("pval"))
    // at equal ts the purchase row (kind 0) sorts first, so prior-OR-EQUAL
    // purchases are visible to the click — matching ASOF's c.ts >= p.ts
    val w = Window.partitionBy("user_id").orderBy("ts", "kind", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(clicks)
      .withColumn("last_purchase", last(col("pval"), ignoreNulls = true).over(w))
      .where(col("kind") === 1)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("last_purchase"))
  }

  /** DuckDB oracle for [[asofPurchase]] — native ASOF LEFT JOIN. */
  val asofPurchaseOracleSql: String =
    s"""WITH ev AS ($canonicalSql),
       |p AS (
       |  SELECT user_id, ts, max(value) AS pval
       |  FROM ev WHERE event_type = 'purchase' GROUP BY user_id, ts),
       |c AS (
       |  SELECT event_id, user_id, ts, value
       |  FROM ev WHERE event_type = 'click')
       |SELECT c.event_id, c.user_id, c.ts, c.value,
       |       p.pval AS last_purchase
       |FROM c ASOF LEFT JOIN p
       |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin

  /** [[asofPurchase]] with a staleness TOLERANCE (kdb / QuestDB
    * `ASOF ... TOLERANCE` semantics): a prior purchase older than
    * `toleranceSec` at click time is no match — last_purchase and
    * staleness_sec both null. The merge-window trick is unchanged (one
    * shuffle of the fact table, no join); the tolerance is a column
    * predicate on the carried purchase timestamp, so the scale shape is
    * identical to the untolerated as-of.
    * Output: (event_id, user_id, ts, value, last_purchase, staleness_sec).
    */
  def asofPurchaseTolerance(events: DataFrame,
                            toleranceSec: Long = 3600L): DataFrame = {
    require(toleranceSec >= 0)
    val purchases = events.where(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max("value").as("pval"))
      .select(lit(-1L).as("event_id"), col("ts"), col("user_id"),
        lit(null).cast("double").as("value"), lit(0).as("kind"),
        struct(col("ts").as("pts"), col("pval")).as("p"))
    val clicks = events.where(col("event_type") === "click")
      .select(col("event_id"), col("ts"), col("user_id"), col("value"),
        lit(1).as("kind"),
        lit(null).cast("struct<pts:timestamp,pval:double>").as("p"))
    val w = Window.partitionBy("user_id").orderBy("ts", "kind", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stale = unix_timestamp(col("ts")) - unix_timestamp(col("lp.pts"))
    purchases.unionByName(clicks)
      .withColumn("lp", last(col("p"), ignoreNulls = true).over(w))
      .where(col("kind") === 1)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        when(stale <= toleranceSec, col("lp.pval")).as("last_purchase"),
        when(stale <= toleranceSec, stale).as("staleness_sec"))
  }

  def asofPurchaseToleranceOracleSql(toleranceSec: Long = 3600L): String =
    s"""WITH ev AS ($canonicalSql),
       |p AS (
       |  SELECT user_id, ts, max(value) AS pval
       |  FROM ev WHERE event_type = 'purchase' GROUP BY user_id, ts),
       |c AS (
       |  SELECT event_id, user_id, ts, value
       |  FROM ev WHERE event_type = 'click')
       |SELECT c.event_id, c.user_id, c.ts, c.value,
       |       CASE WHEN date_diff('second', p.ts, c.ts) <= $toleranceSec
       |            THEN p.pval END AS last_purchase,
       |       CASE WHEN date_diff('second', p.ts, c.ts) <= $toleranceSec
       |            THEN date_diff('second', p.ts, c.ts)::BIGINT
       |       END AS staleness_sec
       |FROM c ASOF LEFT JOIN p
       |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin

  // ---------------------------------------------------------------------
  // Range (interval) join
  // ---------------------------------------------------------------------

  /** Range join with NO equi key: for each "big purchase" (value >
    * `threshold`) count the events — any user, any type — inside the
    * window [ts, ts + winSec). Output (interval_id, n_in, n_users).
    *
    * Scale shape: a naive `e.ts >= lo AND e.ts < hi` join is a
    * BroadcastNestedLoopJoin — quadratic and un-shardable. Instead both
    * sides are bucketed onto a fixed grid of width `winSec`: an interval
    * of length winSec touches at most 2 buckets (exploded), an event
    * falls in exactly 1, and the join becomes an EQUI join on the bucket
    * id followed by the exact containment filter. Each (interval, event)
    * pair is produced at most once because the event's bucket is unique —
    * no post-join dedup. EventsSpec pins the no-nested-loop plan shape.
    */
  def rangeJoinCount(events: DataFrame, threshold: Double = 100.0,
                     winSec: Long = 3600L): DataFrame = {
    val wUs = winSec * 1000000L
    val iv = events
      .where(col("event_type") === "purchase" && col("value") > threshold)
      .select(col("event_id").as("interval_id"),
        unix_micros(col("ts")).as("lo_us"))
      .withColumn("hi_us", col("lo_us") + wUs)
      .withColumn("b", explode(sequence(
        expr(s"lo_us DIV $wUs"), expr(s"(hi_us - 1) DIV $wUs"))))
    val ev = events.select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("e_us"))
      .withColumn("b", expr(s"e_us DIV $wUs"))
    val joined = iv.join(ev, Seq("b"))
      .where(col("e_us") >= col("lo_us") && col("e_us") < col("hi_us"))
    joined.groupBy("interval_id")
      .agg(count(lit(1)).as("n_in"),
        count_distinct(col("user_id")).as("n_users"))
  }

  /** DuckDB oracle for [[rangeJoinCount]] — the declarative inequality
    * join (DuckDB plans it as an IEJoin; at Spark scale that is exactly
    * the shape we refuse to run, hence the bucketed twin).
    */
  def rangeJoinCountOracleSql(threshold: Double = 100.0,
                              winSec: Long = 3600L): String =
    s"""WITH ev AS ($canonicalSql),
       |iv AS (
       |  SELECT event_id AS interval_id, ts AS lo,
       |         ts + INTERVAL $winSec SECOND AS hi
       |  FROM ev WHERE event_type = 'purchase' AND value > $threshold)
       |SELECT iv.interval_id, count(e.event_id)::BIGINT AS n_in,
       |       count(DISTINCT e.user_id)::BIGINT AS n_users
       |FROM iv JOIN ev e ON e.ts >= iv.lo AND e.ts < iv.hi
       |GROUP BY iv.interval_id""".stripMargin

  /** Key-skew diagnostic: the top-k heaviest join keys and their share
    * of the fact table — the report you run BEFORE deciding whether a
    * key needs [[Joins.saltedJoin]] or AQE skew handling. One hash
    * aggregation + a TakeOrdered of k rows; the total rides along as a
    * broadcast 1-row aggregate. Output: (rank, user_id, n_events,
    * share6), rank deterministic via (count DESC, key ASC).
    */
  def keySkew(events: DataFrame, k: Int = 10): DataFrame = {
    val counts = events.groupBy("user_id").agg(count(lit(1)).as("n_events"))
    val tot = events.agg(count(lit(1)).as("tot"))
    // constant partition key: the window input is the k-row TakeOrdered
    // result so a single partition is fine, but the codebase bans
    // unpartitioned windows outright (and the WindowExec warning with it).
    // `n_events * 0.0` is constant on the data yet non-foldable: the
    // DOUBLE multiply cannot be simplified (x*0.0 ≠ 0.0 for NaN/Inf), so
    // the optimizer cannot strip the key back to the warning-emitting
    // empty spec — it does strip lit(0), same-branch CASE keys, and
    // integer x*0 (ReorderAssociativeOperator folds those).
    val w = Window.partitionBy(col("n_events") * lit(0.0))
      .orderBy(desc("n_events"), asc("user_id"))
    counts
      .orderBy(desc("n_events"), asc("user_id")).limit(k)
      .withColumn("rank", row_number().over(w)) // k rows: 1-partition OK
      .join(broadcast(tot))
      .select(col("rank"), col("user_id"), col("n_events"),
        round(col("n_events").cast("double") / col("tot").cast("double"), 6)
          .as("share6"))
  }

  def keySkewOracleSql(k: Int = 10): String =
    s"""WITH ev AS ($canonicalSql),
       |counts AS (
       |  SELECT user_id, count(*)::BIGINT AS n_events
       |  FROM ev GROUP BY user_id),
       |tot AS (SELECT count(*)::BIGINT AS tot FROM ev),
       |top AS (
       |  SELECT row_number() OVER (ORDER BY n_events DESC, user_id) AS rank,
       |         user_id, n_events
       |  FROM counts ORDER BY n_events DESC, user_id LIMIT $k)
       |SELECT rank, user_id, n_events,
       |       round(n_events::DOUBLE / tot::DOUBLE, 6) AS share6
       |FROM top, tot""".stripMargin

  // ---------------------------------------------------------------------
  // Within-window attribution join
  // ---------------------------------------------------------------------

  /** Click→purchase attribution: every (click, purchase) pair for a user
    * whose purchase lands in [click.ts, click.ts + winSec). Unlike
    * [[asofPurchase]] (one most-recent match) and [[rangeJoinCount]] (no
    * equi key), this is the ad-tech attribution shape: an EQUI join on
    * user_id with the time window filtered inside the hash match — the
    * join key already co-locates the pair space, so no bucketed-grid
    * explosion is needed and the plan is one shuffle per side. The
    * streaming twin ([[graft.streaming.StreamingJoins.attributionStream]])
    * is the same join with watermark-bounded state.
    */
  def attribution(events: DataFrame, winSec: Long = 1800L): DataFrame = {
    // time-bucketed equi join (the evt_range_join trick): clicks key on
    // their winSec bucket, purchases probe their bucket and the one
    // before (c_ts ∈ (p_ts − win, p_ts] spans at most those two), and
    // the exact range predicate filters inside the hash match. Without
    // the bucket key the per-user pair space is n_clicks × n_purchases —
    // measured 4× SUPER-linear at the 100× corpus, where one whale user
    // holds ~180k events; bucketing bounds pairs by window density
    // instead of account history. Each (click, purchase) pair matches in
    // exactly one bucket (the click's), so no dedup step is needed.
    val winUs = winSec * 1000000L
    val c = events.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("c_ts"))
      .withColumn("bk", expr(s"unix_micros(c_ts) DIV $winUs"))
    val p = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("purchase_value"))
      .withColumn("bk", explode(array(
        expr(s"unix_micros(p_ts) DIV $winUs"),
        expr(s"unix_micros(p_ts) DIV $winUs") - 1)))
    c.join(p, col("user_id") === col("p_user") && c("bk") === p("bk") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") < col("c_ts") + expr(s"INTERVAL $winSec SECOND"))
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        expr("(unix_micros(p_ts) - unix_micros(c_ts)) DIV 1000000")
          .as("lag_sec"),
        col("purchase_value"))
  }

  def attributionOracleSql(winSec: Long = 1800L): String =
    s"""WITH ev AS ($canonicalSql),
       |c AS (
       |  SELECT event_id AS click_id, user_id, ts AS c_ts
       |  FROM ev WHERE event_type = 'click'),
       |p AS (
       |  SELECT event_id AS purchase_id, user_id, ts AS p_ts,
       |         value AS purchase_value
       |  FROM ev WHERE event_type = 'purchase')
       |SELECT c.click_id, p.purchase_id, c.user_id,
       |       -- floor of the microsecond delta, structurally identical to
       |       -- the operator's unix_micros DIV (date_diff('second') counts
       |       -- boundary crossings and would diverge on sub-second ts)
       |       ((epoch_us(p.p_ts) - epoch_us(c.c_ts)) // 1000000)::BIGINT AS lag_sec,
       |       p.purchase_value
       |FROM c JOIN p ON c.user_id = p.user_id
       |  AND p.p_ts >= c.c_ts
       |  AND p.p_ts < c.c_ts + INTERVAL $winSec SECOND""".stripMargin

  /** Per-user event-type transition matrix — the first-order Markov view
    * of user behavior (the input to next-action models and to funnel
    * hypothesis generation): for every ordered (type → next type) pair
    * within a user's timeline, the count and the row-normalized
    * transition probability P(to | from).
    *
    * Scale shape: ONE shuffle on user_id feeds the lead window (the
    * sessionize partitioning — the whale-key guidance there applies
    * unchanged), then everything collapses to a |types|² aggregate; the
    * probability window runs over that constant-size relation. Counts
    * are integers, p = n/row-total is a single exact division — no
    * accumulation-order surface. Output: (from_type, to_type, n, p).
    */
  def typeTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val counts = events
      .withColumn("next_type", lead("event_type", 1).over(w))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val rowTot = Window.partitionBy("from_type")
    counts.withColumn("p",
      round(col("n").cast("double") / sum("n").over(rowTot), 6))
  }

  val typeTransitionsOracleSql: String =
    s"""WITH ev AS ($canonicalSql),
       |nx AS (
       |  SELECT event_type AS from_type,
       |         lead(event_type) OVER (PARTITION BY user_id
       |                                ORDER BY ts, event_id) AS to_type
       |  FROM ev),
       |counts AS (
       |  SELECT from_type, to_type, count(*)::BIGINT AS n
       |  FROM nx WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
       |SELECT from_type, to_type, n,
       |       round(n::DOUBLE / sum(n) OVER (PARTITION BY from_type), 6) AS p
       |FROM counts""".stripMargin

  /** Linear multi-touch attribution on top of [[attribution]]'s
    * (click, purchase) pair set: each purchase's value splits equally
    * across every click inside its window, and the split credit rolls up
    * per click — the fractional-credit report a marketing/ranking
    * pipeline reads instead of last-touch. Per-pair credit is rounded to
    * integer micro-units before the per-click sum (accumulation-order
    * exact). The touch-count window partitions by purchase_id over the
    * pair relation, whose size is bounded by window density (the bucketed
    * join already guarantees that) — no new scale surface beyond the
    * pair join itself. Output: (click_id, user_id, n_purchases,
    * credited_value).
    */
  def attributionLinear(events: DataFrame, winSec: Long = 1800L): DataFrame = {
    val pairs = attribution(events, winSec)
    val w = Window.partitionBy("purchase_id")
    pairs.withColumn("n_touches", count(lit(1)).over(w))
      .select(col("click_id"), col("user_id"),
        floor(col("purchase_value") / col("n_touches") * 1e6 + 0.5)
          .cast("long").as("credit_micro"))
      .groupBy("click_id", "user_id")
      .agg(count(lit(1)).as("n_purchases"),
        round(sum("credit_micro") / 1e6, 6).as("credited_value"))
  }

  def attributionLinearOracleSql(winSec: Long = 1800L): String =
    s"""WITH pairs AS (
       |  ${attributionOracleSql(winSec)}),
       |t AS (
       |  SELECT *, count(*) OVER (PARTITION BY purchase_id) AS n_touches
       |  FROM pairs)
       |SELECT click_id, user_id, count(*)::BIGINT AS n_purchases,
       |       round(sum(floor(purchase_value / n_touches * 1e6 + 0.5)::BIGINT)
       |             / 1e6, 6) AS credited_value
       |FROM t GROUP BY click_id, user_id""".stripMargin

  // ---------------------------------------------------------------------
  // Funnel analysis
  // ---------------------------------------------------------------------

  /** Ordered three-stage funnel signup → click → purchase: per user, the
    * first signup, the first click strictly after it, the first purchase
    * strictly after that; report how many users reach each stage.
    * Output one row: (n_stage1, n_stage2, n_stage3).
    *
    * Scale shape: three conditional-min aggregations, all keyed by
    * user_id — after the first shuffle every later groupBy/join reuses
    * the same hash partitioning, so the funnel costs ONE data shuffle
    * plus the final single-row rollup.
    */
  def funnel(events: DataFrame): DataFrame = {
    val t1 = events.where(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val t2 = events.where(col("event_type") === "click")
      .join(t1, "user_id").where(col("ts") > col("t1"))
      .groupBy("user_id").agg(min("ts").as("t2"))
    val t3 = events.where(col("event_type") === "purchase")
      .join(t2, "user_id").where(col("ts") > col("t2"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    t1.join(t2, Seq("user_id"), "left").join(t3, Seq("user_id"), "left")
      .agg(count(col("t1")).as("n_stage1"),
        count(col("t2")).as("n_stage2"),
        count(col("t3")).as("n_stage3"))
  }

  val funnelOracleSql: String =
    s"""WITH ev AS ($canonicalSql),
       |t1 AS (SELECT user_id, min(ts) AS t1 FROM ev
       |       WHERE event_type = 'signup' GROUP BY user_id),
       |t2 AS (SELECT e.user_id, min(e.ts) AS t2
       |       FROM ev e JOIN t1 ON e.user_id = t1.user_id
       |       WHERE e.event_type = 'click' AND e.ts > t1.t1
       |       GROUP BY e.user_id),
       |t3 AS (SELECT e.user_id, min(e.ts) AS t3
       |       FROM ev e JOIN t2 ON e.user_id = t2.user_id
       |       WHERE e.event_type = 'purchase' AND e.ts > t2.t2
       |       GROUP BY e.user_id)
       |SELECT count(t1.t1)::BIGINT AS n_stage1,
       |       count(t2.t2)::BIGINT AS n_stage2,
       |       count(t3.t3)::BIGINT AS n_stage3
       |FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
       |        LEFT JOIN t3 ON t1.user_id = t3.user_id""".stripMargin

  // ---------------------------------------------------------------------
  // Cohort retention
  // ---------------------------------------------------------------------

  /** Weekly cohort retention: users are cohorted by their first-ever
    * event day; each later event lands in week-offset
    * floor(days-since-cohort-day / 7). Output: (cohort_day, week_offset,
    * n_users) — the retention matrix of product analytics.
    *
    * Scale shape: the per-user first day is one aggregation on user_id;
    * joining it back to events stays on the user_id key (no second
    * shuffle of the fact table until the small cohort-cell rollup).
    */
  def retention(events: DataFrame): DataFrame = {
    val first = events.groupBy("user_id")
      .agg(date_trunc("day", min("ts")).as("cohort_day"))
    events.join(first, "user_id")
      .withColumn("week_offset",
        expr("datediff(date_trunc('day', ts), cohort_day) DIV 7"))
      .groupBy("cohort_day", "week_offset")
      .agg(count_distinct(col("user_id")).as("n_users"))
  }

  val retentionOracleSql: String =
    s"""WITH ev AS ($canonicalSql),
       |first AS (
       |  -- date_trunc('day') yields DATE in DuckDB; cast back so the
       |  -- output column is a timestamp like the engine's
       |  SELECT user_id, date_trunc('day', min(ts))::TIMESTAMP AS cohort_day
       |  FROM ev GROUP BY user_id)
       |SELECT f.cohort_day,
       |       (datediff('day', f.cohort_day, date_trunc('day', e.ts)::TIMESTAMP)
       |        // 7)::BIGINT AS week_offset,
       |       count(DISTINCT e.user_id)::BIGINT AS n_users
       |FROM ev e JOIN first f ON e.user_id = f.user_id
       |GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // Semi-structured metadata extraction
  // ---------------------------------------------------------------------

  /** Semi-structured props rollup: extract the integer `k` attribute from
    * the JSON `props` column and aggregate per event type — the
    * metadata-column pattern of real event/web corpora (properties land
    * as a JSON string; queries pull typed fields out). get_json_object is
    * a codegen'd path expression, so extraction is a pure scan; the
    * rollup is one hash aggregation on a tiny key. Rows whose props lack
    * `k` are excluded on both engines. Output: (event_type, n, sum_k,
    * avg_k).
    */
  def propsAgg(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.load(spark, sfDir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .where(col("k").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        round(avg("k"), 6).as("avg_k"))

  val propsAggOracleSql: String =
    """SELECT event_type, count(*)::BIGINT AS n,
      |       sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
      |       round(avg(json_extract_string(props, '$.k')::BIGINT), 6) AS avg_k
      |FROM events
      |WHERE json_extract_string(props, '$.k') IS NOT NULL
      |GROUP BY event_type""".stripMargin
}
