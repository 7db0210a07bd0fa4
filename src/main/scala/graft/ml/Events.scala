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
}
