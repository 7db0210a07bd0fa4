package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.ml.Events.sessionize]]: gap-based user
  * sessions over an unbounded event stream, emitted once final.
  *
  * Built on Spark's native `session_window` state store — no custom
  * state code needed. One semantic seam is bridged explicitly: batch
  * starts a new session when `ts - prev > gapSec` (strict), while
  * `session_window` merges an event iff `ts < prev + gap` (strict on
  * the other side). On the engine's second-truncated event grid
  * (see [[graft.ml.Events.canonical]]) `gap = gapSec + 1` makes the two
  * predicates equivalent: `ts < prev + gapSec + 1  ⇔  ts - prev <=
  * gapSec`. The spec pins bit-equality against the batch operator.
  *
  * Append mode: a session row is emitted only after the watermark passes
  * its close, so every emitted session is final (late events behind the
  * watermark are dropped by Spark's late filter, and redelivery cannot
  * reopen an emitted session).
  */
object StreamingSessions {

  /** Input columns: (ts: timestamp, user_id, value). Output one row per
    * closed session: (user_id, session_start, session_end, n_events,
    * total_value) — the batch operator's schema minus the per-user
    * session ordinal, which is inherently a batch (full-history) notion.
    */
  def sessionizeStream(events: DataFrame, gapSec: Long = 1800L,
                       watermarkSlack: String = "0 seconds"): DataFrame =
    events
      .withWatermark("ts", watermarkSlack)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"${gapSec + 1} seconds"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("total_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("total_value"))
}
