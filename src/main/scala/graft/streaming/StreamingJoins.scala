package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.ml.Events.attribution]]: a watermarked
  * stream-stream INNER join — the last Structured Streaming join surface
  * the engine exposes (stateful aggregation, session windows and keyed
  * scorers are covered by [[StreamingTrend]] / [[StreamingSessions]]).
  *
  * State stays bounded because the join carries BOTH watermarks and a
  * two-sided time-range condition: Spark derives that a buffered click
  * can only ever match purchases in [c_ts, c_ts + winSec), so click
  * state older than `watermark − winSec` and purchase state behind the
  * watermark are evicted. Inner-join rows emit as soon as both sides
  * arrive (append mode, no emission latency), so results across any
  * micro-batch split equal the batch join — pinned by
  * StreamingJoinsSpec.
  */
object StreamingJoins {

  /** Input: ONE canonical event stream (event_id, ts, user_id,
    * event_type, value); clicks and purchases are filtered branches of
    * it, each with its own watermark after the rename (a self stream-
    * stream join). Output schema = the batch operator's:
    * (click_id, purchase_id, user_id, lag_sec, purchase_value).
    */
  def attributionStream(events: DataFrame, winSec: Long = 1800L,
                        watermarkSlack: String = "0 seconds"): DataFrame = {
    val c = events.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", watermarkSlack)
    val p = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("purchase_value"))
      .withWatermark("p_ts", watermarkSlack)
    c.join(p, col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") < col("c_ts") + expr(s"INTERVAL $winSec SECOND"))
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        expr("(unix_micros(p_ts) - unix_micros(c_ts)) DIV 1000000")
          .as("lag_sec"),
        col("purchase_value"))
  }
}
