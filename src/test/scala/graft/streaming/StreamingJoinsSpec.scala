package graft.streaming

import graft.SparkSpec
import graft.ml.Events
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-stream attribution join vs the batch operator: identical pairs
  * across micro-batch splits (including a click whose purchase arrives a
  * batch later), and watermark-evicted clicks can no longer match.
  */
class StreamingJoinsSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(s: String) = Timestamp.valueOf(s)

  // (event_id, ts, user_id, event_type, value). Window = 1800s.
  // u1: click 10:00 → purchases 10:10 (in) and 10:30 (boundary, OUT:
  //     p_ts < c_ts + 30min is strict); second click 10:20 matches both.
  // u2: click 10:00, purchase 11:59 (out of window).
  // u3: purchase 10:05 with no prior click (no pair).
  private val rows: Seq[(Long, Timestamp, Long, String, Double)] = Seq(
    (1L, ts("2024-01-01 10:00:00"), 1L, "click", 0.0),
    (2L, ts("2024-01-01 10:10:00"), 1L, "purchase", 5.0),
    (3L, ts("2024-01-01 10:20:00"), 1L, "click", 0.0),
    (4L, ts("2024-01-01 10:30:00"), 1L, "purchase", 7.0),
    (5L, ts("2024-01-01 10:00:00"), 2L, "click", 0.0),
    (6L, ts("2024-01-01 11:59:00"), 2L, "purchase", 9.0),
    (7L, ts("2024-01-01 10:05:00"), 3L, "purchase", 3.0))

  private def batchDf = rows.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("stream-stream attribution equals the batch join across batch splits") {
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = StreamingJoins.attributionStream(
        input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"))
      .writeStream.format("memory").queryName("sattr")
      .outputMode("append").start()
    try {
      // split mid-window: clicks land in batch 1, their purchases partly
      // in batch 2 — the join must buffer click state across the split
      val (early, late) = rows.partition(_._2.before(ts("2024-01-01 10:15:00")))
      input.addData(early); q.processAllAvailable()
      input.addData(late); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("sattr")
    val batch = Events.attribution(batchDf)
    // expected pairs: (1,2), (3,4); boundary purchase 4 excluded for
    // click 1 (lag exactly 1800s), out-of-window and clickless excluded
    assert(streamed.select("click_id", "purchase_id").as[(Long, Long)]
      .collect().toSet === Set((1L, 2L), (3L, 4L)))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("watermark-expired click state cannot match a late purchase") {
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val q = StreamingJoins.attributionStream(
        input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"))
      .writeStream.format("memory").queryName("sattr_late")
      .outputMode("append").start()
    try {
      input.addData(Seq((1L, ts("2024-01-01 10:00:00"), 1L, "click", 0.0)))
      q.processAllAvailable()
      // advance both watermarks far past 10:00 + window
      input.addData(Seq((2L, ts("2024-01-01 13:00:00"), 9L, "click", 0.0),
        (3L, ts("2024-01-01 13:00:00"), 9L, "purchase", 1.0)))
      q.processAllAvailable()
      // in-window for the evicted click, but behind the watermark
      input.addData(Seq((4L, ts("2024-01-01 10:10:00"), 1L, "purchase", 5.0)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sattr_late")
      .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(got === Set((2L, 3L))) // the late purchase attributed nothing
  }
}
