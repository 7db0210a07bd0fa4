package graft.streaming

import graft.SparkSpec
import graft.ml.Events
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming sessionization vs the batch operator: same closed sessions,
  * bit-equal, across micro-batch splits on the time axis (never split by
  * key — key-ordered splits watermark out the other key's history).
  */
class StreamingSessionsSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(s: String) = Timestamp.valueOf(s)

  // (ts, user_id, value): includes the boundary case ts - prev == gap
  // (10:00 → 10:30, stays one session in BOTH engines) and a 31-min gap
  // (10:30 → 11:01, splits in both)
  private val rows: Seq[(Timestamp, Long, Double)] = Seq(
    (ts("2024-01-01 10:00:00"), 1L, 1.0),
    (ts("2024-01-01 10:30:00"), 1L, 2.0), // exactly gap: merges
    (ts("2024-01-01 11:01:00"), 1L, 4.0), // 31 min: new session
    (ts("2024-01-01 10:05:00"), 2L, 8.0),
    (ts("2024-01-01 11:40:00"), 2L, 16.0),
    (ts("2024-01-01 11:50:00"), 2L, 32.0))

  test("streaming sessions match batch sessionize (split on time axis)") {
    val input = MemoryStream[(Timestamp, Long, Double)]
    val q = StreamingSessions.sessionizeStream(
        input.toDF().toDF("ts", "user_id", "value"))
      .writeStream.format("memory").queryName("ssess")
      .outputMode("append").start()
    try {
      val (early, late) = rows.partition(_._1.before(ts("2024-01-01 11:00:00")))
      input.addData(early); q.processAllAvailable()
      input.addData(late); q.processAllAvailable()
      // sentinel far past every session close: flushes remaining state
      input.addData(Seq((ts("2024-01-02 00:00:00"), -1L, 0.0)))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("ssess").where($"user_id" =!= -1L)
    val batch = Events.sessionize(
        rows.zipWithIndex.map { case ((t, u, v), i) =>
          (i.toLong, t, u, "click", v)
        }.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
    assert(streamed.count() === 4) // u1: {10:00,10:30},{11:01}; u2: {10:05},{11:40,11:50}
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("late event behind the watermark cannot reopen an emitted session") {
    val input = MemoryStream[(Timestamp, Long, Double)]
    val q = StreamingSessions.sessionizeStream(
        input.toDF().toDF("ts", "user_id", "value"))
      .writeStream.format("memory").queryName("ssess_late")
      .outputMode("append").start()
    try {
      input.addData(Seq((ts("2024-01-01 10:00:00"), 1L, 1.0)))
      q.processAllAvailable()
      input.addData(Seq((ts("2024-01-01 12:00:00"), 2L, 2.0))) // watermark → 12:00
      q.processAllAvailable()
      // this would extend user 1's 10:00 session, but it is behind the
      // watermark: dropped, the emitted session stays as emitted
      input.addData(Seq((ts("2024-01-01 10:10:00"), 1L, 99.0)))
      q.processAllAvailable()
      input.addData(Seq((ts("2024-01-02 00:00:00"), -1L, 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val u1 = spark.table("ssess_late").where($"user_id" === 1L)
      .select("n_events", "total_value").as[(Long, Double)].collect()
    assert(u1.toSeq === Seq((1L, 1.0)))
  }
}
