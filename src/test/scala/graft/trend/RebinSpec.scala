package graft.trend

import graft.SparkSpec
import java.sql.Timestamp

class RebinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def run(rows: Seq[(String, Long, Double, String)]) = {
    val df = rows.map { case (t, d, c, k) => (ts(t), d, c, k) }
      .toDF("ts", "duration_sec", "count", "counter")
    Rebin(df, "hours", 1)
      .orderBy("counter", "ts")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getDouble(2), r.getDouble(3)))
  }

  test("aligned intervals land in their bins; grid extends one bin past max stop") {
    // reference: grid = trunc(min) .. trunc(max_stop) inclusive (analysis.py:82-97)
    val out = run(Seq(
      ("2024-01-01 00:10:00", 600L, 5.0, "a"),
      ("2024-01-01 01:20:00", 600L, 7.0, "a")))
    // max stop = 01:30 → trunc = 01:00 → grid bins 00:00 and 01:00
    assert(out.toSeq == Seq(
      ("a", "2024-01-01 00:00:00.0", 3600.0, 5.0),
      ("a", "2024-01-01 01:00:00.0", 3600.0, 7.0)))
  }

  test("straddling interval splits proportionally to overlap seconds") {
    // 30-min interval [00:45, 01:15): 15 min in each hour → 0.5/0.5 of count 8
    // plus aligned count 4 in hour 0 → int(4+4)=8 and int(4)=4
    val out = run(Seq(
      ("2024-01-01 00:45:00", 1800L, 8.0, "a"),
      ("2024-01-01 00:00:00", 600L, 4.0, "a")))
    assert(out.toSeq == Seq(
      ("a", "2024-01-01 00:00:00.0", 3600.0, 8.0),
      ("a", "2024-01-01 01:00:00.0", 3600.0, 4.0)))
  }

  test("fractional counts truncate toward zero (analysis.py:147)") {
    // straddler [00:50,01:20) count 3: 10min/30min = 1/3 in h0 (1.0),
    // 2/3 in h1 (2.0); aligned [00:00,00:05) count 1 in h0
    val out = run(Seq(
      ("2024-01-01 00:50:00", 1800L, 3.0, "a"),
      ("2024-01-01 00:00:00", 300L, 1.0, "a")))
    // h0: 1 + 1.0 = 2.0 → 2 ; h1: 2.0 → 2
    assert(out.toSeq == Seq(
      ("a", "2024-01-01 00:00:00.0", 3600.0, 2.0),
      ("a", "2024-01-01 01:00:00.0", 3600.0, 2.0)))
  }

  test("zero-trim: first zero of an interior run kept, rest dropped, trailing trimmed") {
    // counts at hours 0 and 5 → interior hours 1-4 are zero: only hour 1
    // (prev nonzero) is kept (analysis.py:144). The trailing zero at hour 6
    // ALSO survives: the reference slices the compacted list by the grid
    // index of the last nonzero (analysis.py:154), and rows were skipped
    // before it — we reproduce that quirk bit-for-bit.
    val out = run(Seq(
      ("2024-01-01 00:00:00", 3600L, 2.0, "a"),
      ("2024-01-01 05:00:00", 3600L, 3.0, "a")))
    assert(out.toSeq == Seq(
      ("a", "2024-01-01 00:00:00.0", 3600.0, 2.0),
      ("a", "2024-01-01 01:00:00.0", 3600.0, 0.0),
      ("a", "2024-01-01 05:00:00.0", 3600.0, 3.0),
      ("a", "2024-01-01 06:00:00.0", 3600.0, 0.0)))
  }

  test("configured grid anchors at exact start; exact division adds one extra bin") {
    def runCfg(rows: Seq[(String, Long, Double, String)],
               start: String, stop: String) = {
      val df = rows.map { case (t, d, c, k) => (ts(t), d, c, k) }
        .toDF("ts", "duration_sec", "count", "counter")
      Rebin(df, "hours", 1, startTime = start, stopTime = stop,
        gridFromConfig = true)
        .orderBy("counter", "ts")
        .collect()
        .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getDouble(3)))
    }
    // origin 00:30 EXACT (no truncation): a [01:30,02:30) input lands in
    // ONE bin of the shifted grid, where the observed-grid layout would
    // split it across two truncated-hour bins. The first zero after it
    // survives (zero-trim keeps the first zero of each run, and the slice
    // bound is the last TOUCHED grid idx applied to the compacted list).
    val shifted = runCfg(
      Seq(("2024-01-01 01:30:00", 3600L, 6.0, "a")),
      "2024-01-01 00:30:00", "2024-01-01 05:30:00")
    assert(shifted.toSeq == Seq(
      ("a", "2024-01-01 01:30:00.0", 6.0),
      ("a", "2024-01-01 02:30:00.0", 0.0)))
    // ragged division (rebin.py:111-116): bins appended while
    // stop <= configured 02:30 gives 00:00 and 01:00, then ONE extra
    // (02:00) — an input ending at 02:30 is in range and must land in
    // that extra bin, which a grid without the post-loop append lacks
    val extra = runCfg(
      Seq(("2024-01-01 00:00:00", 3600L, 2.0, "a"),
          ("2024-01-01 02:00:00", 1800L, 4.0, "a")),
      "2024-01-01 00:00:00", "2024-01-01 02:30:00")
    assert(extra.toSeq == Seq(
      ("a", "2024-01-01 00:00:00.0", 2.0),
      ("a", "2024-01-01 01:00:00.0", 0.0),
      ("a", "2024-01-01 02:00:00.0", 4.0)))
  }

  test("per-counter grids are independent") {
    val out = run(Seq(
      ("2024-01-01 00:00:00", 3600L, 1.0, "a"),
      ("2024-01-02 00:00:00", 3600L, 9.0, "b")))
    assert(out.toSeq == Seq(
      ("a", "2024-01-01 00:00:00.0", 3600.0, 1.0),
      ("b", "2024-01-02 00:00:00.0", 3600.0, 9.0)))
  }

  test("trailing bin touched by a zero-count input bounds the trim") {
    // reference: last_non_zero_ct_idx is set whenever the bin is TOUCHED by
    // any input row, even with accumulated count 0.0 (analysis.py:140-142),
    // so the compacted [5, 0] survives the final slice
    val out = run(Seq(
      ("2024-01-01 00:00:00", 3600L, 5.0, "a"),
      ("2024-01-01 03:00:00", 3600L, 0.0, "a")))
    assert(out.toSeq == Seq(
      ("a", "2024-01-01 00:00:00.0", 3600.0, 5.0),
      ("a", "2024-01-01 01:00:00.0", 3600.0, 0.0)))
  }

  test("zero-duration rows are dropped, not divided by zero") {
    // count·overlap/size is undefined at size 0; engine and oracle filter
    // stop_ts > ts identically, so such input contributes nothing (and
    // does not extend the grid or mark bins touched)
    val out = run(Seq(
      ("2024-01-01 00:10:00", 600L, 5.0, "a"),
      ("2024-01-01 02:30:00", 0L, 99.0, "a"))) // degenerate: zero duration
    assert(out.toSeq == Seq(("a", "2024-01-01 00:00:00.0", 3600.0, 5.0)))
  }

  test("total count is conserved for in-range input fully covered by grid") {
    val in = Seq(
      ("2024-01-01 00:07:00", 1234L, 10.0, "a"),
      ("2024-01-01 03:33:00", 4321L, 7.0, "a"),
      ("2024-01-01 01:11:00", 600L, 3.0, "a"))
    val df = in.map { case (t, d, c, k) => (ts(t), d, c, k) }
      .toDF("ts", "duration_sec", "count", "counter")
    // sum of pre-truncation partial counts conserves the input total; here we
    // check the truncated outputs sum within (#bins) of the input total
    val outSum = Rebin(df, "hours", 1).agg(org.apache.spark.sql.functions.sum("count"))
      .head().getDouble(0)
    assert(outSum <= 20.0 && outSum >= 20.0 - 6)
  }
}
