package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The many-counter JSON container — the reference's intermediate between
  * rebin and analyze in the parallel driver (trend_analyze_many.py:130,
  * 147,186,235): one JSON object per counter holding its full
  * time-ordered point list. The Spark twin keeps the same logical shape
  * (`{"counter": ..., "points": [[t, dur, count], ...]}`) as JSON Lines,
  * with `t` as epoch seconds so the round trip has no timestamp-format
  * ambiguity; `points` is sorted by time inside the array, making the
  * file content deterministic per counter.
  *
  * Scale shape: one hash aggregation by counter to assemble each array
  * (points-per-counter bounded by the grid, not raw events), a plain
  * distributed JSON write, and an explode on read — both edges
  * splittable; no driver-side container dict like the reference's.
  */
object JsonContainer {

  /** binned (counter, ts, duration_sec, count) → JSON container files. */
  def write(binned: DataFrame, path: String): Unit =
    binned.groupBy("counter")
      .agg(array_sort(collect_list(struct(
        unix_timestamp(col("ts")).as("t"),
        col("duration_sec").as("d"),
        col("count").as("c")))).as("points"))
      .write.mode("overwrite").json(path)

  /** JSON container files → binned (counter, ts, duration_sec, count). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema("counter STRING, points ARRAY<STRUCT<t: BIGINT, d: DOUBLE, c: DOUBLE>>")
      .json(path)
      .select(col("counter"), explode(col("points")).as("p"))
      .select(col("counter"),
        timestamp_seconds(col("p.t")).as("ts"),
        col("p.d").as("duration_sec"),
        col("p.c").as("count"))
}
