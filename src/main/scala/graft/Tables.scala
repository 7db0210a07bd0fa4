package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md) and the
  * canonical mapping from the `events` table to the engine's logical
  * "counted time series" input (SURVEY.md §1.1): one row per
  * (interval_start, duration_sec, count, counter).
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // the events table carries TIMESTAMP(NANOS) which Spark 4 refuses by
    // default; read nanos as long and convert at the column level
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** events → raw counts: each event is a 300-second interval with count 1,
    * keyed by event_type. Timestamps are truncated to the second so the
    * DuckDB oracle (ns-precision parquet) and Spark (µs precision) agree
    * exactly on overlap arithmetic.
    */
  def eventsAsCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = load(spark, sfDir, "events")
    val tsCol = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_seconds(expr("ts DIV 1000000000"))
      case _ => date_trunc("second", col("ts"))
    }
    ev.select(
      tsCol.as("ts"),
      lit(300L).as("duration_sec"),
      lit(1.0).as("count"),
      col("event_type").as("counter"))
  }

  /** The same mapping as ANSI SQL for the DuckDB oracle. */
  val eventsAsCountsSql: String =
    """SELECT date_trunc('second', ts) AS ts, 300 AS duration_sec,
      |       1.0 AS count, event_type AS counter FROM events""".stripMargin

  /** Columnar intermediate store (S4) — the engine's replacement for the
    * reference's JSON dict-of-series handoff between stages
    * (trend_analyze_many.py:186,235). Counter-BUCKETED parquet, not
    * partitionBy(counter): a million counters as directories would be a
    * small-files disaster, while `nBuckets` hash buckets keep files
    * bounded, give partition pruning for single-counter reads
    * (bucket = hash(counter) % n is computable at lookup time), and let a
    * downstream per-counter stage start from co-partitioned data.
    */
  def saveBinned(binned: DataFrame, path: String, nBuckets: Int = 64): Unit =
    binned
      .withColumn("bucket", pmod(hash(col("counter")), lit(nBuckets)))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  def loadBinned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("bucket")
      .select("counter", "ts", "duration_sec", "count")
}
