package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[Similarity.snapshotDrift]] — the refresh-time
  * drift monitor run ON the ingest stream instead of after it lands: the
  * standing corpus contributes a per-dimension baseline mean (computed
  * once, broadcast as a static side), each arriving vector explodes into
  * (dimension, value) rows, and one streaming aggregation maintains the
  * cumulative per-dimension mean of everything ingested so far. Output
  * (update/complete mode): (i, mean_base, mean_new, n_new, delta).
  *
  * State is dim-bounded — 64 rows of (sum, count) regardless of stream
  * length — and the static join is broadcast BEFORE the aggregation, so
  * the plan is a stream-static broadcast join feeding one stateful agg
  * (aggregation-then-join chains are restricted in Structured Streaming;
  * this order is the supported shape). An embedding-model regression in
  * the producer shows up as a growing |delta| on affected dimensions
  * while the batch is still ingesting, not at the next index rebuild.
  */
object StreamingDrift {

  /** Per-dimension baseline means of the standing corpus (static side). */
  private[ml] def baselineMeans(baseline: DataFrame): DataFrame =
    baseline
      .select(posexplode(col("embedding").cast("array<double>"))
        .as(Seq("i", "x")))
      .groupBy(col("i").cast("long").as("i"))
      .agg(avg(col("x")).as("mean_base"))

  /** `stream` must be a streaming DataFrame with an `embedding` column;
    * `baseline` is the static standing corpus. Start the returned frame
    * with outputMode update (deltas per micro-batch) or complete.
    */
  def driftStream(stream: DataFrame, baseline: DataFrame): DataFrame = {
    // materialize the dim-row baseline ONCE, ON THE DRIVER: the static
    // side of a stream-static join is re-planned every micro-batch, so
    // without materialization each batch re-runs the full-corpus
    // posexplode + groupBy just to rebuild these rows. The round-8 fix
    // (localCheckpoint) traded away fault tolerance silently — its
    // blocks live on ONE executor with NO lineage, and the round-9
    // executor-kill test (StreamBench drift_killexec) watched a dead
    // executor take the whole query down with
    // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND. The baseline is dim-bounded
    // (64 rows), so a driver-held LocalRelation is both fault-free and
    // replan-free — no executor state at all.
    val spark = baseline.sparkSession
    val bm = baselineMeans(baseline)
    val base = spark.createDataFrame(
      java.util.Arrays.asList(bm.collect(): _*), bm.schema)
    stream
      .select(posexplode(col("embedding").cast("array<double>"))
        .as(Seq("i", "x")))
      .select(col("i").cast("long").as("i"), col("x"))
      .join(broadcast(base), Seq("i"))
      .groupBy("i")
      .agg(
        max(col("mean_base")).as("mean_base"), // constant per dimension
        avg(col("x")).as("mean_new"),
        count(lit(1)).as("n_new"))
      .select(col("i"), round(col("mean_base"), 6).as("mean_base"),
        round(col("mean_new"), 6).as("mean_new"), col("n_new"),
        round(col("mean_new") - col("mean_base"), 6).as("delta"))
  }
}
