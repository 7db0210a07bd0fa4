// package graft.ml for access to the private[ml] index relations the
// equality pins compare against
package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming admission probe must emit EXACTLY the batch incremental
  * path's cross (batch×snapshot) pairs, across arbitrary micro-batch
  * splits, with a per-batch distinct at the sink.
  */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // near-dup families spanning the even/odd split: docs 1/2/3 share most
  // shingles, 4/5 are copies, 6/7/8 unrelated, 9 too short to shingle
  private val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "alpha beta gamma delta epsilon zeta eta iota"),
    (3L, "alpha beta gamma delta epsilon zeta eta theta kappa"),
    (4L, "one two three four five six seven eight nine ten"),
    (5L, "one two three four five six seven eight nine ten"),
    (6L, "completely different words in this document here now"),
    (7L, "unrelated content again with its own vocabulary set"),
    (8L, "yet another standalone text nothing shared at all"),
    (9L, "too short"))

  private def snapshot = corpus.filter(_._1 % 2 == 0).toDF("doc_id", "text")
  private def batchRows = corpus.filter(_._1 % 2 == 1)

  test("streaming probe ≡ batch incremental cross pairs, any batch split") {
    val input = MemoryStream[(Long, String)]
    val q = StreamingNearDup.nearDupProbeStream(
      input.toDF().toDF("doc_id", "text"), snapshot)
      .writeStream.format("memory").queryName("sprobe")
      .outputMode("append").start()
    try {
      // three micro-batches, including a singleton and the short doc
      input.addData(batchRows.take(1)); q.processAllAvailable()
      input.addData(batchRows.slice(1, 3)); q.processAllAvailable()
      input.addData(batchRows.drop(3)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sprobe").distinct() // per contract
      .as[(Long, Long, Double)].collect().toSet

    val batchOut = Dedup.minHashLshIncremental(
        snapshot, batchRows.toDF("doc_id", "text"))
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => (a % 2 == 0) != (b % 2 == 0) } // cross only
      .toSet
    assert(streamed === batchOut)
    assert(streamed.nonEmpty) // families 1/2/3 and 4/5 straddle the split
  }

  test("per-row signature ≡ the batch band table, including band keys") {
    val docs = corpus.toDF("doc_id", "text")
    val batchBands = Dedup.bandTable(Dedup.shingleTable(docs, 3), 16, 8)
      .select("doc_id", "band", "bkey")
      .as[(Long, Long, String)].collect().toSet
    val rowBands = corpus.flatMap { case (id, text) =>
      StreamingNearDup.signature(text, 3, 16, 8)._2
        .map { case (b, key) => (id, b, key) }
    }.toSet
    assert(rowBands === batchBands)
    // the short doc contributes no bands on either path
    assert(!rowBands.exists(_._1 == 9L))
  }

  test("standing index materializes at plan construction, not per micro-batch") {
    // the stream-static join re-plans its static side every micro-batch:
    // the three snapshot relations (shingles, band index, shingle sets)
    // must be PERSISTED and materialized at CONSTRUCTION, or each
    // arriving batch re-runs the O(corpus) minhash pass (round-8
    // StreamBench finding). persist — not localCheckpoint — since round
    // 9: checkpoint blocks have no lineage and die with their executor
    // (the drift_killexec finding); the CacheManager also DEDUPES, so a
    // second stream over the same snapshot shares the standing index
    // instead of rebuilding it.
    val sc = spark.sparkContext
    spark.catalog.clearCache() // isolate from earlier tests' shared cache
    val before = sc.getPersistentRDDs.keySet.toSet
    val input = MemoryStream[(Long, String)]
    StreamingNearDup.nearDupProbeStream(
      input.toDF().toDF("doc_id", "text"), snapshot)
    val created = sc.getPersistentRDDs.keySet.toSet -- before
    assert(created.size >= 3,
      s"expected >= 3 persisted+materialized index relations, got ${created.size}")
    // lineage retained: a persisted relation recomputes after block loss
    // instead of aborting (localCheckpoint would truncate to nothing)
    created.foreach { id =>
      sc.getPersistentRDDs.get(id).foreach { r =>
        assert(r.getStorageLevel.useDisk || r.getStorageLevel.useMemory)
      }
    }
    spark.catalog.clearCache()
  }

  test("probe plan is stateless — no streaming aggregation state") {
    val input = MemoryStream[(Long, String)]
    val sdf = StreamingNearDup.nearDupProbeStream(
      input.toDF().toDF("doc_id", "text"), snapshot)
    val q = sdf.writeStream.format("noop").outputMode("append").start()
    try {
      input.addData(batchRows); q.processAllAvailable()
      val progress = q.lastProgress
      assert(progress.stateOperators.isEmpty,
        s"expected zero state operators:\n$progress")
    } finally q.stop()
  }
}
