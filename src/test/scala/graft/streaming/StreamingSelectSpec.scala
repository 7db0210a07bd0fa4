// package graft.ml for access to the private[ml] scorer the equality
// pins compare against
package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The score-at-ingest admission gate must emit EXACTLY the batch
  * profile scorer's rows, across arbitrary micro-batch splits, with
  * zero streaming state.
  */
class StreamingSelectSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // seed doc 100 defines the profile; corpus docs overlap it to
  // different degrees; doc 9 is too short to hold a bigram
  private val corpus = Seq(
    (100L, "alpha beta gamma delta epsilon zeta"),
    (1L, "alpha beta gamma delta something else entirely here"),
    (2L, "alpha beta unrelated tail words continue onward now"),
    (3L, "completely different vocabulary in this document here"),
    (4L, "alpha beta gamma delta epsilon zeta almost a copy"),
    (9L, "short"))

  private def docs = corpus.toDF("doc_id", "text")
  private val isSeed = col("doc_id") === 100

  test("streamed admission ≡ batch profileScore, any micro-batch split") {
    val batch = Retrieval.profileScore(docs, isSeed)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(batch.exists(_._3 > 0) && batch.exists(_._3 == 0)) // non-vacuous
    val (profile, avgdl) =
      StreamingSelect.collectProfile(Retrieval.profileWeights(docs, isSeed))
    assert(profile.nonEmpty)
    val input = MemoryStream[(Long, String)]
    val q = StreamingSelect.scoreStream(
      input.toDF().toDF("doc_id", "text"), profile, avgdl)
      .writeStream.format("memory").queryName("sselect")
      .outputMode("append").start()
    val rows = corpus.filter(_._1 != 100L)
    try {
      input.addData(rows.take(1)); q.processAllAvailable()
      input.addData(rows.slice(1, 4)); q.processAllAvailable()
      input.addData(rows.drop(4)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sselect").orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(streamed === batch)
  }

  test("null text scores (0, 0, not admitted) — like the batch left join") {
    val (profile, avgdl) =
      StreamingSelect.collectProfile(Retrieval.profileWeights(docs, isSeed))
    // batch: a null-text doc falls out of the bigram explode, so the
    // left join scores it 0/0/false — the stream must match, not NPE
    val dirty = Seq((1L, "alpha beta gamma delta"), (2L, null: String))
    val input = MemoryStream[(Long, String)]
    val q = StreamingSelect.scoreStream(
      input.toDF().toDF("doc_id", "text"), profile, avgdl)
      .writeStream.format("memory").queryName("sselect_null")
      .outputMode("append").start()
    try {
      input.addData(dirty: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sselect_null").orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(streamed.exists(r => r._1 == 2L && r._2 == 0L && r._3 == 0L && !r._4))
    assert(streamed.exists(r => r._1 == 1L && r._3 > 0L))
  }

  test("admission plan is stateless — no streaming aggregation state") {
    val (profile, avgdl) =
      StreamingSelect.collectProfile(Retrieval.profileWeights(docs, isSeed))
    val input = MemoryStream[(Long, String)]
    val q = StreamingSelect.scoreStream(
      input.toDF().toDF("doc_id", "text"), profile, avgdl)
      .writeStream.format("memory").queryName("sselect_plan")
      .outputMode("append").start()
    try {
      input.addData((1L, "alpha beta gamma")); q.processAllAvailable()
      val p = q.lastProgress
      assert(p == null || p.stateOperators.isEmpty,
        s"stateful operators in the admission plan: ${p.stateOperators}")
    } finally q.stop()
  }
}
