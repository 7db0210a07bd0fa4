package graft.streaming

import graft.SparkSpec
import graft.ml.TextStats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The stateless curation gates (quality, language-ID) are pure row
  * projections, so the SAME operator code runs under Structured
  * Streaming with no changes — this spec pins that property (a batch
  * plan rewrite that introduced state or a shuffle would break it).
  */
class StreamingTextSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val rows: Seq[(Long, String)] = Seq(
    1L -> "the quick brown fox jumps over the lazy dog again and again",
    2L -> "der schnelle braune fuchs und der faule hund",
    3L -> "zz yy xx")

  test("quality and language-ID run unchanged on a stream, equal to batch") {
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val q1 = TextStats.quality(stream)
      .writeStream.format("memory").queryName("squal")
      .outputMode("append").start()
    val q2 = TextStats.languageId(stream)
      .writeStream.format("memory").queryName("slang")
      .outputMode("append").start()
    try {
      input.addData(rows.take(2)); q1.processAllAvailable(); q2.processAllAvailable()
      input.addData(rows.drop(2)); q1.processAllAvailable(); q2.processAllAvailable()
    } finally { q1.stop(); q2.stop() }

    val batchDocs = rows.toDF("doc_id", "text")
    val bq = TextStats.quality(batchDocs)
    val bl = TextStats.languageId(batchDocs)
    assert(spark.table("squal").exceptAll(bq).isEmpty &&
      bq.exceptAll(spark.table("squal")).isEmpty)
    assert(spark.table("slang").exceptAll(bl).isEmpty &&
      bl.exceptAll(spark.table("slang")).isEmpty)
  }
}
