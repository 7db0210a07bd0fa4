// package graft.ml for access to the private[ml] baselineMeans relation
// the equality pin compares against
package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming drift monitor must converge to EXACTLY the batch
  * [[Similarity.snapshotDrift]] means/deltas once the whole refresh has
  * streamed, across arbitrary micro-batch splits. Values are exact
  * binary fractions so float summation order cannot blur the equality.
  */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // snapshot A (even ids) vs refresh B (odd ids): dim 1 shifts by +8.0
  private val corpus = Seq(
    (0L, Array(0.5f, 1.0f)), (2L, Array(-0.5f, 2.0f)),
    (4L, Array(0.25f, 1.5f)), (6L, Array(-0.25f, 1.5f)),
    (1L, Array(0.5f, 9.0f)), (3L, Array(-0.5f, 10.0f)),
    (5L, Array(0.25f, 9.5f)), (7L, Array(-0.25f, 9.5f)))

  private def baseline = corpus.filter(_._1 % 2 == 0).toDF("vec_id", "embedding")
  private def refresh = corpus.filter(_._1 % 2 == 1)

  test("streamed drift ≡ batch snapshotDrift means, any micro-batch split") {
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingDrift.driftStream(
        input.toDF().toDF("vec_id", "embedding"), baseline)
      .writeStream.format("memory").queryName("sdrift")
      .outputMode("complete").start()
    try {
      input.addData(refresh.take(1)); q.processAllAvailable()
      input.addData(refresh.slice(1, 2)); q.processAllAvailable()
      input.addData(refresh.drop(2)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sdrift")
      .select("i", "mean_base", "mean_new", "n_new", "delta")
      .as[(Long, Double, Double, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

    val batch = Similarity.snapshotDrift(
        corpus.toDF("vec_id", "embedding"),
        pmod(col("vec_id"), lit(2)) === 1)
      .select("i", "mean_a", "mean_b", "delta")
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    assert(streamed.keySet === Set(0L, 1L))
    for (i <- Seq(0L, 1L)) {
      val (mb, mn, n, d) = streamed(i)
      val (bMeanA, bMeanB, bDelta) = batch(i)
      assert(mb === bMeanA, s"dim $i baseline mean")
      assert(mn === bMeanB, s"dim $i refresh mean")
      assert(n === 4L, s"dim $i refresh count")
      assert(d === bDelta, s"dim $i delta")
    }
    // the planted shift is visible on dim 1 only
    assert(streamed(0L)._4 === 0.0)
    assert(streamed(1L)._4 === 8.0)
  }
}
