package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit coverage for BM25 retrieval on hand-checkable micro-corpora (the
  * sf-scale oracle check is the driver's t2 gate).
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25TopK: tf weighting ranks the double-match first, zero-overlap absent") {
    // query doc 0: bigrams {"x y","y z","z w"}; doc 1 holds "x y" twice,
    // doc 2 once, doc 3 shares nothing
    val d = Seq(
      0L -> "x y z w",
      1L -> "x y x y",
      2L -> "x y q",
      3L -> "q r s").toDF("doc_id", "text")
    // dfCapFrac 1.0: at N = 3 the default cap floor(0.5·N) = 1 would
    // prune the very terms under test
    val out = Retrieval.bm25TopK(d, col("doc_id") === 0, k = 10, dfCapFrac = 1.0)
      .orderBy("rank")
      .select("query_id", "doc_id", "rank")
      .as[(Long, Long, Int)].collect().toSeq
    assert(out.map(_._1).toSet === Set(0L))
    assert(out.map(_._2) === Seq(1L, 2L)) // tf=2 beats tf=1; doc 3 absent
    assert(out.map(_._3) === Seq(1, 2))
  }

  test("bm25TopK: df cap prunes a term present in every corpus doc") {
    // "c c" appears in all 3 corpus docs (df = 3 = N > 0.5·N → pruned);
    // "a b" appears only in doc 1 → the sole surviving contribution
    val d = Seq(
      0L -> "a b c c",
      1L -> "a b c c",
      2L -> "c c d",
      3L -> "c c e").toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(d, col("doc_id") === 0, k = 10)
      .select("doc_id").as[Long].collect().toSeq
    assert(out === Seq(1L)) // docs 2,3 matched only the capped stopword term
  }

  test("bm25TopK: score is an integer micro-unit sum, ties break on doc_id") {
    // docs 1 and 2 are identical → identical scores; rank order by doc_id
    val d = Seq(
      0L -> "p q r s",
      1L -> "p q m",
      2L -> "p q m").toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(d, col("doc_id") === 0, k = 10, dfCapFrac = 1.0)
      .orderBy("rank")
      .select("doc_id", "score_micro", "rank")
      .as[(Long, Long, Int)].collect().toSeq
    assert(out.map(_._1) === Seq(1L, 2L))
    assert(out(0)._2 === out(1)._2)
    assert(out.forall(_._2 > 0))
  }
}
