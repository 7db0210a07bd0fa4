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

  test("hybridRrf fuses the component lists by exact integer RRF") {
    // corpus: doc 1 is the lexical hit, vec 3 is the dense hit; doc/vec 2
    // shows up in both lists → must collect BOTH contributions
    val d = Seq(
      0L -> "a b c d",
      1L -> "a b c z",
      2L -> "a b y y",
      3L -> "q r s t").toDF("doc_id", "text")
    val emb = Seq(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0f, 1f, 0f, 0f),
      2L -> Seq(0.9f, 0.1f, 0f, 0f),
      3L -> Seq(0.99f, 0f, 0.1f, 0f)).toDF("vec_id", "embedding")
    val k = 3
    val fused = Retrieval.hybridRrf(d, emb, k = k, nSeeds = 1)
      .orderBy("rank")
      .select("query_id", "cand_id", "lex_rank", "dense_rank", "rrf_micro", "rank")
      .as[(Long, Long, Int, Int, Long, Int)].collect().toSeq
    // expected fusion recomputed from the component operators themselves
    val lex = Retrieval.bm25TopK(d, col("doc_id") < 1, k)
      .select("query_id", "doc_id", "rank")
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val den = Similarity.ivfTopK(emb, col("vec_id") < 1, k)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    def c(r: Option[Int]): Long =
      r.map(x => math.floor(1e6 / (60 + x) + 0.5).toLong).getOrElse(0L)
    val expect = (lex.keySet ++ den.keySet).toSeq
      .map { key =>
        (key._1, key._2, lex.get(key).getOrElse(-1), den.get(key).getOrElse(-1),
          c(lex.get(key)) + c(den.get(key)))
      }
      .sortBy(t => (t._1, -t._5, t._2))
      .take(k).zipWithIndex
      .map { case ((q, cand, lr, dr, s), i) => (q, cand, lr, dr, s, i + 1) }
    assert(fused === expect)
    // the fixture exercises all three membership cases
    assert(fused.exists(r => r._3 > 0 && r._4 > 0), "no both-lists candidate")
    assert(fused.exists(r => r._3 === -1 || r._4 === -1), "no one-list candidate")
  }
}
