package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Local semantics for the label-aware kNN family: vote determinism,
  * hard-negative label exclusion, and the consistency diagnostic on a
  * hand-built labeled micro-corpus (the sf-scale oracle hash is the
  * driver's t2 gate).
  */
class KnnEvalSpec extends SparkSpec {
  import spark.implicits._

  /** Two tight clusters on orthogonal axes, 2-dim: ids 0-3 hug (1, eps),
    * ids 10-13 hug (eps, 1). Labels follow the cluster except id 3 —
    * geometrically in cluster A but labeled B (the planted noise).
    */
  private def emb: DataFrame = Seq(
    (0L, Array(1.00f, 0.01f), 0),
    (1L, Array(0.99f, 0.02f), 0),
    (2L, Array(0.98f, 0.01f), 0),
    (3L, Array(0.97f, 0.03f), 1), // planted: A-cluster geometry, B label
    (10L, Array(0.01f, 1.00f), 1),
    (11L, Array(0.02f, 0.99f), 1),
    (12L, Array(0.01f, 0.98f), 1),
    (13L, Array(0.03f, 0.97f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("knnClassify: majority vote recovers cluster labels; planted noise misclassified") {
    val out = KnnEval.knnClassify(emb, lit(true), k = 3)
      .select("query_id", "label", "pred_label", "correct")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3)))
      .toMap
    // clean A members: 3 nearest are the other A vectors, two labeled 0
    // (one is the planted 1) -> majority 0, correct
    for (id <- Seq(0L, 1L, 2L))
      assert(out(id) === ((0, 0, 1)), s"vec $id")
    // planted noise: neighbors are the A cluster (labels 0,0,0) -> pred 0
    // against its own label 1 — exactly the mislabel signal
    assert(out(3L) === ((1, 0, 0)))
    // B members: nearest are other Bs -> label 1 recovered
    for (id <- Seq(10L, 11L, 12L, 13L))
      assert(out(id) === ((1, 1, 1)), s"vec $id")
  }

  test("knnAccuracy aggregates the same votes to one row") {
    val row = KnnEval.knnAccuracy(emb, lit(true), k = 3).collect().head
    assert(row.getAs[Long]("n_queries") === 8L)
    // 7 of 8 correct (only the planted noise misses)
    assert(math.abs(row.getAs[Double]("accuracy") - 0.875) < 1e-9)
  }

  test("vote tie-break is deterministic: count desc then smaller label") {
    // query 0 with k=2 over one label-1 and one label-2 neighbor at
    // distinct cosines: votes tie 1-1, smaller label must win
    val e = Seq(
      (0L, Array(1.00f, 0.00f), 5),
      (1L, Array(0.99f, 0.10f), 2),
      (2L, Array(0.99f, 0.05f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = KnnEval.knnClassify(e, col("vec_id") === 0, k = 2)
      .select("pred_label", "n_votes").as[(Int, Long)].collect()
    assert(out === Array((1, 1L)))
  }

  test("hardNegatives: every row crosses the label boundary, ranks dense from 1") {
    val negs = KnnEval.hardNegatives(emb, lit(true), k = 2)
      .select("query_id", "label", "neg_label", "rank")
      .collect()
    assert(negs.nonEmpty)
    negs.foreach(r => assert(r.getInt(1) !== r.getInt(2)))
    val byQuery = negs.groupBy(_.getLong(0))
    byQuery.values.foreach { rs =>
      assert(rs.map(_.getInt(3)).sorted === (1 to rs.length).toArray)
    }
    // the hardest negative of vec 0 is the planted same-geometry vec 3
    val hardest0 = negs.filter(r => r.getLong(0) === 0L && r.getInt(3) === 1)
    assert(hardest0.map(_.getAs[Long]("query_id")).nonEmpty)
  }

  test("hardNegativesIvf with full probe coverage ≡ exact hardNegatives") {
    // nProbe = nCells: every query probes every cell, so the candidate
    // set is the whole corpus minus self — the IVF miner must reproduce
    // the exact form row for row (contract + tie-break parity)
    val exact = KnnEval.hardNegatives(emb, lit(true), k = 2)
      .orderBy("query_id", "rank").collect().toSeq
    val ivf = KnnEval.hardNegativesIvf(emb, lit(true), k = 2,
      nCells = 2, nProbe = 2)
      .orderBy("query_id", "rank").collect().toSeq
    assert(ivf === exact)
  }

  test("hardNegativesIvf scopes mining to the probed cells") {
    // alternating ids put one seed centroid per family (cells = the two
    // axis clusters); nProbe = 1 probes only the query's own cell
    val e = Seq(
      (0L, Array(1.00f, 0.01f), 0), (2L, Array(0.99f, 0.02f), 0),
      (4L, Array(0.98f, 0.01f), 0), (6L, Array(0.97f, 0.03f), 1),
      (1L, Array(0.01f, 1.00f), 1), (3L, Array(0.02f, 0.99f), 1),
      (5L, Array(0.01f, 0.98f), 1), (7L, Array(0.03f, 0.97f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = KnnEval.hardNegativesIvf(e, col("vec_id") === 0, k = 5,
      nCells = 2, nProbe = 1)
      .select("neg_id", "neg_label", "rank").collect()
    // own-cell negatives only: vec 6 (the planted cross-label near-dup);
    // the y-family label-1 vectors live in the unprobed cell
    assert(out.map(_.getLong(0)).toSeq === Seq(6L))
    assert(out.head.getInt(1) === 1 && out.head.getInt(2) === 1)
  }

  test("hardNegativesRecall: 1.0 under full probing, below 1 when cells hide negatives") {
    // full probe coverage → IVF ≡ exact → recall exactly 1
    val full = KnnEval.hardNegativesRecall(emb, lit(true), k = 2,
      nCells = 2, nProbe = 2).collect()
    assert(full.map(_.getDouble(0)).toSeq === Seq(1.0))
    // two axis-cluster cells, nProbe=1: vec 0's exact top-5 negatives
    // include the y-family label-1 vectors, but its probed cell holds
    // only vec 6 — the miner finds 1 of 5
    val e = Seq(
      (0L, Array(1.00f, 0.01f), 0), (2L, Array(0.99f, 0.02f), 0),
      (4L, Array(0.98f, 0.01f), 0), (6L, Array(0.97f, 0.03f), 1),
      (1L, Array(0.01f, 1.00f), 1), (3L, Array(0.02f, 0.99f), 1),
      (5L, Array(0.01f, 0.98f), 1), (7L, Array(0.03f, 0.97f), 1)
    ).toDF("vec_id", "embedding", "label")
    val scoped = KnnEval.hardNegativesRecall(e, col("vec_id") === 0, k = 5,
      nCells = 2, nProbe = 1).collect()
    assert(scoped.map(_.getDouble(0)).toSeq === Seq(0.2))
    // sub-k exact set: vec 0 has only 5 negatives in the corpus, so at
    // k=8 a perfect full-probe match must still score 1.0 — the
    // denominator is what the exact side HAS, not the fixed k
    val subK = KnnEval.hardNegativesRecall(e, col("vec_id") === 0, k = 8,
      nCells = 2, nProbe = 2).collect()
    assert(subK.map(_.getDouble(0)).toSeq === Seq(1.0))
  }

  test("labelConsistency: planted noise scores 0, its clean cluster-mates score 2/3") {
    // threshold 0.9 keeps only within-cluster neighbors (cross-cluster
    // cosine ~ 0.03); nCells=1 so cell scoping cannot hide anything here
    val out = KnnEval.labelConsistency(emb, threshold = 0.9, nCells = 1)
      .select("vec_id", "n_neighbors", "n_same", "consistency")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // planted vec 3: 3 same-cluster neighbors, all labeled 0 vs its 1
    assert(out(3L) === ((3L, 0L, 0.0)))
    // clean A vectors: neighbors are 2 same-label + the planted mislabel
    for (id <- Seq(0L, 1L, 2L))
      assert(out(id) === ((3L, 2L, 0.666667)), s"vec $id")
    // clean B cluster: fully consistent
    for (id <- Seq(10L, 11L, 12L, 13L))
      assert(out(id) === ((3L, 3L, 1.0)), s"vec $id")
  }

  test("knnClusters: mutual cell-scoped kNN recovers the two families") {
    // alternating ids so the two smallest-id seeds (0, 1) land one per
    // family -> cell 0 = x-axis family, cell 1 = y-axis family
    val e = Seq(
      (0L, Array(1.00f, 0.01f)), (2L, Array(0.99f, 0.02f)),
      (4L, Array(0.98f, 0.01f)), (6L, Array(0.97f, 0.03f)),
      (1L, Array(0.01f, 1.00f)), (3L, Array(0.02f, 0.99f)),
      (5L, Array(0.01f, 0.98f)), (7L, Array(0.03f, 0.97f))
    ).toDF("vec_id", "embedding")
    val out = KnnEval.knnClusters(e, k = 3, nCells = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    for (id <- Seq(0L, 2L, 4L, 6L))
      assert(out(id) === ((0L, id == 0L)), s"vec $id")
    for (id <- Seq(1L, 3L, 5L, 7L))
      assert(out(id) === ((1L, id == 1L)), s"vec $id")
  }
}
