package graft.ml

import graft.functions.VecFold
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Label-aware evaluation and mining over the embedding corpus — the
  * layer a training-data pipeline runs on top of its ANN index once the
  * vectors carry labels (class tags, cluster ids, source buckets):
  *
  *  - [[knnClassify]] / [[knnAccuracy]]: leave-one-out k-nearest-neighbor
  *    majority-vote classification — the standard embedding-quality probe
  *    (kNN accuracy is the first number reported for any representation;
  *    chance-level accuracy means the embedding carries no label signal).
  *  - [[knnClassifyIvf]]: the same vote over IVF-cell candidates instead
  *    of the exact ranking — the composition that survives a corpus the
  *    brute pass cannot: candidates per query stay ≈ nProbe·occupancy
  *    under [[Similarity.autoCells]].
  *  - [[hardNegatives]]: per query, the top-ranked neighbors whose label
  *    DIFFERS — contrastive-training hard-negative mining (the pairs a
  *    triplet/InfoNCE loss learns most from are near-duplicates across a
  *    label boundary).
  *  - [[labelConsistency]]: per-vector neighborhood label agreement over
  *    threshold-similar neighbors, built directly on
  *    [[Similarity.semanticDedup]]'s cell-scoped pair kernel — on a real
  *    corpus, low consistency IS the label-noise signal (confident-
  *    learning style), and the cost inherits the measured linear-in-n
  *    within-cell candidate volume instead of an all-pairs vote.
  *
  * All vote tie-breaks are deterministic (count desc, label asc) and
  * written identically in the DuckDB oracles. On the synthetic test
  * embeddings labels are independent of geometry, so the measured
  * accuracy sits at chance (~1/10) — the operators' contract is the
  * machinery (exact rank parity, vote determinism), not the corpus.
  */
object KnnEval {

  private def dot(a: Column, b: Column): Column = VecFold.dot(a, b)

  /** (vec_id, label, v, norm) — [[Similarity.normed]] plus the label. */
  private def labeledNormed(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label").cast("int").as("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(VecFold.dot(col("v"), col("v"))))

  /** Exact scored candidates (query × corpus, self excluded), labels on
    * both sides. Same join shape as [[Similarity.bruteForceTopK]]: the
    * query relation is query-proportional, AQE broadcasts it when small.
    */
  private def scoredWithLabels(emb: DataFrame, isQuery: Column): DataFrame = {
    val e = labeledNormed(emb)
    val q = e.where(isQuery).select(
      col("vec_id").as("query_id"), col("label").as("qlabel"),
      col("v").as("qv"), col("norm").as("qnorm"))
    e.join(q, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qlabel"),
        col("vec_id").as("neighbor_id"), col("label").as("n_label"),
        round(Similarity.safeCosine(dot(col("v"), col("qv")),
          col("norm"), col("qnorm")), 6).as("cosine"))
  }

  /** Majority vote over a top-k candidate table
    * (query_id, qlabel, n_label): one row per query —
    * (query_id, label, pred_label, n_votes, correct). Tie-break:
    * vote count desc, then smaller label.
    */
  private def vote(top: DataFrame): DataFrame = {
    val votes = top.groupBy("query_id", "qlabel", "n_label")
      .agg(count(lit(1)).as("n_votes"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("n_votes"), asc("n_label"))
    votes.withColumn("r", row_number().over(w)).where(col("r") === 1)
      .select(col("query_id"), col("qlabel").as("label"),
        col("n_label").as("pred_label"), col("n_votes"),
        (col("n_label") === col("qlabel")).cast("int").as("correct"))
  }

  /** Leave-one-out exact kNN classification for every `isQuery` vector:
    * (query_id, label, pred_label, n_votes, correct). Cost is the brute
    * ANN pass (queries × corpus) — the oracle baseline; use
    * [[knnClassifyIvf]] when the corpus outgrows it.
    */
  def knnClassify(emb: DataFrame, isQuery: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    vote(Similarity.topK(scoredWithLabels(emb, isQuery), k))
  }

  /** One-row harness rollup of [[knnClassify]]:
    * (accuracy, n_queries). */
  def knnAccuracy(emb: DataFrame, isQuery: Column, k: Int): DataFrame =
    knnClassify(emb, isQuery, k)
      .agg(round(avg(col("correct")), 6).as("accuracy"),
        count(lit(1)).as("n_queries"))

  /** kNN vote over the IVF index instead of the exact ranking — the
    * scale path: [[Similarity.ivfTopK]] supplies the candidates
    * (auto-scaled cell count keeps candidates/query constant), labels
    * join back by id, the vote is identical. Recall < 1 by design, so
    * predictions can differ from [[knnClassify]] near vote boundaries.
    */
  def knnClassifyIvf(emb: DataFrame, isQuery: Column, k: Int): DataFrame = {
    val lab = emb.select(col("vec_id"), col("label").cast("int").as("label"))
    val top = Similarity.ivfTopK(emb, isQuery, k)
      .join(lab.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("label", "n_label"), Seq("neighbor_id"))
      .join(lab.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("label", "qlabel"), Seq("query_id"))
    vote(top)
  }

  /** Per query, the `k` highest-cosine neighbors whose label differs —
    * hard-negative mining for contrastive training:
    * (query_id, label, neg_id, neg_label, cosine, rank). The label
    * filter applies BEFORE ranking (rank 1 = hardest negative), so ranks
    * are dense within the negative set.
    */
  def hardNegatives(emb: DataFrame, isQuery: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val negs = scoredWithLabels(emb, isQuery)
      .where(col("n_label") =!= col("qlabel"))
    Similarity.topK(negs, k)
      .select(col("query_id"), col("qlabel").as("label"),
        col("neighbor_id").as("neg_id"), col("n_label").as("neg_label"),
        col("cosine"), col("rank"))
  }

  /** [[hardNegatives]] over the IVF probe-cell candidate set instead of
    * the exact query × corpus pass — the scale path: hard-negative
    * mining runs once per training epoch, so at corpus scale it must
    * ride the index ([[Similarity.ivfCandidates]] keeps candidates/query
    * ≈ nProbe · occupancy under autoCells) the way [[knnClassifyIvf]]
    * already does for the vote. The label-mismatch filter applies to the
    * CANDIDATE set before ranking (identical semantics to the exact
    * form: rank 1 = hardest negative, dense ranks within the negative
    * set); negatives outside the probed cells are missed by construction
    * — the standard ANN-mining recall trade-off, priced by comparing
    * against [[hardNegatives]] on a sample. Same output contract and
    * tie-break (cosine desc, id asc) as the exact form.
    */
  def hardNegativesIvf(emb: DataFrame, isQuery: Column, k: Int,
                       nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    require(k > 0, "k must be positive")
    val lab = emb.select(col("vec_id"), col("label").cast("int").as("label"))
    val negs = Similarity.ivfCandidates(emb, isQuery, nCells, nProbe)
      .join(lab.toDF("neighbor_id", "n_label"), Seq("neighbor_id"))
      .join(lab.toDF("query_id", "qlabel"), Seq("query_id"))
      .where(col("n_label") =!= col("qlabel"))
    Similarity.topK(negs, k)
      .select(col("query_id"), col("qlabel").as("label"),
        col("neighbor_id").as("neg_id"), col("n_label").as("neg_label"),
        col("cosine"), col("rank"))
  }

  /** Recall of the IVF-mined hard negatives against the exact mining —
    * the number that prices [[hardNegativesIvf]]'s probed-cell scope:
    * the fraction of each query's exact top-k hardest negatives the
    * index-ridden miner also surfaces, averaged over queries (the same
    * contract as the ANN recall evals — run it on a SAMPLE at corpus
    * scale, it embeds the exact Θ(queries × corpus) pass by definition).
    */
  def hardNegativesRecall(emb: DataFrame, isQuery: Column, k: Int,
                          nCells: Int = 16, nProbe: Int = 4): DataFrame =
    Similarity.recallVs(
      hardNegatives(emb, isQuery, k)
        .withColumnRenamed("neg_id", "neighbor_id"),
      hardNegativesIvf(emb, isQuery, k, nCells, nProbe)
        .withColumnRenamed("neg_id", "neighbor_id"), k)

  /** Neighborhood label consistency over threshold-similar neighbors:
    * for every vector with at least one same-cell neighbor of cosine >=
    * `threshold`, the fraction of those neighbors sharing its label —
    * (vec_id, label, n_neighbors, n_same, consistency). Candidates come
    * from [[Similarity.semanticDedup]] (nearest-centroid cells, fused
    * block kernel, auto-scaled cell count), so the vote volume is the
    * measured within-cell pair volume — linear in n at constant
    * occupancy — never an all-pairs pass. Low consistency on a real
    * corpus flags probable label noise; cross-cell neighbors are missed
    * by construction (the SemDeDup trade-off, documented there).
    */
  def labelConsistency(emb: DataFrame, threshold: Double,
                       nCells: Int = 16): DataFrame = {
    require(threshold >= -1.0 && threshold <= 1.0,
      "threshold is a cosine — must lie in [-1, 1]")
    val pairs = Similarity.semanticDedup(emb, threshold, nCells)
    val sym = pairs.select(col("vec_a").as("vec_id"), col("vec_b").as("nb"))
      .unionAll(pairs.select(col("vec_b").as("vec_id"), col("vec_a").as("nb")))
    val lab = emb.select(col("vec_id"), col("label").cast("int").as("label"))
    sym
      .join(lab.withColumnRenamed("vec_id", "nb")
        .withColumnRenamed("label", "n_label"), Seq("nb"))
      .join(lab, Seq("vec_id"))
      .groupBy("vec_id", "label")
      .agg(count(lit(1)).as("n_neighbors"),
        sum((col("n_label") === col("label")).cast("long")).as("n_same"))
      .withColumn("consistency",
        round(col("n_same") / col("n_neighbors"), 6))
  }

  // ---------------------------------------------------------------- SQL

  private def labeledCteSql: String =
    s"""e AS (
       |  SELECT vec_id, label, embedding::DOUBLE[] AS v,
       |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
       |  FROM embeddings)""".stripMargin

  /** Vote SQL over a CTE `top(query_id, qlabel, n_label)`. */
  private def voteSql(src: String): String =
    s"""votes AS (
       |  SELECT query_id, qlabel, n_label, count(*) AS n_votes
       |  FROM $src GROUP BY 1, 2, 3),
       |pred AS (
       |  SELECT *, row_number() OVER (
       |      PARTITION BY query_id ORDER BY n_votes DESC, n_label) AS r
       |  FROM votes)""".stripMargin

  private def classifySelectSql: String =
    s"""SELECT query_id, qlabel AS label, n_label AS pred_label, n_votes,
       |       (n_label = qlabel)::INT AS correct
       |FROM pred WHERE r = 1""".stripMargin

  /** Oracle for [[knnClassify]]: the brute top-k SQL with labels joined,
    * then the identical vote. */
  def knnClassifyOracleSql(k: Int): String =
    s"""WITH bf AS (SELECT * FROM (${Similarity.bruteForceTopKOracleSql(k)})),
       |lab AS (SELECT vec_id, label FROM embeddings),
       |top AS (
       |  SELECT bf.query_id, ql.label AS qlabel, nl.label AS n_label
       |  FROM bf
       |  JOIN lab nl ON nl.vec_id = bf.neighbor_id
       |  JOIN lab ql ON ql.vec_id = bf.query_id),
       |${voteSql("top")}
       |$classifySelectSql""".stripMargin

  def knnAccuracyOracleSql(k: Int): String =
    s"""WITH cls AS (SELECT * FROM (${knnClassifyOracleSql(k)}))
       |SELECT round(avg(correct), 6) AS accuracy, count(*) AS n_queries
       |FROM cls""".stripMargin

  def knnClassifyIvfOracleSql(k: Int): String =
    s"""WITH ivf AS (SELECT * FROM (${Similarity.ivfTopKOracleSql(k)})),
       |lab AS (SELECT vec_id, label FROM embeddings),
       |top AS (
       |  SELECT ivf.query_id, ql.label AS qlabel, nl.label AS n_label
       |  FROM ivf
       |  JOIN lab nl ON nl.vec_id = ivf.neighbor_id
       |  JOIN lab ql ON ql.vec_id = ivf.query_id),
       |${voteSql("top")}
       |$classifySelectSql""".stripMargin

  def hardNegativesOracleSql(k: Int,
      isQuerySql: String = Similarity.defaultIsQuerySql): String =
    s"""WITH $labeledCteSql,
       |q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv, norm AS qnorm
       |      FROM e WHERE $isQuerySql),
       |scored AS (
       |  SELECT q.query_id, q.qlabel, e.vec_id AS neg_id, e.label AS neg_label,
       |         round(${Similarity.safeCosineSql(
                  "list_dot_product(e.v, q.qv)", "e.norm", "q.qnorm")}, 6) AS cosine
       |  FROM e JOIN q ON e.vec_id != q.query_id AND e.label != q.qlabel),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |            ORDER BY cosine DESC, neg_id) AS rank
       |  FROM scored)
       |SELECT query_id, qlabel AS label, neg_id, neg_label, cosine, rank
       |FROM ranked WHERE rank <= $k""".stripMargin

  def hardNegativesIvfOracleSql(k: Int, nCells: Int = 16, nProbe: Int = 4,
      isQuerySql: String = Similarity.defaultIsQuerySql): String =
    s"""WITH ${Similarity.ivfScoredCtesSql(nCells, nProbe, isQuerySql)},
       |lab AS (SELECT vec_id, label FROM embeddings),
       |negs AS (
       |  SELECT s.query_id, ql.label AS qlabel, s.neighbor_id AS neg_id,
       |         nl.label AS neg_label, s.cosine
       |  FROM scored s
       |  JOIN lab nl ON nl.vec_id = s.neighbor_id
       |  JOIN lab ql ON ql.vec_id = s.query_id
       |  WHERE nl.label != ql.label),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |            ORDER BY cosine DESC, neg_id) AS rank
       |  FROM negs)
       |SELECT query_id, qlabel AS label, neg_id, neg_label, cosine, rank
       |FROM ranked WHERE rank <= $k""".stripMargin

  def hardNegativesRecallOracleSql(k: Int, nCells: Int = 16, nProbe: Int = 4,
      isQuerySql: String = Similarity.defaultIsQuerySql): String =
    Similarity.recallOracleSql(
      s"""SELECT query_id, neg_id AS neighbor_id
         |FROM (${hardNegativesOracleSql(k, isQuerySql)})""".stripMargin,
      s"""SELECT query_id, neg_id AS neighbor_id
         |FROM (${hardNegativesIvfOracleSql(k, nCells, nProbe, isQuerySql)})""".stripMargin,
      k)

  def labelConsistencyOracleSql(threshold: Double, nCells: Int = 16): String =
    s"""WITH pairs AS (
       |  SELECT * FROM (${Similarity.semanticDedupOracleSql(threshold, nCells)})),
       |sym AS (
       |  SELECT vec_a AS vec_id, vec_b AS nb FROM pairs
       |  UNION ALL
       |  SELECT vec_b AS vec_id, vec_a AS nb FROM pairs),
       |lab AS (SELECT vec_id, label FROM embeddings)
       |SELECT s.vec_id, ql.label,
       |       count(*) AS n_neighbors,
       |       sum(CASE WHEN nl.label = ql.label THEN 1 ELSE 0 END)::BIGINT
       |         AS n_same,
       |       round(sum(CASE WHEN nl.label = ql.label THEN 1 ELSE 0 END)::BIGINT
       |             / count(*), 6) AS consistency
       |FROM sym s
       |JOIN lab nl ON nl.vec_id = s.nb
       |JOIN lab ql ON ql.vec_id = s.vec_id
       |GROUP BY 1, 2""".stripMargin

  /** Mutual-kNN graph clustering — topic/near-group discovery over the
    * embedding corpus: every vector queries its IVF cell (nProbe = 1:
    * cell-scoped, candidates = occupancy, linear in n under
    * [[Similarity.autoCells]]), an undirected edge is kept only when BOTH
    * endpoints rank each other in their top-k (the mutual filter that
    * makes kNN graphs robust to hubs), and [[Dedup.components]] labels
    * the connected components — the same pointer-doubling engine as text
    * near-dup clustering. Output: (vec_id, cluster_id, is_keeper).
    */
  def knnClusters(emb: DataFrame, k: Int, nCells: Int = 16): DataFrame = {
    require(k > 0 && nCells > 0, "k and nCells must be positive")
    // cellTopK ≡ ivfTopK(lit(true), k, nProbe = 1) logically, but never
    // shuffles vectors: the all-queries re-attach join spilled ~550 GB at
    // the 100× corpus (see cellTopK's scaladoc / SCALING.md)
    val top = Similarity.cellTopK(emb, k, nCells = nCells)
      .select(col("query_id"), col("neighbor_id"))
    val rev = top.select(col("neighbor_id").as("query_id"),
      col("query_id").as("neighbor_id"))
    val mutual = top.join(rev, Seq("query_id", "neighbor_id"), "left_semi")
      .where(col("query_id") < col("neighbor_id"))
      .select(col("query_id").as("doc_a"), col("neighbor_id").as("doc_b"))
    Dedup.components(emb.select(col("vec_id").as("doc_id")), mutual)
      .select(col("doc_id").as("vec_id"), col("cluster_id"), col("is_keeper"))
  }

  def knnClustersOracleSql(k: Int, nCells: Int = 16): String =
    s"""WITH RECURSIVE topk AS (
       |  SELECT * FROM (${Similarity.ivfTopKOracleSql(k, nCells, nProbe = 1,
             isQuerySql = "TRUE")})),
       |mut AS (
       |  SELECT t1.query_id AS a, t1.neighbor_id AS b
       |  FROM topk t1
       |  JOIN topk t2 ON t1.query_id = t2.neighbor_id
       |              AND t1.neighbor_id = t2.query_id
       |  WHERE t1.query_id < t1.neighbor_id),
       |edges AS (
       |  SELECT a AS src, b AS dst FROM mut
       |  UNION ALL SELECT b, a FROM mut),
       |reach AS (
       |  SELECT vec_id AS id, vec_id AS r FROM embeddings
       |  UNION
       |  SELECT reach.id, e.dst AS r
       |  FROM reach JOIN edges e ON reach.r = e.src),
       |labels AS (SELECT id AS vec_id, min(r) AS cluster_id FROM reach GROUP BY id)
       |SELECT vec_id, cluster_id, vec_id = cluster_id AS is_keeper
       |FROM labels""".stripMargin
}
