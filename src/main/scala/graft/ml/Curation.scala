package graft.ml

import graft.ml.Ckpt.CutOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * after dedup/quality: benchmark decontamination, deterministic split
  * assignment, stratified downsampling, and corpus top-terms. Everything
  * derives randomness from md5 chains ([[Portable]]) so results are
  * reproducible run-to-run AND oracle-checkable bit-for-bit in DuckDB.
  */
object Curation {
  import Portable._

  /** Benchmark decontamination: flag documents sharing any word k-gram
    * with a benchmark set (the standard n-gram-overlap test-set-leak
    * check). Output: (doc_id, n_hits, contaminated) for EVERY document,
    * n_hits = number of distinct benchmark shingles present.
    *
    * Scale shape: real benchmark suites are tiny relative to a 100-TB
    * corpus, so the distinct benchmark-shingle set is collected into a
    * broadcast hash join — the corpus side streams through map-side, only
    * matched (doc, shingle) pairs reach the aggregation shuffle, and the
    * final left join restores non-contaminated docs without a second scan
    * of the text column.
    */
  def decontaminate(docs: DataFrame, isBenchmark: Column, k: Int = 8): DataFrame = {
    // words materialized BEFORE the shingle lambda (see Dedup.shingleTable)
    def docShingles(d: DataFrame) = d
      .select(col("doc_id"), words(col("text")).as("w"))
      .select(col("doc_id"), explode(shingles(col("w"), k)).as("s"))
      .select(col("doc_id"), h64(col("s")).as("sh"))
    val benchShingles = docShingles(docs.where(isBenchmark)).select("sh").distinct()
    val hits = docShingles(docs)
      .join(broadcast(benchShingles), "sh")
      .groupBy("doc_id").agg(count_distinct(col("sh")).as("n_hits"))
    docs.select("doc_id").join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** Bloom-prefiltered decontamination — identical output to
    * [[decontaminate]] (same oracle): a Bloom filter of the benchmark
    * shingle set prunes the corpus shingle stream BEFORE the exact
    * broadcast semi-join, so only probable hits reach the join at all.
    * False positives are eliminated by the exact join that follows;
    * false negatives are impossible — which is why the result is
    * bit-identical and the scale win is free. At 100 TB this is the
    * difference between broadcasting a hash relation of every benchmark
    * shingle and broadcasting a bit array ~10× smaller — the standard
    * pushdown when the reference set outgrows a comfortable broadcast.
    */
  def decontaminateBloom(docs: DataFrame, isBenchmark: Column,
                         k: Int = 8, fpp: Double = 0.01): DataFrame = {
    def docShingles(d: DataFrame) = d
      .select(col("doc_id"), words(col("text")).as("w"))
      .select(col("doc_id"), explode(shingles(col("w"), k)).as("s"))
      .select(col("doc_id"), h64(col("s")).as("sh"))
    val benchShingles = docShingles(docs.where(isBenchmark)).select("sh").distinct()
    val nBench = benchShingles.count() // benchmark-sized: bounded, one job
    val bloom = benchShingles.stat.bloomFilter("sh", math.max(nBench, 1L), fpp)
    val spark = docs.sparkSession
    val bloomB = spark.sparkContext.broadcast(bloom)
    // native expression, not a udf: same BloomFilter probe, no boxed
    // Long per corpus shingle ([[graft.functions.BloomContains]])
    val mightContain = org.apache.spark.sql.graft.GraftShim.column(
      graft.functions.BloomContains(
        org.apache.spark.sql.graft.GraftShim.expression(col("sh")), bloomB))
    val hits = docShingles(docs)
      .where(mightContain) // bits-only prefilter, map-side
      .join(broadcast(benchShingles), "sh") // exact verify removes FPs
      .groupBy("doc_id").agg(count_distinct(col("sh")).as("n_hits"))
    docs.select("doc_id").join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** DuckDB oracle for [[decontaminate]]; `isBenchmarkSql` selects the
    * benchmark rows of `documents` (over columns doc_id/text).
    */
  def decontaminateOracleSql(isBenchmarkSql: String, k: Int = 8): String =
    s"""WITH dw AS (SELECT doc_id, text, $wordsSql AS w FROM documents),
       |sh AS (
       |  SELECT doc_id, text, unnest(${shinglesSql(k)}) AS s FROM dw),
       |hsh AS (SELECT doc_id, text, ${h64Sql("s")} AS sh FROM sh),
       |bench AS (SELECT DISTINCT sh FROM hsh WHERE $isBenchmarkSql),
       |hits AS (
       |  SELECT h.doc_id, count(DISTINCT h.sh)::BIGINT AS n_hits
       |  FROM hsh h JOIN bench b ON h.sh = b.sh GROUP BY h.doc_id)
       |SELECT d.doc_id, coalesce(n_hits, 0)::BIGINT AS n_hits,
       |       coalesce(n_hits, 0) > 0 AS contaminated
       |FROM documents d LEFT JOIN hits USING (doc_id)""".stripMargin

  /** Deterministic train/val/test assignment: bucket = md5-hash(doc_id)
    * mod 100, split by cumulative thresholds. Pure per-row arithmetic —
    * no shuffle, no RNG state, stable under re-runs and backfills (the
    * property `randomSplit` lacks). Output: (doc_id, bucket, split).
    */
  def assignSplit(docs: DataFrame, trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct + valPct <= 100, "split percentages exceed 100")
    val b = pmod(h64(concat(col("doc_id").cast("string"), lit(":split"))), lit(100))
    docs.select(col("doc_id"), b.as("bucket"),
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test").as("split"))
  }

  def assignSplitOracleSql(trainPct: Int = 80, valPct: Int = 10): String = {
    val b = s"${h64Sql("doc_id::VARCHAR || ':split'")} % 100"
    s"""SELECT doc_id, ($b)::BIGINT AS bucket,
       |  CASE WHEN $b < $trainPct THEN 'train'
       |       WHEN $b < ${trainPct + valPct} THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents""".stripMargin
  }

  /** Topic-balanced sampling: cap each embedding-space topic (a
    * [[Similarity.kmeans]] cell) at an equal seat count — the
    * cluster-balancing step that stops a dominant topic from swamping a
    * curated subset, the embedding-space sibling of [[quotaSample]]'s
    * per-source seats. Seats = total/k per topic (+1 for the first
    * total%k topic ids); under-full topics keep everything (seats are
    * not redistributed — balance, not exact size, is the contract).
    * vec_id ≡ doc_id (the embeddings table keys documents, as
    * cur_pipeline4 relies on). Output: (doc_id, topic, rk, quota).
    *
    * Scale: the Lloyd assignment is a broadcast-centroid scan (measured
    * sublinear through 1000×); the election is one window per topic —
    * topics are few but the window key space is k, so per-partition sort
    * state is corpus/k. For corpora where even that is too wide, the
    * same salted-hash rank can be pre-bucketed exactly like
    * [[curriculum]]'s (phase, shard) decomposition.
    */
  def topicBalance(emb: DataFrame, total: Long = 200L, k: Int = 8,
                   iters: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(total > 0 && k > 0)
    val cells = Similarity.kmeans(emb, k, iters)
      .select(col("vec_id").as("doc_id"), col("cluster").as("topic"))
    val quota = (lit(total / k) +
      when(col("topic") < lit(total % k), 1L).otherwise(0L)).as("quota")
    val u = h64(concat(lit("tb:"), col("doc_id").cast("string")))
    val w = Window.partitionBy("topic").orderBy(u.asc, col("doc_id").asc)
    cells.withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("quota", quota)
      .where(col("rk") <= col("quota"))
      .select("doc_id", "topic", "rk", "quota")
  }

  def topicBalanceOracleSql(total: Long = 200L, k: Int = 8,
                            iters: Int = 3): String =
    s"""WITH km AS (${Similarity.kmeansOracleSql(k, iters)}),
       |cells AS (SELECT vec_id AS doc_id, cluster AS topic FROM km),
       |ranked AS (
       |  SELECT doc_id, topic,
       |         row_number() OVER (
       |           PARTITION BY topic
       |           ORDER BY ${h64Sql("'tb:' || doc_id::VARCHAR")}, doc_id
       |         )::BIGINT AS rk,
       |         ($total // $k + CASE WHEN topic < ($total % $k)
       |            THEN 1 ELSE 0 END)::BIGINT AS quota
       |  FROM cells)
       |SELECT doc_id, topic, rk, quota FROM ranked WHERE rk <= quota""".stripMargin

  /** Corpus cartography: label each embedding-space topic (a
    * [[Similarity.kmeans]] cell, vec_id ≡ doc_id) with its most
    * DISTINGUISHING terms — per-topic tf × topic-idf, the standard
    * cluster-naming readout a curation team uses to decide what a cell
    * IS before up/down-weighting it ([[topicBalance]] decides how much
    * of a topic to keep; this says what the topic contains). Score =
    * floor(tf · round(ln(k/df_topics), 6) · 1e6 + 0.5) — integer micro
    * units, a word present in every topic scores exactly 0. Stopwords
    * and empty tokens are excluded; ties break (tf desc, word asc).
    *
    * Scale: one corpus-sized explode into a (topic, word) partial-agg
    * shuffle (vocabulary×k keys, map-side combined); the topic-df and
    * ranking relations are vocabulary-bounded, and the final window
    * sorts vocabulary rows per topic — never corpus rows.
    */
  def topicKeywords(emb: DataFrame, docs: DataFrame, k: Int = 8,
                    iters: Int = 3, topN: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0 && topN > 0)
    val cells = Similarity.kmeans(emb, k, iters)
      .select(col("vec_id").as("doc_id"), col("cluster").as("topic"))
    val toks = docs.join(cells, "doc_id")
      .select(col("topic"), explode(words(col("text"))).as("word"))
      .where(!col("word").isin(TextStats.stopwords: _*) && col("word") =!= "")
    val tf = toks.groupBy("topic", "word").agg(count(lit(1)).as("tf"))
    val dfTopics = tf.groupBy("word")
      .agg(count(lit(1)).as("df_topics"))
    val scored = tf.join(dfTopics, "word")
      .withColumn("score_micro",
        floor(col("tf") * round(log(lit(k.toDouble) / col("df_topics")), 6)
          * 1e6 + 0.5).cast("long"))
    val w = Window.partitionBy("topic")
      .orderBy(desc("score_micro"), desc("tf"), asc("word"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= topN)
      .select("topic", "word", "tf", "df_topics", "score_micro", "rnk")
  }

  def topicKeywordsOracleSql(k: Int = 8, iters: Int = 3,
                             topN: Int = 5): String = {
    val stopList = TextStats.stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH km AS (${Similarity.kmeansOracleSql(k, iters)}),
       |cells AS (SELECT vec_id AS doc_id, cluster AS topic FROM km),
       |toks AS (
       |  SELECT c.topic, t.word FROM (
       |    SELECT doc_id, unnest($wordsSql) AS word FROM documents) t
       |  JOIN cells c USING (doc_id)
       |  WHERE t.word NOT IN ($stopList) AND t.word != ''),
       |tf AS (
       |  SELECT topic, word, count(*)::BIGINT AS tf
       |  FROM toks GROUP BY topic, word),
       |dft AS (SELECT word, count(*)::BIGINT AS df_topics FROM tf GROUP BY word),
       |scored AS (
       |  SELECT topic, word, tf, df_topics,
       |         floor(tf * round(ln($k.0 / df_topics), 6) * 1e6 + 0.5)::BIGINT
       |           AS score_micro
       |  FROM tf JOIN dft USING (word)),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY topic
       |            ORDER BY score_micro DESC, tf DESC, word) AS rnk
       |  FROM scored)
       |SELECT topic, word, tf, df_topics, score_micro, rnk
       |FROM ranked WHERE rnk <= $topN""".stripMargin
  }

  /** Split-leakage audit: near-dup clusters that straddle the train/eval
    * boundary — the contamination a hash split cannot see (it assigns
    * doc-by-doc, so two near-copies routinely land on opposite sides, and
    * the eval set silently overlaps training data). Clusters come from
    * the near-dup pair graph ([[Dedup.components]]); splits from
    * [[assignSplit]]. Output, one row per MULTI-doc cluster:
    * (cluster_id, n_docs, n_train, n_val, n_test, leaky) where leaky =
    * the cluster has a train member and an eval (val/test) member. The
    * fix a pipeline applies downstream is cluster-level reassignment;
    * this operator is the detector.
    *
    * Scale: one doc_id equi-join + one groupBy on cluster_id (conditional
    * partial aggregates — map-side combined); singleton clusters are
    * filtered before output, so result size is bounded by the number of
    * near-dup families, not the corpus.
    */
  def splitLeakage(docs: DataFrame, pairs: DataFrame, trainPct: Int = 80,
                   valPct: Int = 10): DataFrame =
    Dedup.components(docs, pairs).select("doc_id", "cluster_id")
      .join(assignSplit(docs, trainPct, valPct).select("doc_id", "split"),
        "doc_id")
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
      .where(col("n_docs") > 1)
      .withColumn("leaky",
        (col("n_train") > 0) && ((col("n_val") > 0) || (col("n_test") > 0)))

  def splitLeakageOracleSql(pairsSql: String, trainPct: Int = 80,
                            valPct: Int = 10): String =
    s"""WITH comp AS (${Dedup.componentsOracleSql(pairsSql)}),
       |sp AS (${assignSplitOracleSql(trainPct, valPct)}),
       |g AS (
       |  SELECT c.cluster_id,
       |         count(*)::BIGINT AS n_docs,
       |         sum(CASE WHEN s.split = 'train' THEN 1 ELSE 0 END)::BIGINT AS n_train,
       |         sum(CASE WHEN s.split = 'val' THEN 1 ELSE 0 END)::BIGINT AS n_val,
       |         sum(CASE WHEN s.split = 'test' THEN 1 ELSE 0 END)::BIGINT AS n_test
       |  FROM comp c JOIN sp s ON c.doc_id = s.doc_id
       |  GROUP BY c.cluster_id)
       |SELECT cluster_id, n_docs, n_train, n_val, n_test,
       |       n_train > 0 AND (n_val > 0 OR n_test > 0) AS leaky
       |FROM g WHERE n_docs > 1""".stripMargin

  /** Stratified downsampling by predicted language: keep a document iff
    * its md5-derived uniform draw (per-doc, salt ":sample") falls under
    * its stratum's rate — the rebalancing step of corpus curation
    * (e.g. cap the dominant language). `rates` is configuration, not
    * data, so the stratum lookup compiles to a codegen'd CASE chain —
    * one linear scan, no join, no shuffle. Unlisted strata keep
    * `defaultRate`. Output: the sampled (doc_id, lang_pred).
    */
  def stratifiedSample(docs: DataFrame, rates: Map[String, Double],
                       defaultRate: Double = 1.0): DataFrame = {
    val M = 1000000L
    val u = pmod(h64(concat(col("doc_id").cast("string"), lit(":sample"))), lit(M))
    val thresh = rates.toSeq.sortBy(_._1).foldRight(lit((defaultRate * M).toLong)) {
      case ((lang, r), el) =>
        when(col("lang_pred") === lang, lit((r * M).toLong)).otherwise(el)
    }
    TextStats.languageId(docs)
      .select(col("doc_id"), col("lang_pred"))
      .where(u < thresh)
  }

  def stratifiedSampleOracleSql(rates: Map[String, Double],
                                defaultRate: Double = 1.0): String = {
    val M = 1000000L
    val cases = rates.toSeq.sortBy(_._1).map { case (lang, r) =>
      s"WHEN lang_pred = '$lang' THEN ${(r * M).toLong}"
    }.mkString(" ")
    s"""WITH lang AS (${TextStats.languageIdOracleSql})
       |SELECT doc_id, lang_pred FROM lang
       |WHERE ${h64Sql("doc_id::VARCHAR || ':sample'")} % $M
       |      < (CASE $cases ELSE ${(defaultRate * M).toLong} END)""".stripMargin
  }

  /** Fixed-size weighted sample — the "exactly K documents, allocated
    * across sources by weight" primitive ([[stratifiedSample]] is its
    * Bernoulli sibling: per-doc coin flips give binomially-varying
    * output sizes; eval-set construction wants exact counts). Quotas use
    * the largest-remainder method in pure int64 arithmetic — base_s =
    * (K·w_s) div Σw, with the K − Σbase leftovers going to the largest
    * remainders (source-name tiebreak) — so allocation is exact and
    * engine-independent, never a rounded double. Within a source the
    * quota is filled by smallest md5-hash rank, doc_id tiebreak: a
    * deterministic uniform draw, reproducible run-to-run. A source with
    * fewer docs than its quota contributes all of them (no
    * redistribution — the shortfall is visible as rk < quota).
    *
    * Scale: the allocation relations are one row per source (broadcast);
    * the rank is a per-source window — at corpus scale the sort is the
    * cost, and a production variant pre-prunes each source to
    * u < M·quota·c/n_s (n_s is already in the allocation relation)
    * before ranking, shrinking the sorted set to ~c·quota rows per
    * source. The exact fixed-size contract keeps the rank itself.
    * Output: (doc_id, source, rk, quota), kept rows only.
    */
  def quotaSample(docs: DataFrame, total: Long = 1000L,
                  weights: Map[String, Long] = Map.empty): DataFrame = {
    val wCol = weights.toSeq.sortBy(_._1).foldRight(lit(1L): Column) {
      case ((s0, w0), el) => when(col("source") === s0, lit(w0)).otherwise(el)
    }
    val srcs = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("w", wCol)
    val alloc = srcs.join(broadcast(srcs.agg(sum("w").as("tot_w"))))
      .withColumn("base", expr(s"($total * w) div tot_w"))
      .withColumn("rem", pmod(lit(total) * col("w"), col("tot_w")))
    // leftover seats ranked by remainder over the per-source relation;
    // rem * 0.0 is the non-foldable constant partition key (see rocAuc)
    val remW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("rem") * 0.0)
      .orderBy(col("rem").desc, col("source"))
    val quotas = alloc
      .join(broadcast(alloc.agg((lit(total) - sum("base")).as("leftover"))))
      .withColumn("seat", row_number().over(remW))
      .select(col("source"),
        (col("base") + when(col("seat") <= col("leftover"), 1L)
          .otherwise(0L)).as("quota"))
    val u = h64(concat(lit("qs:"), col("doc_id").cast("string")))
    val rkW = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(u.asc, col("doc_id").asc)
    docs.join(broadcast(quotas), "source")
      .withColumn("rk", row_number().over(rkW))
      .where(col("rk") <= col("quota"))
      .select(col("doc_id"), col("source"), col("rk"), col("quota"))
  }

  def quotaSampleOracleSql(total: Long = 1000L,
                           weights: Map[String, Long] = Map.empty): String = {
    val cases = weights.toSeq.sortBy(_._1).map { case (s0, w0) =>
      s"WHEN source = '$s0' THEN $w0"
    }.mkString(" ")
    val wExpr = if (weights.isEmpty) "1" else s"CASE $cases ELSE 1 END"
    s"""WITH srcs AS (
       |  SELECT source, count(*)::BIGINT AS n_docs,
       |         ($wExpr)::BIGINT AS w
       |  FROM documents GROUP BY source),
       |tot AS (SELECT sum(w)::BIGINT AS tot_w FROM srcs),
       |alloc AS (
       |  SELECT source, ($total * w) // tot_w AS base,
       |         ($total * w) % tot_w AS rem
       |  FROM srcs, tot),
       |lo AS (SELECT ($total - sum(base))::BIGINT AS leftover FROM alloc),
       |quotas AS (
       |  SELECT source,
       |         base + CASE WHEN row_number()
       |             OVER (ORDER BY rem DESC, source) <= leftover
       |           THEN 1 ELSE 0 END AS quota
       |  FROM alloc, lo),
       |ranked AS (
       |  SELECT d.doc_id, d.source, q.quota,
       |         row_number() OVER (
       |           PARTITION BY d.source
       |           ORDER BY ${h64Sql("'qs:' || d.doc_id::VARCHAR")}, d.doc_id
       |         ) AS rk
       |  FROM documents d JOIN quotas q USING (source))
       |SELECT doc_id, source, rk, quota FROM ranked
       |WHERE rk <= quota""".stripMargin
  }

  /** Repetition statistics (the Gopher-rule family of quality filters):
    * per document, the total and most-frequent word-bigram counts, the
    * top-bigram fraction, and the duplicate-word fraction — high values
    * mean boilerplate/spam. Two hash aggregations over the exploded
    * bigram table, both keyed by doc_id(+gram): partial aggregation
    * combines map-side, the shuffle carries one row per distinct
    * (doc, gram). Short docs (< 2 words) are reported with zero grams,
    * not dropped. Output: (doc_id, n_grams, max_gram_n, top_gram_frac,
    * dup_word_frac, flagged).
    */
  def repetitionStats(docs: DataFrame, flagThreshold: Double = 0.2): DataFrame = {
    // words materialized BEFORE the shingle lambda (see Dedup.shingleTable)
    val grams = docs.select(col("doc_id"), words(col("text")).as("w"))
      .select(col("doc_id"), explode(shingles(col("w"), 2)).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("gn"))
      .groupBy("doc_id").agg(sum("gn").as("n_grams"), max("gn").as("max_gram_n"))
    docs.select(col("doc_id"), words(col("text")).as("w"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_words"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct"))
      .join(grams, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("max_gram_n"), lit(0L)).as("max_gram_n"),
        round(coalesce(col("max_gram_n").cast("double") / col("n_grams"), lit(0.0)), 6)
          .as("top_gram_frac"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_words"), 6)
          .as("dup_word_frac"),
        (coalesce(col("max_gram_n").cast("double") / col("n_grams"), lit(0.0))
          > flagThreshold).as("flagged"))
  }

  def repetitionStatsOracleSql(flagThreshold: Double = 0.2): String =
    s"""WITH dw AS (SELECT doc_id, $wordsSql AS w FROM documents),
       |grams AS (
       |  SELECT doc_id, unnest(${shinglesSql(2)}) AS gram FROM dw),
       |gcnt AS (
       |  SELECT doc_id, gram, count(*) AS gn FROM grams GROUP BY doc_id, gram),
       |gagg AS (
       |  SELECT doc_id, sum(gn)::BIGINT AS n_grams, max(gn)::BIGINT AS max_gram_n
       |  FROM gcnt GROUP BY doc_id),
       |base AS (
       |  SELECT doc_id, len(w)::BIGINT AS n_words,
       |         len(list_distinct(w))::BIGINT AS n_distinct
       |  FROM dw)
       |SELECT b.doc_id,
       |       coalesce(g.n_grams, 0)::BIGINT AS n_grams,
       |       coalesce(g.max_gram_n, 0)::BIGINT AS max_gram_n,
       |       round(coalesce(g.max_gram_n::DOUBLE / g.n_grams, 0.0), 6) AS top_gram_frac,
       |       round(1.0 - b.n_distinct::DOUBLE / b.n_words, 6) AS dup_word_frac,
       |       coalesce(g.max_gram_n::DOUBLE / g.n_grams, 0.0) > $flagThreshold AS flagged
       |FROM base b LEFT JOIN gagg g USING (doc_id)""".stripMargin

  /** Sequence packing: concatenate documents and chop into fixed
    * `maxTokens` windows — the final step that turns a curated corpus
    * into pretraining examples. Documents are assigned a deterministic
    * md5 shard; packing runs INDEPENDENTLY per shard (order = doc_id
    * within shard), so a document's pack is a pure function of the
    * corpus, rerun-stable, and no global sequential pass exists.
    * Output: (shard, doc_id, n_tokens, pack_id, pack_off) — pack_id is
    * the window the document STARTS in, pack_off its offset there
    * (documents straddle window boundaries, as concat-and-chop does).
    *
    * Scale: the only ordered operation is a running sum windowed by
    * shard — `nShards` independent sorted partitions, each ~corpus/nShards;
    * raise nShards with corpus size to bound per-partition volume. No
    * global sort, no driver state.
    */
  def packSequences(docs: DataFrame, maxTokens: Int = 512,
                    nShards: Int = 64): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docs.select(col("doc_id"),
        size(words(col("text"))).cast("long").as("n_tokens"),
        pmod(h64(concat(col("doc_id").cast("string"), lit(":pack"))), lit(nShards))
          .as("shard"))
      .withColumn("start_off", sum("n_tokens").over(w) - col("n_tokens"))
      // integer DIV, not floor(double /): a shard's running offset can
      // exceed 2^53 at corpus scale, where double division loses ulps
      .select(col("shard"), col("doc_id"), col("n_tokens"),
        expr(s"start_off DIV $maxTokens").as("pack_id"),
        pmod(col("start_off"), lit(maxTokens.toLong)).as("pack_off"))
  }

  def packSequencesOracleSql(maxTokens: Int = 512, nShards: Int = 64): String =
    s"""WITH t AS (
       |  SELECT doc_id, len($wordsSql)::BIGINT AS n_tokens,
       |         ${h64Sql("doc_id::VARCHAR || ':pack'")} % $nShards AS shard
       |  FROM documents),
       |cum AS (
       |  SELECT shard, doc_id, n_tokens,
       |         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           - n_tokens AS start_off
       |  FROM t)
       |SELECT shard::BIGINT AS shard, doc_id, n_tokens,
       |       (start_off // $maxTokens)::BIGINT AS pack_id,
       |       (start_off % $maxTokens)::BIGINT AS pack_off
       |FROM cum""".stripMargin

  /** [[packSequences]] under the TRAINED tokenizer: offsets accumulate
    * real BPE token counts ([[bpeEncode]]) instead of whitespace words —
    * the pack layout a pretraining loader actually consumes, where the
    * budget is model tokens, not words. Same shard-parallel
    * concat-and-chop shape; docs with no pre-tokenizer-accepted words
    * pack as 0-length (LEFT join + coalesce keeps every document).
    */
  def packSequencesBpe(docs: DataFrame, maxTokens: Int = 512,
                       nShards: Int = 64, nMerges: Int = 8): DataFrame = {
    val enc = bpeEncode(docs, nMerges).select("doc_id", "n_bpe_tokens")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docs.select("doc_id").join(enc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_tokens"),
        pmod(h64(concat(col("doc_id").cast("string"), lit(":pack"))), lit(nShards))
          .as("shard"))
      .withColumn("start_off", sum("n_tokens").over(w) - col("n_tokens"))
      .select(col("shard"), col("doc_id"), col("n_tokens"),
        expr(s"start_off DIV $maxTokens").as("pack_id"),
        pmod(col("start_off"), lit(maxTokens.toLong)).as("pack_off"))
  }

  def packSequencesBpeOracleSql(maxTokens: Int = 512, nShards: Int = 64,
                                nMerges: Int = 8): String =
    s"""WITH enc AS (${bpeEncodeOracleSql(nMerges)}),
       |t AS (
       |  SELECT d.doc_id, coalesce(e.n_bpe_tokens, 0)::BIGINT AS n_tokens,
       |         ${h64Sql("d.doc_id::VARCHAR || ':pack'")} % $nShards AS shard
       |  FROM documents d LEFT JOIN enc e USING (doc_id)),
       |cum AS (
       |  SELECT shard, doc_id, n_tokens,
       |         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           - n_tokens AS start_off
       |  FROM t)
       |SELECT shard::BIGINT AS shard, doc_id, n_tokens,
       |       (start_off // $maxTokens)::BIGINT AS pack_id,
       |       (start_off % $maxTokens)::BIGINT AS pack_off
       |FROM cum""".stripMargin

  /** Pack-efficiency sweep — the capacity-planning report behind choosing
    * `maxTokens`: for each candidate sequence length, how many training
    * sequences the corpus packs into ([[packSequences]] layout: per-shard
    * concat-and-chop, last sequence of each shard padded), what fraction
    * of the token budget is padding waste, and how many documents get
    * split across a sequence boundary (the fragmentation a loader pays
    * in attention-mask complexity). One scan for offsets, then two
    * constant-size rollups (per-shard totals × grid, per-doc split flags
    * × grid) — the sweep adds |grid| rows of work, not |grid| passes.
    * Output: (max_tokens, n_seqs, total_tokens, waste_pct, n_split_docs).
    */
  def packSweep(docs: DataFrame,
                grid: Seq[Int] = Seq(128, 256, 512, 1024, 2048),
                nShards: Int = 64): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val offs = docs.select(col("doc_id"),
        size(words(col("text"))).cast("long").as("n_tokens"),
        pmod(h64(concat(col("doc_id").cast("string"), lit(":pack"))), lit(nShards))
          .as("shard"))
      .withColumn("end_off", sum("n_tokens").over(w))
      .withColumn("start_off", col("end_off") - col("n_tokens"))
    val shardTot = offs.groupBy("shard").agg(max("end_off").as("tot"))
    val byM = shardTot
      .withColumn("m", explode(typedlit(grid.map(_.toLong))))
      .groupBy("m")
      .agg(sum(expr("(tot + m - 1) DIV m")).as("n_seqs"),
        sum("tot").as("total_tokens"))
    val splits = offs.where(col("n_tokens") > 0)
      .withColumn("m", explode(typedlit(grid.map(_.toLong))))
      .groupBy("m")
      .agg(sum(when(expr("(end_off - 1) DIV m") =!= expr("start_off DIV m"), 1L)
        .otherwise(0L)).as("n_split_docs"))
    byM.join(splits, Seq("m"), "left")
      .select(col("m").as("max_tokens"), col("n_seqs"), col("total_tokens"),
        round((col("n_seqs") * col("m") - col("total_tokens")).cast("double") /
          (col("n_seqs") * col("m")).cast("double"), 6).as("waste_pct"),
        coalesce(col("n_split_docs"), lit(0L)).as("n_split_docs"))
  }

  def packSweepOracleSql(grid: Seq[Int] = Seq(128, 256, 512, 1024, 2048),
                         nShards: Int = 64): String = {
    val gridVals = grid.map(m => s"($m)").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, len($wordsSql)::BIGINT AS n_tokens,
       |         ${h64Sql("doc_id::VARCHAR || ':pack'")} % $nShards AS shard
       |  FROM documents),
       |cum AS (
       |  SELECT shard, doc_id, n_tokens,
       |         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           AS end_off
       |  FROM t),
       |offs AS (SELECT *, end_off - n_tokens AS start_off FROM cum),
       |grid(m) AS (VALUES $gridVals),
       |sh AS (SELECT shard, max(end_off) AS tot FROM offs GROUP BY shard),
       |bym AS (
       |  SELECT m::BIGINT AS m, sum((tot + m - 1) // m)::BIGINT AS n_seqs,
       |         sum(tot)::BIGINT AS total_tokens
       |  FROM sh, grid GROUP BY 1),
       |sp AS (
       |  SELECT m::BIGINT AS m,
       |         sum(CASE WHEN (end_off - 1) // m != start_off // m
       |                  THEN 1 ELSE 0 END)::BIGINT AS n_split_docs
       |  FROM offs, grid WHERE n_tokens > 0 GROUP BY 1)
       |SELECT bym.m AS max_tokens, n_seqs, total_tokens,
       |       round((n_seqs * bym.m - total_tokens)::DOUBLE
       |             / (n_seqs * bym.m)::DOUBLE, 6) AS waste_pct,
       |       coalesce(sp.n_split_docs, 0)::BIGINT AS n_split_docs
       |FROM bym LEFT JOIN sp ON bym.m = sp.m""".stripMargin
  }

  /** Per-language document-length quantiles (exact, linear-interpolated —
    * the curation report's length distribution). One hash aggregation;
    * exact percentile needs the per-group values, which is fine for a
    * bounded-cardinality stratum key like language.
    * Output: (lang_pred, q25, q50, q95), 6 dp.
    */
  def lengthQuantiles(docs: DataFrame): DataFrame =
    TextStats.languageId(docs)
      .join(docs.select(col("doc_id"),
        size(words(col("text"))).cast("long").as("n_words")), "doc_id")
      .groupBy("lang_pred")
      .agg(
        round(percentile(col("n_words"), lit(0.25)), 6).as("q25"),
        round(percentile(col("n_words"), lit(0.5)), 6).as("q50"),
        round(percentile(col("n_words"), lit(0.95)), 6).as("q95"))

  def lengthQuantilesOracleSql: String =
    s"""WITH lang AS (${TextStats.languageIdOracleSql}),
       |n AS (SELECT doc_id, len($wordsSql)::BIGINT AS n_words FROM documents)
       |SELECT l.lang_pred,
       |       round(quantile_cont(n.n_words, 0.25), 6) AS q25,
       |       round(quantile_cont(n.n_words, 0.5), 6) AS q50,
       |       round(quantile_cont(n.n_words, 0.95), 6) AS q95
       |FROM lang l JOIN n ON l.doc_id = n.doc_id
       |GROUP BY l.lang_pred""".stripMargin

  /** Scale path for [[lengthQuantiles]]: GK-sketch quantiles
    * (`percentile_approx`) with the rank-error CONTRACT emitted as
    * oracle-assertable booleans — the [[TextStats.vocabSketchChecked]]
    * pattern. The exact form collects each language's full value list
    * into one aggregation buffer (fine for a bounded stratum key, wrong
    * for millions of rows per group at corpus scale); the sketch holds
    * O(accuracy·log n) state and guarantees rank error ≤ n/accuracy.
    * The engine computes the exact rank window of each returned value
    * (one broadcast join of the |langs|·2-row sketch output back to the
    * lengths) and emits whether it intersects [q ± eps]·n; the oracle
    * asserts both booleans true — a drifting sketch fails the hash row.
    * The approx VALUES stay out of the output: they are engine-specific.
    * Output: (lang_pred, n_docs, p50_ok, p95_ok).
    */
  def lengthQuantilesSketch(docs: DataFrame, accuracy: Int = 1000): DataFrame = {
    val eps = 1.0 / accuracy
    val lens = TextStats.languageId(docs)
      .join(docs.select(col("doc_id"),
        size(words(col("text"))).cast("long").as("n_words")), "doc_id")
      .select("lang_pred", "n_words")
    val sk = lens.groupBy("lang_pred")
      .agg(percentile_approx(col("n_words"),
        typedlit(Seq(0.5, 0.95)), lit(accuracy)).as("ap"))
      .select(col("lang_pred").as("lp"),
        element_at(col("ap"), 1).as("v50"), element_at(col("ap"), 2).as("v95"))
    // a value's rank window [count(<v)+1, count(<=v)] must intersect
    // [(q−eps)·n, (q+eps)·n]: lower-count strictly below the upper bound,
    // inclusive-count at or above the lower bound (handles ties exactly)
    lens.join(broadcast(sk), col("lang_pred") === col("lp"))
      .groupBy("lang_pred")
      .agg(count(lit(1)).as("n_docs"),
        (sum(when(col("n_words") < col("v50"), 1L).otherwise(0L)) <
          (lit(0.5) + eps) * count(lit(1)) &&
         sum(when(col("n_words") <= col("v50"), 1L).otherwise(0L)) >=
          (lit(0.5) - eps) * count(lit(1))).as("p50_ok"),
        (sum(when(col("n_words") < col("v95"), 1L).otherwise(0L)) <
          (lit(0.95) + eps) * count(lit(1)) &&
         sum(when(col("n_words") <= col("v95"), 1L).otherwise(0L)) >=
          (lit(0.95) - eps) * count(lit(1))).as("p95_ok"))
  }

  /** Data-driven pack layout: choose `maxTokens` as the sweep's
    * argmin-waste candidate (tie → the smaller length: cheaper
    * attention) and emit the pack layout under the CHOSEN length — the
    * config decision a pipeline usually makes by hand, folded into one
    * deterministic plan. The chosen length rides along as a broadcast
    * 1-row relation (the scalar-subquery shape of q13), so the decision
    * never forces a second pass over the corpus: offsets are computed
    * once and divided by the chosen length as a column.
    * Output: (shard, doc_id, n_tokens, pack_id, pack_off, chosen_m).
    */
  def packAuto(docs: DataFrame,
               grid: Seq[Int] = Seq(128, 256, 512, 1024, 2048),
               nShards: Int = 64): DataFrame = {
    val best = packSweep(docs, grid, nShards)
      .orderBy(asc("waste_pct"), asc("max_tokens")).limit(1)
      .select(col("max_tokens").as("chosen_m"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docs.select(col("doc_id"),
        size(words(col("text"))).cast("long").as("n_tokens"),
        pmod(h64(concat(col("doc_id").cast("string"), lit(":pack"))), lit(nShards))
          .as("shard"))
      .withColumn("start_off", sum("n_tokens").over(w) - col("n_tokens"))
      .join(broadcast(best))
      .select(col("shard"), col("doc_id"), col("n_tokens"),
        expr("start_off DIV chosen_m").as("pack_id"),
        pmod(col("start_off"), col("chosen_m")).as("pack_off"),
        col("chosen_m"))
  }

  def packAutoOracleSql(grid: Seq[Int] = Seq(128, 256, 512, 1024, 2048),
                        nShards: Int = 64): String =
    s"""WITH sweep AS (${packSweepOracleSql(grid, nShards)}),
       |best AS (
       |  SELECT max_tokens AS chosen_m FROM sweep
       |  ORDER BY waste_pct, max_tokens LIMIT 1),
       |t AS (
       |  SELECT doc_id, len($wordsSql)::BIGINT AS n_tokens,
       |         ${h64Sql("doc_id::VARCHAR || ':pack'")} % $nShards AS shard
       |  FROM documents),
       |cum AS (
       |  SELECT shard, doc_id, n_tokens,
       |         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           - n_tokens AS start_off
       |  FROM t)
       |SELECT shard::BIGINT AS shard, doc_id, n_tokens,
       |       (start_off // chosen_m)::BIGINT AS pack_id,
       |       (start_off % chosen_m)::BIGINT AS pack_off,
       |       chosen_m
       |FROM cum, best""".stripMargin

  /** Oracle for [[lengthQuantilesSketch]]: exact per-language counts with
    * the rank-error contract asserted true.
    */
  val lengthQuantilesSketchOracleSql: String =
    s"""WITH lang AS (${TextStats.languageIdOracleSql}),
       |n AS (SELECT doc_id, len($wordsSql)::BIGINT AS n_words FROM documents)
       |SELECT l.lang_pred, count(*)::BIGINT AS n_docs,
       |       true AS p50_ok, true AS p95_ok
       |FROM lang l JOIN n ON l.doc_id = n.doc_id
       |GROUP BY l.lang_pred""".stripMargin

  /** Corpus top-terms per predicted language: the k most frequent words
    * with deterministic (count desc, word) tie-break — the vocabulary
    * report of a curation run. Two hash aggregations (doc→lang, then
    * (lang, word) counts) + a rank window over the vocabulary-sized
    * count relation; the heavy explode never passes through a window.
    * Output: (lang_pred, word, n, rank).
    */
  def topTerms(docs: DataFrame, k: Int = 10): DataFrame = {
    val counts = TextStats.languageId(docs)
      .join(docs.select(col("doc_id"), explode(words(col("text"))).as("word")), "doc_id")
      .groupBy("lang_pred", "word").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang_pred").orderBy(desc("n"), asc("word"))
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  def topTermsOracleSql(k: Int = 10): String =
    s"""WITH lang AS (${TextStats.languageIdOracleSql}),
       |wds AS (SELECT doc_id, unnest($wordsSql) AS word FROM documents),
       |counts AS (
       |  SELECT l.lang_pred, w.word, count(*) AS n
       |  FROM lang l JOIN wds w ON l.doc_id = w.doc_id
       |  GROUP BY l.lang_pred, w.word),
       |ranked AS (
       |  SELECT lang_pred, word, n,
       |         row_number() OVER (PARTITION BY lang_pred
       |                            ORDER BY n DESC, word) AS rank
       |  FROM counts)
       |SELECT lang_pred, word, n, rank FROM ranked WHERE rank <= $k""".stripMargin

  // ---------------------------------------------------------------------
  // PII redaction
  // ---------------------------------------------------------------------

  // conservative patterns chosen to evaluate identically under Java's
  // regex (Spark) and RE2 (DuckDB): no backrefs, no lookaround, greedy
  // character classes only
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val UrlRe = "https?://[A-Za-z0-9./_-]+"
  private val IpRe = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** The synthetic-PII enrichment both engines apply before redaction:
    * the corpus text is synthetic words, so deterministic doc_id-derived
    * email/URL/IP spans are appended to a subset of documents to give the
    * scrubber real work. Pure string concat — no shuffle.
    */
  private def withPii(docs: DataFrame): Column = concat(
    col("text"),
    when(pmod(col("doc_id"), lit(3)) === 0,
      concat(lit(" reach user"), col("doc_id").cast("string"),
        lit("@mail.example.org"))).otherwise(lit("")),
    when(pmod(col("doc_id"), lit(5)) === 0,
      concat(lit(" see https://docs.example.net/p/"),
        col("doc_id").cast("string"))).otherwise(lit("")),
    when(pmod(col("doc_id"), lit(7)) === 0,
      concat(lit(" from 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
        lit("."), (pmod(col("doc_id"), lit(250)) + 1).cast("string")))
      .otherwise(lit("")))

  // single line: this fragment is interpolated into SQL templates that
  // apply their own stripMargin, which would re-strip multi-line text
  private val withPiiSql: String =
    "text || " +
      "(CASE WHEN doc_id % 3 = 0 THEN ' reach user' || doc_id::VARCHAR " +
      "|| '@mail.example.org' ELSE '' END) || " +
      "(CASE WHEN doc_id % 5 = 0 THEN ' see https://docs.example.net/p/' " +
      "|| doc_id::VARCHAR ELSE '' END) || " +
      "(CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.' " +
      "|| (doc_id % 256)::VARCHAR || '.' || (doc_id % 250 + 1)::VARCHAR " +
      "ELSE '' END)"

  /** PII redaction — the safety-scrub pass of corpus curation: replace
    * emails, URLs and IPv4 addresses with typed placeholder tokens and
    * report per-document match counts plus an md5 signature of the
    * scrubbed text (so the oracle checks the full rewrite without
    * shipping the text back). Email → URL → IP replacement order is part
    * of the contract: each later pattern runs on the previous pass's
    * output, and the counts are taken on the pre-redaction text. One
    * codegen'd linear scan — no shuffle, no UDF.
    */
  def redact(docs: DataFrame): DataFrame = {
    val pii = withPii(docs)
    val red = regexp_replace(
      regexp_replace(
        regexp_replace(pii, lit(EmailRe), lit("<EMAIL>")),
        lit(UrlRe), lit("<URL>")),
      lit(IpRe), lit("<IP>"))
    docs.select(col("doc_id"),
      regexp_count(pii, lit(EmailRe)).as("n_emails"),
      regexp_count(pii, lit(UrlRe)).as("n_urls"),
      regexp_count(pii, lit(IpRe)).as("n_ips"),
      length(red).as("n_chars_red"),
      md5(red).as("sig"))
  }

  /** DuckDB oracle for [[redact]] (regexp_replace needs the explicit
    * global flag; Spark replaces all matches by default).
    */
  val redactOracleSql: String = {
    // the Scala constants already hold the literal regex text, and DuckDB
    // single-quoted literals don't process backslashes — embed verbatim
    val email = EmailRe; val url = UrlRe; val ip = IpRe
    s"""WITH pii AS (SELECT doc_id, $withPiiSql AS t FROM documents),
       |red AS (
       |  SELECT doc_id, t,
       |         regexp_replace(
       |           regexp_replace(
       |             regexp_replace(t, '$email', '<EMAIL>', 'g'),
       |             '$url', '<URL>', 'g'),
       |           '$ip', '<IP>', 'g') AS r
       |  FROM pii)
       |SELECT doc_id,
       |       len(regexp_extract_all(t, '$email'))::BIGINT AS n_emails,
       |       len(regexp_extract_all(t, '$url'))::BIGINT AS n_urls,
       |       len(regexp_extract_all(t, '$ip'))::BIGINT AS n_ips,
       |       length(r)::BIGINT AS n_chars_red,
       |       md5(r) AS sig
       |FROM red""".stripMargin
  }

  // ---------------------------------------------------------------------
  // TF-IDF top terms
  // ---------------------------------------------------------------------

  /** Per-document top-k terms by tf·idf (idf = ln(N/df)) — the keyword
    * extraction step of corpus analytics. Scores are rounded to 6 dp
    * BEFORE ranking (ties then break on the term's binary collation) so
    * the ranking is deterministic across engines despite last-ulp ln()
    * differences. Shape: one shuffle for per-doc term counts, one
    * vocabulary-sized df aggregation joined back on the term, one window
    * by doc — the raw exploded token table never crosses a window.
    * N (corpus size) is a driver-side scalar from a distributed count,
    * like the IVF centroid collect: constant-bounded, not per-row.
    */
  def tfidfTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    import Ckpt.CutOps
    val n = docs.count()
    // materialized once: tf feeds both the df aggregation and the score
    // join — uncut, the full-text tokenize lineage executed twice
    val tf = docs
      .select(col("doc_id"), explode(words(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .lineageCut
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "term")
      .withColumn("score",
        round(col("tf") * log(lit(n.toDouble) / col("df")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(desc("score"), asc("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("doc_id", "term", "tf", "score", "rank")
  }

  def tfidfTermsOracleSql(k: Int = 3): String =
    s"""WITH wds AS (SELECT doc_id, unnest($wordsSql) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
       |       FROM wds GROUP BY doc_id, term),
       |df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
       |scored AS (
       |  SELECT tf.doc_id, tf.term, tf.tf,
       |         round(tf.tf * ln((SELECT count(*) FROM documents)::DOUBLE
       |                          / df.df), 6) AS score
       |  FROM tf JOIN df ON tf.term = df.term),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id
       |                               ORDER BY score DESC, term) AS rank
       |  FROM scored)
       |SELECT doc_id, term, tf, score, rank::BIGINT AS rank
       |FROM ranked WHERE rank <= $k""".stripMargin

  // ---------------------------------------------------------------------
  // Unigram-LM perplexity filter
  // ---------------------------------------------------------------------

  /** CCNet-style perplexity quality filter with the corpus's own unigram
    * LM: per document the average negative log-likelihood (nats/token)
    * under p(w) = count(w)/T, i.e. xent = ln T − (Σ ln c_w)/n. High xent
    * = tokens the corpus rarely sees (gibberish / OCR noise); low =
    * boilerplate. Deterministic: counts are exact integers, the one fp
    * sum is rounded to 6 dp, and `flagged` compares the ROUNDED value.
    *
    * Scale shape: vocabulary aggregation + token-key join (both on the
    * word key, one shuffle each), per-doc rollup on doc_id. T is a
    * driver-side scalar from a distributed count, like tfidf's N.
    * Output: (doc_id, n_tokens, xent_nats, flagged).
    */
  def perplexity(docs: DataFrame, flagThreshold: Double = 9.0): DataFrame = {
    import Ckpt.CutOps
    val toks = docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
    // the vocabulary is materialized once (it feeds the token join AND
    // the corpus-size scalar), and T = Σ c falls out of it — the
    // previous toks.count() was a third full tokenize of the corpus
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("c")).lineageCut
    val t = vocab.agg(coalesce(sum("c"), lit(0L))).head().getLong(0)
    val perDoc = toks.join(vocab, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(log(col("c"))).as("slc"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(when(col("n_tokens") > 0,
          lit(math.log(t.toDouble)) - col("slc") / col("n_tokens"))
          .otherwise(lit(0.0)), 6).as("xent_nats"))
      .withColumn("flagged", col("xent_nats") > flagThreshold)
  }

  def perplexityOracleSql(flagThreshold: Double = 9.0): String =
    s"""WITH wds AS (SELECT doc_id, unnest($wordsSql) AS w FROM documents),
       |vocab AS (SELECT w, count(*) AS c FROM wds GROUP BY w),
       |per AS (
       |  SELECT doc_id, count(*)::BIGINT AS n_tokens, sum(ln(c)) AS slc
       |  FROM wds JOIN vocab USING (w) GROUP BY doc_id),
       |x AS (
       |  SELECT d.doc_id, coalesce(n_tokens, 0)::BIGINT AS n_tokens,
       |         round(CASE WHEN coalesce(n_tokens, 0) > 0
       |               THEN ln((SELECT count(*)::DOUBLE FROM wds)) - slc / n_tokens
       |               ELSE 0.0 END, 6) AS xent_nats
       |  FROM documents d LEFT JOIN per USING (doc_id))
       |SELECT doc_id, n_tokens, xent_nats,
       |       xent_nats > $flagThreshold AS flagged
       |FROM x""".stripMargin

  /** Bigram-LM cross-entropy quality gate — one model order up from
    * [[perplexity]], the shape of the KenLM/CCNet filter an LLM pipeline
    * actually ships: P(b|a) = (c(ab)+1) / (c(a·)+V) (add-one smoothing
    * over the corpus-trained bigram table), per-doc score = mean negative
    * log-prob of its bigrams. Training and scoring are the same two
    * hash aggregations + key joins as the unigram gate (no new scan
    * shapes); the distinct-vocab size rides along as a broadcast 1-row
    * aggregate. Docs with < 2 words score 0 with n_bigrams = 0.
    * Output: (doc_id, n_bigrams, xent_nats, flagged).
    */
  def bigramLm(docs: DataFrame, flagThreshold: Double = 3.42): DataFrame = {
    // 8-byte keys before the wide ops (the shingleTable discipline): the
    // corpus-sized bigram stream shuffles int64s, never bigram text. The
    // oracle hashes identically, so both engines share the (whp
    // collision-free) key space.
    import Ckpt.CutOps
    // materialized once: the bigram stream feeds BOTH the model
    // aggregation and the per-doc scoring join — uncut, the full-text
    // tokenize+shingle lineage executed twice per call
    val bi = docs
      .select(col("doc_id"), explode(shingles(words(col("text")), 2)).as("bg"))
      .select(col("doc_id"), h64(col("bg")).as("bgh"),
        h64(substring_index(col("bg"), " ", 1)).as("w1h"))
      .lineageCut
    val v = docs.select(explode(words(col("text"))).as("w"))
      .agg(count_distinct(col("w")).as("v"))
    // ONE aggregation of the stream gives the bigram table (w1h rides
    // along — it is functionally dependent on the bigram); the context
    // counts fall out of it as a vocabulary-sized rollup, so the
    // per-bigram log-prob score table is built entirely off-stream
    val bgTab = bi.groupBy("bgh", "w1h").agg(count(lit(1)).as("c2"))
    val c1 = bgTab.groupBy("w1h").agg(sum("c2").as("c1"))
    val score = bgTab.join(c1, "w1h").join(broadcast(v))
      .select(col("bgh"),
        log((col("c2") + 1).cast("double") /
          (col("c1") + col("v")).cast("double")).as("lp"))
    val perDoc = bi.join(score, "bgh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("lp").as("slp"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(when(col("n_bigrams") > 0, -col("slp") / col("n_bigrams"))
          .otherwise(lit(0.0)), 6).as("xent_nats"))
      .withColumn("flagged", col("xent_nats") > flagThreshold)
  }

  def bigramLmOracleSql(flagThreshold: Double = 3.42): String =
    s"""WITH wds AS (SELECT doc_id, $wordsSql AS w FROM documents),
       |bi AS (
       |  SELECT doc_id, ${h64Sql("w[i] || ' ' || w[i+1]")} AS bgh,
       |         ${h64Sql("w[i]")} AS w1h
       |  FROM wds, unnest(range(1, len(w))) AS r(i)),
       |v AS (
       |  SELECT count(DISTINCT wd)::BIGINT AS v
       |  FROM (SELECT unnest($wordsSql) AS wd FROM documents)),
       |bgt AS (SELECT bgh, w1h, count(*)::BIGINT AS c2 FROM bi GROUP BY 1, 2),
       |c1 AS (SELECT w1h, sum(c2)::BIGINT AS c1 FROM bgt GROUP BY 1),
       |score AS (
       |  SELECT bgh, ln((c2 + 1)::DOUBLE / (c1 + v)::DOUBLE) AS lp
       |  FROM bgt JOIN c1 USING (w1h), v),
       |per AS (
       |  SELECT doc_id, count(*)::BIGINT AS n_bigrams, sum(lp) AS slp
       |  FROM bi JOIN score USING (bgh)
       |  GROUP BY doc_id),
       |x AS (
       |  SELECT d.doc_id, coalesce(n_bigrams, 0)::BIGINT AS n_bigrams,
       |         round(CASE WHEN coalesce(n_bigrams, 0) > 0
       |               THEN -slp / n_bigrams ELSE 0.0 END, 6) AS xent_nats
       |  FROM documents d LEFT JOIN per USING (doc_id))
       |SELECT doc_id, n_bigrams, xent_nats,
       |       xent_nats > $flagThreshold AS flagged
       |FROM x""".stripMargin

  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling"): per-document log-ratio
    * of a target-set hashed-bigram LM against the corpus LM,
    * log w(x) = Σ_{g ∈ x} [ln p_target(g) − ln p_corpus(g)] with add-one
    * smoothing over the shared bigram vocabulary. Documents resembling
    * the target (benchmark/task seed set) score high — the importance-
    * resampling selection signal that complements [[graft.ml.Retrieval]]'s
    * per-query retrieval with a corpus-wide density ratio.
    *
    * Scale shape: identical machinery to [[bigramLm]] — one corpus-sized
    * 8-byte-hashed bigram stream, one vocabulary-sized count table (the
    * target side is benchmark-sized), and a key join of the stream
    * against the per-gram score. Per-occurrence contributions are
    * rounded to integer nano-units before the per-document sum
    * (accumulation-order exact, the BM25 discipline).
    * Output: (doc_id, n_grams, log_ratio) for every document.
    */
  def dsirWeights(docs: DataFrame, isTarget: Column): DataFrame = {
    // both the count aggregation and the per-doc score join read the
    // corpus-sized bigram stream: materialize the hashed 17-byte rows
    // once so the interpreted shingle-explode + md5 pass (the dominant
    // cost, per the bm25TopK measurement) runs once, not per consumer.
    // Checkpoint lifetime: the blocks must outlive this function (they
    // back the RETURNED plan), so they cannot be freed here; both
    // harnesses unpersist all persistent RDDs after consuming each query
    // (Bench.materialize, Verify's post-dump sweep — Dataset.unpersist
    // alone would NOT free them, the SQL CacheManager never tracked
    // checkpoint RDDs). A library caller embedding dsirWeights in a
    // long-lived session owns the same sweep after consumption.
    val bi = docs
      .select(col("doc_id"), words(col("text")).as("w"))
      .select(col("doc_id"), isTarget.as("is_t"),
        explode(shingles(col("w"), 2)).as("bg"))
      .select(col("doc_id"), col("is_t"), h64(col("bg")).as("bgh"))
      .lineageCut
    // corpus LM counts over ALL docs; target LM over the seed slice —
    // one aggregation produces both (conditional count)
    val counts = bi.groupBy("bgh").agg(
      count(lit(1)).as("cc"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"))
    val tot = counts.agg(sum("cc").as("nc"), sum("ct").as("nt"),
      count(lit(1)).as("v"))
    val score = counts.join(broadcast(tot))
      .select(col("bgh"),
        (log((col("ct") + 1).cast("double") / (col("nt") + col("v")).cast("double")) -
          log((col("cc") + 1).cast("double") / (col("nc") + col("v")).cast("double")))
          .as("lr"))
    val perDoc = bi
      .join(score, "bgh")
      .select(col("doc_id"),
        floor(col("lr") * 1e9 + 0.5).cast("long").as("lr_nano"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), sum("lr_nano").as("s_nano"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        round(coalesce(col("s_nano"), lit(0L)) / 1e9, 6).as("log_ratio"))
  }

  def dsirWeightsOracleSql(isTargetSql: String): String =
    s"""WITH dw AS (
       |  SELECT doc_id, ($isTargetSql) AS is_t, $wordsSql AS w FROM documents),
       |bi AS (
       |  SELECT doc_id, is_t, ${h64Sql("w[i] || ' ' || w[i+1]")} AS bgh
       |  FROM dw, unnest(range(1, len(w))) AS r(i)),
       |counts AS (
       |  SELECT bgh, count(*)::BIGINT AS cc,
       |         sum(CASE WHEN is_t THEN 1 ELSE 0 END)::BIGINT AS ct
       |  FROM bi GROUP BY bgh),
       |tot AS (
       |  SELECT sum(cc)::BIGINT AS nc, sum(ct)::BIGINT AS nt,
       |         count(*)::BIGINT AS v
       |  FROM counts),
       |score AS (
       |  SELECT bgh,
       |         ln((ct + 1)::DOUBLE / (nt + v)::DOUBLE) -
       |         ln((cc + 1)::DOUBLE / (nc + v)::DOUBLE) AS lr
       |  FROM counts, tot),
       |per AS (
       |  SELECT doc_id, count(*)::BIGINT AS n_grams,
       |         sum(floor(lr * 1e9 + 0.5)::BIGINT)::BIGINT AS s_nano
       |  FROM bi JOIN score USING (bgh)
       |  GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(n_grams, 0)::BIGINT AS n_grams,
       |       round(coalesce(s_nano, 0) / 1e9, 6) AS log_ratio
       |FROM documents d LEFT JOIN per USING (doc_id)""".stripMargin

  // ---------------------------------------------------------------------
  // Document chunking
  // ---------------------------------------------------------------------

  /** Overlapping fixed-window chunking: split each document into word
    * windows of `window` tokens every `stride` tokens — the step that
    * turns curated documents into retrieval/pretraining units (stride <
    * window gives the standard overlapped context). The chunk text is
    * reported as an md5 signature plus its token count, so the oracle
    * checks the full chunk content without shipping text back. Pure
    * per-row explode — no shuffle, no state; chunk identity
    * (doc_id, chunk_id) is a pure function of the document.
    * Output: (doc_id, chunk_id, start_word, n_tokens, sig).
    */
  def chunk(docs: DataFrame, window: Int = 64, stride: Int = 48): DataFrame = {
    require(stride >= 1 && window >= stride,
      "need stride >= 1 and window >= stride (no uncovered gaps)")
    docs.select(col("doc_id"), words(col("text")).as("w"))
      .select(col("doc_id"), col("w"),
        posexplode(sequence(lit(0), size(col("w")) - 1, lit(stride)))
          .as(Seq("chunk_id", "start_word")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        col("start_word").cast("long").as("start_word"),
        least(lit(window), size(col("w")) - col("start_word")).cast("long")
          .as("n_tokens"),
        md5(concat_ws(" ", slice(col("w"), col("start_word") + 1, lit(window))))
          .as("sig"))
  }

  def chunkOracleSql(window: Int = 64, stride: Int = 48): String =
    s"""WITH dw AS (SELECT doc_id, $wordsSql AS w FROM documents),
       |st AS (
       |  SELECT doc_id, w, i AS start_word
       |  FROM dw, unnest(range(0, len(w), $stride)) AS r(i))
       |SELECT doc_id, (start_word // $stride)::BIGINT AS chunk_id,
       |       start_word::BIGINT AS start_word,
       |       least($window, len(w) - start_word)::BIGINT AS n_tokens,
       |       md5(array_to_string(w[start_word + 1 : start_word + $window], ' ')) AS sig
       |FROM st""".stripMargin

  // ---------------------------------------------------------------------
  // Global quality bucketing
  // ---------------------------------------------------------------------

  /** Global quantile bucketing of the quality score — equal-population
    * quality tiers WITHOUT a global sort: phase 1 computes the
    * `nBuckets−1` interpolated quantile boundaries (one distributed
    * aggregation to a constant-size result), phase 2 assigns each
    * document by counting boundaries below its score (a broadcast-free
    * literal comparison chain). This is the standard two-phase global
    * bucketing shape — an ntile() window here would serialize the corpus
    * through one partition. Boundaries are 9-dp-rounded before the
    * compare so a last-ulp interpolation difference between engines
    * cannot flip a boundary-sitting document.
    *
    * Scale note: `percentile` here is EXACT and buffers the score values
    * in its aggregation buffer — right for the oracle-checked contract,
    * but at 100-TB corpus scale phase 1 swaps to `approx_percentile`
    * (t-digest, bounded memory); phase 2 is unchanged since only the
    * constant-size boundary vector leaves the aggregation.
    * Output: (doc_id, quality_score, bucket) — bucket in [1, nBuckets].
    */
  def qualityBuckets(docs: DataFrame, nBuckets: Int = 10): DataFrame = {
    val q = TextStats.quality(docs).select("doc_id", "quality_score")
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val row = q
      .agg(percentile(col("quality_score"), typedlit(probs)).as("bs"))
      .head()
    // empty corpus: percentile yields NULL — no boundaries, no rows
    val bounds =
      if (row.isNullAt(0)) Seq.empty[Double]
      else row.getSeq[Double](0).map(b => math.floor(b * 1e9 + 0.5) / 1e9)
    val bucket = bounds
      .map(b => when(col("quality_score") > lit(b), 1L).otherwise(0L))
      .reduceOption(_ + _).getOrElse(lit(0L)) + lit(1L)
    q.select(col("doc_id"), col("quality_score"), bucket.as("bucket"))
  }

  def qualityBucketsOracleSql(nBuckets: Int = 10): String = {
    val probs = (1 until nBuckets).map(i => i.toDouble / nBuckets)
      .mkString("[", ", ", "]")
    val terms = (1 until nBuckets).map(i =>
      s"(CASE WHEN quality_score > floor(b[$i] * 1e9 + 0.5) / 1e9 THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH q AS (SELECT doc_id, quality_score FROM (${TextStats.qualityOracleSql})),
       |bs AS (SELECT quantile_cont(quality_score, $probs) AS b FROM q)
       |SELECT doc_id, quality_score, (1 + $terms)::BIGINT AS bucket
       |FROM q, bs""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Corpus snapshot diff
  // ---------------------------------------------------------------------

  /** Snapshot diff between two corpus versions — the refresh-ops question
    * "what changed since the last crawl": every doc_id classified as
    * added / removed / modified / unchanged by a FULL OUTER join of the
    * two (doc_id, md5) relations. Content compare is by signature, so
    * the join carries 16 bytes per side, never the text. One
    * hash-partitioned join on the id key — scale-safe.
    * Inputs are (doc_id, text) frames; output: (doc_id, status).
    */
  def snapshotDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val sa = a.select(col("doc_id").as("id_a"), md5(col("text")).as("sig_a"))
    val sb = b.select(col("doc_id").as("id_b"), md5(col("text")).as("sig_b"))
    sa.join(sb, col("id_a") === col("id_b"), "full_outer")
      .select(coalesce(col("id_a"), col("id_b")).as("doc_id"),
        when(col("id_b").isNull, "removed")
          .when(col("id_a").isNull, "added")
          .when(col("sig_a") =!= col("sig_b"), "modified")
          .otherwise("unchanged").as("status"))
  }

  /** Oracle twin; `aSql`/`bSql` each select (doc_id, text). */
  def snapshotDiffOracleSql(aSql: String, bSql: String): String =
    s"""WITH sa AS (SELECT doc_id, md5(text) AS sig FROM ($aSql)),
       |sb AS (SELECT doc_id, md5(text) AS sig FROM ($bSql))
       |SELECT coalesce(sa.doc_id, sb.doc_id) AS doc_id,
       |       CASE WHEN sb.doc_id IS NULL THEN 'removed'
       |            WHEN sa.doc_id IS NULL THEN 'added'
       |            WHEN sa.sig != sb.sig THEN 'modified'
       |            ELSE 'unchanged' END AS status
       |FROM sa FULL OUTER JOIN sb ON sa.doc_id = sb.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Source mixing report
  // ---------------------------------------------------------------------

  /** Per-source mixing report — the numbers a domain-reweighting decision
    * is made on: document and token counts, each source's token share,
    * and the sampling weight that would equalize token mass across
    * sources (uniform target / actual share). One source-keyed hash
    * aggregation; the corpus totals are a single-row aggregate combined
    * by a constant-size 1×1 cross join (cf. [[datasetCard]]).
    * Output: (source, n_docs, n_tokens, token_share, uniform_weight).
    */
  def sourceMix(docs: DataFrame): DataFrame = {
    val per = docs
      .select(col("source"), size(words(col("text"))).cast("long").as("nw"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("nw").as("n_tokens"))
    val tot = per.agg(sum("n_tokens").as("tot_tokens"),
      count(lit(1)).as("n_sources"))
    val share = col("n_tokens").cast("double") / col("tot_tokens")
    per.crossJoin(tot)
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(share, 6).as("token_share"),
        round((lit(1.0) / col("n_sources")) / share, 6).as("uniform_weight"))
  }

  val sourceMixOracleSql: String =
    s"""WITH per AS (
       |  SELECT source, count(*)::BIGINT AS n_docs,
       |         sum(len($wordsSql))::BIGINT AS n_tokens
       |  FROM documents GROUP BY source),
       |tot AS (
       |  SELECT sum(n_tokens)::BIGINT AS tot_tokens,
       |         count(*)::BIGINT AS n_sources
       |  FROM per)
       |SELECT source, n_docs, n_tokens,
       |       round(n_tokens::DOUBLE / tot_tokens, 6) AS token_share,
       |       round((1.0::DOUBLE / n_sources)
       |             / (n_tokens::DOUBLE / tot_tokens), 6) AS uniform_weight
       |FROM per, tot""".stripMargin

  /** Per-source distribution shift: KL(source unigram dist ‖ corpus
    * unigram dist) over the global top-`vocabCap` words — the domain-
    * drift number a mixing/reweighting decision reads next to
    * [[sourceMix]]'s token shares (a source whose word distribution sits
    * far from the corpus mean contributes differently per token than its
    * share suggests; CCNet/DoReMi-style pipelines track exactly this).
    *
    * Scale shape: one corpus-sized token scan feeds a vocabulary-sized
    * count relation; the top-`vocabCap` capping (count desc, word-hash
    * tie-break) bounds every later relation at `vocabCap` rows per
    * source — the KL sum never touches corpus-sized data again. Both
    * distributions are renormalized over the capped vocabulary, so the
    * measure compares like with like.
    *
    * Determinism: per-word KL contributions p·ln(p/q) are rounded to
    * integer nano-units before summing (accumulation-order independent —
    * the BM25 discipline). Output: (source, n_vocab_words, n_tokens_capped,
    * kl_nats), kl_nats >= 0 up to nano rounding.
    */
  def distShift(docs: DataFrame, vocabCap: Int = 2000): DataFrame = {
    require(vocabCap > 0)
    val toks = docs
      .select(col("source"), explode(words(col("text"))).as("word"))
      .select(col("source"), h64(col("word")).as("wh"))
    val global = toks.groupBy("wh").agg(count(lit(1)).as("cg"))
    // two-stage global top-vocabCap (Similarity.topK shape): the 64-way
    // bucketed pre-prune bounds the single-partition final rank's input
    // to 64·vocabCap rows regardless of vocabulary size
    val ord = Seq(desc("cg"), asc("wh"))
    val pre = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("wh"), lit(64))).orderBy(ord: _*)
    val fin = org.apache.spark.sql.expressions.Window.orderBy(ord: _*)
    val vocab = global
      .withColumn("r1", row_number().over(pre)).where(col("r1") <= vocabCap)
      .withColumn("r", row_number().over(fin))
      .where(col("r") <= vocabCap).drop("r1", "r")
    val capped = toks.join(broadcast(vocab), "wh")
    val perSrc = capped.groupBy("source", "wh")
      .agg(count(lit(1)).as("cs"), first("cg").as("cg"))
    val srcTot = perSrc.groupBy("source")
      .agg(sum("cs").as("ns"), count(lit(1)).as("n_vocab_words"))
    val gTot = vocab.agg(sum("cg").as("ng"))
    perSrc.join(srcTot, "source").join(broadcast(gTot))
      .select(col("source"), col("n_vocab_words"), col("ns"),
        // ratio of double ratios, never an int64 product: cs*ng / ns*cg
        // overflows 2^63 once ng (sum of the global top-vocabCap counts)
        // crosses ~2^40 at large corpora — non-ANSI Spark would wrap
        // silently while the DuckDB oracle errors
        floor(col("cs") / col("ns").cast("double") *
          log((col("cs").cast("double") / col("ns").cast("double")) /
            (col("cg").cast("double") / col("ng").cast("double"))) * 1e9 + 0.5)
          .cast("long").as("kl_nano"))
      .groupBy("source")
      .agg(first("n_vocab_words").as("n_vocab_words"),
        first("ns").as("n_tokens_capped"),
        round(sum("kl_nano") / 1e9, 6).as("kl_nats"))
  }

  def distShiftOracleSql(vocabCap: Int = 2000): String =
    s"""WITH toks AS (
       |  SELECT source, ${h64Sql("word")} AS wh
       |  FROM (SELECT source, unnest($wordsSql) AS word FROM documents)),
       |global AS (SELECT wh, count(*)::BIGINT AS cg FROM toks GROUP BY wh),
       |vocab AS (
       |  SELECT wh, cg FROM (
       |    SELECT *, row_number() OVER (ORDER BY cg DESC, wh) AS r FROM global)
       |  WHERE r <= $vocabCap),
       |per AS (
       |  SELECT t.source, t.wh, count(*)::BIGINT AS cs, any_value(v.cg) AS cg
       |  FROM toks t JOIN vocab v USING (wh) GROUP BY t.source, t.wh),
       |st AS (
       |  SELECT source, sum(cs)::BIGINT AS ns,
       |         count(*)::BIGINT AS n_vocab_words
       |  FROM per GROUP BY source),
       |gt AS (SELECT sum(cg)::BIGINT AS ng FROM vocab),
       |contrib AS (
       |  SELECT p.source, s.n_vocab_words, s.ns,
       |         floor(p.cs / s.ns::DOUBLE *
       |               ln((p.cs::DOUBLE / s.ns::DOUBLE) /
       |                  (p.cg::DOUBLE / g.ng::DOUBLE)) * 1e9
       |               + 0.5)::BIGINT AS kl_nano
       |  FROM per p JOIN st s USING (source), gt g)
       |SELECT source, any_value(n_vocab_words) AS n_vocab_words,
       |       any_value(ns) AS n_tokens_capped,
       |       round(sum(kl_nano) / 1e9, 6) AS kl_nats
       |FROM contrib GROUP BY source""".stripMargin

  /** Zipf-law fit of the corpus word-frequency distribution: OLS slope
    * of ln(count) against ln(rank) over the global top-`vocabCap` words —
    * the corpus-health diagnostic that flags synthetic/degenerate token
    * distributions (natural corpora sit near slope −1; templated or
    * machine-generated text flattens toward 0). Output one row:
    * (n_vocab, slope, intercept), 6 dp.
    *
    * Determinism: per-word ln(rank)/ln(count) are rounded to integer
    * MICRO-units and the five OLS sums run over exact int64 products
    * (micro² ≈ 6e13 per term × vocabCap ≪ 2⁶³) — accumulation-order
    * free; the closed-form slope/intercept arithmetic then runs on those
    * exact integers identically in both engines. Same two-stage bucketed
    * top-V as [[distShift]]; everything after the vocabulary-sized count
    * relation is vocabCap-bounded.
    */
  def zipfFit(docs: DataFrame, vocabCap: Int = 2000): DataFrame = {
    require(vocabCap > 1)
    val toks = docs
      .select(explode(words(col("text"))).as("word"))
      .select(h64(col("word")).as("wh"))
    val global = toks.groupBy("wh").agg(count(lit(1)).as("cg"))
    val ord = Seq(desc("cg"), asc("wh"))
    val pre = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("wh"), lit(64))).orderBy(ord: _*)
    val fin = org.apache.spark.sql.expressions.Window.orderBy(ord: _*)
    val ranked = global
      .withColumn("r1", row_number().over(pre)).where(col("r1") <= vocabCap)
      .withColumn("r", row_number().over(fin)).where(col("r") <= vocabCap)
    val m = ranked.select(
      floor(log(col("r").cast("double")) * 1e6 + 0.5).cast("long").as("x"),
      floor(log(col("cg").cast("double")) * 1e6 + 0.5).cast("long").as("y"))
    // sums stay exact int64; the closed form then runs on each sum CAST
    // to double (n·Σxy would overflow int64 at large corpora — both
    // engines round the same exact int64 to the same double, so the
    // double arithmetic is still deterministic)
    val agg = m.agg(count(lit(1)).cast("double").as("n"),
      sum("x").cast("double").as("sx"), sum("y").cast("double").as("sy"),
      sum(col("x") * col("y")).cast("double").as("sxy"),
      sum(col("x") * col("x")).cast("double").as("sxx"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    agg.select(col("n").cast("long").as("n_vocab"),
      round(slope, 6).as("slope"),
      round((col("sy") / col("n") - slope * (col("sx") / col("n"))) / 1e6, 6)
        .as("intercept"))
  }

  def zipfFitOracleSql(vocabCap: Int = 2000): String =
    s"""WITH toks AS (
       |  SELECT ${h64Sql("word")} AS wh
       |  FROM (SELECT unnest($wordsSql) AS word FROM documents)),
       |global AS (SELECT wh, count(*)::BIGINT AS cg FROM toks GROUP BY wh),
       |ranked AS (
       |  SELECT cg, row_number() OVER (ORDER BY cg DESC, wh) AS r
       |  FROM global QUALIFY r <= $vocabCap),
       |m AS (
       |  SELECT floor(ln(r::DOUBLE) * 1e6 + 0.5)::BIGINT AS x,
       |         floor(ln(cg::DOUBLE) * 1e6 + 0.5)::BIGINT AS y
       |  FROM ranked),
       |s AS (
       |  SELECT count(*)::DOUBLE AS n, sum(x)::DOUBLE AS sx,
       |         sum(y)::DOUBLE AS sy, sum(x * y)::DOUBLE AS sxy,
       |         sum(x * x)::DOUBLE AS sxx
       |  FROM m)
       |SELECT n::BIGINT AS n_vocab,
       |       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       |       round((sy / n -
       |              ((n * sxy - sx * sy) / (n * sxx - sx * sx))
       |              * (sx / n)) / 1e6, 6) AS intercept
       |FROM s""".stripMargin

  /** Length-bucket batching report: documents assigned to power-of-two
    * token-length buckets (16 … `maxLen`, longer docs truncated to
    * `maxLen`), with per-bucket padded-token mass and padding-waste
    * fraction — the decision table for dynamic-batching / bucketed-
    * sampler configuration (padding waste is pure wasted FLOPs at
    * training time; this is the report that says which bucket boundaries
    * earn their complexity). Pure per-row arithmetic into a ~8-row
    * aggregate: one scan, no joins.
    * Output: (bucket, n_docs, sum_tokens, padded_tokens, waste_frac).
    */
  def lengthBuckets(docs: DataFrame, maxLen: Int = 2048): DataFrame = {
    require(maxLen >= 16 && (maxLen & (maxLen - 1)) == 0,
      "maxLen must be a power of two >= 16")
    val n = least(greatest(size(words(col("text"))).cast("long"), lit(1L)),
      lit(maxLen.toLong))
    // smallest power-of-two bucket >= n, by explicit CASE chain (no
    // floating log2 — bit-exact in both engines)
    val buckets = Iterator.iterate(16L)(_ * 2).takeWhile(_ <= maxLen).toSeq
    val bucket = buckets.init.foldRight(lit(buckets.last): Column) {
      (b, rest) => when(n <= b, lit(b)).otherwise(rest)
    }
    docs.select(n.as("n_tok"), bucket.as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tokens"))
      .select(col("bucket"), col("n_docs"), col("sum_tokens"),
        (col("bucket") * col("n_docs")).as("padded_tokens"),
        round(lit(1.0) - col("sum_tokens").cast("double") /
          (col("bucket") * col("n_docs")), 6).as("waste_frac"))
  }

  def lengthBucketsOracleSql(maxLen: Int = 2048): String = {
    val buckets = Iterator.iterate(16L)(_ * 2).takeWhile(_ <= maxLen).toSeq
    val caseChain = buckets.init.map(b => s"WHEN n_tok <= $b THEN $b")
      .mkString(" ")
    s"""WITH n AS (
       |  SELECT least(greatest(len($wordsSql), 1), $maxLen)::BIGINT AS n_tok
       |  FROM documents),
       |b AS (
       |  SELECT n_tok,
       |         (CASE $caseChain ELSE ${buckets.last} END)::BIGINT AS bucket
       |  FROM n),
       |agg AS (
       |  SELECT bucket, count(*)::BIGINT AS n_docs,
       |         sum(n_tok)::BIGINT AS sum_tokens
       |  FROM b GROUP BY bucket)
       |SELECT bucket, n_docs, sum_tokens,
       |       (bucket * n_docs)::BIGINT AS padded_tokens,
       |       round(1.0 - sum_tokens::DOUBLE / (bucket * n_docs), 6)
       |         AS waste_frac
       |FROM agg""".stripMargin
  }

  // ---------------------------------------------------------------------
  // Vocabulary build + OOV rate
  // ---------------------------------------------------------------------

  /** Fixed-size vocabulary coverage: build the corpus top-`vocabSize`
    * word vocabulary (count desc, word asc — deterministic) and report
    * each document's out-of-vocabulary token fraction, the coverage
    * number a tokenizer/vocab decision is made on. The vocabulary
    * selection is a distributed top-k (TakeOrdered over the
    * vocabulary-sized count relation — never a single-partition window
    * over the corpus), broadcast back against the token table; the OOV
    * rollup is one hash aggregation on doc_id.
    * Output: (doc_id, n_tokens, n_oov, oov_rate).
    */
  def vocabOov(docs: DataFrame, vocabSize: Int = 1000): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(words(col("text"))).as("word"))
    val vocab = toks.groupBy("word").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("word")).limit(vocabSize)
      .select(col("word"), lit(true).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("word"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 6).as("oov_rate"))
  }

  def vocabOovOracleSql(vocabSize: Int = 1000): String =
    s"""WITH toks AS (SELECT doc_id, unnest($wordsSql) AS word FROM documents),
       |counts AS (SELECT word, count(*) AS c FROM toks GROUP BY word),
       |vocab AS (SELECT word FROM counts ORDER BY c DESC, word LIMIT $vocabSize),
       |per AS (
       |  SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
       |         sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov
       |  FROM toks t LEFT JOIN vocab v ON t.word = v.word
       |  GROUP BY t.doc_id)
       |SELECT doc_id, n_tokens, n_oov,
       |       round(n_oov::DOUBLE / n_tokens, 6) AS oov_rate
       |FROM per""".stripMargin

  // ---------------------------------------------------------------------
  // Dataset card
  // ---------------------------------------------------------------------

  /** One-row dataset card — the corpus-level summary a curation run
    * publishes: doc/token totals, exact-dup rate, mean quality score,
    * and the language distribution's count and entropy. Everything
    * integer-exact except the two rounded fp summaries. The two
    * single-row aggregates are combined with a 1×1 cross join (constant
    * size — not a data cross product).
    */
  def datasetCard(docs: DataFrame): DataFrame = {
    val base = docs
      .select(col("doc_id"), md5(col("text")).as("sig"),
        words(col("text")).as("w"))
      .select(col("doc_id"), col("sig"), size(col("w")).cast("long").as("nw"))
    val joined = base
      .join(TextStats.quality(docs).select("doc_id", "quality_score"), "doc_id")
      .join(TextStats.languageId(docs).select("doc_id", "lang_pred"), "doc_id")
    val totals = joined.agg(
      count(lit(1)).as("n_docs"),
      sum(col("nw")).as("n_tokens"),
      count_distinct(col("sig")).as("n_unique_texts"),
      round(lit(1.0) - count_distinct(col("sig")) / count(lit(1)).cast("double"), 6)
        .as("dup_rate"),
      round(avg(col("quality_score")), 6).as("mean_quality"))
    val langH = joined.groupBy("lang_pred").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_langs"),
        round(log(sum(col("c"))) - sum(col("c") * log(col("c"))) / sum(col("c")), 6)
          .as("lang_entropy"))
    totals.crossJoin(langH)
  }

  val datasetCardOracleSql: String =
    s"""WITH q AS (${TextStats.qualityOracleSql}),
       |l AS (${TextStats.languageIdOracleSql}),
       |base AS (
       |  SELECT doc_id, md5(text) AS sig, len($wordsSql)::BIGINT AS nw
       |  FROM documents),
       |j AS (
       |  SELECT b.doc_id, b.sig, b.nw, q.quality_score, l.lang_pred
       |  FROM base b JOIN q USING (doc_id) JOIN l USING (doc_id)),
       |a AS (
       |  SELECT count(*)::BIGINT AS n_docs, sum(nw)::BIGINT AS n_tokens,
       |         count(DISTINCT sig)::BIGINT AS n_unique_texts,
       |         round(1.0 - count(DISTINCT sig)::DOUBLE / count(*), 6) AS dup_rate,
       |         round(avg(quality_score), 6) AS mean_quality
       |  FROM j),
       |lc AS (SELECT lang_pred, count(*) AS c FROM j GROUP BY lang_pred),
       |h AS (
       |  SELECT count(*)::BIGINT AS n_langs,
       |         round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS lang_entropy
       |  FROM lc)
       |SELECT a.*, h.* FROM a, h""".stripMargin

  // ---------------------------------------------------------------------
  // Deterministic global shuffle → training shards
  // ---------------------------------------------------------------------

  /** Deterministic global shuffle + shard assignment — the step between a
    * curated corpus and the shard files a training data-loader streams
    * (webdataset/tfrecord layout): every doc gets a pseudo-random but
    * reproducible `shard` and a dense 0-based `pos` within it, so the
    * write order is fully determined by (corpus, salt) and a re-run
    * produces byte-identical shards.
    *
    * Scale: the shard key is a hash — one shuffle partitions by it, and
    * `pos` is a per-shard sort, never a global one. `nShards` is chosen
    * so one shard ≈ one output file (O(100k) shards at 100 TB); no
    * driver-side state, no global row_number bottleneck.
    */
  def shuffleShard(docs: DataFrame, nShards: Int = 8,
                   salt: String = "r4"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val skey = h64(concat(lit(s"shuf:$salt:"), col("doc_id").cast("string")))
    docs.select(col("doc_id"), skey.as("skey"))
      .withColumn("shard", pmod(col("skey"), lit(nShards.toLong)))
      .withColumn("pos",
        (row_number().over(Window.partitionBy("shard")
          .orderBy(col("skey"), col("doc_id"))) - 1).cast("long"))
      .select("doc_id", "shard", "pos")
  }

  /** Curriculum ordering: a dense global training order 0..n-1 that
    * presents high-quality documents first. phase = quality band
    * (floor((1-q)·nPhases), clamped — band 0 is the best-written slice);
    * within a phase documents are deterministically shuffled (the
    * [[shuffleShard]] salted-hash key), so the curriculum is reproducible
    * and oracle-checkable. Output: (doc_id, phase, train_pos).
    *
    * Scale: the order is (phase, shard, skey, doc_id) — the oracle states
    * it as ONE global row_number, but the engine never materializes a
    * global sort: per-(phase, shard) row_numbers are bounded windows
    * (corpus/nShards rows each), and the phase/shard base offsets come
    * from a nPhases×nShards-row count rollup cumulated with a window on
    * that TINY relation (256 rows — the single-partition window is
    * bounded by construction, same pattern as [[packAuto]]'s shard
    * offsets) and broadcast back. No stage touches more than a shard's
    * rows, so the plan survives any corpus width at fixed nShards·phase
    * skew.
    */
  def curriculum(docs: DataFrame, nPhases: Int = 4, nShards: Int = 64,
                 salt: String = "r7"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nPhases > 0 && nShards > 0)
    val q = TextStats.quality(docs).select(col("doc_id"), col("quality_score"))
    val skey = h64(concat(lit(s"curr:$salt:"), col("doc_id").cast("string")))
    val keyed = q.select(col("doc_id"),
        least(lit(nPhases - 1),
          floor((lit(1.0) - col("quality_score")) * nPhases).cast("int"))
          .as("phase"),
        skey.as("skey"))
      .withColumn("shard", pmod(col("skey"), lit(nShards.toLong)).cast("int"))
    val posInShard = row_number().over(
      Window.partitionBy("phase", "shard").orderBy(col("skey"), col("doc_id")))
      .cast("long") - 1
    // tiny offset relation: cumulative docs before each (phase, shard)
    val offsets = keyed.groupBy("phase", "shard").agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(
        sum("cnt").over(Window.orderBy("phase", "shard")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("phase", "shard", "off")
    keyed.withColumn("rn", posInShard)
      .join(broadcast(offsets), Seq("phase", "shard"))
      .select(col("doc_id"), col("phase"),
        (col("off") + col("rn")).as("train_pos"))
  }

  /** DuckDB oracle: the same order declared as one global row_number.
    * `keepersSql` (a doc_id relation) optionally restricts the corpus —
    * the capstone-pipeline seam, so a composed oracle reuses these exact
    * phase/shard/key expressions instead of restating them.
    */
  def curriculumOracleSql(nPhases: Int = 4, nShards: Int = 64,
                          salt: String = "r7",
                          keepersSql: Option[String] = None): String = {
    val semi = keepersSql
      .map(k => s"SEMI JOIN ($k) kp ON q.doc_id = kp.doc_id")
      .getOrElse("")
    s"""WITH q AS (${TextStats.qualityOracleSql}),
       |keyed AS (
       |  SELECT q.doc_id,
       |         least($nPhases - 1,
       |               floor((1.0 - q.quality_score) * $nPhases)::INT) AS phase,
       |         ${h64Sql(s"'curr:$salt:' || q.doc_id::VARCHAR")} AS skey
       |  FROM q $semi)
       |SELECT doc_id, phase,
       |       (row_number() OVER (
       |          ORDER BY phase, skey % $nShards, skey, doc_id) - 1)::BIGINT
       |         AS train_pos
       |FROM keyed""".stripMargin
  }

  def shuffleShardOracleSql(nShards: Int = 8, salt: String = "r4"): String =
    s"""WITH s AS (
       |  SELECT doc_id,
       |         ${h64Sql(s"'shuf:$salt:' || doc_id::VARCHAR")} AS skey
       |  FROM documents)
       |SELECT doc_id, skey % $nShards AS shard,
       |       (row_number() OVER (PARTITION BY skey % $nShards
       |                           ORDER BY skey, doc_id) - 1)::BIGINT AS pos
       |FROM s""".stripMargin

  // ---------------------------------------------------------------------
  // Source rebalancing by deterministic weighted sampling
  // ---------------------------------------------------------------------

  /** Apply [[sourceMix]]'s uniform-rebalance weights as a deterministic
    * downsampling pass: a doc from an over-represented source (weight
    * < 1) is kept iff its hash fraction falls below the weight; sources
    * at or under par keep everything (upsampling is the loader's job —
    * an engine emitting duplicate rows would break every downstream
    * dedup invariant). The hash fraction derives from md5 of the doc id,
    * so the sample is reproducible and oracle-checkable, not an RNG
    * draw. Output: (doc_id, source, weight6, kept) for every doc.
    *
    * Scale: the weight relation is one row per source (tiny — AQE
    * broadcasts it); the decision is a map-side expression. This is the
    * temperature-style source-mixing step of LLM corpus prep, run at
    * full corpus width.
    */
  def rebalanceSample(docs: DataFrame): DataFrame = {
    val w = sourceMix(docs).select(col("source"),
      col("uniform_weight").as("weight6"))
    // 2^60 = h64's key space; identical int64→double→divide on both
    // engines, so the comparison is bit-deterministic
    val frac = h64(concat(lit("rb:"), col("doc_id").cast("string")))
      .cast("double") / lit(1152921504606846976.0)
    docs.join(w, "source")
      .select(col("doc_id"), col("source"), col("weight6"),
        (frac < least(col("weight6"), lit(1.0))).as("kept"))
  }

  val rebalanceSampleOracleSql: String =
    s"""WITH mix AS ($sourceMixOracleSql)
       |SELECT d.doc_id, d.source, m.uniform_weight AS weight6,
       |       ${h64Sql("'rb:' || d.doc_id::VARCHAR")}::DOUBLE
       |         / 1152921504606846976.0 < least(m.uniform_weight, 1.0) AS kept
       |FROM documents d JOIN mix m ON d.source = m.source""".stripMargin

  /** Temperature-scaled language mixing weights — the multilingual
    * sampling rule w_l ∝ p_l^α at α = 0.5, the temperature that keeps
    * low-resource languages visible without swamping the head. Per
    * language (from the language-ID rollup): w6 = the language's share
    * of Σ√tokens, 6 dp.
    *
    * Cross-engine determinism: the denominator is a sum of DOUBLES in
    * principle — so each √tokens is quantized FIRST
    * (floor(√n·1e6 + 0.5), sqrt being IEEE-exact) and the sum runs over
    * int64s, order-independent in both engines (the [[Similarity.kmeans]]
    * quantize-before-aggregate trick). The one-row total broadcasts.
    * Output: (lang_pred, n_docs, total_words, weight6).
    */
  def temperatureMix(docs: DataFrame): DataFrame = {
    val scaled = TextStats.corpusStats(docs)
      .withColumn("scaled",
        floor(sqrt(col("total_words").cast("double")) * 1e6 + 0.5).cast("long"))
    val tot = scaled.agg(sum("scaled").as("tot_scaled"))
    scaled.join(broadcast(tot))
      .select(col("lang_pred"), col("n_docs"), col("total_words"),
        round(col("scaled").cast("double") / col("tot_scaled").cast("double"), 6)
          .as("weight6"))
  }

  val temperatureMixOracleSql: String =
    s"""WITH cs AS (${TextStats.corpusStatsOracleSql}),
       |sc AS (
       |  SELECT lang_pred, n_docs::BIGINT AS n_docs, total_words,
       |         floor(sqrt(total_words::DOUBLE) * 1e6 + 0.5)::BIGINT AS scaled
       |  FROM cs),
       |t AS (SELECT sum(scaled)::BIGINT AS tot FROM sc)
       |SELECT lang_pred, n_docs, total_words,
       |       round(scaled::DOUBLE / tot::DOUBLE, 6) AS weight6
       |FROM sc, t""".stripMargin

  /** Anneal the corpus toward the [[temperatureMix]] target: per
    * language, keep rate r_l = (w_l / share_l) normalized so the MOST
    * over-target language keeps 100% (pure downsampling — no document is
    * ever duplicated); documents then keep/drop by the usual md5-uniform
    * draw. Every rate is a chain of single IEEE ops over already-rounded
    * inputs (no float summation anywhere: the token total is an integer
    * sum, the normalizer is a max), so both engines compute identical
    * rates. Output: (doc_id, lang_pred, rate6, kept).
    */
  def annealMix(docs: DataFrame): DataFrame = {
    val mix = temperatureMix(docs)
    val tot = mix.agg(sum("total_words").as("tw"))
    val rates = mix.join(broadcast(tot))
      .select(col("lang_pred"),
        (col("weight6") * col("tw").cast("double") /
          col("total_words").cast("double")).as("ratio"))
    val mx = rates.agg(max("ratio").as("mx"))
    val r6 = rates.join(broadcast(mx))
      .select(col("lang_pred"), round(col("ratio") / col("mx"), 6).as("rate6"))
    val frac = h64(concat(lit("an:"), col("doc_id").cast("string")))
      .cast("double") / lit(1152921504606846976.0)
    TextStats.languageId(docs).select("doc_id", "lang_pred")
      .join(broadcast(r6), "lang_pred")
      .select(col("doc_id"), col("lang_pred"), col("rate6"),
        (frac < col("rate6")).as("kept"))
  }

  val annealMixOracleSql: String =
    s"""WITH mix AS ($temperatureMixOracleSql),
       |tot AS (SELECT sum(total_words)::BIGINT AS tw FROM mix),
       |rates AS (
       |  SELECT lang_pred,
       |         weight6 * tw::DOUBLE / total_words::DOUBLE AS ratio
       |  FROM mix, tot),
       |mx AS (SELECT max(ratio) AS mx FROM rates),
       |r6 AS (SELECT lang_pred, round(ratio / mx, 6) AS rate6 FROM rates, mx),
       |lang AS (${TextStats.languageIdOracleSql})
       |SELECT l.doc_id, l.lang_pred, r.rate6,
       |       ${h64Sql("'an:' || l.doc_id::VARCHAR")}::DOUBLE
       |         / 1152921504606846976.0 < r.rate6 AS kept
       |FROM lang l JOIN r6 r ON l.lang_pred = r.lang_pred""".stripMargin

  // ---------------------------------------------------------------------
  // Tokenizer training: BPE merge table
  // ---------------------------------------------------------------------

  /** Distributed BPE tokenizer training — the merge-table artifact every
    * LLM data pipeline ships next to its corpus. Classic corpus-level
    * BPE: train on the word-frequency dictionary (one groupBy of the
    * corpus), then `nMerges` rounds of count-adjacent-symbol-pairs →
    * merge the most frequent pair everywhere. Pre-tokenization contract:
    * words matching `[a-z0-9]+` only (the usual pre-tokenizer regex;
    * anything else is excluded from training on BOTH engines).
    *
    * Engine-exact representation: a word's symbol sequence is the
    * sentinel string `<s1><s2>…` — safe because the pre-tokenizer bans
    * `<`/`>` inside symbols. Applying a merge is then a plain
    * `replace(s, '<a><b>', '<ab>')`, whose leftmost-nonoverlapping-
    * sequential semantics (identical in Spark and DuckDB) are EXACTLY
    * BPE's greedy merge order: '<a><a><a>' under merge (a,a) yields
    * '<aa><a>', never '<a><aa>'. Pair counts are integer sums; the
    * argmax tie-breaks on (count DESC, pair lexicographic) — every round
    * is deterministic, so the DuckDB oracle replays the whole training
    * run CTE-by-CTE.
    *
    * Scale shape: each round is ONE linear pass over the word-frequency
    * table (corpus-independent after the first groupBy), a map-side-
    * combined pair aggregation, and a 1-row TakeOrdered collect — the
    * same constant-bounded driver materialization as
    * [[graft.ml.Similarity.kmeans]] centroids. The evolving symbol table
    * is localCheckpointed per round so round t+1 never replays rounds
    * 1..t. Output: (step, pair_a, pair_b, cnt) — the ordered merge list.
    */
  /** The shared training loop: returns the final symbol table
    * (word, s, freq) and the ordered merge list.
    *
    * BATCHED rounds (the vocab-scale shape): one driver round-trip per
    * BATCH of merges, not per merge. Each round ranks the round-start
    * pair counts, collects the top `5·batch` candidate pool (a
    * constant-bounded collect), greedily selects up to `cap` SYMBOL-
    * DISJOINT pairs in (cnt DESC, a, b) order — disjoint merges cannot
    * change each other's round-start counts, so they apply in one
    * projection — and rewrites the symbol table once. A 100k-merge vocab
    * costs ~100k/batch sequential Spark jobs instead of 100k; batch = 1
    * degenerates to the classical strictly-sequential algorithm.
    * Deterministic end to end (total candidate order, greedy rule, rank
    * application order), so the DuckDB oracle replays every round — the
    * greedy used-symbol state unrolls as a recursive CTE.
    */
  private[ml] def bpeTrain(docs: DataFrame, nMerges: Int, batch: Int = 8,
                           untilTarget: Boolean = false)
      : (DataFrame, Seq[(Long, String, String, Long)]) = {
    val wf = docs
      .select(explode(words(col("text"))).as("word"))
      .where(col("word").rlike("^[a-z0-9]+$"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    var seq = wf
      .select(col("word"),
        regexp_replace(col("word"), "(.)", "<$1>").as("s"), col("freq"))
    val poolK = 5 * batch
    // Round-checkpoint hygiene: every round re-checkpoints the symbol
    // table; at tokenizer scale (hundreds of rounds for a 32k vocab) the
    // dead checkpoints would otherwise pile up until driver GC happens to
    // run the ContextCleaner. Track the block IDs each checkpoint call
    // creates and free the PREVIOUS round's explicitly — never touching
    // caller-owned checkpoints (e.g. the bench's reused corpus).
    val sc = docs.sparkSession.sparkContext
    // Under Ckpt.cut's RELIABLE path (a checkpoint dir is configured —
    // the executor-loss-safe deployment) no persistent RDD blocks are
    // created, so `created` is empty and the per-round unpersist is a
    // no-op: cleanup is the checkpoint FILES' job (see Ckpt's scaladoc).
    def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val out = df.lineageCut
      (out, sc.getPersistentRDDs.keySet.toSet -- before)
    }
    var seqBlocks = Set.empty[Int]
    def recheckpoint(df: DataFrame): DataFrame = {
      val (out, created) = checkpointTracked(df)
      seqBlocks.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      seqBlocks = created
      out
    }
    seq = { val (out, created) = checkpointTracked(seq); seqBlocks = created; out }
    // Fixed-round mode (the oracle-replayed shape): exactly
    // ceil(nMerges/batch) rounds, round t capped so requested merge
    // SLOTS never exceed nMerges. Until-target mode (the tokenizer-
    // training shape, [[bpeMergesToVocab]]): keep running full-batch
    // rounds until the merge LIST reaches nMerges — each non-exhausted
    // round applies >= 1 merge, so the loop takes at most nMerges rounds.
    val rounds = if (untilTarget) nMerges else (nMerges + batch - 1) / batch
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var exhausted = false
    for (t <- 1 to rounds if !exhausted && merges.size < nMerges) {
      val cap = if (untilTarget) math.min(batch, nMerges - merges.size)
                else math.min(batch, nMerges - (t - 1) * batch)
      val sy = split(expr("trim(BOTH '<>' FROM s)"), "><")
      val cands = seq
        .select(col("freq"), sy.as("sy"))
        .where(size(col("sy")) >= 2)
        .select(col("freq"), explode(transform(
          sequence(lit(1), size(col("sy")) - 1),
          i => struct(element_at(col("sy"), i).as("a"),
            element_at(col("sy"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(poolK).collect()
      if (cands.isEmpty) exhausted = true // corpus fully merged: stop early
      else {
        val used = scala.collection.mutable.HashSet.empty[String]
        val sel = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        cands.foreach { r =>
          val (a, b, c) = (r.getString(0), r.getString(1), r.getLong(2))
          if (sel.size < cap && !used(a) && !used(b)) {
            used += a; used += b; sel += ((a, b, c))
          }
        }
        sel.foreach { case (a, b, c) => merges += ((merges.size + 1L, a, b, c)) }
        val mergedS = sel.foldLeft(col("s")) { case (e, (a, b, _)) =>
          replace(e, lit(s"<$a><$b>"), lit(s"<$a$b>"))
        }
        seq = recheckpoint(
          seq.select(col("word"), mergedS.as("s"), col("freq")))
      }
    }
    (seq, merges.toSeq)
  }

  /** Run bpeTrain for its merge list only, freeing the final symbol-table
    * checkpoint the round-hygiene loop leaves alive for seq-consuming
    * callers (bpeEncode) — the merge list is already a driver-side Seq,
    * so nothing downstream can reference the blocks.
    */
  private def bpeMergesOnly(docs: DataFrame, nMerges: Int, batch: Int,
                            untilTarget: Boolean): Seq[(Long, String, String, Long)] = {
    val sc = docs.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val merges = bpeTrain(docs, nMerges, batch, untilTarget)._2
    (sc.getPersistentRDDs.keySet.toSet -- before).foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    merges
  }

  def bpeMerges(docs: DataFrame, nMerges: Int = 8, batch: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeMergesOnly(docs, nMerges, batch, untilTarget = false)
      .toDF("step", "pair_a", "pair_b", "cnt")
  }

  /** Train until the merge list actually REACHES `targetMerges` (or the
    * corpus exhausts) — the contract a tokenizer trainer wants ("give me
    * a 32k vocab"), as opposed to [[bpeMerges]]'s fixed
    * ceil(nMerges/batch) round budget, which under-fills early rounds:
    * round 1 can select at most ~(alphabet/2) symbol-disjoint pairs
    * regardless of batch, so a fixed-round run at batch 512 ends far
    * short of its request. Each round still applies at most `batch`
    * merges with the same candidate pool, greedy disjointness rule, and
    * tie-break — at batch = 1 the two modes are step-for-step identical
    * (spec-pinned). Same output schema as [[bpeMerges]].
    */
  def bpeMergesToVocab(docs: DataFrame, targetMerges: Int,
                       batch: Int = 512): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeMergesOnly(docs, targetMerges, batch, untilTarget = true)
      .toDF("step", "pair_a", "pair_b", "cnt")
  }

  /** Corpus tokenization under the trained BPE vocabulary: per document,
    * whitespace-word count vs BPE token count and the tokens-per-word
    * ratio — the number a pipeline reports to size its training budget.
    * Words are encoded by joining against the trained symbol table (the
    * word-frequency dictionary already holds every pre-tokenized word),
    * so no per-document merge replay happens: one equi join on word +
    * one per-doc aggregation. Pre-tokenizer-rejected words are excluded
    * from BOTH counts (the [[bpeTrain]] contract).
    */
  def bpeEncode(docs: DataFrame, nMerges: Int = 8, batch: Int = 8): DataFrame = {
    val (seqF, _) = bpeTrain(docs, nMerges, batch)
    val tok = seqF.select(col("word"),
      size(split(expr("trim(BOTH '<>' FROM s)"), "><")).cast("long").as("n_tok"))
    docs.select(col("doc_id"), explode(words(col("text"))).as("word"))
      .where(col("word").rlike("^[a-z0-9]+$"))
      .join(tok, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_tok").as("n_bpe_tokens"))
      .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"),
        round(col("n_bpe_tokens").cast("double") / col("n_words").cast("double"), 6)
          .as("tokens_per_word"))
  }

  /** CTE-by-CTE replay of [[bpeMerges]]: seq0 → (pairs_t → best_t →
    * seq_t)* with the final UNION of the per-round argmax rows.
    */
  /** The shared CTE chain (wf, seq0, then p_t/b_t/seq_t per round) —
    * every seq CTE carries (word, s, freq) so both the merge-table and
    * the encode oracle can hang off the final round.
    */
  /** Per-round CTEs: p_t (pair counts) → c_t (ranked top-5·batch pool) →
    * st_t (the greedy symbol-disjoint selection as a recursive scan — the
    * used-symbol set rides along as a '|'-delimited string, safe because
    * symbols are [a-z0-9]+) → sel_t (batch-ranked picks) → selagg_t (the
    * picks folded into ONE ordered pattern⟂replacement list — a single
    * reference into the selection chain; per-rank scalar subqueries
    * would inline the whole upstream chain 4·cap times per round, an
    * exponential planning blowup) → seq_t (list_reduce applies the picks
    * in rank order; an empty round reduces to the identity). The
    * emitted chain must be opened with WITH RECURSIVE. Every CTE is
    * AS MATERIALIZED: DuckDB otherwise inlines multi-referenced CTEs,
    * and the round-over-round chain re-expands upstream rounds
    * exponentially (the 64-merge replay went from >10 min to 0.6 s).
    */
  private def bpeChainCtes(nMerges: Int, batch: Int): String = {
    val poolK = 5 * batch
    val rounds = (nMerges + batch - 1) / batch
    val header =
      s"""wf AS MATERIALIZED (
         |  SELECT word, count(*)::BIGINT AS freq
         |  FROM (SELECT unnest($wordsSql) AS word FROM documents)
         |  WHERE regexp_matches(word, '^[a-z0-9]+$$')
         |  GROUP BY word),
         |seq0 AS MATERIALIZED (
         |  SELECT word, regexp_replace(word, '(.)', '<\\1>', 'g') AS s, freq
         |  FROM wf)""".stripMargin
    val roundCtes = (1 to rounds).map { t =>
      val cap = math.min(batch, nMerges - (t - 1) * batch)
      val ok = s"st.nsel < $cap AND strpos(st.used, '|' || c.a || '|') = 0" +
        " AND strpos(st.used, '|' || c.b || '|') = 0"
      s"""p$t AS MATERIALIZED (
         |  SELECT sy[i] AS a, sy[i+1] AS b, sum(freq)::BIGINT AS cnt
         |  FROM (SELECT string_split(trim(s, '<>'), '><') AS sy, freq
         |        FROM seq${t - 1}) AS w$t,
         |       unnest(range(1, len(sy))) AS r(i)
         |  GROUP BY 1, 2),
         |c$t AS MATERIALIZED (
         |  SELECT a, b, cnt, row_number() OVER (ORDER BY cnt DESC, a, b) AS r
         |  FROM p$t QUALIFY r <= $poolK),
         |st$t AS (
         |  SELECT 0 AS r, '|' AS used, 0 AS nsel,
         |         CAST(NULL AS VARCHAR) AS a, CAST(NULL AS VARCHAR) AS b,
         |         CAST(NULL AS BIGINT) AS cnt, false AS selected
         |  UNION ALL
         |  SELECT c.r,
         |         CASE WHEN $ok THEN st.used || c.a || '|' || c.b || '|'
         |              ELSE st.used END,
         |         st.nsel + CASE WHEN $ok THEN 1 ELSE 0 END,
         |         c.a, c.b, c.cnt, $ok
         |  FROM st$t st JOIN c$t c ON c.r = st.r + 1),
         |sel$t AS MATERIALIZED (
         |  SELECT row_number() OVER (ORDER BY r) AS brank, a, b, cnt
         |  FROM st$t WHERE selected),
         |selagg$t AS MATERIALIZED (
         |  SELECT list(('<' || a || '><' || b || '>') || chr(2) ||
         |              ('<' || a || b || '>') ORDER BY brank) AS prs
         |  FROM sel$t),
         |seq$t AS MATERIALIZED (
         |  SELECT word,
         |         list_reduce(list_prepend(s, coalesce(prs, [])),
         |           (acc, x) -> replace(acc, split_part(x, chr(2), 1),
         |                               split_part(x, chr(2), 2))) AS s,
         |         freq
         |  FROM seq${t - 1}, selagg$t)""".stripMargin
    }.mkString(",\n")
    s"$header,\n$roundCtes"
  }

  def bpeMergesOracleSql(nMerges: Int = 8, batch: Int = 8): String = {
    val rounds = (nMerges + batch - 1) / batch
    val union = (1 to rounds)
      .map(t => s"SELECT $t AS t, brank, a, b, cnt FROM sel$t")
      .mkString("\nUNION ALL ")
    s"""WITH RECURSIVE ${bpeChainCtes(nMerges, batch)}
       |SELECT row_number() OVER (ORDER BY t, brank)::BIGINT AS step,
       |       a AS pair_a, b AS pair_b, cnt
       |FROM ($union) AS allsel""".stripMargin
  }

  def bpeEncodeOracleSql(nMerges: Int = 8, batch: Int = 8): String = {
    val rounds = (nMerges + batch - 1) / batch
    s"""WITH RECURSIVE ${bpeChainCtes(nMerges, batch)},
       |tok AS (
       |  SELECT word, len(string_split(trim(s, '<>'), '><'))::BIGINT AS n_tok
       |  FROM seq$rounds),
       |dw AS (
       |  SELECT doc_id, word
       |  FROM (SELECT doc_id, unnest($wordsSql) AS word FROM documents) AS u
       |  WHERE regexp_matches(word, '^[a-z0-9]+$$'))
       |SELECT dw.doc_id, count(*)::BIGINT AS n_words,
       |       sum(t.n_tok)::BIGINT AS n_bpe_tokens,
       |       round(sum(t.n_tok)::DOUBLE / count(*)::DOUBLE, 6) AS tokens_per_word
       |FROM dw JOIN tok t ON dw.word = t.word
       |GROUP BY dw.doc_id""".stripMargin
  }

  /** Tokenizer fertility by language — tokens-per-word under the TRAINED
    * BPE vocab, split by the language-ID rollup: the standard diagnostic
    * for how well a tokenizer serves each language in a multilingual mix
    * (a language with high fertility is paying more sequence length per
    * word, the signal that drives vocab-allocation decisions). Composes
    * [[bpeEncode]]'s per-doc token counts with
    * [[TextStats.languageId]]'s per-doc label: a doc_id equi join of two
    * doc-level relations, then a per-language rollup of INT sums —
    * fertility is one int64/int64 division at the end, so the result is
    * accumulation-order independent at any scale.
    * Output: (lang_pred, n_docs, sum_words, sum_tokens, fertility).
    */
  def bpeFertility(docs: DataFrame, nMerges: Int = 8,
                   batch: Int = 8): DataFrame = {
    val enc = bpeEncode(docs, nMerges, batch)
      .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"))
    val lang = TextStats.languageId(docs).select(col("doc_id"), col("lang_pred"))
    enc.join(lang, "doc_id")
      .groupBy("lang_pred")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("sum_words"),
        sum("n_bpe_tokens").as("sum_tokens"))
      .select(col("lang_pred"), col("n_docs"), col("sum_words"),
        col("sum_tokens"),
        round(col("sum_tokens").cast("double") /
          col("sum_words").cast("double"), 6).as("fertility"))
  }

  def bpeFertilityOracleSql(nMerges: Int = 8, batch: Int = 8): String = {
    val rounds = (nMerges + batch - 1) / batch
    s"""WITH RECURSIVE ${bpeChainCtes(nMerges, batch)},
       |tok AS (
       |  SELECT word, len(string_split(trim(s, '<>'), '><'))::BIGINT AS n_tok
       |  FROM seq$rounds),
       |dw AS (
       |  SELECT doc_id, word
       |  FROM (SELECT doc_id, unnest($wordsSql) AS word FROM documents) AS u
       |  WHERE regexp_matches(word, '^[a-z0-9]+$$')),
       |enc AS (
       |  SELECT dw.doc_id, count(*)::BIGINT AS n_words,
       |         sum(t.n_tok)::BIGINT AS n_bpe_tokens
       |  FROM dw JOIN tok t ON dw.word = t.word
       |  GROUP BY dw.doc_id),
       |lang AS (${TextStats.languageIdOracleSql})
       |SELECT l.lang_pred, count(*)::BIGINT AS n_docs,
       |       sum(e.n_words)::BIGINT AS sum_words,
       |       sum(e.n_bpe_tokens)::BIGINT AS sum_tokens,
       |       round(sum(e.n_bpe_tokens)::DOUBLE / sum(e.n_words)::DOUBLE, 6)
       |         AS fertility
       |FROM enc e JOIN lang l ON e.doc_id = l.doc_id
       |GROUP BY l.lang_pred""".stripMargin
  }

  // ---- quality-classifier distillation (logistic regression, GD) ----

  /** Per-doc training features for the quality distiller, every value a
    * 6-dp-rounded rational of integer counts (the determinism discipline
    * of [[TextStats.quality]]): stopword ratio, punctuation ratio,
    * length saturation min(1, nwords/50), mean word length / 10, and the
    * teacher label y = [quality_score ≥ `teacherThreshold`] — the
    * heuristic gate this classifier distills. Degenerate docs (no words
    * or no chars) are excluded from training and scoring alike.
    */
  private[ml] def lrFeats(docs: DataFrame,
                          teacherThreshold: Double): DataFrame =
    docs.select(col("doc_id"), words(col("text")).as("w"), col("text"))
      .select(col("doc_id"),
        size(col("w")).cast("double").as("nwords"),
        graft.functions.CountInSet(col("w"), TextStats.stopwords)
          .cast("double").as("nstop"),
        length(regexp_replace(col("text"), "[a-z0-9 ]", ""))
          .cast("double").as("npunct"),
        length(col("text")).cast("double").as("nchars"))
      .where(col("nwords") > 0 && col("nchars") > 0)
      .select(col("doc_id"),
        round(col("nstop") / col("nwords"), 6).as("x1"),
        round(col("npunct") / col("nchars"), 6).as("x2"),
        round(least(lit(1.0), col("nwords") / 50.0), 6).as("x3"),
        round((col("nchars") - (col("nwords") - 1)) / col("nwords") / 10.0, 6)
          .as("x4"),
        when(round((lit(1.0) - col("nstop") / col("nwords")) *
          least(lit(1.0), col("nwords") / 50.0), 6) >= teacherThreshold,
          lit(1)).otherwise(lit(0)).as("y"))

  /** σ(w·x) under micro-unit integer weights, association-pinned: z =
    * ((((w0 + w1·x1) + w2·x2) + w3·x3) + w4·x4)/1e6 rounded to 6 dp, p =
    * round(1/(1+exp(−z)), 6). The single transcendental (exp on a
    * 6-dp-rounded argument, result re-rounded) is the same accepted
    * cross-engine risk class as BM25's ln(idf).
    */
  private def lrP(w: Array[Long]): Column = {
    val z = round((lit(w(0).toDouble) + lit(w(1).toDouble) * col("x1")
      + lit(w(2).toDouble) * col("x2") + lit(w(3).toDouble) * col("x3")
      + lit(w(4).toDouble) * col("x4")) / 1e6, 6)
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }

  /** Distill the heuristic quality gate into a logistic-regression
    * scorer by full-batch gradient descent — the "train a cheap linear
    * classifier to imitate the expensive teacher" step of a production
    * data pipeline (fastText-style quality filters), run IN-ENGINE.
    * Each iteration is ONE corpus scan ending in a 5-column integer
    * aggregate: per-doc gradient contributions floor((p−y)·x·1e6 + 0.5)
    * are summed as int64 (accumulation-order exact), the driver holds
    * exactly 5 micro-unit weights and applies w ← w − round(lr·Σg/n) —
    * the kmeans/pqTrain iterative-build shape, so cost is
    * iters × O(corpus/cluster) with nothing corpus-sized ever
    * collected. Output: one row per iteration with the post-update
    * weights (micro units) — the training trajectory.
    */
  def qualityLr(docs: DataFrame, iters: Int = 16, lr: Double = 16.0,
                teacherThreshold: Double = 0.9): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val f = lrFeats(docs, teacherThreshold).lineageCut
    val n = f.count()
    require(n > 0, "qualityLr: no trainable documents")
    var w = Array.fill(5)(0L)
    val rows = (1 to iters).map { it =>
      val scored = f.withColumn("p", lrP(w))
      def g(x: Column): Column =
        sum(floor((col("p") - col("y")) * x * 1e6 + 0.5).cast("long"))
      val r = scored.agg(g(lit(1.0)), g(col("x1")), g(col("x2")),
        g(col("x3")), g(col("x4"))).head()
      w = w.indices.toArray.map(i =>
        w(i) - math.floor(lr * r.getLong(i) / n + 0.5).toLong)
      (it, w(0), w(1), w(2), w(3), w(4))
    }
    spark.createDataset(rows).toDF("iter", "w_bias_micro", "w_stop_micro",
      "w_punct_micro", "w_len_micro", "w_wlen_micro")
  }

  /** Score the corpus under the trained distiller (the inference side):
    * per doc, p in micro units, the predicted admission flag, the
    * teacher's flag, and their agreement — the distillation-quality
    * audit a pipeline runs before swapping the teacher out.
    */
  def qualityLrScores(docs: DataFrame, iters: Int = 16, lr: Double = 16.0,
                      teacherThreshold: Double = 0.9): DataFrame = {
    val last = qualityLr(docs, iters, lr, teacherThreshold)
      .orderBy(desc("iter")).head()
    val w = Array.tabulate(5)(i => last.getLong(i + 1))
    lrFeats(docs, teacherThreshold)
      .withColumn("p", lrP(w))
      .select(col("doc_id"),
        floor(col("p") * 1e6 + 0.5).cast("long").as("score_micro"),
        (col("p") >= 0.5).as("predicted"),
        (col("y") === 1).as("teacher"),
        ((col("p") >= 0.5) === (col("y") === 1)).as("agree"))
  }

  private def lrFeatsSql(teacherThreshold: Double): String = {
    val stopList = TextStats.stopwords.map(s => s"'$s'").mkString(", ")
    s"""feats AS MATERIALIZED (
       |  SELECT doc_id,
       |    round(nstop/nwords, 6) AS x1,
       |    round(npunct/nchars, 6) AS x2,
       |    round(least(1.0, nwords/50.0), 6) AS x3,
       |    round((nchars - (nwords - 1))/nwords/10.0, 6) AS x4,
       |    CASE WHEN round((1.0 - nstop/nwords)*least(1.0, nwords/50.0), 6)
       |         >= $teacherThreshold THEN 1 ELSE 0 END AS y
       |  FROM (
       |    SELECT doc_id,
       |      len($wordsSql)::DOUBLE AS nwords,
       |      len(list_filter($wordsSql, x -> x IN ($stopList)))::DOUBLE AS nstop,
       |      length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))::DOUBLE AS npunct,
       |      length(text)::DOUBLE AS nchars
       |    FROM documents)
       |  WHERE nwords > 0 AND nchars > 0),
       |nn AS (SELECT count(*)::BIGINT AS n FROM feats),
       |w0 AS (SELECT 0::BIGINT AS w0, 0::BIGINT AS w1, 0::BIGINT AS w2,
       |              0::BIGINT AS w3, 0::BIGINT AS w4)""".stripMargin
  }

  private def lrIterCtesSql(iters: Int, lr: Double): String =
    (1 to iters).map { k =>
      val z = s"round((w.w0 + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3 + w.w4*f.x4)/1e6, 6)"
      // MATERIALIZED is load-bearing: each w_k reads w_{k-1} twice (the
      // update and the gradient's scoring pass) — inlined CTEs would
      // expand the chain 2^iters times (measured: 16 iters exhausted the
      // file-handle ulimit before planning finished)
      s"""p$k AS MATERIALIZED (
         |  SELECT f.*, round(1/(1 + exp(-$z)), 6) AS p
         |  FROM feats f, w${k - 1} w),
         |g$k AS MATERIALIZED (
         |  SELECT sum(floor((p - y)*1e6 + 0.5))::BIGINT AS g0,
         |         sum(floor((p - y)*x1*1e6 + 0.5))::BIGINT AS g1,
         |         sum(floor((p - y)*x2*1e6 + 0.5))::BIGINT AS g2,
         |         sum(floor((p - y)*x3*1e6 + 0.5))::BIGINT AS g3,
         |         sum(floor((p - y)*x4*1e6 + 0.5))::BIGINT AS g4
         |  FROM p$k),
         |w$k AS MATERIALIZED (
         |  SELECT ${(0 to 4).map(i =>
             s"w.w$i - floor($lr*g.g$i/n.n + 0.5)::BIGINT AS w$i").mkString(", ")}
         |  FROM w${k - 1} w, g$k g, nn n)""".stripMargin
    }.mkString(",\n")

  /** DuckDB oracle for [[qualityLr]]: the same iterations unrolled as a
    * CTE chain (the kmeans/pqTrain oracle convention).
    */
  def qualityLrOracleSql(iters: Int = 16, lr: Double = 16.0,
                         teacherThreshold: Double = 0.9): String = {
    val per = (1 to iters).map(k =>
      s"""SELECT $k AS iter, w0 AS w_bias_micro, w1 AS w_stop_micro,
         |       w2 AS w_punct_micro, w3 AS w_len_micro, w4 AS w_wlen_micro
         |FROM w$k""".stripMargin).mkString("\nUNION ALL\n")
    s"""WITH ${lrFeatsSql(teacherThreshold)},
       |${lrIterCtesSql(iters, lr)}
       |$per""".stripMargin
  }

  /** DuckDB oracle for [[qualityLrScores]]. */
  def qualityLrScoresOracleSql(iters: Int = 16, lr: Double = 16.0,
                               teacherThreshold: Double = 0.9): String = {
    val z = s"round((w.w0 + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3 + w.w4*f.x4)/1e6, 6)"
    s"""WITH ${lrFeatsSql(teacherThreshold)},
       |${lrIterCtesSql(iters, lr)},
       |scored AS (
       |  SELECT f.doc_id, round(1/(1 + exp(-$z)), 6) AS p, f.y
       |  FROM feats f, w$iters w)
       |SELECT doc_id, floor(p*1e6 + 0.5)::BIGINT AS score_micro,
       |       p >= 0.5 AS predicted, y = 1 AS teacher,
       |       (p >= 0.5) = (y = 1) AS agree
       |FROM scored""".stripMargin
  }
}
