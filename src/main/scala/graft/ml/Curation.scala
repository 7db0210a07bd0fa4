package graft.ml

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
    val sh = explode(shingles(words(col("text")), k))
    val benchShingles = docs.where(isBenchmark)
      .select(sh.as("s")).select(h64(col("s")).as("sh")).distinct()
    val hits = docs.select(col("doc_id"), sh.as("s"))
      .select(col("doc_id"), h64(col("s")).as("sh"))
      .join(broadcast(benchShingles), "sh")
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
}
