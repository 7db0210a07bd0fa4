package graft.ml

import graft.ml.Ckpt.CutOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the documents table: token counting,
  * quality scoring, language-ID heuristic, and document fingerprinting
  * (BASELINE.json north-star surface). Everything is a single narrow
  * projection — one linear scan, no shuffle, codegen-friendly — and every
  * formula is expressed identically in DuckDB for the oracle.
  */
object TextStats {
  import Portable._

  private val M = 1000000007L // fingerprint modulus (fits sums in int64)
  private val FpMaxWords = 200 // fingerprint looks at the first 200 words
  private val pow31: Seq[Long] =
    Iterator.iterate(1L)(p => p * 31 % M).take(FpMaxWords).toSeq

  /** Marker stopwords per language for the n-gram-free heuristic; ties are
    * broken by list order (en, de, es, fr), no markers → "und".
    */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "of", "and"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "los", "es"),
    "fr" -> Seq("le", "les", "et", "est", "une"))

  private[ml] val stopwords: Seq[String] =
    Seq("a", "the", "of", "and", "to", "in", "is", "it", "on", "for")

  // BPE-ish token regex: letter/digit runs, else one symbol per char
  private val tokenRe = "[a-z0-9]+|[^a-z0-9 ]"

  /** Token & char statistics: (doc_id, n_words, n_tokens, n_chars_obs,
    * sum_word_len, avg_word_len).
    */
  def tokenStats(docs: DataFrame): DataFrame =
    // staged projections: the words array and the aggregate() sum are
    // each materialized once — inlined, the interpreted HOFs re-evaluate
    // per reference (split per element_at; see Dedup.shingleTable)
    docs.select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(tokenRe), lit(0))).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars_obs"),
        words(col("text")).as("w"))
      .select(col("doc_id"), col("n_tokens"), col("n_chars_obs"),
        size(col("w")).cast("long").as("n_words"),
        graft.functions.SumStrLen(col("w")).as("sum_word_len"))
      .select(col("doc_id"), col("n_words"), col("n_tokens"), col("n_chars_obs"),
        col("sum_word_len"),
        round(col("sum_word_len") / col("n_words"), 6).as("avg_word_len"))

  val tokenStatsOracleSql: String =
    s"""SELECT doc_id,
       |  len($wordsSql)::BIGINT AS n_words,
       |  len(regexp_extract_all(text, '$tokenRe'))::BIGINT AS n_tokens,
       |  length(text)::BIGINT AS n_chars_obs,
       |  list_sum(list_transform($wordsSql, x -> len(x)))::BIGINT AS sum_word_len,
       |  round(list_sum(list_transform($wordsSql, x -> len(x)))::DOUBLE
       |        / len($wordsSql), 6) AS avg_word_len
       |FROM documents""".stripMargin

  /** Quality scoring: stopword / punctuation ratios + a bounded score.
    * score = (1 - stop_ratio) * min(1, n_words/50) — long-enough docs that
    * aren't stopword soup score near 1.
    */
  def quality(docs: DataFrame): DataFrame =
    // staged projections: one split, one filter() pass (see tokenStats)
    docs.select(col("doc_id"), col("text"), words(col("text")).as("w"))
      .select(col("doc_id"),
        size(col("w")).cast("double").as("nwords"),
        graft.functions.CountInSet(col("w"), stopwords).cast("double").as("nstop"),
        length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("double").as("npunct"),
        length(col("text")).cast("double").as("nchars"))
      .select(col("doc_id"),
        round(col("nstop") / col("nwords"), 6).as("stop_ratio"),
        round(col("npunct") / col("nchars"), 6).as("punct_ratio"),
        round((lit(1.0) - col("nstop") / col("nwords")) *
          least(lit(1.0), col("nwords") / 50.0), 6).as("quality_score"))

  val qualityOracleSql: String = {
    val stopList = stopwords.map(s => s"'$s'").mkString(", ")
    s"""SELECT doc_id,
       |  round(nstop / nwords, 6) AS stop_ratio,
       |  round(npunct / nchars, 6) AS punct_ratio,
       |  round((1.0 - nstop / nwords) * least(1.0, nwords / 50.0), 6) AS quality_score
       |FROM (
       |  SELECT doc_id,
       |    len($wordsSql)::DOUBLE AS nwords,
       |    len(list_filter($wordsSql, x -> x IN ($stopList)))::DOUBLE AS nstop,
       |    length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))::DOUBLE AS npunct,
       |    length(text)::DOUBLE AS nchars
       |  FROM documents)""".stripMargin
  }

  /** Language-ID heuristic: per-language marker-word occurrence counts,
    * argmax with list-order tiebreak, "und" when nothing matches.
    * Output: (doc_id, lang_pred, lang_score).
    */
  def languageId(docs: DataFrame): DataFrame = {
    // staged projections: each marker filter() runs ONCE — inlined into
    // the best/pred when-chains the interpreted HOFs would re-run per
    // reference (see tokenStats)
    val scored = docs.select(col("doc_id"), words(col("text")).as("w"))
      .select(col("doc_id") +: markers.map { case (lang, ms) =>
        graft.functions.CountInSet(col("w"), ms).cast("long").as(s"s_$lang")
      }: _*)
      .withColumn("best",
        markers.map(m => col(s"s_${m._1}")).reduce((a, b) => greatest(a, b)))
    // foldRight nests the first language outermost → first-match-wins ties
    val pred = markers.foldRight(lit("und"): Column) { case ((lang, _), el) =>
      when(col(s"s_$lang") === col("best") && col("best") > 0, lit(lang)).otherwise(el)
    }
    scored.select(col("doc_id"), pred.as("lang_pred"), col("best").as("lang_score"))
  }

  val languageIdOracleSql: String = {
    val scoreExprs = markers.map { case (lang, ms) =>
      val list = ms.map(m => s"'$m'").mkString(", ")
      lang -> s"len(list_filter(w, x -> x IN ($list)))::BIGINT"
    }
    val bestExpr = s"greatest(${scoreExprs.map(s => s"s_${s._1}").mkString(", ")})"
    val caseExpr = scoreExprs.map { case (lang, _) =>
      s"WHEN s_$lang = best AND best > 0 THEN '$lang'"
    }.mkString("CASE ", " ", " ELSE 'und' END")
    s"""SELECT doc_id, $caseExpr AS lang_pred, best AS lang_score
       |FROM (
       |  SELECT doc_id, $bestExpr AS best,
       |         ${scoreExprs.map { case (l, e) => s"s_$l" }.mkString(", ")}
       |  FROM (
       |    SELECT doc_id,
       |      ${scoreExprs.map { case (l, e) => s"$e AS s_$l" }.mkString(",\n      ")}
       |    FROM (SELECT doc_id, $wordsSql AS w FROM documents)))""".stripMargin
  }

  /** Corpus rollup by predicted language — the summary a training-data
    * curation run reports. Integer aggregates only (counts, word/char
    * totals), so results are accumulation-order independent and hash
    * stable across engines.
    */
  def corpusStats(docs: DataFrame): DataFrame = {
    val w = words(col("text"))
    languageId(docs)
      .join(docs.select(col("doc_id"),
        size(w).cast("long").as("n_words"),
        length(col("text")).cast("long").as("n_chars")), "doc_id")
      .groupBy("lang_pred")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("total_words"),
        sum("n_chars").as("total_chars"))
  }

  val corpusStatsOracleSql: String =
    s"""WITH lang AS ($languageIdOracleSql),
       |stats AS (
       |  SELECT doc_id, len($wordsSql)::BIGINT AS n_words,
       |         length(text)::BIGINT AS n_chars
       |  FROM documents)
       |SELECT l.lang_pred, count(*) AS n_docs,
       |       sum(s.n_words)::BIGINT AS total_words,
       |       sum(s.n_chars)::BIGINT AS total_chars
       |FROM lang l JOIN stats s ON l.doc_id = s.doc_id
       |GROUP BY l.lang_pred""".stripMargin

  /** Feature hashing (the hashing trick): word term frequencies folded
    * into `dim` buckets by the portable 60-bit hash — the featurization
    * step before any linear probe / cheap classifier over the corpus.
    * Long-form sparse output (doc_id, dim, tf): integer counts, one
    * explode + one map-side-combined aggregation, no vocabulary state at
    * all (that's the trick).
    */
  def hashTf(docs: DataFrame, dim: Int = 256): DataFrame =
    docs.select(col("doc_id"), explode(words(col("text"))).as("word"))
      .select(col("doc_id"), pmod(h64(col("word")), lit(dim.toLong)).as("dim"))
      .groupBy("doc_id", "dim").agg(count(lit(1)).as("tf"))

  def hashTfOracleSql(dim: Int = 256): String =
    s"""SELECT doc_id, ${h64Sql("word")} % $dim AS dim, count(*)::BIGINT AS tf
       |FROM (SELECT doc_id, unnest($wordsSql) AS word FROM documents)
       |GROUP BY 1, 2""".stripMargin

  /** Polynomial rolling-hash fingerprint over the first 200 words:
    * fp = Σᵢ (h64(wᵢ) mod M) · 31ⁱ mod M, all integer arithmetic so the
    * result is order-deterministic and engine-portable.
    * Output: (doc_id, fingerprint, fp_words).
    */
  def fingerprint(docs: DataFrame): DataFrame = {
    // staged projection: the sliced words array materializes once
    val terms = transform(col("w"), (x, i) =>
      pmod((h64(x) % M) * element_at(typedlit(pow31), i + 1), lit(M)))
    docs.select(col("doc_id"), slice(words(col("text")), 1, FpMaxWords).as("w"))
      .select(col("doc_id"),
        pmod(aggregate(terms, lit(0L), (acc, x) => acc + x), lit(M)).as("fingerprint"),
        size(col("w")).cast("long").as("fp_words"))
  }

  val fingerprintOracleSql: String = {
    val powsList = pow31.mkString("[", ", ", "]")
    // outer ::BIGINT: DuckDB list_sum returns HUGEINT; the driver's hash is
    // type-sensitive, so the oracle must declare int64 like the engine does
    s"""SELECT doc_id,
       |  (list_sum(list_transform(w, (x, i) ->
       |    ((${h64Sql("x")} % $M) * ($powsList)[i]) % $M)) % $M)::BIGINT AS fingerprint,
       |  len(w)::BIGINT AS fp_words
       |FROM (SELECT doc_id, ($wordsSql)[1:$FpMaxWords] AS w FROM documents)""".stripMargin
  }

  /** Character-distribution Shannon entropy per document (nats) — a
    * compression-style quality signal: gibberish and boilerplate sit at
    * the distribution's tails. H = ln(n) − (Σ c·ln c)/n over per-char
    * counts c. The char split is `regexp_extract_all(text, '.')` — the
    * one splitter that behaves identically under Java regex and RE2
    * (split-on-empty-string does not). Two hash aggregations, counts
    * exact; the fp sum is rounded to 6 dp. Empty docs report entropy 0.
    * Output: (doc_id, n_chars, n_distinct, char_entropy).
    */
  def charEntropy(docs: DataFrame): DataFrame = {
    val cnt = docs
      .select(col("doc_id"), length(col("text")).as("n"),
        explode(regexp_extract_all(col("text"), lit("."), lit(0))).as("ch"))
      .groupBy("doc_id", "n", "ch").agg(count(lit(1)).as("c"))
    val ent = cnt.groupBy("doc_id", "n")
      .agg(count(lit(1)).as("n_distinct"),
        sum(col("c") * log(col("c"))).as("clnc"))
      .select(col("doc_id"), col("n"), col("n_distinct"),
        round(log(col("n")) - col("clnc") / col("n"), 6).as("char_entropy"))
    docs.select("doc_id").join(ent, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n"), lit(0L)).cast("long").as("n_chars"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("char_entropy"), lit(0.0)).as("char_entropy"))
  }

  val charEntropyOracleSql: String =
    """WITH ch AS (
      |  SELECT doc_id, length(text) AS n,
      |         unnest(regexp_extract_all(text, '.')) AS ch
      |  FROM documents),
      |cnt AS (SELECT doc_id, n, ch, count(*) AS c
      |        FROM ch GROUP BY doc_id, n, ch),
      |ent AS (
      |  SELECT doc_id, n, count(*)::BIGINT AS n_distinct,
      |         round(ln(n) - sum(c * ln(c)) / n, 6) AS char_entropy
      |  FROM cnt GROUP BY doc_id, n)
      |SELECT d.doc_id, coalesce(e.n, 0)::BIGINT AS n_chars,
      |       coalesce(e.n_distinct, 0)::BIGINT AS n_distinct,
      |       coalesce(e.char_entropy, 0.0) AS char_entropy
      |FROM documents d LEFT JOIN ent e USING (doc_id)""".stripMargin

  /** Approximate distinct-vocabulary size per language via HyperLogLog++
    * (`approx_count_distinct`) — the sketch a 100-TB corpus report uses
    * where the exact distinct count would shuffle the full vocabulary.
    * Bounded memory per group (one HLL register set), map-side
    * mergeable. NOT oracle-checked: DuckDB's approx sketch is a
    * different implementation with different estimates; the unit test
    * pins the relative-error contract against the exact count instead.
    * Output: (lang_pred, n_docs, approx_vocab).
    */
  def vocabSketch(docs: DataFrame, rsd: Double = 0.05): DataFrame =
    languageId(docs)
      .join(docs.select(col("doc_id"), explode(words(col("text"))).as("word")),
        "doc_id")
      .groupBy("lang_pred")
      .agg(count_distinct(col("doc_id")).as("n_docs"),
        approx_count_distinct(col("word"), rsd).as("approx_vocab"))

  /** Error-bound-checked twin of [[vocabSketch]]: emits the exact distinct
    * vocabulary (oracle-able) plus `within_3rsd` — whether the HLL
    * estimate landed inside 3·rsd of it. The DuckDB oracle asserts the
    * boolean is literally `true`, turning the sketch's accuracy contract
    * into a hash-checked correctness row (the estimate itself stays out
    * of the output: engine-specific sketches can't hash-match). This is
    * the verification query; at corpus scale run [[vocabSketch]], which
    * never shuffles the full vocabulary.
    */
  def vocabSketchChecked(docs: DataFrame, rsd: Double = 0.05): DataFrame =
    languageId(docs)
      .join(docs.select(col("doc_id"), explode(words(col("text"))).as("word")),
        "doc_id")
      .groupBy("lang_pred")
      .agg(count_distinct(col("doc_id")).as("n_docs"),
        count_distinct(col("word")).as("exact_vocab"),
        approx_count_distinct(col("word"), rsd).as("approx"))
      .select(col("lang_pred"), col("n_docs"), col("exact_vocab"),
        (abs(col("approx").cast("double") - col("exact_vocab").cast("double"))
          <= lit(3 * rsd) * col("exact_vocab").cast("double")).as("within_3rsd"))

  /** Oracle for [[vocabSketchChecked]]: exact counts, and the error bound
    * asserted true — a drifting sketch fails the row.
    */
  val vocabSketchCheckedOracleSql: String =
    s"""WITH lang AS ($languageIdOracleSql),
       |wrd AS (
       |  SELECT doc_id, unnest($wordsSql) AS word FROM documents)
       |SELECT l.lang_pred, count(DISTINCT w.doc_id)::BIGINT AS n_docs,
       |       count(DISTINCT w.word)::BIGINT AS exact_vocab,
       |       true AS within_3rsd
       |FROM lang l JOIN wrd w USING (doc_id)
       |GROUP BY l.lang_pred""".stripMargin

  /** Misra–Gries heavy hitters with the deterministic guarantee emitted
    * as an oracle-assertable contract. Each task summarizes its word
    * stream into at most `k` counters (O(k) state regardless of stream
    * length — the corpus-scale alternative to aggregating the full
    * vocabulary); the per-partition summaries (≤ k·partitions rows, a
    * constant-bounded collect) union on the driver. The MG error bound
    * — true_p(x) − count_p(x) ≤ n_p/(k+1), count 0 when absent — sums
    * across partitions to N(x) − Σ count_p(x) ≤ N/(k+1), so EVERY word
    * with global frequency > N/(k+1) must appear in some summary, no
    * matter how rows were partitioned. The query emits exactly the
    * guaranteed-heavy words (a deterministic, exact-count-defined set)
    * with `in_sketch`, which the oracle asserts true: a sketch that
    * loses a guaranteed word fails the hash row, while the partition-
    * dependent rest of the candidate set stays out of the comparison.
    * This is one of the codebase's rare justified `mapPartitions` uses:
    * genuinely imperative per-partition state.
    * Output: (word, n, in_sketch).
    */
  def heavyHitters(docs: DataFrame, k: Int = 50): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = docs.select(explode(words(col("text"))).as("word")).as[String]
    val candidates: Array[String] = w.mapPartitions { it =>
      val cnt = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { x =>
        if (cnt.contains(x)) cnt(x) += 1L
        else if (cnt.size < k) cnt(x) = 1L
        else { // decrement-all step: drop every counter by one
          val dead = scala.collection.mutable.ArrayBuffer.empty[String]
          cnt.keysIterator.foreach { w0 =>
            val c = cnt(w0) - 1L
            if (c == 0L) dead += w0 else cnt(w0) = c
          }
          dead.foreach(cnt.remove)
        }
      }
      cnt.keysIterator
    }.distinct().collect()

    val counts = w.groupBy("word").agg(count(lit(1)).as("n"))
    val tot = w.toDF("word").agg(count(lit(1)).as("tot"))
    counts.join(broadcast(tot))
      .where(col("n") * (k + 1) > col("tot")) // guaranteed-heavy only
      .select(col("word"), col("n"),
        col("word").isin(candidates.toSeq: _*).as("in_sketch"))
  }

  /** Oracle for [[heavyHitters]]: the exact guaranteed-heavy set with the
    * MG membership contract asserted true.
    */
  def heavyHittersOracleSql(k: Int = 50): String =
    s"""WITH wrd AS (SELECT unnest($wordsSql) AS word FROM documents),
       |cnt AS (SELECT word, count(*)::BIGINT AS n FROM wrd GROUP BY word),
       |tot AS (SELECT count(*)::BIGINT AS tot FROM wrd)
       |SELECT word, n, true AS in_sketch
       |FROM cnt, tot WHERE n * ${k + 1} > tot""".stripMargin

  /** Count-Min sketch over the word stream, replayed BIT-EXACTLY by the
    * oracle. The sketch uses `depth` seeded [[Portable.h64]] row hashes
    * into `width` buckets; because the hash is the md5-based portable
    * one, DuckDB rebuilds the identical depth×width cell table and the
    * identical per-word estimates — so unlike the HLL vocab sketch
    * (engine-specific registers, boolean-contract oracle) this sketch's
    * estimates themselves are hash-oracled.
    *
    * Shape for scale: occurrences collapse to the vocabulary FIRST (the
    * standard wordcount shuffle — CMS is a linear sketch, so cell(r,b) =
    * Σ n(word) over words hashing to b equals summing raw occurrences);
    * the cell table is then a depth×vocab aggregation down to at most
    * depth×width rows, broadcast back to probe the guaranteed-heavy
    * words. Nothing driver-side grows with the corpus; the sketch is the
    * constant-size summary a 100-TB stream would ship between stages.
    *
    * Output, restricted to the deterministic guaranteed-heavy set (the
    * [[heavyHitters]] rule, frequency > N/(k+1)): (word, n, est, err)
    * with err = est − n ≥ 0 (CMS never underestimates; the spec also
    * asserts the ε=2/width error bound err ≤ 2N/width at default dims).
    */
  def countMin(docs: DataFrame, width: Int = 1024, depth: Int = 4,
               k: Int = 50): DataFrame = {
    val w = docs.select(explode(words(col("text"))).as("word"))
    // three consumers (cells, total, heavy probe) — materialize the
    // vocab-sized wordcount once instead of re-running the corpus scan
    // and its shuffle per consumer (the shingleTable discipline)
    val cnt = w.groupBy("word").agg(count(lit(1)).as("n")).lineageCut
    def bucket(word: Column, r: Column): Column =
      h64(concat(lit("cms"), r.cast("string"), lit(":"), word)) % width
    val rows = explode(sequence(lit(0), lit(depth - 1))).as("r")
    val cells = cnt.select(col("word"), col("n"), rows)
      .withColumn("b", bucket(col("word"), col("r")))
      .groupBy("r", "b").agg(sum("n").as("cell"))
    val tot = cnt.agg(sum("n").as("tot"))
    val heavy = cnt.join(broadcast(tot))
      .where(col("n") * (k + 1) > col("tot"))
      .select(col("word"), col("n"), rows)
      .withColumn("b", bucket(col("word"), col("r")))
    heavy.join(broadcast(cells), Seq("r", "b"))
      .groupBy("word")
      .agg(max("n").as("n"), min("cell").as("est"))
      .select(col("word"), col("n"), col("est"),
        (col("est") - col("n")).as("err"))
  }

  /** Oracle for [[countMin]]: DuckDB rebuilds the identical sketch. */
  def countMinOracleSql(width: Int = 1024, depth: Int = 4,
                        k: Int = 50): String = {
    def bucketSql(word: String, r: String): String =
      s"${h64Sql(s"'cms' || $r || ':' || $word")} % $width"
    s"""WITH wrd AS (SELECT unnest($wordsSql) AS word FROM documents),
       |cnt AS (SELECT word, count(*)::BIGINT AS n FROM wrd GROUP BY word),
       |cells AS (
       |  SELECT r, ${bucketSql("word", "r")} AS b, sum(n)::BIGINT AS cell
       |  FROM cnt, range($depth) t(r) GROUP BY 1, 2),
       |tot AS (SELECT sum(n)::BIGINT AS tot FROM cnt),
       |heavy AS (
       |  SELECT word, n, r, ${bucketSql("word", "r")} AS b
       |  FROM cnt, tot, range($depth) t(r) WHERE n * ${k + 1} > tot)
       |SELECT h.word, max(h.n)::BIGINT AS n, min(c.cell)::BIGINT AS est,
       |       (min(c.cell) - max(h.n))::BIGINT AS err
       |FROM heavy h JOIN cells c ON h.r = c.r AND h.b = c.b
       |GROUP BY h.word""".stripMargin
  }
}
