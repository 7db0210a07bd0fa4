package graft.ml

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming targeted-selection ADMISSION gate — score-at-ingest for the
  * corpus loop: every arriving document is scored against a standing
  * BM25 seed-term profile ([[Retrieval.profileWeights]] — a
  * constant-bounded (term-hash → idf) relation persisted from the
  * standing corpus) and admitted when the score clears the threshold.
  *
  * The stream stays completely STATELESS: the profile is a broadcast
  * map, and each row's score is computed IN-ROW by a typed map that
  * replicates [[Retrieval.profileScore]]'s math bit-for-bit in plain
  * Scala — same md5-prefix 60-bit bigram hash, same 6-dp idf, same
  * micro-unit floor-rounded BM25 contribution per DISTINCT matched
  * term, same integer sum. No streaming aggregation, no shuffle, no
  * state store; per-arriving-doc cost is O(bigrams). Bit-equality to
  * the batch scorer across any micro-batch split is pinned in
  * StreamingSelectSpec.
  */
object StreamingSelect {

  /** In-row scorer. `profile` maps the 60-bit bigram hash to its 6-dp
    * idf; `avgdl`/`k1`/`b` are the profile's corpus stats.
    * Returns (n_matched, score_micro).
    */
  private[ml] def scoreText(text: String, profile: Map[Long, Double],
                            avgdl: Double, k1: Double,
                            b: Double): (Long, Long) = {
    val md = MessageDigest.getInstance("MD5")
    def h64(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map(x => f"$x%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    // split(text, " ") with Java limit -1 = Spark's split semantics
    val w = text.split(" ", -1)
    val dl = math.max(w.length - 1, 0).toLong
    if (dl == 0) return (0L, 0L)
    // per-term tf over the doc's bigrams, profile terms only
    val tf = scala.collection.mutable.LongMap.empty[Long]
    var i = 0
    while (i < w.length - 1) {
      val th = h64(w(i) + " " + w(i + 1))
      if (profile.contains(th)) tf(th) = tf.getOrElse(th, 0L) + 1L
      i += 1
    }
    var score = 0L
    tf.foreach { case (th, n) =>
      val idf = profile(th)
      val tfn = n * (k1 + 1) / (n + k1 * ((1.0 - b) + b * dl / avgdl))
      score += math.floor(idf * tfn * 1e6 + 0.5).toLong
    }
    (tf.size.toLong, score)
  }

  /** Score a (doc_id, text) stream against the profile. Output columns
    * mirror the batch scorer: (doc_id, n_matched, score_micro,
    * admitted). Works identically on a static frame (the spec's
    * equality pin).
    */
  def scoreStream(docs: DataFrame, profile: Map[Long, Double],
                  avgdl: Double, k1: Double = 1.2, b: Double = 0.75,
                  thresholdMicro: Long = 1000000L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(profile)
    val ds: Dataset[(Long, Long, Long)] = docs
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        // null text scores (0, 0) — the batch profileScore reaches the
        // same via its left join (no bigrams → no match rows); without
        // the guard, split would NPE and kill the streaming query on
        // the first dirty row, diverging from batch
        val (n, s) = scoreText(Option(text).getOrElse(""), bc.value, avgdl, k1, b)
        (id, n, s)
      }
    ds.toDF("doc_id", "n_matched", "score_micro")
      .withColumn("admitted", col("score_micro") >= thresholdMicro)
  }

  /** Collect a profile DataFrame ([[Retrieval.profileWeights]] output or
    * its persisted copy) into the broadcastable map + avgdl pair. The
    * relation is seed-vocabulary-sized — a constant-bounded collect.
    */
  def collectProfile(weights: DataFrame): (Map[Long, Double], Double) = {
    val rows = weights.select("th", "idf", "avgdl").collect()
    val m = rows.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val avgdl = if (rows.isEmpty) 1.0 else rows.head.getDouble(2)
    (m, avgdl)
  }
}
