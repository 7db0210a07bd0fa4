package graft.trend

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Post-scoring operators: threshold detection, global argmax, aligned
  * pairwise Pearson correlation, and the plot-stage coarse rebin.
  */
object Detect {

  /** Exceedance report: points where eta > theta (trend_detector.py:26-27). */
  def apply(scored: DataFrame, theta: Double): DataFrame =
    scored.where(col("eta") > theta)
      .select("counter", "ts", "count", "eta")

  /** Global argmax: the single (counter, time, eta) with maximal eta
    * (trend_detector.py:18-25). Deterministic tie-break on (counter, ts);
    * executes as a TakeOrderedAndProject (no full sort materialized).
    */
  def argmax(scored: DataFrame): DataFrame =
    scored.orderBy(desc("eta"), asc("counter"), asc("ts")).limit(1)
      .select("counter", "ts", "count", "eta")

  /** All-pairs Pearson correlation between counters' series, aligned by
    * inner join on ts (fixing the reference's assumption of equal-length
    * aligned inputs, README.md:85; time_series_correlations.py:38-44).
    * Correlations are rounded to 6 dp so engine/oracle agree despite
    * different accumulation orders. Scale: the self-join is on ts (dense
    * keys); pairs are formed per-ts then hash-aggregated — shuffle on the
    * pair key only, no driver-side matrix.
    */
  def correlate(binned: DataFrame): DataFrame = {
    val a = binned.select(col("counter").as("counter_a"), col("ts"),
      col("count").cast("double").as("ca"))
    val b = binned.select(col("counter").as("counter_b"), col("ts"),
      col("count").cast("double").as("cb"))
    a.join(b, Seq("ts"))
      .where(col("counter_a") < col("counter_b"))
      .groupBy("counter_a", "counter_b")
      .agg(round(corr("ca", "cb"), 6).as("r"))
  }

  /** Plot-stage coarse rebin (analysis.py:248-268): group every
    * `rebinFactor` consecutive points per counter; sum counts, average
    * etas, keep the LAST timestamp of each full group, and drop the
    * trailing partial group (analysis.py:261 checks the group is full).
    */
  def coarsen(scored: DataFrame, rebinFactor: Int): DataFrame = {
    val w = Window.partitionBy("counter").orderBy("ts")
    scored
      .withColumn("grp", floor((row_number().over(w) - 1) / rebinFactor))
      .groupBy("counter", "grp")
      .agg(max("ts").as("ts"), sum("count").as("count"),
        round(avg("eta"), 9).as("eta"), count(lit(1)).as("n"))
      .where(col("n") === rebinFactor)
      .select("counter", "ts", "count", "eta")
  }

  /** Scale path for [[correlate]]: prune to the `topK` counters by count
    * variance before forming any pair. All-pairs correlation is Θ(n²) in
    * counters by definition — at corpus scale (10⁶ counters) the pair
    * space must shrink first. Variance is the natural trend-candidate
    * score (flat series cannot spike); the prune is one hash aggregation
    * + a top-k (TakeOrdered, no full sort), the survivors' pair stage is
    * k²-bounded regardless of corpus width, and the semi join broadcasts
    * the tiny top-k set. Deterministic (variance, counter) tie-break keeps
    * results reproducible.
    */
  def correlateTop(binned: DataFrame, topK: Int): DataFrame = {
    val top = binned.groupBy("counter")
      .agg(var_pop(col("count").cast("double")).as("v"))
      .orderBy(desc("v"), asc("counter")).limit(topK)
      .select("counter")
    correlate(binned.join(broadcast(top), Seq("counter"), "left_semi"))
  }

  /** ROC theta-sweep (the whitepaper's evaluation methodology,
    * trends.tex:495-506): a labeled series is classified "trend" when its
    * eta exceeds theta at any point (trends.tex:206); sweeping theta
    * yields the confusion counts behind the ROC curve. Labels are a tiny
    * per-counter relation (broadcast); the sweep explodes the literal
    * theta grid over the per-counter maxima — counts are integers, so the
    * output is accumulation-order independent.
    */
  def rocSweep(scored: DataFrame, labels: DataFrame,
               thetas: Seq[Double]): DataFrame = {
    val maxEta = scored.groupBy("counter").agg(max("eta").as("max_eta"))
      .join(broadcast(labels.select("counter", "is_trend")), "counter")
    maxEta
      .withColumn("theta", explode(typedlit(thetas)))
      .groupBy("theta")
      .agg(
        sum(when(col("max_eta") > col("theta") && col("is_trend"), 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("max_eta") > col("theta") && !col("is_trend"), 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("max_eta") <= col("theta") && col("is_trend"), 1L)
          .otherwise(0L)).as("fn"),
        sum(when(col("max_eta") <= col("theta") && !col("is_trend"), 1L)
          .otherwise(0L)).as("tn"))
  }

  /** Area under the ROC curve from a [[rocSweep]] confusion table — the
    * whitepaper's headline evaluation metric ("large area under the ROC
    * curve", trends.tex:505, reported there only as a figure). Trapezoid
    * rule over the theta points plus the (0,0) and (1,1) endpoints.
    * The global window is by design over #thetas + 2 rows (the sweep
    * grid is a constant), never data-sized, so the single partition it
    * implies is not a scale concern.
    */
  def rocAuc(roc: DataFrame): DataFrame = {
    val spark = roc.sparkSession
    import spark.implicits._
    // degenerate sweeps (a single-class label set ⇒ zero positives or
    // negatives) have no defined rate: drop those rows — identically in
    // the oracle — rather than let 0/0 produce NaN (Spark) vs NULL
    // (DuckDB); an all-degenerate sweep leaves the endpoints ⇒ auc 0.5
    val pts = roc
      .where((col("fp") + col("tn")) > 0 && (col("tp") + col("fn")) > 0)
      .select(
        (col("fp").cast("double") / (col("fp") + col("tn"))).as("fpr"),
        (col("tp").cast("double") / (col("tp") + col("fn"))).as("tpr"))
      .unionByName(Seq((0.0, 0.0), (1.0, 1.0)).toDF("fpr", "tpr"))
    // constant partition key: the input is |thetas|+2 rows by construction,
    // but an unpartitioned Window is the one pattern PlanSpec bans
    // everywhere else — keep the rule absolute (and the WindowExec
    // moves-all-data warning out of bench logs). `fpr * 0.0` is constant
    // on the data (fpr is guarded non-null, never NaN/Inf) yet cannot be
    // constant-folded (x*0.0 ≠ 0.0 for NaN), so neither
    // EliminateWindowPartitions nor SimplifyConditionals strips it the
    // way they strip lit(0) / same-branch CASE keys.
    val w = Window.partitionBy(col("fpr") * 0.0).orderBy("fpr", "tpr")
    pts
      .withColumn("pfpr", lag("fpr", 1).over(w))
      .withColumn("ptpr", lag("tpr", 1).over(w))
      .agg(round(sum((col("fpr") - col("pfpr")) * (col("tpr") + col("ptpr")) / 2), 6)
        .as("auc"))
  }

  /** DuckDB CTE for rocAuc, appended after [[rocSweepOracleCtes]]. */
  val rocAucOracleCtes: String =
    s"""auc_pts AS (
       |  SELECT fp::DOUBLE / (fp + tn) AS fpr, tp::DOUBLE / (tp + fn) AS tpr
       |  FROM roc WHERE (fp + tn) > 0 AND (tp + fn) > 0
       |  UNION ALL SELECT 0.0, 0.0 UNION ALL SELECT 1.0, 1.0),
       |auc_lag AS (
       |  SELECT fpr, tpr,
       |         lag(fpr) OVER (ORDER BY fpr, tpr) AS pfpr,
       |         lag(tpr) OVER (ORDER BY fpr, tpr) AS ptpr
       |  FROM auc_pts),
       |auc AS (
       |  SELECT round(sum((fpr - pfpr) * (tpr + ptpr) / 2), 6) AS auc
       |  FROM auc_lag)""".stripMargin

  /** Spike normalization as a column op (library.py:116-127):
    * |pt − prev|^alpha per counter in ts order, zeros pass through,
    * prev defaults to 0 — the same kernel `SeriesTransforms
    * .spikeNormalization` applies inside the WDT chains. 6 dp.
    */
  def spikeNorm(binned: DataFrame, alpha: Double): DataFrame = {
    val w = Window.partitionBy("counter").orderBy("ts")
    binned
      .withColumn("prev", lag("count", 1, 0.0).over(w))
      .select(col("counter"), col("ts"), col("count"),
        round(when(col("count") === 0.0, 0.0)
          .otherwise(pow(abs(col("count") - col("prev")), alpha)), 6).as("spiked"))
  }

  /** DuckDB CTEs for spikeNorm over `rebinned`; yields `spiked`. */
  def spikeNormOracleCtes(alpha: Double): String =
    s"""sn_prev AS (
       |  SELECT counter, ts, count,
       |         lag(count, 1, 0.0) OVER (PARTITION BY counter ORDER BY ts) AS prev
       |  FROM rebinned),
       |spiked AS (
       |  SELECT counter, ts, count,
       |         round(CASE WHEN count = 0 THEN 0.0
       |                    ELSE pow(abs(count - prev), $alpha) END, 6) AS spiked
       |  FROM sn_prev)""".stripMargin

  /** DuckDB CTE for rocSweep over `scored`; `isTrendSql` labels counters. */
  def rocSweepOracleCtes(isTrendSql: String, thetas: Seq[Double]): String =
    s"""roc_max AS (
       |  SELECT counter, max(eta) AS max_eta, ($isTrendSql) AS is_trend
       |  FROM scored GROUP BY counter),
       |roc AS (
       |  SELECT th::DOUBLE AS theta,
       |         sum(CASE WHEN max_eta > th AND is_trend THEN 1 ELSE 0 END)::BIGINT AS tp,
       |         sum(CASE WHEN max_eta > th AND NOT is_trend THEN 1 ELSE 0 END)::BIGINT AS fp,
       |         sum(CASE WHEN max_eta <= th AND is_trend THEN 1 ELSE 0 END)::BIGINT AS fn,
       |         sum(CASE WHEN max_eta <= th AND NOT is_trend THEN 1 ELSE 0 END)::BIGINT AS tn
       |  FROM roc_max, unnest([${thetas.mkString(", ")}]) AS t(th)
       |  GROUP BY th)""".stripMargin

  /** DuckDB CTE for correlateTop over `rebinned`. */
  def correlateTopOracleCtes(topK: Int): String =
    s"""corr_top AS (
       |  SELECT counter FROM (
       |    SELECT counter, var_pop(count) AS v FROM rebinned GROUP BY counter
       |    ORDER BY v DESC, counter LIMIT $topK)),
       |corr_pruned AS (
       |  SELECT r.* FROM rebinned r SEMI JOIN corr_top t ON r.counter = t.counter),
       |corr_pairs AS (
       |  SELECT a.counter AS counter_a, b.counter AS counter_b,
       |         round(corr(a.count, b.count), 6) AS r
       |  FROM corr_pruned a JOIN corr_pruned b ON a.ts = b.ts
       |  WHERE a.counter < b.counter
       |  GROUP BY a.counter, b.counter)""".stripMargin

  /** DuckDB CTE for correlate over `rebinned`. */
  def correlateOracleCtes: String =
    s"""corr_pairs AS (
       |  SELECT a.counter AS counter_a, b.counter AS counter_b,
       |         round(corr(a.count, b.count), 6) AS r
       |  FROM rebinned a JOIN rebinned b ON a.ts = b.ts
       |  WHERE a.counter < b.counter
       |  GROUP BY a.counter, b.counter)""".stripMargin

  /** DuckDB CTE for coarsen over `scored`. */
  def coarsenOracleCtes(rebinFactor: Int): String =
    s"""coarse_g AS (
       |  SELECT counter, ts, count, eta,
       |         floor((row_number() OVER (PARTITION BY counter ORDER BY ts) - 1)
       |               / $rebinFactor) AS grp
       |  FROM scored),
       |coarse AS (
       |  SELECT counter, max(ts) AS ts, sum(count) AS count, round(avg(eta), 9) AS eta
       |  FROM coarse_g GROUP BY counter, grp HAVING count(*) = $rebinFactor)""".stripMargin
}
