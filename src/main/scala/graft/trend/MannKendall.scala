package graft.trend

import graft.functions.Rounding
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mann-Kendall trend test, scored per point over the history seen so far —
  * the reference recomputes mk_test over the full count list at every
  * update (models.py:25-45, mk_test.py:14-77) and returns z only
  * (`mk_test(x, alpha)[3]`).
  *
  * Per-point, for the prefix x_1..x_n:
  *   S      = Σ_{k<j} sign(x_j − x_k)                      (mk_test.py:41-44)
  *   var(S) = (n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)) / 18 (mk_test.py:46-57)
  *   z      = (S−1)/√var  if S>0;  0 if S=0;  (S+1)/√var   (mk_test.py:59-64)
  *
  * The reference is O(n²) per point ⇒ O(n³) per series. Here each counter's
  * series is processed once with a Fenwick tree over value ranks:
  * ΔS_i = #{k<i: x_k<x_i} − #{k<i: x_k>x_i} and the tie correction updates
  * incrementally as f(c+1)−f(c) for f(t)=t(t−1)(2t+5) — O(n log n) per
  * series total.
  *
  * Distribution: groupByKey(counter) + flatMapGroups; one shuffle, state is
  * one series (≤ grid-bin count, bounded by time range / resolution, NOT by
  * raw data volume — safe at 100 TB of events). An optional window_size
  * recomputes over the trailing window per point (models.py:42-44),
  * O(n·w log w).
  */
object MannKendall {

  // not `private`: Spark's encoder codegen needs public access to these
  final case class Pt(counter: String, ts: java.sql.Timestamp, count: Double)
  final case class Scored(counter: String, ts: java.sql.Timestamp,
                          count: Double, z: Double)

  private def fTie(t: Long): Double = t.toDouble * (t - 1) * (2 * t + 5)

  private final class Fenwick(n: Int) {
    private val a = new Array[Int](n + 1)
    def add(i: Int, delta: Int = 1): Unit = {
      var x = i + 1; while (x <= n) { a(x) += delta; x += x & -x }
    }
    /** count of inserted ranks <= i */
    def cumLe(i: Int): Int = { var x = i + 1; var s = 0; while (x > 0) { s += a(x); x -= x & -x }; s }
  }

  private def zOf(s: Double, varS: Double): Double =
    if (s > 0) (s - 1) / math.sqrt(varS)
    else if (s < 0) (s + 1) / math.sqrt(varS)
    else 0.0

  /** z per prefix (expanding history) for one time-ordered value array. */
  private[trend] def expandingZ(xs: Array[Double]): Array[Double] = {
    val n = xs.length
    val sorted = xs.distinct.sorted
    val rank = sorted.zipWithIndex.toMap
    val bit = new Fenwick(sorted.length)
    val tieCount = scala.collection.mutable.HashMap.empty[Double, Long]
    val out = new Array[Double](n)
    var s = 0.0
    var tieSum = 0.0
    var i = 0
    while (i < n) {
      val r = rank(xs(i))
      val less = if (r == 0) 0 else bit.cumLe(r - 1)
      val leq = bit.cumLe(r)
      val greater = i - leq
      s += (less - greater)
      val c = tieCount.getOrElse(xs(i), 0L)
      tieSum += fTie(c + 1) - fTie(c)
      tieCount.update(xs(i), c + 1)
      bit.add(r)
      val nn = (i + 1).toDouble
      val varS = (nn * (nn - 1) * (2 * nn + 5) - tieSum) / 18.0
      out(i) = if (varS <= 0) 0.0 else zOf(s, varS)
      i += 1
    }
    out
  }

  /** z per point over the trailing `w` values — incremental sliding
    * window: one Fenwick insert, one delete, and O(1) tie-sum deltas per
    * step ⇒ O(n log n) per series, vs the O(n·w²) of recomputing every
    * window (a real scale-killer at large window_size). All S/tie terms
    * are exact integers in doubles, so results are bit-identical to the
    * per-window recompute.
    */
  private[trend] def slidingZ(xs: Array[Double], w: Int): Array[Double] = {
    val n = xs.length
    val sorted = xs.distinct.sorted
    val rank = sorted.zipWithIndex.toMap
    val bit = new Fenwick(sorted.length)
    val tieCount = scala.collection.mutable.HashMap.empty[Double, Long]
    val out = new Array[Double](n)
    var s = 0.0
    var tieSum = 0.0
    var i = 0
    while (i < n) {
      if (i >= w) { // evict the element leaving the window
        val o = xs(i - w)
        val r = rank(o)
        bit.add(r, -1)
        val c = tieCount(o)
        tieSum += fTie(c - 1) - fTie(c)
        tieCount.update(o, c - 1)
        // o was the EARLIEST element: every pair it joined had it first,
        // contributing sign(x_j - o) — count over the remaining w-1
        val less = if (r == 0) 0 else bit.cumLe(r - 1)
        val leq = bit.cumLe(r)
        val greater = (w - 1) - leq
        s -= (greater - less)
      }
      val r = rank(xs(i))
      val inWindow = math.min(i, w) - (if (i >= w) 1 else 0) // size before insert
      val less = if (r == 0) 0 else bit.cumLe(r - 1)
      val leq = bit.cumLe(r)
      val greater = inWindow - leq
      s += (less - greater)
      val c = tieCount.getOrElse(xs(i), 0L)
      tieSum += fTie(c + 1) - fTie(c)
      tieCount.update(xs(i), c + 1)
      bit.add(r, 1)
      val nn = math.min(i + 1, w).toDouble
      val varS = (nn * (nn - 1) * (2 * nn + 5) - tieSum) / 18.0
      out(i) = if (varS <= 0) 0.0 else zOf(s, varS)
      i += 1
    }
    out
  }

  /** Naive mk z over one window (used by the streaming scorer's bounded
    * buffers and as the test cross-check for [[slidingZ]]).
    */
  private[graft] def windowZ(xs: Array[Double]): Double = {
    val n = xs.length
    var s = 0.0
    var k = 0
    while (k < n - 1) {
      var j = k + 1
      while (j < n) { s += math.signum(xs(j) - xs(k)); j += 1 }
      k += 1
    }
    val ties = xs.groupBy(identity).values.map(g => fTie(g.length.toLong)).sum
    val varS = (n.toDouble * (n - 1) * (2 * n + 5) - ties) / 18.0
    if (varS <= 0) 0.0 else zOf(s, varS)
  }

  /** Raw signed z per point — the shared kernel behind the model contract
    * ([[apply]], which trims through the analyze-stage convention) and the
    * standalone test surface ([[fullTest]], which must keep the sign).
    * z is hash-exact across engines: S and var(S) are integers held in
    * doubles, and sqrt/divide are correctly-rounded IEEE ops.
    */
  private def scoredZ(binned: DataFrame, windowSize: Option[Int]): DataFrame = {
    val spark = binned.sparkSession
    import spark.implicits._
    binned.select($"counter", $"ts", $"count".cast("double").as("count"))
      .as[Pt]
      .groupByKey(_.counter)
      .flatMapGroups { (counter, it) =>
        val pts = it.toArray.sortBy(_.ts.getTime)
        val xs = pts.map(_.count)
        val zs = windowSize match {
          case None => expandingZ(xs)
          case Some(ws) => slidingZ(xs, ws)
        }
        pts.indices.iterator.map(i => Scored(counter, pts(i).ts, pts(i).count, zs(i)))
      }
      .toDF()
  }

  def apply(binned: DataFrame, windowSize: Option[Int] = None): DataFrame =
    scoredZ(binned, windowSize)
      .withColumn("eta", Rounding.trim2(col("z")))
      .select("counter", "ts", "count", "eta")

  /** Full standalone-test surface: `(eta, p6, trend)` per point — the
    * reference's `mk_test` returns `(trend, h, p, z)` (mk_test.py:67-75:
    * two-tail p via the normal cdf, label by sign + significance at
    * `alpha`), while the model contract surfaces z only (models.py:45).
    * This is the view a user running the statistical test directly gets.
    * Unlike the model contract, z keeps its SIGN (mk_test.py never trims;
    * the analyze-stage `x > 0` clamp would erase every decreasing trend).
    *
    * p is computed from raw z via the Zelen–Severo 26.2.17 upper-tail
    * polynomial (|err| < 7.5e-8 — well inside the 6-dp emission; DuckDB
    * has no erf, so the oracle evaluates the literally identical
    * arithmetic). All ops but exp() are exactly-rounded IEEE arithmetic
    * on engine-identical inputs; exp may differ by 1 ulp between JVM and
    * libm, which flips the 6-dp rounding only if the true value sits
    * within an ulp of a 5e-7 boundary.
    * h = "p < alpha" replaces the reference's |z| > ppf(1−alpha/2) —
    * equivalent by monotonicity of the cdf, and comparing the rounded p6
    * keeps the label a pure function of emitted columns in both engines.
    */
  def fullTest(binned: DataFrame, alpha: Double = 0.05,
               windowSize: Option[Int] = None): DataFrame = {
    val az = abs(col("z"))
    val k = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = k * (lit(0.319381530) + k * (lit(-0.356563782) +
      k * (lit(1.781477937) + k * (lit(-1.821255978) + k * lit(1.330274429)))))
    val phi = exp(az * az * lit(-0.5)) / lit(2.5066282746310002)
    val p = least(lit(2.0) * phi * poly, lit(1.0)) // two-tail 2·(1−cdf(|z|))
    scoredZ(binned, windowSize)
      .withColumn("p6", round(p, 6))
      .withColumn("trend",
        when(col("p6") < alpha && col("z") < 0, "decreasing")
          .when(col("p6") < alpha && col("z") > 0, "increasing")
          .otherwise("no trend"))
      .select("counter", "ts", "count", "z", "p6", "trend")
  }

  /** DuckDB CTEs for [[fullTest]], appended after [[oracleCtes]] (whose
    * `mk_z` carries the raw signed z); produces `mk_full`.
    */
  def fullTestOracleCtes(alpha: Double): String =
    s"""mk_k AS (
       |  SELECT counter, ts, count, z,
       |         1.0 / (1.0 + 0.2316419 * abs(z)) AS kk
       |  FROM mk_z),
       |mk_p AS (
       |  SELECT counter, ts, count, z,
       |         round(least(2.0 * (exp(abs(z) * abs(z) * -0.5) / 2.5066282746310002)
       |           * (kk * (0.319381530 + kk * (-0.356563782 + kk * (1.781477937
       |              + kk * (-1.821255978 + kk * 1.330274429))))), 1.0), 6) AS p6
       |  FROM mk_k),
       |mk_full AS (
       |  SELECT counter, ts, count, z, p6,
       |         CASE WHEN p6 < $alpha AND z < 0 THEN 'decreasing'
       |              WHEN p6 < $alpha AND z > 0 THEN 'increasing'
       |              ELSE 'no trend' END AS trend
       |  FROM mk_p)""".stripMargin

  /** DuckDB oracle: O(n²) prefix-pair formulation over
    * `rebinned(counter, ts, duration_sec, count)` → `scored(...)`. Feasible
    * at oracle scale (sf0.01); the engine itself uses the O(n log n) path.
    */
  def oracleCtes: String =
    s"""mk_idx AS (
       |  SELECT counter, ts, count,
       |         row_number() OVER (PARTITION BY counter ORDER BY ts) AS i
       |  FROM rebinned),
       |mk_delta AS (
       |  SELECT a.counter, a.i,
       |         sum(CASE WHEN a.count > b.count THEN 1
       |                  WHEN a.count < b.count THEN -1 ELSE 0 END) AS d_s,
       |         sum(CASE WHEN a.count = b.count THEN 1 ELSE 0 END) AS n_eq
       |  FROM mk_idx a JOIN mk_idx b
       |    ON a.counter = b.counter AND b.i < a.i
       |  GROUP BY a.counter, a.i),
       |mk_tie AS (
       |  SELECT counter, i, d_s,
       |         (((n_eq+1)*n_eq*(2*(n_eq+1)+5)) - (n_eq*(n_eq-1)*(2*n_eq+5)))::DOUBLE AS tie_delta
       |  FROM mk_delta),
       |mk_run AS (
       |  SELECT x.counter, x.ts, x.count, x.i,
       |         coalesce(sum(t.d_s) OVER (PARTITION BY x.counter ORDER BY x.i), 0)::DOUBLE AS s,
       |         (x.i::DOUBLE * (x.i-1) * (2*x.i+5)
       |          - coalesce(sum(t.tie_delta) OVER (PARTITION BY x.counter ORDER BY x.i), 0)
       |          - 0) / 18.0 AS var_s_pre
       |  FROM mk_idx x LEFT JOIN mk_tie t ON x.counter = t.counter AND x.i = t.i),
       |mk_z AS (
       |  SELECT counter, ts, count,
       |         CASE WHEN var_s_pre <= 0 THEN 0.0
       |              WHEN s > 0 THEN (s - 1) / sqrt(var_s_pre)
       |              WHEN s < 0 THEN (s + 1) / sqrt(var_s_pre)
       |              ELSE 0.0 END AS z
       |  FROM mk_run),
       |scored AS (
       |  SELECT counter, ts, count, ${Rounding.trim2Sql("z")} AS eta
       |  FROM mk_z)""".stripMargin

  /** Windowed variant (models.py:42-44: mk_test over the trailing
    * `windowSize` counts at every point). O(n·w²) pair enumeration —
    * oracle-scale only; the engine recomputes per trailing slice.
    */
  def windowedOracleCtes(windowSize: Int): String = {
    val w1 = windowSize - 1
    s"""mk_idx AS (
       |  SELECT counter, ts, count,
       |         row_number() OVER (PARTITION BY counter ORDER BY ts) AS i
       |  FROM rebinned),
       |mkw_s AS (
       |  SELECT a.counter, a.i,
       |         sum(CASE WHEN c.count > b.count THEN 1
       |                  WHEN c.count < b.count THEN -1 ELSE 0 END) AS s
       |  FROM mk_idx a
       |  JOIN mk_idx b ON b.counter = a.counter AND b.i BETWEEN a.i - $w1 AND a.i
       |  JOIN mk_idx c ON c.counter = a.counter AND c.i BETWEEN b.i + 1 AND a.i
       |  GROUP BY a.counter, a.i),
       |mkw_n AS (
       |  SELECT a.counter, a.i, b.count AS v, count(*) AS cnt
       |  FROM mk_idx a
       |  JOIN mk_idx b ON b.counter = a.counter AND b.i BETWEEN a.i - $w1 AND a.i
       |  GROUP BY a.counter, a.i, b.count),
       |mkw_tie AS (
       |  SELECT counter, i, sum(cnt)::DOUBLE AS n,
       |         sum(cnt*(cnt-1)*(2*cnt+5))::DOUBLE AS ties
       |  FROM mkw_n GROUP BY counter, i),
       |mkw_z AS (
       |  SELECT x.counter, x.ts, x.count,
       |         CASE WHEN (t.n*(t.n-1)*(2*t.n+5) - t.ties) / 18.0 <= 0 THEN 0.0
       |              WHEN coalesce(s.s, 0) > 0
       |                THEN (s.s - 1) / sqrt((t.n*(t.n-1)*(2*t.n+5) - t.ties) / 18.0)
       |              WHEN coalesce(s.s, 0) < 0
       |                THEN (s.s + 1) / sqrt((t.n*(t.n-1)*(2*t.n+5) - t.ties) / 18.0)
       |              ELSE 0.0 END AS z
       |  FROM mk_idx x
       |  LEFT JOIN mkw_s s ON x.counter = s.counter AND x.i = s.i
       |  JOIN mkw_tie t ON x.counter = t.counter AND x.i = t.i),
       |scored AS (
       |  SELECT counter, ts, count, ${Rounding.trim2Sql("z")} AS eta
       |  FROM mkw_z)""".stripMargin
  }
}
