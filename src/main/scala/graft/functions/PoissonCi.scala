package graft.functions

import org.apache.commons.math3.special.Gamma
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Equal-tail Poisson confidence-interval width, scipy-convention
  * (reference: `dists.poisson.interval(alpha, mean)[1] - [0]`,
  * models.py:301-310).
  *
  * ppf(q, μ) = min{k ∈ ℕ : CDF(k) ≥ q}, with the CDF accumulated
  * term-by-term as exp(k·lnμ − μ − lnΓ(k+1)). The summation (rather than a
  * closed-form inverse) is deliberate: the *identical* accumulation is
  * expressible in DuckDB SQL (sum of exp(k*ln(m) - m - lgamma(k+1)) over a
  * generated k range), so engine and oracle pick the same integer k. A
  * 1e-9 tolerance on the threshold absorbs libm ulp differences between
  * the JVM and DuckDB.
  *
  * Scale note: O(μ + 40√μ) per *distinct* mean; callers should compute it
  * over distinct means and join back when means repeat (they do: means are
  * lagged integer counts). The UDF itself is cheap for the count scales
  * this engine targets (μ ≲ 10⁵ per bin even at 100 TB of raw events,
  * because bins are bounded by the grid resolution, not data volume).
  */
object PoissonCi {
  private val Tol = 1e-9

  /** Smallest k with CDF(k) ≥ q − tol. μ must be > 0, 0 < q < 1. */
  def ppf(q: Double, mu: Double): Long = {
    val lnMu = math.log(mu)
    val kMax = (mu + 40.0 * math.sqrt(mu) + 200.0).toLong
    var k = 0L
    var cdf = math.exp(-mu)
    while (cdf < q - Tol && k < kMax) {
      k += 1
      cdf += math.exp(k * lnMu - mu - Gamma.logGamma(k + 1.0))
    }
    k
  }

  /** interval(alpha, μ) upper − lower; equal tails of (1−alpha)/2 each. */
  def width(alpha: Double, mu: Double): Double = {
    val qLo = (1.0 - alpha) / 2.0
    val qHi = 1.0 - qLo
    (ppf(qHi, mu) - ppf(qLo, mu)).toDouble
  }

  /** Null-safe column form: null/≤0 mean → null (callers map to eta 0,
    * matching models.py:306-307). Backed by the codegen'd
    * [[PoissonCiWidth]] expression — inside whole-stage codegen this is a
    * static Java call, not a Scala-function UDF invocation per row.
    */
  def widthUdf(alpha: Double): Column => Column =
    (c: Column) => org.apache.spark.sql.graft.GraftShim.column(
      PoissonCiWidth(
        org.apache.spark.sql.graft.GraftShim.expression(c.cast("double")), alpha))

  /** DuckDB SQL fragment computing (mean → ci_width) for all distinct
    * positive means of `srcRel.meanCol`; yields relation (mean, ci_width).
    */
  def widthSqlCte(alpha: Double, srcRel: String, meanCol: String): String = {
    val qLo = (1.0 - alpha) / 2.0
    val qHi = 1.0 - qLo
    s"""ci_means AS (
       |  SELECT DISTINCT $meanCol AS mean FROM $srcRel
       |  WHERE $meanCol IS NOT NULL AND $meanCol > 0),
       |ci_ks AS (
       |  SELECT mean, unnest(range(0, (mean + 40*sqrt(mean) + 200)::BIGINT + 1)) AS k
       |  FROM ci_means),
       |ci_cdf AS (
       |  SELECT mean, k,
       |         sum(exp(k * ln(mean) - mean - lgamma(k + 1.0)))
       |           OVER (PARTITION BY mean ORDER BY k) AS c
       |  FROM ci_ks),
       |ci_width AS (
       |  SELECT mean,
       |         (min(CASE WHEN c >= ${qHi} - 1e-9 THEN k END)
       |          - min(CASE WHEN c >= ${qLo} - 1e-9 THEN k END))::DOUBLE AS ci_w
       |  FROM ci_cdf GROUP BY mean)""".stripMargin
  }
}
