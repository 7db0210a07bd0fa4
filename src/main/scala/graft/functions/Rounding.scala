package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric trimming helpers mirroring the reference's output conventions. */
object Rounding {

  /** Round a positive value to 2 significant digits; non-positive → 0.
    * Reference: `round(x, -int(floor(log10(x)))+1)` guarded by `x > 0`
    * (analysis.py:189-196). Implemented as floor(x·10^d + 0.5)/10^d so the
    * identical expression is writable in DuckDB SQL (Spark's `round` only
    * takes a literal scale). Half-up instead of Python's half-even: exact
    * halves CAN occur (Poisson-lc eta is a ratio of an integer numerator to
    * an integer CI width, e.g. 1/8 = 0.125 → 0.13 here vs 0.12 in the
    * reference), so reference fidelity diverges on those inputs by one ulp
    * of the 2nd significant digit. Engine and oracle use the identical
    * expression on both sides, so the correctness gate is unaffected; this
    * is a documented, deliberate divergence.
    */
  def trim2(x: Column): Column = {
    val d = lit(1) - floor(log10(x))
    val r = pow(lit(10.0), d)
    when(x > 0, floor(x * r + lit(0.5)) / r).otherwise(lit(0.0))
  }

  /** Scalar twin of [[trim2]] (used by the streaming scorers); JVM floor/
    * log10/pow are what Spark's column functions call, so results are
    * bit-identical to the batch path.
    */
  def trim2Scalar(x: Double): Double =
    if (x > 0) {
      val r = math.pow(10.0, 1 - math.floor(math.log10(x)))
      math.floor(x * r + 0.5) / r
    } else 0.0

  /** The same expression as SQL text, for DuckDB oracle queries. */
  def trim2Sql(x: String): String =
    s"CASE WHEN $x > 0 THEN floor($x * pow(10, 1 - floor(log10($x))) + 0.5)" +
      s" / pow(10, 1 - floor(log10($x))) ELSE 0.0 END"

  /** Truncate-toward-zero of a non-negative float count, stabilized against
    * last-ulp noise from summation order (reference: `int(count)`,
    * analysis.py:147). Rounding to 9 decimals first makes Spark and DuckDB
    * agree even though they sum partial counts in different orders.
    */
  def stableIntTrunc(x: Column): Column = floor(round(x, 9)).cast("double")

  def stableIntTruncSql(x: String): String = s"floor(round($x, 9))"

  /** Scalar twin of [[stableIntTrunc]] (streaming coarsen): BigDecimal
    * HALF_UP at scale 9 is exactly what Spark's ROUND does on doubles.
    */
  def stableIntTruncScalar(x: Double): Double =
    math.floor(BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
}
