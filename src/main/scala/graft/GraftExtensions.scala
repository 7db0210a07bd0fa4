package graft

import graft.functions.PoissonCiWidth
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.Decimal

/** SparkSessionExtensions hook exposing the engine's custom expressions to
  * SQL. Deploy with
  * `--conf spark.sql.extensions=graft.GraftExtensions`, or call
  * [[GraftExtensions.register]] on a live session (tests, notebooks):
  *
  *   SELECT poisson_ci_width(0.99, mean)  -- equal-tail Poisson CI width
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.poissonCiWidthFn)
}

object GraftExtensions {

  private def alphaLiteral(e: Expression): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: Decimal, _) => v.toDouble
    case Literal(v: Int, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"poisson_ci_width alpha must be a literal, got $other")
  }

  private[graft] val poissonCiWidthFn
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("poisson_ci_width"),
    new ExpressionInfo(classOf[PoissonCiWidth].getName, "poisson_ci_width"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "usage: poisson_ci_width(alpha, mean)")
      PoissonCiWidth(
        org.apache.spark.sql.catalyst.expressions.Cast(args(1),
          org.apache.spark.sql.types.DoubleType), alphaLiteral(args(0)))
    })

  /** Register on an existing session (the extensions class only applies at
    * session construction).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      poissonCiWidthFn._1, poissonCiWidthFn._2, poissonCiWidthFn._3)
}
