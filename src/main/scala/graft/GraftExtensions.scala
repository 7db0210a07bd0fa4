package graft

import graft.functions.{DotFold, L2SqFold, PoissonCiWidth}
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
  *   SELECT dot_fold(a, b), l2sq_fold(a, b)  -- codegen'd vector folds
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.poissonCiWidthFn)
    ext.injectFunction(GraftExtensions.dotFoldFn)
    ext.injectFunction(GraftExtensions.l2sqFoldFn)
  }
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

  private def binaryVecFn(name: String, clazz: Class[_],
                          build: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(clazz.getName, name),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"usage: $name(array<double>, array<double>)")
      val cast = args.map(a => org.apache.spark.sql.catalyst.expressions.Cast(
        a, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
      build(cast(0), cast(1))
    })

  private[graft] val dotFoldFn = binaryVecFn("dot_fold", classOf[DotFold], DotFold.apply)
  private[graft] val l2sqFoldFn = binaryVecFn("l2sq_fold", classOf[L2SqFold], L2SqFold.apply)

  /** Register on an existing session (the extensions class only applies at
    * session construction).
    */
  def register(spark: SparkSession): Unit =
    Seq(poissonCiWidthFn, dotFoldFn, l2sqFoldFn).foreach { fn =>
      spark.sessionState.functionRegistry.registerFunction(fn._1, fn._2, fn._3)
    }
}
