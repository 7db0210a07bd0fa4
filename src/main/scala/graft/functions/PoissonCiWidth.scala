package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the equal-tail Poisson CI width
  * (scipy convention; see [[PoissonCi]]). Null or non-positive mean →
  * null, matching the reference's guards (models.py:306-307).
  *
  * A codegen'd expression rather than a Scala UDF: inside whole-stage
  * codegen it compiles to one static Java call on the memoized kernel —
  * no boxed-function invocation, no UDF null-wrapper, and the projection
  * it appears in stays a single generated loop. `alpha` is part of the
  * expression tree (a plan constant), so Catalyst folds/prunes around it
  * normally.
  */
case class PoissonCiWidth(child: Expression, alpha: Double)
  extends UnaryExpression {

  // callers cast the child to double (see PoissonCi.widthUdf and the
  // GraftExtensions SQL builder) — ImplicitCastInputTypes is private[sql]
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "poisson_ci_width"

  // Per-expression-instance memo, re-created on each executor after
  // deserialization. alpha is fixed per instance, so the key is the bare
  // boxed mean — no tuple allocation — and the size bound is checked only
  // on the (rare) miss path, keeping the hot hit path to one CHM get.
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Double, java.lang.Double]()

  def widthOf(mu: Double): Double = {
    val k = java.lang.Double.valueOf(mu)
    val w = cache.get(k)
    if (w != null) w
    else {
      val v = PoissonCi.width(alpha, mu)
      if (cache.size > 65536) cache.clear() // crude bound; refill is cheap
      cache.put(k, v)
      v
    }
  }

  protected override def nullSafeEval(mu: Any): Any = {
    val m = mu.asInstanceOf[Double]
    if (m <= 0.0) null else widthOf(m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("poissonCiWidth", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($c <= 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $ref.widthOf($c);
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PoissonCiWidth =
    copy(child = newChild)
}
