package graft.functions

import graft.{GraftExtensions, SparkSpec}
import org.apache.spark.sql.functions._

class PoissonCiWidthSpec extends SparkSpec {
  import spark.implicits._

  test("expression equals the scalar kernel, null-safe") {
    val out = Seq(Some(5.0), Some(0.0), None, Some(123.0))
      .toDF("mean")
      .select(PoissonCi.widthUdf(0.99)(col("mean")).as("w"))
      .as[Option[Double]].collect()
    assert(out(0) === Some(PoissonCi.width(0.99, 5.0)))
    assert(out(1) === None) // zero mean -> null (models.py:306)
    assert(out(2) === None)
    assert(out(3) === Some(PoissonCi.width(0.99, 123.0)))
  }

  test("registered SQL function works, with implicit int cast") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT poisson_ci_width(0.99, 5.0) AS a, poisson_ci_width(0.99, 7) AS b")
      .as[(Double, Double)].head()
    assert(r._1 === PoissonCi.width(0.99, 5.0))
    assert(r._2 === PoissonCi.width(0.99, 7.0))
  }

  test("expression stays inside whole-stage codegen") {
    // a local Seq would be constant-folded into a LocalTableScan; range
    // scans go through codegen, so the projection must fuse with it
    val df = spark.range(1, 100)
      .select(PoissonCi.widthUdf(0.99)(col("id").cast("double")).as("w"))
    // the "*(n)" prefix marks a WholeStageCodegen stage in plan strings
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [poisson_ci_width("))
    assert(df.agg(sum("w")).head().getDouble(0) > 0.0) // and actually runs
  }
}
