package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-run benchmark: one JSON line with per-query seconds.
  *
  * Each query is fully materialized through the `noop` sink — unlike
  * `.count()`, every projected column is computed (Catalyst cannot prune
  * the eta windows/UDFs away), so the timings reflect real operator work.
  * One untimed warm-up pass absorbs session/codegen/IO-cache start-up
  * cost, and queries run in sorted name order so numbers are comparable
  * across rounds.
  */
object Bench {
  private def materialize(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    ordered.foreach { case (_, fn) => // warm-up (untimed)
      try materialize(fn(spark, sfDir)) catch { case _: Throwable => () }
    }
    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try materialize(fn(spark, sfDir)) catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
