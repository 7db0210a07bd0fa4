package graft
import org.apache.spark.sql.SparkSession

/** Print a registered query's result rows (capped) as one JSON line per
  * query — the scale-measurement aid for VALUE metrics (recall fractions,
  * assignment agreement, state sizes) on corpora where Verify's
  * oracle-floor guard rightly refuses to dump parquet for the DuckDB
  * compare: the wall clock comes from Bench, the metric value from here.
  *
  * Usage: runMain graft.Show <sfDir> <query> [query...]
  */
object Show {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val rows = SparkEntry.queries(name)(spark, sfDir).toJSON.take(20)
      println(s"""{"query":"$name","rows":[${rows.mkString(",")}]}""")
    }
    spark.stop()
  }
}
