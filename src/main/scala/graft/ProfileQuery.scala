package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Optimization-round profiling aid: runs one registered query (warm-up
  * + one timed pass, the Bench methodology) and prints a PER-SPARK-JOB
  * wall-time breakdown — job id, seconds, and the call site that
  * launched it — so a 6-second lifecycle query decomposes into "which of
  * its ~30 actions cost what" without event-log spelunking. Usage:
  *   sbt "runMain graft.ProfileQuery <sfDir> <query> [query ...]"
  * Measurement tooling only — never on any query path.
  */
object ProfileQuery {
  private case class Job(id: Int, start: Long, var end: Long = -1L,
                         site: String = "")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    @volatile var capture = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (capture) {
          val site = Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("?")
          jobs.put(js.jobId, Job(js.jobId, js.time, site = site)); ()
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val j = jobs.get(je.jobId)
        if (j != null) j.end = je.time
      }
    })
    def materialize(name: String): Unit = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.mode("overwrite").format("noop").save()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    names.foreach { name =>
      materialize(name) // warm-up (untimed, uncaptured)
      jobs.clear(); capture = true
      val t0 = System.nanoTime()
      materialize(name)
      val wall = (System.nanoTime() - t0) / 1e9
      capture = false
      import scala.jdk.CollectionConverters._
      val done = jobs.values.asScala.toSeq.filter(_.end > 0)
        .sortBy(j => -(j.end - j.start))
      println(f"===== $name wall=$wall%.2f s, ${done.size} jobs, " +
        f"sum=${done.map(j => (j.end - j.start) / 1e3).sum}%.2f s =====")
      done.take(40).foreach { j =>
        println(f"  job ${j.id}%4d ${(j.end - j.start) / 1e3}%7.3f s  ${j.site}")
      }
    }
    spark.stop()
  }
}
