package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Executor-loss A/B for the BATCH surface — the sibling of StreamBench's
  * `drift_killexec`: run a registered query to completion for reference,
  * then re-run it and SIGKILL one executor JVM mid-flight (requires
  * SPARK_GRAFT_MASTER=local-cluster[...] — local[] has no executor
  * process to kill). Whether the query survives depends on whether its
  * lineage cuts are executor-loss-safe: localCheckpoint blocks die with
  * their executor and abort the job; with SPARK_GRAFT_CHECKPOINT_DIR set
  * every [[graft.ml.Ckpt.cut]] becomes a reliable checkpoint that
  * rebuilds from files on a surviving executor. One JSON line per query:
  * {"query":…, "refSec":…, "killSec":…, "killedPid":…, "survived":…,
  *  "resultEqual":…}
  *
  * Usage: runMain graft.BatchKill <killAtFracOfRefWall> <query> [query…]
  */
object BatchKill {
  /** Order-independent content checksum (count + two 60-bit md5-slice
    * sums over canonical JSON rows) — same scheme as the StreamBench
    * recovery stages; collecting whole results to the driver would not.
    */
  private def checksum(df: DataFrame): String = {
    val j = md5(to_json(struct(df.columns.sorted.map(col): _*)))
    val r = df.select(count(lit(1)).cast("decimal(38,0)"),
      sum(conv(substring(j, 1, 15), 16, 10).cast("decimal(38,0)")),
      sum(conv(substring(j, 17, 15), 16, 10).cast("decimal(38,0)"))).head()
    (0 until 3).map(i => Option(r.getDecimal(i)).map(_.toString)
      .getOrElse("0")).mkString(":")
  }

  def main(args: Array[String]): Unit = {
    val killAtFrac = args(0).toDouble
    val names = args.drop(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    require(master.startsWith("local-cluster"),
      "BatchKill needs SPARK_GRAFT_MASTER=local-cluster[n,cores,mem] — " +
        "the point is killing a REAL executor JVM, and local[] has none")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_EXEC_CP").foreach { cp =>
      builder.config("spark.executor.extraClassPath", cp)
    }
    val LocalClusterMem = """local-cluster\[\s*\d+\s*,\s*\d+\s*,\s*(\d+)\s*\]""".r
    master match {
      case LocalClusterMem(mem) => builder.config("spark.executor.memory", s"${mem}m")
      case _ => ()
    }
    val spark = builder.getOrCreate()
    sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR")
      .foreach(spark.sparkContext.setCheckpointDir)
    spark.sparkContext.setLogLevel("WARN")
    import scala.sys.process._
    def executorPids(): Seq[Long] =
      (try "pgrep -f CoarseGrainedExecutorBackend".!!
       catch { case _: Throwable => "" })
        .split("\n").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val refSum = checksum(fn(spark, sfDir))
      val refSec = (System.nanoTime() - t0) / 1e9
      var killedPid = 0L
      val killer = new Thread(() => {
        Thread.sleep(math.max(200L, (refSec * killAtFrac * 1000).toLong))
        executorPids().headOption.foreach { p =>
          killedPid = p
          System.err.println(s"[batchkill] kill -9 executor $p during $name")
          s"kill -9 $p".!
          ()
        }
      })
      killer.setDaemon(true)
      val t1 = System.nanoTime()
      killer.start()
      val (survived, kSum) =
        try (true, checksum(fn(spark, sfDir)))
        catch {
          case e: Throwable =>
            System.err.println(s"[batchkill] $name DIED: " +
              s"${e.getClass.getSimpleName}: " +
              String.valueOf(e.getMessage).replace('\n', ' ').take(200))
            (false, "")
        }
      val killSec = (System.nanoTime() - t1) / 1e9
      println(s"""{"query":"$name","refSec":${Bench.fmt3(refSec)},""" +
        s""""killSec":${Bench.fmt3(killSec)},"killedPid":$killedPid,""" +
        s""""checkpointDir":${spark.sparkContext.getCheckpointDir.isDefined},""" +
        s""""survived":$survived,"resultEqual":${survived && kSum == refSum}}""")
      System.out.flush()
      // let the standalone worker finish relaunching the killed executor
      // before the next query starts
      Thread.sleep(3000)
    }
    spark.stop()
  }
}
