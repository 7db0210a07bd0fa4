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
  private def materialize(df: DataFrame): Unit = {
    df.write.mode("overwrite").format("noop").save()
    // drop this query's localCheckpoint blocks: across ~100 queries in
    // one JVM they otherwise accumulate until GC happens to collect the
    // RDD refs, and the resulting eviction churn showed up as 3x
    // wall-time spikes on checkpoint-heavy queries
    val sc = df.sparkSession.sparkContext
    sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_MASTER lets the same harness run under real executor
    // isolation — e.g. local-cluster[4,8,10240] forks 4 executor JVMs
    // with their own heaps and serialized network-path shuffle, the
    // closest a single box gets to cluster execution. Needs SPARK_HOME
    // and SPARK_GRAFT_EXEC_CP=<target/scala-2.13/classes> so the forked
    // executors can load the engine. Default (driver runs) is unchanged.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    // At scaled corpora per-task working sets grow with partition size;
    // the knob a cluster operator turns is partition count, not heap.
    // Default (= cores) matches the driver's small-sf runs.
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_EXEC_CP").foreach { cp =>
      builder.config("spark.executor.extraClassPath", cp)
    }
    // Arbitrary extra confs for scale experiments ("k=v;k2=v2") — e.g.
    // spark.eventLog.enabled for stage-level OOM forensics, or AQE knobs
    // for an A/B, without touching the harness defaults.
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach { kvs =>
      kvs.split(';').filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k.trim, v.trim)
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional args restrict the run (local profiling aid; the driver
    // always calls with no args)
    val only = args.toSet
    val ordered = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.isEmpty || only(n) }.sortBy(_._1)
    ordered.foreach { case (name, fn) => // warm-up (untimed)
      try materialize(fn(spark, sfDir)) catch {
        case e: Throwable =>
          System.err.println(s"[bench] warm-up FAILED $name: $e")
      }
    }
    // A failed query reports -1 (never a plausible small wall-time) and is
    // listed in "failed" — a regression that breaks a query must not
    // masquerade as a speedup.
    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        materialize(fn(spark, sfDir))
        val sec = (System.nanoTime() - t0) / 1e9
        // per-query progress on stderr: long runs (the 100× corpus) are
        // otherwise silent until the final line, and a hung query is
        // indistinguishable from a slow suite
        System.err.println(f"[bench] $name%-24s $sec%8.2f s")
        (name, sec, true)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] FAILED $name: $e")
          (name, -1.0, false)
      }
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    // Full per-query map first; then a compact summary as the LAST line.
    // The driver's artifact capture keeps only the tail of stdout, and in
    // round 4 the single giant line lost its leading total to truncation —
    // the trailing compact line is small enough to always survive intact.
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    println(s"""{"metric":"total","value":$total,"unit":"sec","nqueries":${results.size},"nfailed":${results.count(!_._3)},"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
