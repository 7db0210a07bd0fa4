package graft
import org.apache.spark.sql.SparkSession

/** superProbe cost/agreement curve for the two-level IVF coarse
  * quantizer (the measurement behind the [[graft.ml.Similarity]]
  * defaultSuperProbe choice): for each probe width, one timed full-corpus
  * two-level assignment plus its agreement against the exact flat scan.
  * One JSON line per point.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.IvfSweep [probe...]
  */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sfXL")
    val probes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(4, 6, 10, 14)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.load(spark, sfDir, "embeddings")
    def timeNoop(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    // end-metric: recall@10 of the full IVF query path over the bounded
    // 50-query sample (linear exact side) — what the probe width actually
    // costs a retrieval user, as opposed to raw cell agreement
    def recall(forceFlat: Boolean, p: Int): Double =
      graft.ml.Similarity.ivfRecall(emb, graft.ml.Similarity.sampledIsQuery,
          k = 10, forceFlat = forceFlat, superProbe = p)
        .select("recall_at_k").head().getDouble(0)
    // flat baseline once (warm-up pass first, as in Bench)
    timeNoop(graft.ml.Similarity.ivfAssign(emb, forceFlat = true))
    val flatSec = timeNoop(graft.ml.Similarity.ivfAssign(emb, forceFlat = true))
    println(s"""{"probe":"flat","sec":${Bench.fmt3(flatSec)},"agreement":1.0,""" +
      s""""recall_sampled":${recall(forceFlat = true, 0)}}""")
    probes.foreach { p =>
      timeNoop(graft.ml.Similarity.ivfAssign(emb, superProbe = p))
      val sec = timeNoop(graft.ml.Similarity.ivfAssign(emb, superProbe = p))
      val agree = graft.ml.Similarity.ivfAssignAgreement(emb, superProbe = p)
        .select("agreement").head().getDouble(0)
      println(s"""{"probe":$p,"sec":${Bench.fmt3(sec)},"agreement":$agree,""" +
        s""""recall_sampled":${recall(forceFlat = false, p)}}""")
      System.out.flush()
    }
    spark.stop()
  }
}
