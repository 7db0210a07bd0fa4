package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional extra args = run only these queries (local iteration aid;
    // the driver always calls with exactly two args)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
    // Auto-scaled index parameters (Similarity.autoBits/autoCells) only
    // match the fixed-parameter oracle SQL while the corpus sits at the
    // parameter floor; above it, refuse loudly instead of letting the
    // driver's hash compare silently diverge.
    // An unreadable embeddings table must fail only the auto-param
    // queries (each alone can't establish the floor invariant), not abort
    // the whole verify run — the other queries never touch that table.
    val nEmb: Either[Throwable, Long] =
      if (selected.keySet.exists(SparkEntry.autoParamQueries))
        try Right(spark.read.parquet(s"$sfDir/embeddings.parquet").count())
        catch { case e: Throwable => Left(e) }
      else Right(0L)
    // A refused query must leave NO output dump: a stale parquet from an
    // earlier run would let the driver compare data that was never re-run
    // and report green/red for it.
    def deleteRecursively(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
      f.delete(); ()
    }
    def refuse(name: String, why: String): Unit = {
      System.err.println(s"[verify] $name REFUSED: $why")
      val dump = new java.io.File(s"$outDir/$name")
      if (dump.exists()) deleteRecursively(dump)
    }
    selected.foreach { case (name, fn) =>
      if (SparkEntry.autoParamQueries(name) && nEmb.isLeft) {
        refuse(name, "embeddings table unreadable, cannot establish the " +
          s"oracle parameter floor invariant: ${nEmb.swap.toOption.get}")
      } else if (SparkEntry.autoParamQueries(name) &&
          nEmb.toOption.get > graft.ml.Similarity.oracleParamMaxN) {
        refuse(name, s"embeddings corpus (${nEmb.toOption.get} rows) " +
          s"exceeds the oracle parameter floor " +
          s"(${graft.ml.Similarity.oracleParamMaxN}) — auto-scaled index " +
          "params would diverge from the fixed-parameter oracle SQL")
      } else {
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      }
      // release this query's localCheckpoint blocks (see Bench.materialize)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
