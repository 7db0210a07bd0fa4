package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Counter-level gating and naming helpers.
  *
  *  - Allowlist (S7, trend_analyze_many.py:136-147): only counters named
  *    in a newline-delimited file are processed. Exact string match (the
  *    reference tests `counter_name in counters` with no normalization).
  *    At scale this is a broadcast LEFT SEMI join — the allowlist is tiny,
  *    every executor filters its partitions locally, no shuffle of the
  *    fact side.
  *  - Sanitize (C10, trend_analyze_many.py:256): spaces → dashes,
  *    truncated to 100 chars — the reference applies it to derive
  *    plot/file names from free-form counter strings.
  */
object Counters {

  /** Keep rows whose `counter` appears in `allowed` (exact match). */
  def allowlist(df: DataFrame, allowed: DataFrame): DataFrame =
    df.join(broadcast(allowed.select(col("counter"))), Seq("counter"), "left_semi")

  def allowlist(df: DataFrame, allowed: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    allowlist(df, allowed.toDF("counter"))
  }

  /** Read a newline-delimited allowlist file (driver-side, tiny). */
  def allowlistFromFile(df: DataFrame, path: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val lines = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(path),
        java.nio.charset.StandardCharsets.UTF_8)
      .asScala.map(_.stripLineEnd).filter(_.nonEmpty).toSeq
    allowlist(df, lines)
  }

  /** counter.replace(" ", "-")[0:100] (trend_analyze_many.py:256). */
  def sanitize(c: Column): Column =
    substring(regexp_replace(c, " ", "-"), 1, 100)

  /** DuckDB equivalent over an expression string. */
  def sanitizeSql(e: String): String =
    s"substr(replace($e, ' ', '-'), 1, 100)"
}
