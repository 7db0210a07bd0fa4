package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic hashing/tokenization primitives that evaluate identically
  * in Spark and DuckDB, so every dedup/similarity operator can be oracle-
  * checked bit-for-bit. The 60-bit hash is the first 15 hex chars of md5 —
  * md5 is the one hash both engines share; 15 nibbles keep it positive in
  * an int64.
  */
object Portable {

  /** 60-bit non-negative hash of a string column. */
  def h64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB equivalent of h64. */
  def h64Sql(e: String): String =
    s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  /** Whitespace word split (documents.text is single-space separated). */
  def words(text: Column): Column = split(text, " ")

  val wordsSql: String = "string_split(text, ' ')"

  /** Word k-grams ("shingles") of a words array; empty when too short. */
  def shingles(w: Column, k: Int): Column =
    when(size(w) >= k,
      transform(sequence(lit(0), size(w) - k), i =>
        concat_ws(" ", (1 to k).map(j => element_at(w, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  /** DuckDB equivalent over a list column named `w` (1-based indexing). */
  def shinglesSql(k: Int): String = {
    val parts = (0 until k).map(j => s"w[i+$j]").mkString(" || ' ' || ")
    s"CASE WHEN len(w) >= $k THEN [$parts FOR i IN range(1, len(w) - ${k - 2})] " +
      "ELSE [] END"
  }
}
