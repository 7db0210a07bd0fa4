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

  /** 60-bit non-negative hash of a string column. A native expression
    * ([[graft.functions.H64Expr]]) — bit-equal to the built-in chain
    * `conv(substring(md5(c), 1, 15), 16, 10).cast("long")` (H64Spec pins
    * it) without its per-value digest construction and string parses.
    */
  def h64(c: Column): Column = graft.functions.H64(c)

  /** DuckDB equivalent of h64. */
  def h64Sql(e: String): String =
    s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  /** Whitespace word split (documents.text is single-space separated).
    * A native byte-level expression ([[graft.functions.SpaceSplit]]) —
    * bit-equal to `split(text, " ")` (SpaceSplitSpec pins it) without
    * its per-row String decode / regex / re-encode round trip.
    */
  def words(text: Column): Column = graft.functions.SpaceSplit(text)

  val wordsSql: String = "string_split(text, ' ')"

  /** Word k-grams ("shingles") of a words array; empty when too short.
    * A native expression ([[graft.functions.ShingleArray]]) — bit-equal
    * to the interpreted-HOF original
    * `when(size(w) >= k, transform(sequence(0, size(w) - k), i =>
    *    concat_ws(" ", element_at(w, i+1) ... element_at(w, i+k))))
    *  .otherwise(array())`
    * without its per-element interpreter trips (PortableSpec pins the
    * equivalence, the DuckDB oracles the strings' hashes).
    */
  def shingles(w: Column, k: Int): Column =
    graft.functions.ShingleArray(w, k)

  /** DuckDB equivalent over a list column named `w` (1-based indexing). */
  def shinglesSql(k: Int): String = {
    val parts = (0 until k).map(j => s"w[i+$j]").mkString(" || ' ' || ")
    s"CASE WHEN len(w) >= $k THEN [$parts FOR i IN range(1, len(w) - ${k - 2})] " +
      "ELSE [] END"
  }
}
