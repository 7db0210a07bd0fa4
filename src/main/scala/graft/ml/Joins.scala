package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join utilities. AQE's skew-join splitting handles
  * sort-merge partitions at runtime, but it cannot help when a single
  * join KEY is hot (all its rows must still meet in one task) and the
  * build side is too large to broadcast. Salting is the standard fix:
  * widen the key with a salt, replicating the small side per salt value,
  * so one hot key spreads over `nSalts` tasks.
  */
object Joins {

  /** Equi-join `big ⋈ small` on `key`, salted: the big side derives a
    * deterministic salt from `bigSaltSource` (any column expression with
    * high row-level entropy, e.g. an id — NOT the join key), the small
    * side is replicated once per salt, and the join runs on
    * (key, salt) — semantically identical to the plain join (each big
    * row matches exactly the replica carrying its salt) but with the hot
    * key's rows spread over `nSalts` partitions.
    *
    * Inner join; duplicate keys on either side behave exactly as in the
    * plain join. Cost: small side is written `nSalts`×; pick nSalts ~ the
    * worst key's skew factor, not the partition count.
    *
    * MEASURED break-even (SCALING.md): at a 10M-row corpus with five
    * ~180k-row whale keys, the salted join was 2× SLOWER than the plain
    * shuffle join — replication tax beat the skew relief, because a hot
    * key well under the per-partition row budget is already handled by
    * AQE's skew split. Reach for salting when one key's rows approach
    * partition size (rows/partitions), not at the first sight of skew.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 bigSaltSource: Column, nSalts: Int = 8): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val salted = big.withColumn("__salt", pmod(Portable.h64(
      concat(bigSaltSource.cast("string"), lit(":salt"))), lit(nSalts)))
    val replicated = small.withColumn("__salt",
      explode(lit((0 until nSalts).toArray)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
