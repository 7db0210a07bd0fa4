package graft

/** Driver-contract guards: every registered query must carry an oracle
  * (the t2 gate silently skips queries missing from either map), and the
  * flagship entry must produce rows on the smoke scale factor.
  */
class SparkEntrySpec extends SparkSpec {

  // queries DELIBERATELY registered without an oracle: the driver records
  // the weaker rows-only check for them. Only cross-engine-incomparable
  // results belong here (approx sketches differ by implementation); each
  // must carry a unit test pinning its contract instead. Empty since
  // round 5: text_vocab_sketch now emits exact counts + a within-3rsd
  // boolean the oracle asserts, so even the HLL sketch has a hash row.
  private val rowsOnly = Set.empty[String]

  test("queries and oracleSql cover exactly the same keys (minus rows-only)") {
    val q = SparkEntry.queries.keySet -- rowsOnly
    val o = SparkEntry.oracleSql.keySet
    assert(q === o, s"only in queries: ${q -- o}; only in oracle: ${o -- q}")
    assert(rowsOnly.subsetOf(SparkEntry.queries.keySet))
    assert((SparkEntry.oracleSql.keySet & rowsOnly).isEmpty,
      "a rows-only query grew an oracle — remove it from the allowlist")
  }

  test("query names are stable identifiers") {
    SparkEntry.queries.keys.foreach(k =>
      assert(k.matches("[a-z0-9_]+"), s"odd query name: $k"))
  }

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
