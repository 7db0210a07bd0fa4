package graft

/** Driver-contract guards: every registered query must carry an oracle
  * (the t2 gate silently skips queries missing from either map), and the
  * flagship entry must produce rows on the smoke scale factor.
  */
class SparkEntrySpec extends SparkSpec {

  test("queries and oracleSql cover exactly the same keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q === o, s"only in queries: ${q -- o}; only in oracle: ${o -- q}")
  }

  test("query names are stable identifiers") {
    SparkEntry.queries.keys.foreach(k =>
      assert(k.matches("[a-z0-9_]+"), s"odd query name: $k"))
  }

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
