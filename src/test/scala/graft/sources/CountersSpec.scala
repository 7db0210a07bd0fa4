package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountersSpec extends SparkSpec {
  import spark.implicits._

  test("allowlist keeps exact matches only (no normalization)") {
    val df = Seq(("a", 1.0), (" a", 2.0), ("b", 3.0), ("c", 4.0))
      .toDF("counter", "count")
    val kept = Counters.allowlist(df, Seq("a", "c"))
      .select("counter").as[String].collect().sorted.toSeq
    assert(kept === Seq("a", "c")) // " a" is NOT matched
  }

  test("allowlistFromFile reads newline-delimited names") {
    val f = java.nio.file.Files.createTempFile("graft-allow", ".txt")
    java.nio.file.Files.write(f, "a\n\nc\n".getBytes("UTF-8"))
    val df = Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)).toDF("counter", "count")
    assert(Counters.allowlistFromFile(df, f.toString).count() === 2)
  }

  test("sanitize replaces spaces with dashes and truncates to 100") {
    val out = Seq("a b  c", "x" * 150).toDF("counter")
      .select(Counters.sanitize(col("counter"))).as[String].collect()
    assert(out(0) === "a-b--c")
    assert(out(1) === "x" * 100)
  }
}
