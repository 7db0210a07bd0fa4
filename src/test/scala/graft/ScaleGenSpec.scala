package graft

import org.apache.spark.sql.functions._

/** Pins the scale-corpus generator's contract: determinism (two
  * evaluations produce identical mutations), word-count preservation,
  * and the light/heavy mutation mix that keeps near-dup families small
  * (the quadratic-candidate trap a naive replication falls into —
  * SCALING.md "Corpus").
  */
class ScaleGenSpec extends SparkSpec {
  import spark.implicits._

  private val base = (0L until 200L)
    .map(i => (i, (0 until 20).map(w => s"w${(i * 7 + w) % 50}").mkString(" ")))
    .toDF("doc_id", "text")

  test("mutation is deterministic and preserves word count") {
    def run() = base
      .select(col("doc_id"),
        ScaleGen.mutateText(col("text"), col("doc_id"), lit(3L)).as("m"))
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    val a = run()
    assert(a === run(), "same seed inputs must produce identical text")
    val words = base.orderBy("doc_id").as[(Long, String)].collect()
    a.zip(words).foreach { case ((_, m), (_, t)) =>
      assert(m.split(" ").length === t.split(" ").length, "word count changes")
    }
  }

  test("copies split into a small light-mutation tail and a heavy majority") {
    // pct is drawn per (doc, rep): ~5% of copies mutate ~10% of words,
    // the rest ~55% — measure the changed-word fraction per copy
    val out = base
      .withColumn("rep", explode(sequence(lit(1), lit(5))))
      .select(col("doc_id"), col("rep"), col("text"),
        ScaleGen.mutateText(col("text"), col("doc_id"), col("rep")).as("m"))
      .as[(Long, Long, String, String)].collect()
    val fracs = out.map { case (_, _, t, m) =>
      val (tw, mw) = (t.split(" "), m.split(" "))
      tw.zip(mw).count { case (a, b) => a != b }.toDouble / tw.length
    }
    val light = fracs.count(_ < 0.3)
    val heavy = fracs.count(_ >= 0.3)
    // expectation: 5% light — allow generous slack on 1000 samples
    assert(light > 0 && light < fracs.length * 0.15,
      s"light fraction ${light.toDouble / fracs.length} outside (0, 0.15)")
    assert(heavy > fracs.length * 0.8)
  }
}
