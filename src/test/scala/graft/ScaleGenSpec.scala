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

  test("clustered embeddings: deterministic, family-tight, level-separated") {
    val dim = 16
    val nFam = 40L // 480 ids / 40 families ≈ the familySize target
    val ids = (0L until 480L).toDF("vec_id")
    def gen() = ids
      .select(col("vec_id"),
        pmod(xxhash64(lit("fam"), col("vec_id")), lit(nFam)).as("fam"),
        ScaleGen.clusteredEmbedding(col("vec_id"), dim, nFam).as("v"))
      .as[(Long, Long, Seq[Float])].collect().toSeq.sortBy(_._1)
    val a = gen()
    assert(a === gen(), "clustered embedding must be deterministic")
    def d2(x: Seq[Float], y: Seq[Float]): Double =
      x.zip(y).map { case (p, q) => (p - q) * (p - q) }.sum
    val byFam = a.groupBy(_._2).filter(_._2.length >= 2)
    assert(byFam.nonEmpty, "no family drew two members — fixture too small")
    val within = for {
      (_, ms) <- byFam.toSeq; Seq(x, y) <- ms.map(_._3).combinations(2)
    } yield d2(x, y)
    // within-family: only jitter (±0.01/component) separates members
    assert(within.forall(_ <= dim * 4e-4 + 1e-9),
      s"within-family distance exceeds the jitter bound: ${within.max}")
    // across families: offset/center scales dominate — the level
    // separation a query's true top-k (its family) depends on
    val across = (for (i <- a.indices by 7; j <- (i + 1) until a.length by 13
      if a(i)._2 != a(j)._2) yield d2(a(i)._3, a(j)._3)).sorted
    assert(across.head > dim * 4e-4 * 10,
      s"cross-family min ${across.head} not separated from the jitter scale")
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
