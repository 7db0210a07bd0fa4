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

  test("clustered embeddings: deterministic, tight within, spread across") {
    val dim = 16
    val ids = (0L until 400L).toDF("vec_id")
    def gen() = ids
      .select(col("vec_id"),
        pmod(xxhash64(lit("cl"), col("vec_id")),
          lit(ScaleGen.clusterCount.toLong)).as("cl"),
        ScaleGen.clusteredEmbedding(col("vec_id"), dim).as("v"))
      .as[(Long, Long, Seq[Float])].collect().toSeq.sortBy(_._1)
    val a = gen()
    assert(a === gen(), "clustered embedding must be deterministic")
    def d2(x: Seq[Float], y: Seq[Float]): Double =
      x.zip(y).map { case (p, q) => (p - q) * (p - q) }.sum
    val byCl = a.groupBy(_._2).filter(_._2.length >= 2)
    assert(byCl.nonEmpty, "no cluster drew two members — fixture too small")
    val within = for {
      (_, ms) <- byCl.toSeq; Seq(x, y) <- ms.map(_._3).combinations(2)
    } yield d2(x, y)
    // within-cluster: only jitter (±0.1/component) separates members
    assert(within.forall(_ <= dim * 0.04 + 1e-9),
      s"within-cluster distance exceeds the jitter bound: ${within.max}")
    // across-cluster: center spread dominates — median far above jitter
    val across = (for (i <- a.indices by 7; j <- (i + 1) until a.length by 13
      if a(i)._2 != a(j)._2) yield d2(a(i)._3, a(j)._3)).sorted
    assert(across(across.length / 2) > dim * 0.04 * 4,
      s"cross-cluster median ${across(across.length / 2)} not dominated by centers")
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
