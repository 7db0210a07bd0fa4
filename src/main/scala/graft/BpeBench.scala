package graft

import graft.ml.Ckpt.CutOps
import org.apache.spark.sql.SparkSession

/** BPE training-curve harness: wall time vs merge count at several round
  * batch sizes, on the scale corpus.
  *
  * The oracle query (`cur_bpe_merges`) proves 63 merges bit-exact against
  * the DuckDB CTE replay; what it cannot show is the VOCAB-scale shape:
  * real tokenizers train 32k–100k merges, and the batched-round design
  * ([[ml.Curation.bpeTrain]]) exists precisely so wall time scales with
  * merges/batch driver round-trips, not with merges. This main measures
  * that curve — if wall time at fixed batch grows super-linearly in
  * merges, or fails to shrink ~proportionally as batch grows, the batched
  * design is not earning its keep.
  *
  * Output: one JSON line per (merges, batch) combo and a summary file
  * (default `BENCH_bpe.json`).
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sfL")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BPE_OUT", "BENCH_bpe.json")
    // combos as "merges:batch" args (fixed-round bpeMerges) or
    // "t<merges>:batch" (train-to-target bpeMergesToVocab — runs until
    // the vocab actually reaches <merges>); default curve doubles merges
    // at batch 32 plus a batch sweep at the 2048-merge point
    val combos: Seq[(Int, Int, Boolean)] =
      (if (args.nonEmpty) args.toSeq
       else Seq("256:32", "512:32", "1024:32", "2048:32",
                "2048:8", "2048:64", "2048:128"))
        .map { s =>
          val Array(m, b) = s.split(":")
          if (m.startsWith("t")) (m.drop(1).toInt, b.toInt, true)
          else (m.toInt, b.toInt, false)
        }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents").lineageCut
    // warm-up: session/codegen/scan-cache startup out of the measurements
    ml.Curation.bpeMerges(docs, nMerges = 8, batch = 8).count()
    val rows = combos.map { case (m, b, toVocab) =>
      val t0 = System.nanoTime()
      val merges =
        if (toVocab) ml.Curation.bpeMergesToVocab(docs, targetMerges = m, batch = b)
        else ml.Curation.bpeMerges(docs, nMerges = m, batch = b)
      val n = merges.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"""{"merges":$m,"batch":$b,"toVocab":$toVocab,"gotMerges":$n,"sec":${
        String.format(java.util.Locale.ROOT, "%.1f", Double.box(sec))}}""")
      System.out.flush()
      (m, b, toVocab, n, sec)
    }
    val json = rows.map { case (m, b, tv, n, s) =>
      s"""{"merges":$m,"batch":$b,"toVocab":$tv,"gotMerges":$n,"sec":$s}"""
    }.mkString("[", ",", "]")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      s"""{"sf":"$sfDir","curve":$json}""" + "\n")
    println(s"""{"metric":"bpe_curve","combos":${rows.size},"out":"$outPath"}""")
    spark.stop()
  }
}
