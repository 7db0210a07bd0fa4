package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq.tabulate(400) { i =>
    (i.toLong, s"doc text $i", "en", if (i % 3 == 0) "web" else "books",
      (i * 37 % 2000).toLong)
  }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("morton key interleaves bits (hand-computed cases)") {
    // x=3 (bits 11) -> even positions 0,2 = 5; y=1 -> odd position 1 = 2
    val got = Seq((3L, 1L), (0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L))
      .toDF("x", "y")
      .select(Layout.mortonKey(col("x"), col("y"))).as[Long].collect()
    assert(got.toSeq == Seq(7L, 0L, 0x5555L, 0xAAAAL, 0xFFFFL))
  }

  test("zorder write yields disjoint per-file key ranges (skippable layout)") {
    val keyed = Layout.zorderKeys(docs)
    val path = java.nio.file.Files.createTempDirectory("zorder").toString
    Layout.writeZOrdered(keyed, path, "zkey", nFiles = 8)
    // per parquet file min/max of zkey must not overlap across files —
    // the property footer-stat pruning depends on
    val ranges = spark.read.parquet(path)
      .select(input_file_name().as("f"), col("zkey"))
      .groupBy("f").agg(min("zkey").as("mn"), max("zkey").as("mx"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, mxA), (mnB, _)) => assert(mxA <= mnB)
      case _ => ()
    }
    // and a zkey-range filter prunes: Spark reports skipped files via
    // the scan's metrics only, so assert the plan pushes the filter down
    val scan = spark.read.parquet(path).where(col("zkey") < 100)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(zkey), LessThan(zkey,100)]"),
      plan)
  }

  test("shuffleShard: dense 0-based positions per shard, deterministic") {
    val a = Curation.shuffleShard(docs, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = Curation.shuffleShard(docs, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq) // reproducible
    a.groupBy(_._2).foreach { case (_, rows) =>
      val ps = rows.map(_._3).sorted
      assert(ps.toSeq == ps.indices.map(_.toLong).toSeq) // dense, 0-based
    }
    // a different salt permutes the assignment
    val c = Curation.shuffleShard(docs, nShards = 4, salt = "other")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(c.sortBy(_._1).toSeq != a.sortBy(_._1).toSeq)
  }
}
