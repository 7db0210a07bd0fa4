package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic ~`factor`× scale-up of an sf directory, for measuring the
  * scale-sensitive operators on data large enough that a wrong plan hurts
  * (the sf0.1 corpus is 17 MB; every shuffle fits in one buffer and no
  * design claim is ever exercised). Everything is seeded from xxhash64 of
  * (id, rep) — two runs produce identical tables.
  *
  * Design notes, per table:
  *  - documents ×factor: each (doc_id, rep) copy draws a BASE text from a
  *    hash-rotated source doc and mutates words deterministically. ~5% of
  *    copies are LIGHT mutations (~10% of words) — realistic near-dup
  *    clusters for the banded dedup family — and the rest HEAVY (~55%),
  *    which drops shingle Jaccard far below the LSH band-collision range.
  *    A naive "append a suffix per rep" scale-up would make every doc a
  *    member of a factor-sized near-dup family and blow the candidate
  *    pair set up quadratically — no real corpus looks like that.
  *  - events ×factor: rep 0 is the pristine base; every tenth replica
  *    collapses onto FIVE whale user_ids (at 100× that is ~180k events
  *    per whale — hot-key rows within an order of magnitude of a 32-way
  *    partition, the regime where skew actually bites a shuffle join),
  *    the rest move to fresh user ranges. Timestamps jitter by
  *    rep·7s + hash%300s, so sessions interleave instead of duplicating;
  *    per-bin counts scale ~factor for the trend pipeline.
  *  - embeddings ×factor: component-wise hash-seeded jitter (±5e-3)
  *    around the source vector — cluster structure survives, so IVF cell
  *    occupancy stays realistic while exact duplicates disappear.
  *  - every other table is copied through unchanged, so the output dir is
  *    a complete sf layout and ANY registered query runs against it.
  *
  * Usage: sbt "runMain graft.ScaleGen [srcDir] [outDir] [factor] [embMode]"
  * (defaults /root/testdata/sf0.1 → /tmp/sfL at 100×, embMode `jitter`).
  *
  * `embMode = clustered` replaces the jittered-copy embeddings with a
  * PLANTED-CLUSTER corpus: [[clusterCount]] hash-seeded centers in
  * [-1,1]^dim, each vector a center plus ±0.1 per-component jitter,
  * cluster membership hashed from vec_id. Rationale: the jittered-copy
  * corpus inherits the testdata generator's uniform embeddings, which
  * have NO cluster structure for k-means to find — measured at 1000×,
  * trained IVF-PQ recall (0.006) sat at the probe-fraction bound below
  * the seed build's (0.01), making the trained-quantizer feature's
  * payoff undemonstrable (BENCH_trained_sfXL_r11.json, round-11
  * verdict). Real embedding corpora are clustered — that is the entire
  * premise of IVF — so the clustered mode is the realistic recall
  * fixture; the uniform mode stays as the adversarial contrast. Same
  * vec_id scheme (rep-0 ids preserved ⇒ the bounded query sets and
  * every registered workload run unchanged); labels pass through.
  */
object ScaleGen {
  private def reps(factor: Int): Column =
    explode(sequence(lit(0), lit(factor - 1)))

  /** Macro centers for `embMode = clustered` — the COARSE structure IVF
    * cells should tile (≈ one cell per macro-cluster at the 100× corpus'
    * autoCells budget; trained k-means must subdivide them at 1000×).
    */
  val clusterCount = 100

  /** Target near-dup family size — the FINE structure that makes exact
    * top-k recoverable by an approximate index at all: a query's true
    * top-10 are its ~11 family co-members, separated from everything
    * else by the family-offset scale. (A single-level cluster+jitter
    * corpus leaves thousands of near-EQUIDISTANT candidates per cell;
    * no absolute-coding quantizer can rank the true top-10 out of that
    * continuum, so recall@10 measures tie-break luck, not index quality
    * — measured: seed 0.014 / trained 0.002 at the 100× single-level
    * fixture. Real retrieval corpora are near-dup-heavy at the top; the
    * family level models exactly that.)
    */
  val familySize = 12L

  /** Deterministic hierarchical embedding:
    * macro center (±1.0, per cluster·dim) + family offset (±0.25, per
    * family·dim) + jitter (±0.01, per vector·dim), all integer-hash
    * seeded. Families hash into macro-clusters; vectors hash into
    * families (`nFam` ≈ corpus/[[familySize]]). Scale separation 1.0 ≫
    * 0.25 ≫ 0.01 gives each level its job: macro centers are what the
    * coarse quantizer should learn, family offsets are what the PQ
    * codebook must resolve, jitter orders the within-family ties.
    */
  private[graft] def clusteredEmbedding(vecId: Column, dim: Int,
                                        nFam: Long): Column = {
    val fam = pmod(xxhash64(lit("fam"), vecId), lit(nFam))
    val cl = pmod(xxhash64(lit("cl"), fam), lit(clusterCount.toLong))
    transform(sequence(lit(1), lit(dim)), j =>
      (((pmod(xxhash64(lit("cc"), cl, j), lit(2001)).cast("double") - 1000.0)
          / 1000.0) +
        ((pmod(xxhash64(lit("fo"), fam, j), lit(501)).cast("double") - 250.0)
          / 1000.0) +
        ((pmod(xxhash64(lit("cj"), vecId, j), lit(21)).cast("double") - 10.0)
          / 1000.0)).cast("float"))
  }

  /** Deterministic word mutation: word i of copy (id, rep) is replaced by
    * a synthetic token when xxhash64(seed, id, rep, i) lands under
    * `pct`; light/heavy pct is itself drawn per copy. Preserves word
    * COUNT (token/quality stats stay comparable) while controlling
    * shingle overlap with the base text.
    */
  private[graft] def mutateText(text: Column, id: Column, rep: Column): Column = {
    val pct = when(pmod(xxhash64(lit("dup"), id, rep), lit(100)) < 5, lit(10))
      .otherwise(lit(55))
    val ws = split(text, " ")
    array_join(
      zip_with(ws, sequence(lit(1), size(ws)), (w, i) =>
        when(pmod(xxhash64(lit("mut"), id, rep, i), lit(100)) < pct,
          concat(lit("tk"), pmod(xxhash64(lit("tok"), id, rep, i), lit(99999))))
          .otherwise(w)),
      " ")
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/sfL")
    val factor = args.lift(2).map(_.toInt).getOrElse(100)
    val embMode = args.lift(3).getOrElse("jitter")
    require(Set("jitter", "clustered")(embMode),
      s"embMode must be jitter|clustered, got $embMode")
    // optional comma-list of tables to (re)generate — a clustered-recall
    // fixture only needs `embeddings` next to an existing jitter-mode dir
    val only: Option[Set[String]] =
      args.lift(4).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def wanted(name: String): Boolean = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scalegen] wrote $name")
    }

    // documents: base text rotates across source docs by a hash stride, so
    // copy families spread over the corpus instead of stacking on one id
    if (wanted("documents")) {
      val docs = Tables.load(spark, src, "documents")
      val nDocs = docs.count()
      val base = docs.select(col("doc_id").as("base_id"), col("text").as("base_text"),
        col("lang"), col("source"))
      val scaledDocs = docs.select(col("doc_id"), reps(factor).as("rep"))
        .withColumn("base_id",
          pmod(col("doc_id") + col("rep") * lit(7919L), lit(nDocs)))
        .join(base, "base_id")
        .select(
          (col("doc_id") + col("rep") * lit(10000000L)).as("doc_id"),
          when(col("rep") === 0, col("base_text"))
            .otherwise(mutateText(col("base_text"), col("doc_id"), col("rep")))
            .as("text"),
          col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
      write(scaledDocs.repartition(32), "documents")
    }

    // events
    if (wanted("events")) {
      val ev = Tables.load(spark, src, "events")
      val tsCol = ev.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          timestamp_seconds(expr("ts DIV 1000000000"))
        case _ => date_trunc("second", col("ts"))
      }
      val scaledEv = ev.select(col("event_id"), tsCol.as("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .withColumn("rep", reps(factor))
        .select(
          (col("event_id") + col("rep") * lit(100000000L)).as("event_id"),
          (col("ts") + make_interval(lit(0), lit(0), lit(0), lit(0), lit(0), lit(0),
            col("rep") * 7 + pmod(xxhash64(lit("ts"), col("event_id"), col("rep")),
              lit(300)))).as("ts"),
          when(col("rep") === 0, col("user_id"))
            .when(pmod(col("rep"), lit(10)) === 0, pmod(col("user_id"), lit(5)))
            .otherwise(col("user_id") + col("rep") * lit(10000L)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      write(scaledEv.repartition(64), "events")
    }

    // embeddings: ±5e-3 jitter per component, floats preserved (jitter
    // mode) or the planted-cluster corpus (clustered mode — see object
    // doc; recall fixtures need structure k-means can find)
    if (wanted("embeddings")) {
    val emb = Tables.load(spark, src, "embeddings")
    val scaledEmb =
      if (embMode == "clustered") {
        val dim = emb.select(size(col("embedding"))).head().getInt(0)
        val nFam = math.max(1L, emb.count() * factor / familySize)
        emb.withColumn("rep", reps(factor))
          .select(
            (col("vec_id") + col("rep") * lit(10000000L)).as("vec_id"),
            col("label"))
          .withColumn("embedding",
            clusteredEmbedding(col("vec_id"), dim, nFam))
          .select("vec_id", "embedding", "label")
      } else emb
        .withColumn("rep", reps(factor))
        .select(
          (col("vec_id") + col("rep") * lit(10000000L)).as("vec_id"),
          zip_with(col("embedding"), sequence(lit(1), size(col("embedding"))),
            (x, i) => (x +
              (pmod(xxhash64(lit("emb"), col("vec_id"), col("rep"), i), lit(1000))
                .cast("double") - 500.0) / 100000.0).cast("float"))
            .as("embedding"),
          col("label"))
    write(scaledEmb.repartition(32), "embeddings")
    }

    // pass-through for the rest: the dir is a complete sf layout
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .filter(wanted)
      .foreach(t => write(Tables.load(spark, src, t), t))
    spark.stop()
  }
}
