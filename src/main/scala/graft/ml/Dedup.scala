package graft.ml

import graft.ml.Ckpt.CutOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators over the documents table — the training-data-
  * pipeline companions to the reference's trend surface (BASELINE.json
  * north star). Each has an exact DuckDB oracle built from the Portable
  * primitives.
  *
  * Scale design (100 TB): everything is hash-partitioned long-form work —
  * no driver-side state; candidate generation is pruned before any pair
  * is materialized (minhash LSH bands, 15-bit simhash bands, df-capped
  * shared-shingle inverted index). The one exception is
  * [[embeddingCosine]], the deliberately-exact all-pairs baseline whose
  * scale path is [[Similarity.lshTopK]].
  */
object Dedup {
  import Portable._

  /** Exact dedup: md5 content key → representative = min doc_id.
    * Output: (content_key, keep_id, n_copies).
    */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("content_key"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))

  val exactOracleSql: String =
    """SELECT md5(text) AS content_key, min(doc_id) AS keep_id,
      |       count(*) AS n_copies
      |FROM documents GROUP BY md5(text)""".stripMargin

  /** First-seen record for streaming dedup output. */
  final case class FirstSeen(content_key: String, doc_id: Long)

  /** Streaming counterpart of [[exact]]: emit only the FIRST document
    * carrying each content key (md5 of text) at ingestion time. Keyed
    * state is one boolean per distinct content key; within a micro-batch
    * the lowest doc_id wins (deterministic), across batches the earlier
    * batch wins — so keepers equal the batch pass when arrival order
    * follows doc_id, and otherwise differ only in WHICH copy represents
    * the group. State grows with DISTINCT corpus content — production
    * deployments bound it with a state-store TTL or an upstream
    * time-windowed scope; there is no watermark because content keys
    * never expire by event time.
    */
  def exactStream(docs: DataFrame): org.apache.spark.sql.Dataset[FirstSeen] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    docs.selectExpr("md5(text) AS content_key", "doc_id")
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, FirstSeen](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[Boolean]) =>
          if (state.getOption.contains(true)) Iterator.empty
          else {
            state.update(true)
            Iterator.single(FirstSeen(key, rows.map(_._2).min))
          }
      }
  }

  /** Incremental exact dedup — the daily-refresh pattern: a NEW batch of
    * documents is deduped against the STANDING corpus snapshot without
    * rescanning it for pairs. A new doc's group survives iff its content
    * key is absent from the snapshot; within the batch the min doc_id
    * represents the group. Output: (content_key, keep_id,
    * n_batch_copies) — the batch's admissible keepers.
    *
    * Scale: one shuffle anti join on the 16-byte content key (both sides
    * hash-partitioned; the snapshot side is its distinct KEY set, not its
    * text) + one hash aggregation over the batch. The snapshot keys are
    * exactly what [[exact]] already materializes, so a production loop
    * carries them forward run-to-run instead of recomputing.
    */
  def incremental(snapshot: DataFrame, batch: DataFrame): DataFrame = {
    val oldKeys = snapshot.select(md5(col("text")).as("content_key")).distinct()
    batch.select(md5(col("text")).as("content_key"), col("doc_id"))
      .join(oldKeys, Seq("content_key"), "left_anti")
      .groupBy("content_key")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_batch_copies"))
  }

  /** Oracle over one `documents` table split by doc_id parity (even =
    * standing snapshot, odd = new batch) — mirrors the registered query.
    */
  val incrementalOracleSql: String =
    """WITH keyed AS (SELECT doc_id, md5(text) AS content_key FROM documents),
      |old AS (
      |  SELECT DISTINCT content_key FROM keyed
      |  WHERE ((doc_id % 2) + 2) % 2 = 0),
      |fresh AS (
      |  SELECT * FROM keyed WHERE ((doc_id % 2) + 2) % 2 = 1)
      |SELECT content_key, min(doc_id) AS keep_id,
      |       count(*) AS n_batch_copies
      |FROM fresh ANTI JOIN old USING (content_key)
      |GROUP BY content_key""".stripMargin

  /** Distinct (doc_id, sh) table of 60-bit shingle HASHES. The words
    * array is materialized in its own projection BEFORE the shingle
    * lambda: a split() inlined into the lambda body re-executes per
    * element_at (k splits per shingle — measured 40× slower), because
    * higher-order functions are interpreted and get no common-
    * subexpression elimination. CollapseProject keeps the multi-
    * referenced non-cheap alias out of the lambda.
    *
    * Hashing happens BEFORE the distinct: every downstream consumer
    * (distinct, df aggregation, inverted-index joins, minhash mixes)
    * keys on the shingle, and an 8-byte int64 key shuffles ~10× fewer
    * bytes than the k-word string it replaces. The 60-bit space makes
    * collisions negligible, and the DuckDB oracle hashes at the same
    * point so both engines see identical keys.
    */
  private[ml] def shingleTable(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"), words(col("text")).as("w"))
      .select(col("doc_id"), explode(shingles(col("w"), k)).as("shingle"))
      .select(col("doc_id"), h64(col("shingle")).as("sh"))
      .distinct()

  /** Per-doc DISTINCT-shingle count as a map-only projection — the same
    * number the 3-stage explode→distinct→count aggregation over
    * [[shingleTable]] produces, without its two shuffles. Distinctness is
    * counted on the STRINGS (same count as the table's 60-bit hashes,
    * collisions aside) — hashing here would run md5 inside an interpreted
    * lambda, re-paying the whole hash pass per consumer for a number the
    * strings already give. Used for the Jaccard denominator.
    */
  private def shingleSizes(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"), words(col("text")).as("w"))
      .select(col("doc_id"),
        size(array_distinct(shingles(col("w"), k))).cast("long").as("n"))

  private def shingleTableSql(k: Int): String =
    s"""doc_words AS (SELECT doc_id, $wordsSql AS w FROM documents),
       |doc_shingles AS (
       |  SELECT DISTINCT doc_id, ${h64Sql("s")} AS sh
       |  FROM (SELECT doc_id, unnest(${shinglesSql(k)}) AS s FROM doc_words))""".stripMargin

  /** Universal-hash constants for the minhash seed family, derived from
    * md5 so both engines embed identical literals: values in [1, P).
    */
  private val HashP = 1000000007L
  private[ml] def seedConst(tag: String, s: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"mh:$tag:$s".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(14), 16) % (HashP - 1) + 1
  }

  /** MinHash + LSH near-dup pairs: `numHashes` min-hashes of word-`k`-gram
    * shingles, banded into `bands` buckets (rows = numHashes/bands); pairs
    * sharing a band bucket are verified with exact Jaccard >= `threshold`.
    * Output: (doc_a, doc_b, jaccard).
    *
    * Scale: shingles → shuffle by (doc, seed) for signatures; band self-
    * join is on the band-bucket key (tiny groups); the exact-verify join is
    * per candidate pair only. No O(n²) stage. Each shingle is md5-hashed
    * ONCE; the `numHashes` seed hashes are universal-hash mixes
    * (aᵢ·h + bᵢ mod P) of that digest with literal constants — hashing the
    * shingle string per seed would multiply the dominant md5 cost by
    * numHashes for no statistical gain.
    */
  def minHashLsh(docs: DataFrame, k: Int = 3, numHashes: Int = 16,
                 bands: Int = 8, threshold: Double = 0.5): DataFrame =
    // three consumers (signature agg + both sides of the exact-verify
    // join) — materialize the scan→explode→md5→distinct subtree once,
    // as in ngramJaccard
    minHashLshFrom(shingleTable(docs, k).lineageCut,
      shingleSizes(docs, k), numHashes, bands, threshold)

  /** (doc_id, band, bkey) LSH band table of a shingle table: all
    * `numHashes` min-signatures as agg columns of ONE groupBy (no
    * per-seed row explosion), band keys assembled directly from them.
    * The universal-hash mixes (aᵢ·h + bᵢ mod P, literal constants both
    * engines embed) reuse the table's 60-bit key — hashing the shingle
    * string per seed would multiply the dominant md5 cost by numHashes
    * for no statistical gain. This is also the relation a production
    * loop PERSISTS as the standing corpus's index (bucketed by
    * (band, bkey)) for [[minHashLshIncremental]] to probe.
    */
  private[ml] def bandTable(sh: DataFrame, numHashes: Int,
                            bands: Int): DataFrame = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    val as = (0 until numHashes).map(seedConst("A", _))
    val bs = (0 until numHashes).map(seedConst("B", _))
    val minCols = (0 until numHashes).map(s =>
      min((lit(as(s)) * col("hm") + lit(bs(s))) % HashP).as(s"mh$s"))
    val sig = sh
      .withColumn("hm", col("sh") % HashP)
      .groupBy("doc_id")
      .agg(minCols.head, minCols.tail: _*)
    val bandCols = (0 until bands).map { b =>
      val key = md5(concat_ws("|",
        (0 until rows).map(r => col(s"mh${b * rows + r}").cast("string")): _*))
      struct(lit(b.toLong).as("band"), key.as("bkey"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"),
        col("bb.bkey").as("bkey"))
  }

  /** [[minHashLsh]] over a caller-provided (already-materialized)
    * shingle table — the scan-sharing seam [[lshRecall]] uses.
    */
  private[ml] def minHashLshFrom(sh: DataFrame, sizes: DataFrame,
                                 numHashes: Int, bands: Int,
                                 threshold: Double): DataFrame = {
    val banded = bandTable(sh, numHashes, bands)

    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

    jaccardVerify(cand, sh, sizes, threshold)
  }

  /** Exact jaccard for candidate pairs via the shared-shingle join;
    * `sizes` is the (doc_id, n) distinct-shingle-count relation
    * ([[shingleSizes]] — map-only, no shuffle).
    */
  private def jaccardVerify(cand: DataFrame, sh: DataFrame,
                            sizes: DataFrame, threshold: Double): DataFrame = {
    val inter = cand
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"), col("doc_b") === col("sb.doc_id") &&
        col("sa.sh") === col("sb.sh"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("ninter"))
    inter
      .join(sizes.as("na"), col("doc_a") === col("na.doc_id"))
      .join(sizes.as("nb"), col("doc_b") === col("nb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(col("ninter").cast("double") /
          (col("na.n") + col("nb.n") - col("ninter")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  def minHashLshOracleSql(k: Int = 3, numHashes: Int = 16, bands: Int = 8,
                          threshold: Double = 0.5): String = {
    val rows = numHashes / bands
    val minExprs = (0 until numHashes)
      .map(s => s"min((${seedConst("A", s)} * hm + ${seedConst("B", s)}) % $HashP) AS mh$s")
      .mkString(",\n         ")
    val bandSelects = (0 until bands).map { b =>
      val key = (0 until rows).map(r => s"mh${b * rows + r}::VARCHAR")
        .mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5($key) AS bkey FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH ${shingleTableSql(k)},
       |hashed AS (
       |  SELECT doc_id, sh % $HashP AS hm FROM doc_shingles),
       |sig AS (
       |  SELECT doc_id,
       |         $minExprs
       |  FROM hashed
       |  GROUP BY doc_id),
       |banded AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS n FROM doc_shingles GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS ninter
       |  FROM cand c
       |  JOIN doc_shingles sa ON c.doc_a = sa.doc_id
       |  JOIN doc_shingles sb ON c.doc_b = sb.doc_id AND sa.sh = sb.sh
       |  GROUP BY c.doc_a, c.doc_b)
       |SELECT i.doc_a, i.doc_b,
       |       round(i.ninter::DOUBLE / (na.n + nb.n - i.ninter), 6) AS jaccard
       |FROM inter i
       |JOIN sizes na ON i.doc_a = na.doc_id
       |JOIN sizes nb ON i.doc_b = nb.doc_id
       |WHERE round(i.ninter::DOUBLE / (na.n + nb.n - i.ninter), 6) >= $threshold""".stripMargin
  }

  /** Incremental MinHash-LSH — the daily-refresh pattern for NEAR-dup,
    * the banded sibling of [[incremental]]: a new batch is near-dup-
    * checked against the standing corpus without re-pairing the corpus
    * with itself. Only the BATCH is shingled and banded; the snapshot
    * contributes its (persistable) index relations — the [[bandTable]]
    * band buckets for the probe and the shingle/size tables for the
    * exact-Jaccard verify of surviving candidates. Output is exactly
    * [[minHashLsh]] over snapshot∪batch RESTRICTED to pairs that touch
    * the batch: (doc_a, doc_b, jaccard), doc_a < doc_b.
    *
    * Scale: the probe is an equi join on (band, bkey) between the
    * batch's bands and the index — with the index bucketed by
    * (band, bkey) on disk (the way a production loop stores it), the
    * probe shuffles ONLY the batch side; within-batch pairs self-join
    * the batch bands (tiny). The verify joins candidates against the
    * doc_id-keyed shingle tables — bucketed by doc_id in the stored
    * index, that side co-locates too. Nothing rescans or re-hashes the
    * snapshot text, which is the entire point at a 100-TB standing
    * corpus: per-refresh cost is O(batch + matches), not O(corpus).
    */
  def minHashLshIncremental(snapshot: DataFrame, batch: DataFrame,
                            k: Int = 3, numHashes: Int = 16,
                            bands: Int = 8,
                            threshold: Double = 0.5): DataFrame = {
    val snapSh = shingleTable(snapshot, k).lineageCut
    val batchSh = shingleTable(batch, k).lineageCut
    val snapBands = bandTable(snapSh, numHashes, bands)
    val batchBands = bandTable(batchSh, numHashes, bands)
    val cross = batchBands.as("n")
      .join(snapBands.as("o"),
        col("n.band") === col("o.band") && col("n.bkey") === col("o.bkey"))
      .select(least(col("n.doc_id"), col("o.doc_id")).as("doc_a"),
        greatest(col("n.doc_id"), col("o.doc_id")).as("doc_b"))
    val within = batchBands.as("a")
      .join(batchBands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val cand = cross.union(within).distinct()
    jaccardVerify(cand, snapSh.union(batchSh),
      shingleSizes(snapshot, k).union(shingleSizes(batch, k)), threshold)
  }

  /** Cluster-oriented MinHash-LSH — the scale path for CLUSTERING when
    * near-dup families are large. [[minHashLsh]] lists every qualifying
    * pair, so its candidate volume (and its very output) is Σ C(f,2)
    * over family sizes f — at the 1000× corpus, where mutation families
    * reach ~50 members, the pair listing measured 480 s because the
    * workload itself is family-quadratic. For connected-component
    * clustering the full clique is unnecessary: within each band bucket
    * this variant emits only the doc_id-CHAIN edges (sorted neighbors,
    * m−1 edges per m-doc bucket — a lag window, no self-join), then
    * exact-verifies those. Verified chain edges connect a family into
    * one component whenever consecutive members qualify; the price is
    * recall at the margins (a chain edge that fails the Jaccard verify
    * can split a cluster the full pair set would have joined — the
    * documented trade every production LSH-cluster pipeline makes).
    * Candidate volume: linear in bucket occupancy, so the op stays
    * linear however large the duplicate families grow.
    * Output: (doc_a, doc_b, jaccard) — verified chain edges, a SUBSET
    * of [[minHashLsh]]'s pairs, intended to feed [[components]].
    */
  def minHashLshChain(docs: DataFrame, k: Int = 3, numHashes: Int = 16,
                      bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    val sh = shingleTable(docs, k).lineageCut
    val banded = bandTable(sh, numHashes, bands)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("band", "bkey").orderBy("doc_id")
    val cand = banded
      .withColumn("prev", lag("doc_id", 1).over(w))
      .where(col("prev").isNotNull)
      .select(col("prev").as("doc_a"), col("doc_id").as("doc_b"))
      .distinct()
    jaccardVerify(cand, sh, shingleSizes(docs, k), threshold)
  }

  /** Oracle for [[minHashLshChain]]: the identical lag-window chain. */
  def minHashLshChainOracleSql(k: Int = 3, numHashes: Int = 16,
                               bands: Int = 8,
                               threshold: Double = 0.5): String = {
    val rows = numHashes / bands
    val minExprs = (0 until numHashes)
      .map(s => s"min((${seedConst("A", s)} * hm + ${seedConst("B", s)}) % $HashP) AS mh$s")
      .mkString(",\n         ")
    val bandSelects = (0 until bands).map { b =>
      val key = (0 until rows).map(r => s"mh${b * rows + r}::VARCHAR")
        .mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5($key) AS bkey FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH ${shingleTableSql(k)},
       |hashed AS (
       |  SELECT doc_id, sh % $HashP AS hm FROM doc_shingles),
       |sig AS (
       |  SELECT doc_id,
       |         $minExprs
       |  FROM hashed
       |  GROUP BY doc_id),
       |banded AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT prev AS doc_a, doc_id AS doc_b
       |  FROM (
       |    SELECT doc_id, band, bkey,
       |           lag(doc_id) OVER (PARTITION BY band, bkey
       |                             ORDER BY doc_id) AS prev
       |    FROM banded) AS ch
       |  WHERE prev IS NOT NULL),
       |sizes AS (SELECT doc_id, count(*) AS n FROM doc_shingles GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS ninter
       |  FROM cand c
       |  JOIN doc_shingles sa ON c.doc_a = sa.doc_id
       |  JOIN doc_shingles sb ON c.doc_b = sb.doc_id AND sa.sh = sb.sh
       |  GROUP BY c.doc_a, c.doc_b)
       |SELECT i.doc_a, i.doc_b,
       |       round(i.ninter::DOUBLE / (na.n + nb.n - i.ninter), 6) AS jaccard
       |FROM inter i
       |JOIN sizes na ON i.doc_a = na.doc_id
       |JOIN sizes nb ON i.doc_b = nb.doc_id
       |WHERE round(i.ninter::DOUBLE / (na.n + nb.n - i.ninter), 6) >= $threshold""".stripMargin
  }

  /** Oracle over the doc_id-parity split (even = snapshot, odd = batch,
    * as [[incrementalOracleSql]]): the full banded pair set minus
    * snapshot-internal pairs.
    */
  def minHashLshIncrementalOracleSql(k: Int = 3, numHashes: Int = 16,
                                     bands: Int = 8,
                                     threshold: Double = 0.5): String = {
    val rows = numHashes / bands
    val minExprs = (0 until numHashes)
      .map(s => s"min((${seedConst("A", s)} * hm + ${seedConst("B", s)}) % $HashP) AS mh$s")
      .mkString(",\n         ")
    val bandSelects = (0 until bands).map { b =>
      val key = (0 until rows).map(r => s"mh${b * rows + r}::VARCHAR")
        .mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5($key) AS bkey FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH ${shingleTableSql(k)},
       |hashed AS (
       |  SELECT doc_id, sh % $HashP AS hm FROM doc_shingles),
       |sig AS (
       |  SELECT doc_id,
       |         $minExprs
       |  FROM hashed
       |  GROUP BY doc_id),
       |banded AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |  WHERE NOT (((a.doc_id % 2) + 2) % 2 = 0
       |             AND ((b.doc_id % 2) + 2) % 2 = 0)),
       |sizes AS (SELECT doc_id, count(*) AS n FROM doc_shingles GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS ninter
       |  FROM cand c
       |  JOIN doc_shingles sa ON c.doc_a = sa.doc_id
       |  JOIN doc_shingles sb ON c.doc_b = sb.doc_id AND sa.sh = sb.sh
       |  GROUP BY c.doc_a, c.doc_b)
       |SELECT i.doc_a, i.doc_b,
       |       round(i.ninter::DOUBLE / (na.n + nb.n - i.ninter), 6) AS jaccard
       |FROM inter i
       |JOIN sizes na ON i.doc_a = na.doc_id
       |JOIN sizes nb ON i.doc_b = nb.doc_id
       |WHERE round(i.ninter::DOUBLE / (na.n + nb.n - i.ninter), 6) >= $threshold""".stripMargin
  }

  /** Band-recall of MinHash-LSH against the exact-index pair set — the
    * dedup twin of [[graft.ml.Similarity.lshRecall]]: both operands
    * exact-verify their candidates at the same Jaccard threshold, so the
    * metric isolates exactly what the LSH BANDS miss (the knob a
    * deployment tunes: more bands → higher recall, more candidates).
    * One row: (n_exact, n_lsh, n_both, recall), integer counts so the
    * compare is accumulation-order independent; recall 6 dp.
    */
  def lshRecall(docs: DataFrame, k: Int = 3, threshold: Double = 0.5): DataFrame = {
    // ONE shingle scan feeds both operands (the per-operator checkpoints
    // would otherwise each re-run scan→explode→md5→distinct)
    val shBase = shingleTable(docs, k).lineageCut
    val sizes = shingleSizes(docs, k)
    val e = ngramJaccardFrom(shBase, sizes, threshold, maxDf = 1000)
      .select("doc_a", "doc_b").withColumn("in_e", lit(1))
    val l = minHashLshFrom(shBase, sizes, numHashes = 16, bands = 8,
        threshold = threshold)
      .select("doc_a", "doc_b").withColumn("in_l", lit(1))
    e.join(l, Seq("doc_a", "doc_b"), "full_outer")
      .agg(count(col("in_e")).as("n_exact"), count(col("in_l")).as("n_lsh"),
        count(when(col("in_e").isNotNull && col("in_l").isNotNull, 1))
          .as("n_both"))
      .select(col("n_exact"), col("n_lsh"), col("n_both"),
        when(col("n_exact") > 0,
          round(col("n_both").cast("double") / col("n_exact").cast("double"), 6))
          .as("recall"))
  }

  def lshRecallOracleSql(k: Int = 3, threshold: Double = 0.5): String =
    s"""WITH e AS (
       |  SELECT doc_a, doc_b FROM (${ngramJaccardOracleSql(k, threshold)})),
       |l AS (
       |  SELECT doc_a, doc_b FROM (${minHashLshOracleSql(k, threshold = threshold)})),
       |j AS (
       |  SELECT e.doc_a IS NOT NULL AS in_e, l.doc_a IS NOT NULL AS in_l
       |  FROM e FULL OUTER JOIN l
       |    ON e.doc_a = l.doc_a AND e.doc_b = l.doc_b),
       |c AS (
       |  SELECT count(*) FILTER (WHERE in_e)::BIGINT AS n_exact,
       |         count(*) FILTER (WHERE in_l)::BIGINT AS n_lsh,
       |         count(*) FILTER (WHERE in_e AND in_l)::BIGINT AS n_both
       |  FROM j)
       |SELECT n_exact, n_lsh, n_both,
       |       CASE WHEN n_exact > 0
       |            THEN round(n_both::DOUBLE / n_exact::DOUBLE, 6) END AS recall
       |FROM c""".stripMargin

  /** All near-dup pairs by exact n-gram Jaccard >= threshold, candidates
    * from the shared-shingle inverted index.
    *
    * Scale: shingles with document frequency > `maxDf` are excluded from
    * candidate GENERATION (a hot shingle like "of the same" would emit
    * O(df²) pairs); verification is still exact. Pairs whose only shared
    * shingles are hot ones are missed — by definition they share nothing
    * distinctive.
    *
    * The exact intersection is assembled in two parts so no candidate pair
    * is ever re-expanded against the full shingle table: the rare part
    * falls straight out of the candidate-generation join (group the
    * matches by pair), and the hot part joins candidates against the
    * df>maxDf slice only — small per doc by construction (it's the df
    * distribution's head).
    */
  def ngramJaccard(docs: DataFrame, k: Int = 3, threshold: Double = 0.5,
                   maxDf: Int = 1000): DataFrame =
    ngramJaccardFrom(shingleTable(docs, k), shingleSizes(docs, k),
      threshold, maxDf)

  /** [[ngramJaccard]] over a caller-provided shingle table — lets a
    * composition ([[lshRecall]]) share ONE scan→explode→md5→distinct
    * pass across operators instead of re-running it per operand.
    */
  private[ml] def ngramJaccardFrom(shBase: DataFrame, sizes: DataFrame,
                                   threshold: Double, maxDf: Int): DataFrame =
    sharedShingleCounts(shBase, maxDf)
      .join(sizes.as("na"), col("doc_a") === col("na.doc_id"))
      .join(sizes.as("nb"), col("doc_b") === col("nb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(col("ninter").cast("double") /
          (col("na.n") + col("nb.n") - col("ninter")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)

  /** Shared-shingle intersection counts (doc_a, doc_b, ninter) for every
    * pair sharing >= 1 rare shingle — the candidate+count core both
    * [[ngramJaccardFrom]] and [[containment]] project their measure from.
    */
  private[ml] def sharedShingleCounts(shBase: DataFrame, maxDf: Int): DataFrame = {
    // df via hash aggregation + same-key join, NOT a window: both sides
    // partition on shingle (one shuffle, reused), and no per-partition
    // sort — a hot shingle's partition would otherwise sort-spill at
    // corpus scale
    val dfs = shBase.groupBy("sh").agg(count(lit(1)).as("df"))
    // materialize the df-annotated inverted index ONCE: five downstream
    // consumers (rare×2, hot×2, and the candidate re-expansion) would
    // otherwise each re-run the scan→explode→md5→distinct subtree — the
    // query's dominant cost. Spill-safe (MEMORY_AND_DISK blocks); at
    // cluster scale this is the explicit index-materialization step every
    // MinHash/Jaccard pipeline has (cf. the S4 columnar intermediate).
    val sh = shBase.join(dfs, "sh").lineageCut
    val rare = sh.where(col("df") <= maxDf).drop("df")
    val hot = sh.where(col("df") > maxDf).drop("df")

    val interRare = rare.as("sa").join(rare.as("sb"),
        col("sa.sh") === col("sb.sh") &&
          col("sa.doc_id") < col("sb.doc_id"))
      .groupBy(col("sa.doc_id").as("doc_a"), col("sb.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter_rare"))

    val interHot = interRare.select("doc_a", "doc_b")
      .join(hot.as("ha"), col("doc_a") === col("ha.doc_id"))
      .join(hot.as("hb"), col("doc_b") === col("hb.doc_id") &&
        col("ha.sh") === col("hb.sh"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter_hot"))

    interRare
      .join(interHot, Seq("doc_a", "doc_b"), "left")
      .withColumn("ninter", col("inter_rare") + coalesce(col("inter_hot"), lit(0L)))
      .select("doc_a", "doc_b", "ninter")
  }

  /** Containment near-dup: c(A,B) = |S(A)∩S(B)| / min(|S(A)|,|S(B)|) —
    * the asymmetric twin of [[ngramJaccard]]. Catches a document embedded
    * inside a larger one (boilerplate wrapping, quote-with-commentary):
    * a 50-shingle doc inside a 500-shingle doc has jaccard <= 0.1 — LSH
    * band candidates (tuned to Jaccard) never see it — but containment
    * 1.0. Candidates therefore come from the shared-RARE-shingle inverted
    * index ([[sharedShingleCounts]], df-capped), which surfaces any pair
    * with one uncommon shingle in common regardless of size ratio.
    * Output: (doc_a, doc_b, containment, contained_id) — contained_id is
    * the smaller-shingle-set side (doc_a on ties), i.e. the doc a
    * keep-larger dedup policy would drop.
    */
  def containment(docs: DataFrame, k: Int = 3, threshold: Double = 0.6,
                  maxDf: Int = 1000): DataFrame = {
    val sizes = shingleSizes(docs, k)
    sharedShingleCounts(shingleTable(docs, k), maxDf)
      .join(sizes.as("na"), col("doc_a") === col("na.doc_id"))
      .join(sizes.as("nb"), col("doc_b") === col("nb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(col("ninter").cast("double") /
          least(col("na.n"), col("nb.n")), 6).as("containment"),
        when(col("na.n") <= col("nb.n"), col("doc_a"))
          .otherwise(col("doc_b")).as("contained_id"))
      .where(col("containment") >= threshold)
  }

  def containmentOracleSql(k: Int = 3, threshold: Double = 0.6,
                           maxDf: Int = 1000): String =
    s"""WITH ${shingleTableSql(k)},
       |dfs AS (
       |  SELECT doc_id, sh,
       |         count(*) OVER (PARTITION BY sh) AS df
       |  FROM doc_shingles),
       |rare AS (SELECT doc_id, sh FROM dfs WHERE df <= $maxDf),
       |hot AS (SELECT doc_id, sh FROM dfs WHERE df > $maxDf),
       |sizes AS (SELECT doc_id, count(*) AS n FROM doc_shingles GROUP BY doc_id),
       |inter_rare AS (
       |  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, count(*) AS inter_rare
       |  FROM rare sa JOIN rare sb
       |    ON sa.sh = sb.sh AND sa.doc_id < sb.doc_id
       |  GROUP BY sa.doc_id, sb.doc_id),
       |inter_hot AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS inter_hot
       |  FROM inter_rare c
       |  JOIN hot ha ON c.doc_a = ha.doc_id
       |  JOIN hot hb ON c.doc_b = hb.doc_id AND ha.sh = hb.sh
       |  GROUP BY c.doc_a, c.doc_b),
       |inter AS (
       |  SELECT r.doc_a, r.doc_b,
       |         r.inter_rare + coalesce(h.inter_hot, 0) AS ninter
       |  FROM inter_rare r LEFT JOIN inter_hot h
       |    ON r.doc_a = h.doc_a AND r.doc_b = h.doc_b)
       |SELECT i.doc_a, i.doc_b,
       |       round(i.ninter::DOUBLE / least(na.n, nb.n), 6) AS containment,
       |       CASE WHEN na.n <= nb.n THEN i.doc_a ELSE i.doc_b END AS contained_id
       |FROM inter i
       |JOIN sizes na ON i.doc_a = na.doc_id
       |JOIN sizes nb ON i.doc_b = nb.doc_id
       |WHERE round(i.ninter::DOUBLE / least(na.n, nb.n), 6) >= $threshold""".stripMargin

  def ngramJaccardOracleSql(k: Int = 3, threshold: Double = 0.5,
                            maxDf: Int = 1000): String =
    s"""WITH ${shingleTableSql(k)},
       |dfs AS (
       |  SELECT doc_id, sh,
       |         count(*) OVER (PARTITION BY sh) AS df
       |  FROM doc_shingles),
       |rare AS (SELECT doc_id, sh FROM dfs WHERE df <= $maxDf),
       |hot AS (SELECT doc_id, sh FROM dfs WHERE df > $maxDf),
       |sizes AS (SELECT doc_id, count(*) AS n FROM doc_shingles GROUP BY doc_id),
       |inter_rare AS (
       |  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, count(*) AS inter_rare
       |  FROM rare sa JOIN rare sb
       |    ON sa.sh = sb.sh AND sa.doc_id < sb.doc_id
       |  GROUP BY sa.doc_id, sb.doc_id),
       |inter_hot AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS inter_hot
       |  FROM inter_rare c
       |  JOIN hot ha ON c.doc_a = ha.doc_id
       |  JOIN hot hb ON c.doc_b = hb.doc_id AND ha.sh = hb.sh
       |  GROUP BY c.doc_a, c.doc_b),
       |inter AS (
       |  SELECT r.doc_a, r.doc_b,
       |         r.inter_rare + coalesce(h.inter_hot, 0) AS ninter
       |  FROM inter_rare r LEFT JOIN inter_hot h
       |    ON r.doc_a = h.doc_a AND r.doc_b = h.doc_b)
       |SELECT i.doc_a, i.doc_b,
       |       round(i.ninter::DOUBLE / (na.n + nb.n - i.ninter), 6) AS jaccard
       |FROM inter i
       |JOIN sizes na ON i.doc_a = na.doc_id
       |JOIN sizes nb ON i.doc_b = nb.doc_id
       |WHERE round(i.ninter::DOUBLE / (na.n + nb.n - i.ninter), 6) >= $threshold""".stripMargin

  /** 60-bit SimHash over distinct words (the full width of the portable
    * md5-prefix hash); near-dup pairs = hamming <= maxHamming, with
    * candidates pruned by the 15-bit-band pigeonhole: <= 3 bit flips cannot
    * change all 4 bands, so near pairs share >= 1 exact band. 15-bit bands
    * give 32,768 buckets per band — at corpus scale each bucket holds
    * ~n/32768 docs, vs the ~n/256 of byte bands, keeping the within-bucket
    * self-join quadratic-in-tiny-groups only.
    * Output: (doc_a, doc_b, hamming).
    */
  /** Per-document 60-bit SimHash signatures: (doc_id, simhash).
    * Checkpointed — callers fan it out 4× into the band table, which
    * would otherwise re-run the word-explode + 60-column aggregation.
    */
  def simHashSignatures(docs: DataFrame): DataFrame = {
    // hash before the distinct (cf. shingleTable): the distinct shuffles
    // 8-byte keys, and the bit-sum aggregation reads the key directly
    val dw = docs.select(col("doc_id"), explode(words(col("text"))).as("word"))
      .select(col("doc_id"), h64(concat(col("word"), lit("#s"))).as("wh"))
      // partition by doc_id BEFORE the dedupe: hashpartitioning(doc_id)
      // satisfies both the (doc_id, wh) clustering the dedupe needs and
      // the doc_id clustering the bit-sum aggregate needs, so dedupe and
      // the aggregate run in ONE post-shuffle stage whose per-task state
      // is one partition's share of DOCS — and shrinks with the partition
      // knob. The default plan hash-partitioned on (doc_id, wh), which
      // put the 488-byte-wide partial bit-sum aggregate on data where
      // every task saw ~every doc_id: ~2.4 GB of partial-agg state per
      // task at the 1000× corpus — a sealed-executor OOM (stage-traced
      // via event log) that NO partition count could fix, because the
      // state was group-count- not partition-size-proportional.
      .repartition(col("doc_id"))
      // dedupe SORT-based, not hash-based: `.distinct()` here compiles to
      // a hash aggregate whose map holds every (doc_id, wh) PAIR of the
      // partition at once — ~15M pairs/task at the 1000× corpus under
      // default partitioning, and with 8 tasks per sealed 10 GiB executor
      // all hitting peak map size together, the sealed-heap run OOMed in
      // the map's own sort-fallback allocation (stage-traced). A window
      // row_number over (doc_id, wh) is the same dedupe through
      // UnsafeExternalSorter, which spills incrementally — per-task memory
      // is a bounded sort buffer regardless of partition share. Rows in a
      // (doc_id, wh) group are bit-identical, so keeping row_number = 1 is
      // deterministic, and the partitionBy is satisfied by the doc_id
      // hash-partitioning above — still no extra shuffle.
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id", "wh").orderBy("wh")))
      .where(col("rn") === 1).drop("rn")
    // all 60 bit-sums as agg columns of ONE groupBy — exploding a row per
    // (word, bit) would shuffle 60× the word table for the same result
    val bitSums = (0 until 60).map(b =>
      sum(when(expr(s"shiftright(wh, $b) & 1") === 1, 1).otherwise(-1)).as(s"s$b"))
    dw
      .groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 60).map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
      .lineageCut
  }

  /** (doc_id, simhash, b, bkey) — each signature fanned out to its four
    * 15-bit band keys.
    */
  private def simHashBands(sims: DataFrame): DataFrame =
    sims.withColumn("b", explode(lit((0 until 4).toArray)))
      .withColumn("bkey", expr("shiftright(simhash, 15 * b) & 32767"))

  def simHash(docs: DataFrame, maxHamming: Int = 3,
              blockSize: Int = 4096): DataFrame = {
    require(maxHamming <= 3, "4-band prefilter is exact only for <= 3")
    require(blockSize > 0, "blockSize must be positive (block index math divides by it)")
    val band = simHashBands(simHashSignatures(docs))
    // The naive band self-join buffers every same-(b,bkey) group inside
    // one join task. Bucket occupancy grows with the corpus (15-bit bands
    // are FIXED width), and a join key cannot be split by raising the
    // partition count — at the 1000× corpus family-dense buckets exceeded
    // a sealed 10 GiB-executor heap at ANY shuffle-partition setting.
    // Fix: block-nested self-join. Each bucket is sliced into blocks of
    // <= blockSize rows ordered by doc_id (row_number), and block pairs
    // (i, j), i <= j are matched through the bounded join key
    // (b, bkey, i, j): the left row of block i fans out to (i, j) for
    // j in [i, nBlocks); the right row of block j fans out to (i, j) for
    // i in [0, j]. Every cross-block pair meets exactly once, and since
    // blocks are doc_id-ordered, i < j implies doc_a < doc_b — the one
    // predicate also dedupes the i == j diagonal. Per-task join state is
    // <= blockSize rows per side REGARDLESS of bucket occupancy; rows in
    // ordinary single-block buckets fan out exactly once per side, so the
    // sf-scale plan (and output — it is the same pair set) is unchanged.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("b", "bkey").orderBy("doc_id")
    val blocked = band
      .withColumn("blk", ((row_number().over(w) - 1) / blockSize).cast("int"))
      .withColumn("nb", ceil(count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("b", "bkey"))
        .cast("double") / blockSize).cast("int"))
    val left = blocked
      .withColumn("j", explode(sequence(col("blk"), col("nb") - 1)))
      .select(col("doc_id"), col("simhash"), col("b"), col("bkey"),
        col("blk").as("i"), col("j"))
    val right = blocked
      .withColumn("i", explode(sequence(lit(0), col("blk"))))
      .select(col("doc_id"), col("simhash"), col("b"), col("bkey"),
        col("i"), col("blk").as("j"))
    left.as("a").join(right.as("b"),
        col("a.b") === col("b.b") && col("a.bkey") === col("b.bkey") &&
          col("a.i") === col("b.i") && col("a.j") === col("b.j") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      // hamming filter BEFORE the distinct: the filter is row-wise, so
      // the result set is identical — but the distinct's hash set then
      // holds only true near-dup pairs, not every band collision. At the
      // 1000× corpus the collision stream is ~10⁹ rows (fixed 15-bit
      // bands ⇒ bucket occupancy grows with n) and materializing it
      // OOM'd a 48g heap; filtered first, it streams through codegen
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  def simHashOracleSql(maxHamming: Int = 3): String = {
    val bitSums = (0 until 60).map(b =>
      s"sum(CASE WHEN (wh >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b")
      .mkString(",\n         ")
    val assemble = (0 until 60).map(b =>
      s"(CASE WHEN s$b > 0 THEN ${1L << b}::BIGINT ELSE 0 END)").mkString(" + ")
    s"""WITH dw AS (
       |  SELECT DISTINCT doc_id, ${h64Sql("word || '#s'")} AS wh
       |  FROM (SELECT doc_id, unnest($wordsSql) AS word FROM documents)),
       |bitsum AS (
       |  SELECT doc_id,
       |         $bitSums
       |  FROM dw
       |  GROUP BY doc_id),
       |sims AS (
       |  SELECT doc_id, $assemble AS simhash
       |  FROM bitsum),
       |band AS (
       |  SELECT doc_id, simhash, b, (simhash >> (15 * b)) & 32767 AS bkey
       |  FROM sims, unnest(range(0, 4)) AS r(b))
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       bit_count(xor(a.simhash, b.simhash)) AS hamming
       |FROM band a JOIN band b
       |  ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxHamming""".stripMargin
  }

  /** Cluster-oriented SimHash — the scale path for CLUSTERING, the exact
    * analogue of [[minHashLshChain]]: within each 15-bit band bucket emit
    * only the doc_id-CHAIN edges (lag window, m−1 edges per m-doc bucket)
    * instead of the C(m,2) pair listing, then keep edges with hamming
    * <= maxHamming. Because every band row carries the full 60-bit
    * signature, verification is a single bit_count on the lagged column —
    * no rejoin at all, so the whole operator is one window over the band
    * table: linear in bucket occupancy however large the duplicate
    * families grow. Verified chain edges connect a family into one
    * component whenever consecutive members qualify; recall at the
    * margins is the same documented trade as the MinHash chain. Output:
    * (doc_a, doc_b, hamming) — a SUBSET of [[simHash]]'s pairs, intended
    * to feed [[components]].
    */
  def simHashChain(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-band prefilter is exact only for <= 3")
    val band = simHashBands(simHashSignatures(docs))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("b", "bkey").orderBy("doc_id")
    band
      .withColumn("prev_id", lag("doc_id", 1).over(w))
      .withColumn("prev_sim", lag("simhash", 1).over(w))
      .where(col("prev_id").isNotNull)
      .select(col("prev_id").as("doc_a"), col("doc_id").as("doc_b"),
        expr("bit_count(prev_sim ^ simhash)").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Oracle for [[simHashChain]]: the identical lag-window chain. */
  def simHashChainOracleSql(maxHamming: Int = 3): String = {
    val bitSums = (0 until 60).map(b =>
      s"sum(CASE WHEN (wh >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b")
      .mkString(",\n         ")
    val assemble = (0 until 60).map(b =>
      s"(CASE WHEN s$b > 0 THEN ${1L << b}::BIGINT ELSE 0 END)").mkString(" + ")
    s"""WITH dw AS (
       |  SELECT DISTINCT doc_id, ${h64Sql("word || '#s'")} AS wh
       |  FROM (SELECT doc_id, unnest($wordsSql) AS word FROM documents)),
       |bitsum AS (
       |  SELECT doc_id,
       |         $bitSums
       |  FROM dw
       |  GROUP BY doc_id),
       |sims AS (
       |  SELECT doc_id, $assemble AS simhash
       |  FROM bitsum),
       |band AS (
       |  SELECT doc_id, simhash, b, (simhash >> (15 * b)) & 32767 AS bkey
       |  FROM sims, unnest(range(0, 4)) AS r(b)),
       |chain AS (
       |  SELECT lag(doc_id) OVER (PARTITION BY b, bkey ORDER BY doc_id) AS doc_a,
       |         lag(simhash) OVER (PARTITION BY b, bkey ORDER BY doc_id) AS sim_a,
       |         doc_id AS doc_b, simhash AS sim_b
       |  FROM band)
       |SELECT DISTINCT doc_a, doc_b,
       |       bit_count(xor(sim_a, sim_b)) AS hamming
       |FROM chain
       |WHERE doc_a IS NOT NULL
       |  AND bit_count(xor(sim_a, sim_b)) <= $maxHamming""".stripMargin
  }

  /** Edit-distance near-dup pairs: candidates from the SimHash band
    * prefilter (tail edits barely move a word-level SimHash), verified
    * with exact character Levenshtein ≤ `maxDist`. Output:
    * (doc_a, doc_b, edit_dist) — the classic small-edit dedup family
    * (ads/spam variants, OCR rescans) that Jaccard misses when the edit
    * splits a shingle.
    *
    * Scale: candidate volume is the banded SimHash join's (tiny bucket
    * groups), and the O(len²) Levenshtein kernel runs per CANDIDATE
    * only — never all pairs. Both engines compute unit-cost Levenshtein
    * natively, so the verdict is integer-exact.
    */
  def editDistance(docs: DataFrame, maxDist: Int = 8,
                   simHashHamming: Int = 3): DataFrame = {
    val cand = simHash(docs, simHashHamming).select("doc_a", "doc_b")
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("text").as("ta")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("text").as("tb")), "doc_b")
      // result-equivalent prefilters that keep the kernel off hopeless
      // pairs: dist ≤ maxDist implies |len(a) − len(b)| ≤ maxDist; and
      // the THRESHOLD Levenshtein variant runs the banded O(len·maxDist)
      // algorithm (returning −1 over budget) instead of the full
      // O(len²) table — on KB-scale docs that is a ~len/maxDist speedup
      .where(abs(length(col("ta")) - length(col("tb"))) <= maxDist)
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("ta"), col("tb"), maxDist + 1).cast("long")
          .as("edit_dist"))
      .where(col("edit_dist") >= 0 && col("edit_dist") <= maxDist)
  }

  def editDistanceOracleSql(maxDist: Int = 8, simHashHamming: Int = 3): String =
    s"""WITH cand AS (${simHashOracleSql(simHashHamming)})
       |SELECT c.doc_a, c.doc_b,
       |       levenshtein(a.text, b.text)::BIGINT AS edit_dist
       |FROM cand c
       |JOIN documents a ON c.doc_a = a.doc_id
       |JOIN documents b ON c.doc_b = b.doc_id
       |WHERE levenshtein(a.text, b.text) <= $maxDist""".stripMargin

  /** Per-document duplicated-n-gram coverage — the span-level dedup
    * signal (cf. Lee et al. 2022's substring dedup): for every document,
    * the fraction of its distinct word-`k`-grams that also occur in at
    * least one OTHER document. A high fraction means the doc is largely
    * assembled from corpus-repeated spans even when no whole-document
    * near-dup pair exists (the case pairwise Jaccard misses). Output:
    * (doc_id, n_shingles, n_dup, dup_frac) for EVERY document; short docs
    * (< k words) report zero shingles.
    *
    * Scale: one shingle-keyed aggregation for document frequency — the
    * same shuffle key the inverted index uses — rejoined to the
    * (doc, shingle) table, then a doc-keyed rollup. No pair
    * materialization at all: cost is linear in the shingle table, so this
    * runs where the O(pairs) operators need candidate pruning.
    */
  def ngramCoverage(docs: DataFrame, k: Int = 8): DataFrame = {
    // the shingle table keys on the 60-bit hash already — the df shuffle
    // carries 8 bytes per key instead of ~k words of text
    val hashed = shingleTable(docs, k)
    val dfs = hashed.groupBy("sh").agg(count(lit(1)).as("df"))
    val per = hashed.join(dfs, "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
    docs.select("doc_id").join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        round(when(coalesce(col("n_shingles"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("n_dup").cast("double") / col("n_shingles")), 6)
          .as("dup_frac"))
  }

  def ngramCoverageOracleSql(k: Int = 8): String =
    s"""WITH ${shingleTableSql(k)},
       |dfs AS (SELECT sh, count(*) AS df FROM doc_shingles GROUP BY sh),
       |per AS (
       |  SELECT h.doc_id, count(*)::BIGINT AS n_shingles,
       |         sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup
       |  FROM doc_shingles h JOIN dfs d ON h.sh = d.sh
       |  GROUP BY h.doc_id)
       |SELECT d.doc_id,
       |       coalesce(p.n_shingles, 0)::BIGINT AS n_shingles,
       |       coalesce(p.n_dup, 0)::BIGINT AS n_dup,
       |       round(CASE WHEN coalesce(p.n_shingles, 0) = 0 THEN 0.0
       |             ELSE p.n_dup::DOUBLE / p.n_shingles END, 6) AS dup_frac
       |FROM documents d LEFT JOIN per p USING (doc_id)""".stripMargin

  /** Token-level duplicated-SPAN coverage — the Lee-et-al-style span
    * dedup signal at token granularity: for each document, the fraction
    * of token positions lying inside at least one word-`k`-gram that
    * also occurs in ≥ 2 distinct documents. Where [[ngramCoverage]]
    * counts duplicated shingles, this measures how much of the TEXT the
    * duplicated spans actually cover (the quantity a span-removal pass
    * would delete). Output: (doc_id, n_tokens, n_covered, covered_frac).
    *
    * The union length of the fixed-length spans is computed with a
    * lead() interval merge over each doc's sorted duplicate-span starts
    * — contribution of start s = min(next_start − s, k), last = k —
    * instead of exploding k positions per span: exact, one window over
    * the (small) duplicate-start relation, linear everywhere else.
    */
  def spanCoverage(docs: DataFrame, k: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pos = docs.select(col("doc_id"), words(col("text")).as("w"))
      .select(col("doc_id"), posexplode(shingles(col("w"), k)).as(Seq("p", "s")))
      .select(col("doc_id"), col("p").cast("long").as("p"), h64(col("s")).as("sh"))
    val dup = pos.groupBy("sh")
      .agg(count_distinct(col("doc_id")).as("ndocs"))
      .where(col("ndocs") >= 2).select("sh")
    val w = Window.partitionBy("doc_id").orderBy("p")
    val covered = pos.join(dup, "sh")
      .select(col("doc_id"), col("p")).distinct()
      .withColumn("contrib",
        least(coalesce(lead(col("p"), 1).over(w) - col("p"), lit(k.toLong)),
          lit(k.toLong)))
      .groupBy("doc_id").agg(sum("contrib").as("n_covered"))
    docs.select(col("doc_id"),
        size(words(col("text"))).cast("long").as("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"),
        round(coalesce(col("n_covered"), lit(0L)).cast("double")
          / col("n_tokens"), 6).as("covered_frac"))
  }

  def spanCoverageOracleSql(k: Int = 8): String =
    s"""WITH dw AS (SELECT doc_id, $wordsSql AS w FROM documents),
       |pos AS (
       |  SELECT doc_id, i - 1 AS p, ${h64Sql("s")} AS sh
       |  FROM (SELECT doc_id, unnest(${shinglesSql(k)}) AS s,
       |               generate_subscripts(${shinglesSql(k)}, 1) AS i
       |        FROM dw)),
       |dup AS (
       |  SELECT sh FROM pos GROUP BY sh HAVING count(DISTINCT doc_id) >= 2),
       |starts AS (
       |  SELECT DISTINCT doc_id, p FROM pos SEMI JOIN dup ON pos.sh = dup.sh),
       |contribs AS (
       |  SELECT doc_id,
       |         least(coalesce(lead(p) OVER (PARTITION BY doc_id ORDER BY p) - p,
       |                        $k), $k) AS contrib
       |  FROM starts),
       |cov AS (
       |  SELECT doc_id, sum(contrib)::BIGINT AS n_covered
       |  FROM contribs GROUP BY doc_id)
       |SELECT d.doc_id, len($wordsSql)::BIGINT AS n_tokens,
       |       coalesce(c.n_covered, 0)::BIGINT AS n_covered,
       |       round(coalesce(c.n_covered, 0)::DOUBLE
       |             / len($wordsSql), 6) AS covered_frac
       |FROM documents d LEFT JOIN cov c USING (doc_id)""".stripMargin

  /** Duplicated-span REMOVAL — the transform whose cost [[spanCoverage]]
    * measures: rewrite every document with the tokens covered by a
    * cross-document duplicate `k`-gram deleted (Lee et al. 2022's
    * substring dedup, at word granularity). Output: (doc_id, n_tokens,
    * n_kept, clean_text); a fully-duplicated doc keeps an empty string.
    *
    * Coverage is decided per TOKEN without exploding k positions per
    * span: duplicate-span starts are merged into the token stream and a
    * running max over the ordered union gives each token the latest
    * start at-or-before it — covered iff that start is within k. One
    * doc-partitioned window over tokens+starts, one bounded-by-doc-length
    * ordered collect to reassemble text; everything else is the same
    * linear shingle machinery as spanCoverage.
    */
  def removeSpans(docs: DataFrame, k: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dw = docs.select(col("doc_id"), words(col("text")).as("w"))
    val pos = dw
      .select(col("doc_id"), posexplode(shingles(col("w"), k)).as(Seq("p", "s")))
      .select(col("doc_id"), col("p").cast("long").as("p"), h64(col("s")).as("sh"))
    val dup = pos.groupBy("sh")
      .agg(count_distinct(col("doc_id")).as("ndocs"))
      .where(col("ndocs") >= 2).select("sh")
    val starts = pos.join(dup, "sh").select(col("doc_id"), col("p")).distinct()
    val toks = dw
      .select(col("doc_id"), posexplode(col("w")).as(Seq("t", "word")))
      .select(col("doc_id"), col("t").cast("long").as("pos"), col("word"))
    // ordered union: start rows sort BEFORE token rows at the same
    // position (a span starting at s covers the token at s)
    val ev = toks.withColumn("sa", lit(null).cast("long"))
      .unionByName(starts.select(col("doc_id"), col("p").as("pos"),
        lit(null).cast("string").as("word"), col("p").as("sa")))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("pos"), col("sa").isNull)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kept = ev.withColumn("last_s", max("sa").over(w))
      .where(col("word").isNotNull &&
        (col("last_s").isNull || col("last_s") <= col("pos") - k))
    val rebuilt = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("word")))),
          x => x.getField("word"))).as("clean_text"))
    docs.select(col("doc_id"),
        size(words(col("text"))).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  def removeSpansOracleSql(k: Int = 8): String =
    s"""WITH dw AS (SELECT doc_id, $wordsSql AS w FROM documents),
       |pos AS (
       |  SELECT doc_id, i - 1 AS p, ${h64Sql("s")} AS sh
       |  FROM (SELECT doc_id, unnest(${shinglesSql(k)}) AS s,
       |               generate_subscripts(${shinglesSql(k)}, 1) AS i
       |        FROM dw)),
       |dup AS (
       |  SELECT sh FROM pos GROUP BY sh HAVING count(DISTINCT doc_id) >= 2),
       |starts AS (
       |  SELECT DISTINCT doc_id, p FROM pos SEMI JOIN dup ON pos.sh = dup.sh),
       |toks AS (
       |  SELECT doc_id, i - 1 AS pos, w[i] AS word
       |  FROM (SELECT doc_id, w, generate_subscripts(w, 1) AS i FROM dw)),
       |ev AS (
       |  SELECT doc_id, pos, word, NULL::BIGINT AS sa FROM toks
       |  UNION ALL
       |  SELECT doc_id, p, NULL, p FROM starts),
       |m AS (
       |  SELECT doc_id, pos, word,
       |         max(sa) OVER (PARTITION BY doc_id
       |                       ORDER BY pos, (sa IS NULL)
       |                       ROWS UNBOUNDED PRECEDING) AS last_s
       |  FROM ev),
       |kept AS (
       |  SELECT doc_id, pos, word FROM m
       |  WHERE word IS NOT NULL AND (last_s IS NULL OR last_s <= pos - $k)),
       |rebuilt AS (
       |  SELECT doc_id, count(*)::BIGINT AS n_kept,
       |         string_agg(word, ' ' ORDER BY pos) AS clean_text
       |  FROM kept GROUP BY doc_id)
       |SELECT d.doc_id, len($wordsSql)::BIGINT AS n_tokens,
       |       coalesce(r.n_kept, 0)::BIGINT AS n_kept,
       |       coalesce(r.clean_text, '') AS clean_text
       |FROM documents d LEFT JOIN rebuilt r USING (doc_id)""".stripMargin

  /** Connected components over a near-dup pair graph → cluster
    * assignment: every document labeled with the min doc_id reachable
    * through pair edges (its cluster id); docs in no pair are their own
    * cluster. The keep-list of a dedup pass is `is_keeper = true`.
    *
    * Distribution: iterative min-label propagation — each round is one
    * groupBy over the (undirected) edge list joined back to labels, state
    * lives entirely in DataFrames, and the loop stops when a round
    * changes nothing (checked with one count per round) or at `maxIter`.
    * Rounds needed = graph diameter; near-dup clusters are shallow (stars
    * around a template), so convergence is fast in practice. The result
    * is iteration-order independent (min is idempotent/commutative), so
    * it equals the oracle's recursive-CTE fixpoint exactly.
    */
  def components(docs: DataFrame, pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // materialize the edge list once — every propagation round reuses it,
    // and without this the (expensive) pair-generation plan would
    // re-execute per round
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .lineageCut
    // iterate ONLY over vertices that appear in an edge: un-paired docs
    // are their own cluster by definition and must not ride through every
    // propagation round (at corpus scale near-dup pairs touch a small
    // fraction of docs; shuffling the full label table per round would
    // dominate). They rejoin via the final left join below. The initial
    // label is already min(self, neighbors) — the same aggregation the
    // vertex-set distinct would shuffle anyway, pre-applying round 1's
    // one-hop step so star graphs (the common near-dup shape) converge
    // one full round earlier.
    var labels = edges.groupBy(col("src").as("doc_id"))
      .agg(min("dst").as("nmin"))
      .select(col("doc_id"),
        least(col("doc_id"), col("nmin")).as("cluster_id"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val viaNeighbors = edges
        .join(labels, col("dst") === col("doc_id"))
        .groupBy(col("src").as("doc_id"))
        .agg(min("cluster_id").as("nmin"))
      val hop = labels.join(viaNeighbors, Seq("doc_id"), "left")
        .select(col("doc_id"), col("cluster_id").as("old"),
          least(col("cluster_id"), coalesce(col("nmin"), col("cluster_id")))
            .as("cluster_id"))
      // pointer doubling: label ← label(label). With the one-hop step
      // above this converges in O(log diameter) rounds, so maxIter = 20
      // covers any realistic component (2^20-deep chains), instead of the
      // one-hop-per-round O(diameter) that silently truncates long chains.
      // The previous label rides along as `old`, so the convergence check
      // is a flag scan of the checkpointed result — no second join/shuffle
      // per round.
      val newLabel = least(col("cluster_id"), coalesce(col("cc"), col("cluster_id")))
      val next = hop.as("h")
        .join(hop.select(col("doc_id").as("cluster_id"),
          col("cluster_id").as("cc")).as("h2"), Seq("cluster_id"), "left")
        .select(col("doc_id"), newLabel.as("cluster_id"),
          (newLabel =!= col("old")).as("chg"))
        .lineageCut // truncate the growing iterative lineage
      val changed = next.where(col("chg")).limit(1).count()
      labels = next.select("doc_id", "cluster_id")
      converged = changed == 0
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"components did not converge in $maxIter rounds — raise maxIter")
    docs.select("doc_id").join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .withColumn("is_keeper", col("doc_id") === col("cluster_id"))
  }

  /** DuckDB oracle: min reachable id via a recursive reachability CTE
    * (fine at oracle scale; the engine iterates instead).
    */
  def componentsOracleSql(pairsSql: String): String =
    s"""WITH RECURSIVE pairs AS ($pairsSql),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach AS (
       |  SELECT doc_id AS id, doc_id AS r FROM documents
       |  UNION
       |  SELECT reach.id, e.dst AS r
       |  FROM reach JOIN edges e ON reach.r = e.src),
       |labels AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id)
       |SELECT doc_id, cluster_id, doc_id = cluster_id AS is_keeper
       |FROM labels""".stripMargin

  /** Quality-aware keeper selection: instead of [[components]]' min-id
    * keeper, keep the HIGHEST-QUALITY document of each near-dup cluster
    * (the standard curation policy — dropping duplicates should not drop
    * the best-written copy). Ties break on doc_id, so the choice is
    * deterministic. Output: (doc_id, cluster_id, quality_score, is_best).
    *
    * Distribution: clusters come from the linear chain-edge path
    * ([[minHashLshChain]] → [[components]]); quality is a single scan
    * joined on doc_id; keeper election is ONE window shuffle on
    * cluster_id with per-row state — no per-cluster collect, no driver
    * work, state ∝ partition size regardless of cluster count or corpus
    * size.
    */
  def keepBest(docs: DataFrame, pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clusters = components(docs, pairs).select("doc_id", "cluster_id")
    val quality = TextStats.quality(docs).select("doc_id", "quality_score")
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("quality_score").desc, col("doc_id"))
    clusters.join(quality, "doc_id")
      .withColumn("is_best", row_number().over(w) === 1)
      .select("doc_id", "cluster_id", "quality_score", "is_best")
  }

  /** DuckDB oracle: the recursive-CTE clusters joined to the quality
    * oracle, keeper elected with the same (score desc, doc_id) window.
    */
  def keepBestOracleSql(pairsSql: String): String =
    s"""WITH comp AS (${componentsOracleSql(pairsSql)}),
       |q AS (${TextStats.qualityOracleSql}),
       |r AS (
       |  SELECT c.doc_id, c.cluster_id, q.quality_score,
       |         row_number() OVER (PARTITION BY c.cluster_id
       |                            ORDER BY q.quality_score DESC, c.doc_id) AS rk
       |  FROM comp c JOIN q ON c.doc_id = q.doc_id)
       |SELECT doc_id, cluster_id, quality_score, rk = 1 AS is_best
       |FROM r""".stripMargin

  // Spark's encoder codegen needs public access
  final case class VecBlock(bid: Int, ids: Array[Long], flat: Array[Double],
                            norms: Array[Double])
  final case class RawPair(vec_a: Long, vec_b: Long, cos_raw: Double)

  /** Embedding near-dup pairs: cosine >= threshold, computed in double
    * with a left-to-right sum on both engines, rounded to 6 dp before the
    * threshold. All-pairs here (exact baseline, O(n²) by definition);
    * [[Similarity.lshTopK]] is the candidate-pruned scale path.
    *
    * Physical design — distributed block nested loop: vectors are packed
    * into `nBlocks` primitive-array blocks (one shuffle), the tiny block
    * relation is cross-joined with itself on bid_a <= bid_b, and each of
    * the ~nBlocks²/2 tasks runs a fused while-loop kernel over its pair of
    * blocks. No driver-side collection, no per-pair array allocation or
    * boxing — a row-level pair join evaluating aggregate/zip_with (or a
    * boxing UDF) on n²/2 rows is 10-30× slower. The kernel emits raw
    * cosines with a half-ulp margin; the exact 6-dp round + threshold is
    * applied as column expressions so the filter matches the oracle
    * bit-for-bit.
    */
  def embeddingCosine(emb: DataFrame, threshold: Double,
                      nBlocks: Int = 32): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val blocks = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .as[(Long, Array[Double])]
      .groupByKey { case (id, _) => (id % nBlocks).toInt }
      .mapGroups { (bid, it) =>
        val rows = it.toArray.sortBy(_._1)
        val dim = if (rows.isEmpty) 0 else rows(0)._2.length
        val flat = new Array[Double](rows.length * dim)
        val norms = new Array[Double](rows.length)
        var i = 0
        while (i < rows.length) {
          System.arraycopy(rows(i)._2, 0, flat, i * dim, dim)
          var s = 0.0
          var d = 0
          while (d < dim) { val x = rows(i)._2(d); s += x * x; d += 1 }
          norms(i) = math.sqrt(s)
          i += 1
        }
        VecBlock(bid, rows.map(_._1), flat, norms)
      }
    val margin = threshold - 5.1e-7 // keep pairs that 6-dp-round up to threshold
    val pairs = blocks.as("bl").joinWith(blocks.as("br"),
        col("bl.bid") <= col("br.bid"), "inner")
      .flatMap { case (a, b) =>
        val dim = if (a.ids.length > 0 && a.flat.length > 0) a.flat.length / a.ids.length else 0
        val out = scala.collection.mutable.ArrayBuffer.empty[RawPair]
        val sameBlock = a.bid == b.bid
        var i = 0
        while (i < a.ids.length) {
          var j = 0
          while (j < b.ids.length) {
            val ia = a.ids(i)
            val jb = b.ids(j)
            // same block: each unordered pair once via id order; distinct
            // blocks: every (i, j) combination is already unique — emit
            // with ids ordered (products commute, so the cosine is
            // bit-identical either way)
            if (if (sameBlock) ia < jb else ia != jb) {
              var s = 0.0
              var d = 0
              val oi = i * dim
              val oj = j * dim
              while (d < dim) { s += a.flat(oi + d) * b.flat(oj + d); d += 1 }
              // zero-vector convention: cosine 0, never NaN (swept in
              // round 9 — see Similarity.safeCosine)
              val nn = a.norms(i) * b.norms(j)
              val c = if (nn == 0) 0.0 else s / nn
              if (c >= margin)
                out += RawPair(math.min(ia, jb), math.max(ia, jb), c)
            }
            j += 1
          }
          i += 1
        }
        out
      }
    pairs.toDF()
      .select(col("vec_a"), col("vec_b"), round(col("cos_raw"), 6).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  def embeddingCosineOracleSql(threshold: Double): String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
       |  FROM embeddings)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |       round(CASE WHEN a.norm * b.norm = 0 THEN 0.0
       |             ELSE list_dot_product(a.v, b.v) / (a.norm * b.norm) END, 6) AS cosine
       |FROM e a JOIN e b ON a.vec_id < b.vec_id
       |WHERE round(CASE WHEN a.norm * b.norm = 0 THEN 0.0
       |            ELSE list_dot_product(a.v, b.v) / (a.norm * b.norm) END, 6) >= $threshold""".stripMargin
}
