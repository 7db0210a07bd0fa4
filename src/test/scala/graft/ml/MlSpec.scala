package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unit coverage for the dedup / similarity / text-analysis operators on
  * hand-built micro-corpora (the sf-scale oracle check is the driver's t2
  * gate; these pin the local semantics).
  */
class MlSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("exact dedup groups identical texts under min doc_id") {
    val out = Dedup.exact(docs(1L -> "a b c", 2L -> "a b c", 3L -> "x y z"))
      .collect().map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_copies")))
      .toSet
    assert(out === Set((1L, 2L), (3L, 1L)))
  }

  test("shingles: word 3-grams, empty under k") {
    val sh = docs(1L -> "a b c d", 2L -> "a b")
      .select($"doc_id", Portable.shingles(Portable.words($"text"), 3).as("s"))
      .collect().map(r => r.getAs[Long](0) -> r.getSeq[String](1)).toMap
    assert(sh(1L) === Seq("a b c", "b c d"))
    assert(sh(2L) === Seq.empty)
  }

  test("ngramJaccard finds the one near-dup pair and dfCap prunes hot shingles") {
    val d = docs(
      1L -> "the quick brown fox jumps over dogs",
      2L -> "the quick brown fox jumps over cats",
      3L -> "completely different words entirely here now")
    val pairs = Dedup.ngramJaccard(d, k = 3, threshold = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
    // with every shared shingle df-capped away, no candidates survive
    val none = Dedup.ngramJaccard(d, k = 3, threshold = 0.3, maxDf = 1)
      .count()
    assert(none === 0L)
  }

  test("chain LSH: subset of the full pair set, still connects a family") {
    // docs 1-4 are one near-dup family (pairwise jaccard high); 5 is far
    val fam = Seq(
      1L -> "the quick brown fox jumps over the lazy dogs daily",
      2L -> "the quick brown fox jumps over the lazy dogs nightly",
      3L -> "the quick brown fox jumps over the lazy dogs weekly",
      4L -> "the quick brown fox jumps over the lazy dogs monthly",
      5L -> "completely different content with other words here now then")
    val d = docs(fam: _*)
    val full = Dedup.minHashLsh(d, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val chain = Dedup.minHashLshChain(d, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(chain.subsetOf(full))
    assert(chain.nonEmpty)
    // the chain must connect {1,2,3,4} into one component: union-find
    // over chain edges reaches a single root for all four
    val parent = scala.collection.mutable.Map((1L to 5L).map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    chain.foreach { case (a, b) => parent(find(a)) = find(b) }
    assert((1L to 4L).map(find).toSet.size === 1)
    assert(find(5L) === 5L)
  }

  test("incremental LSH equals the full pair set restricted to batch-touching pairs") {
    // 1↔2 near-dup crosses the split, 3↔5 is batch-internal, 4↔6 is
    // snapshot-internal and must NOT be re-paired
    val all = docs(
      1L -> "the quick brown fox jumps over dogs",
      2L -> "the quick brown fox jumps over cats",
      3L -> "alpha beta gamma delta epsilon zeta eta",
      4L -> "one two three four five six seven eight",
      5L -> "alpha beta gamma delta epsilon zeta theta",
      6L -> "one two three four five six seven nine",
      7L -> "completely unrelated text with other words")
    val snap = all.where($"doc_id".isin(2L, 4L, 6L))
    val batch = all.where(!$"doc_id".isin(2L, 4L, 6L))
    val full = Dedup.minHashLsh(all, threshold = 0.3)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val inc = Dedup.minHashLshIncremental(snap, batch, threshold = 0.3)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val snapIds = Set(2L, 4L, 6L)
    assert(inc === full.filterNot(p => snapIds(p._1) && snapIds(p._2)))
    assert(full.exists(p => snapIds(p._1) && snapIds(p._2))) // 4↔6 dropped
    assert(inc.map(p => (p._1, p._2)).contains((1L, 2L)))    // cross kept
    assert(inc.map(p => (p._1, p._2)).contains((3L, 5L)))    // within kept
  }

  test("simhash: identical docs at hamming 0; band prefilter keeps them") {
    val d = docs(1L -> "alpha beta gamma", 2L -> "alpha beta gamma",
      3L -> "unrelated totally different tokens")
    val out = Dedup.simHash(d).select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(out.contains((1L, 2L, 0L)))
  }

  test("simhash block-nested join: blockSize 2 equals default on a mega-bucket") {
    // ten identical docs = one 10-member bucket in every band; with
    // blockSize=2 that bucket splits into 5 blocks and the pair set must
    // still be exactly C(10,2) — the block decomposition may not lose or
    // duplicate any pair, including the i==j diagonal
    val fam = (1L to 10L).map(i => i -> "alpha beta gamma delta epsilon") ++
      Seq(11L -> "unrelated totally different tokens here",
        12L -> "alpha beta gamma delta zeta") // near, maybe-in-3-hamming
    val d = docs(fam: _*)
    val big = Dedup.simHash(d).select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    val small = Dedup.simHash(d, blockSize = 2)
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(small === big)
    assert(big.count { case (a, b, h) => a <= 10 && b <= 10 && h == 0 } === 45)
  }

  test("simhash chain: subset of the pair set, still connects a family") {
    val fam = (1L to 6L).map(i => i -> "alpha beta gamma delta epsilon") :+
      (7L -> "unrelated totally different tokens here")
    val d = docs(fam: _*)
    val full = Dedup.simHash(d).select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    val chain = Dedup.simHashChain(d).select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    assert(chain.subsetOf(full))
    assert(chain.nonEmpty)
    val parent = scala.collection.mutable.Map((1L to 7L).map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    chain.foreach { case (a, b) => parent(find(a)) = find(b) }
    assert((1L to 6L).map(find).toSet.size === 1)
    assert(find(7L) === 7L)
  }

  test("plane weights are deterministic and bounded") {
    assert(Similarity.planeWeight(0, 0) === Similarity.planeWeight(0, 0))
    val ws = Similarity.planes(16, 64).flatten
    assert(ws.forall(w => w >= -1000 && w <= 1000))
    assert(ws.distinct.size > 100) // not degenerate
  }

  test("bruteForceTopK ranks by cosine desc with id tiebreak") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.1f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(emb, col("vec_id") === 0, k = 2)
      .orderBy("rank").select("neighbor_id", "rank")
      .as[(Long, Int)].collect()
    assert(top === Array((3L, 1), (1L, 2))) // exact dup first, then near
  }

  test("lshTopK returns a subset of brute-force candidates, exactly ranked") {
    val emb = (0L until 40L).map { i =>
      (i, Array.tabulate(64)(d => math.sin(i * 17.0 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val brute = Similarity.bruteForceTopK(emb, col("vec_id") === 0, k = 40)
      .select($"neighbor_id", $"cosine").as[(Long, Double)].collect().toMap
    val lsh = Similarity.lshTopK(emb, col("vec_id") === 0, k = 5)
      .select($"neighbor_id", $"cosine").as[(Long, Double)].collect()
    assert(lsh.nonEmpty)
    lsh.foreach { case (id, c) => assert(brute(id) === c) } // same scores
  }

  test("components assigns min-id cluster labels, chains converge") {
    val allDocs = (1L to 7L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)) // a 4-chain + a pair
      .toDF("doc_a", "doc_b")
    val out = Dedup.components(allDocs, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(out === Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (4L, 1L, false),
      (5L, 5L, true), (6L, 5L, false), (7L, 7L, true)))
  }

  test("components converges on a deep chain (pointer doubling)") {
    val n = 80 // path graph of diameter 79 — one-hop propagation would
               // need 79 rounds; doubling needs ~log2(79)
    val docsDf = (0L until n.toLong).map(i => (i, "x")).toDF("doc_id", "text")
    val chain = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = Dedup.components(docsDf, chain, maxIter = 12)
      .select("cluster_id").distinct().as[Long].collect()
    assert(out.toSeq === Seq(0L))
  }

  test("components matches an independent union-find on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val n = 30
      val edges = Seq.fill(25)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      // reference union-find
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n).map { i =>
        // min id in component
        val root = find(i)
        (i.toLong, (0 until n).filter(j => find(j) == root).min.toLong)
      }.toSet

      val docsDf = (0L until n.toLong).map(i => (i, "x")).toDF("doc_id", "text")
      val got = Dedup.components(docsDf, edges.toDF("doc_a", "doc_b"))
        .select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet
      assert(got === expected, s"trial $trial edges $edges")
    }
  }

  test("containment flags doc-inside-doc that jaccard misses") {
    // doc 2 = doc 1 verbatim + a long unique tail: every shingle of 1
    // appears in 2 (containment 1.0) but jaccard is small; doc 3 unrelated
    val base = (1 to 12).map(i => s"alpha$i beta$i gamma$i").mkString(" ")
    val tail = (1 to 120).map(i => s"tail$i filler$i").mkString(" ")
    val docsDf = Seq(
      (1L, base), (2L, s"$base $tail"),
      (3L, "completely different content here")).toDF("doc_id", "text")
    val cont = Dedup.containment(docsDf, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(cont.map(c => (c._1, c._2)).toSeq === Seq((1L, 2L)))
    assert(cont.head._3 === 1.0) // every shingle of 1 is in 2
    assert(cont.head._4 === 1L)  // doc 1 is the contained (smaller) side
    // the symmetric measure misses the same pair at the same bar
    val jac = Dedup.ngramJaccard(docsDf, threshold = 0.9).count()
    assert(jac === 0L)
  }

  test("keepBest elects exactly one highest-quality doc per cluster") {
    // cluster {1,2,3}: doc 2 is long + content-heavy (best), 1 and 3 are
    // stopword soup; cluster {4,5}: doc 5 longer than 4; doc 6 singleton
    val good = Seq.fill(60)("analytics").mkString(" ")
    val soup = "the and is of to the and is of to"
    val docsDf = Seq(
      (1L, soup), (2L, good), (3L, soup + " extra"),
      (4L, "short words here"), (5L, Seq.fill(55)("signal").mkString(" ")),
      (6L, "lonely document")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val out = Dedup.keepBest(docsDf, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    // one keeper per cluster
    val keepersByCluster = out.groupBy(_._2).map { case (c, rows) =>
      (c, rows.filter(_._3).map(_._1).toSeq) }
    assert(keepersByCluster === Map(1L -> Seq(2L), 4L -> Seq(5L), 6L -> Seq(6L)))
    // the elected keeper has the cluster-max quality score
    val q = graft.ml.TextStats.quality(docsDf)
      .select($"doc_id", $"quality_score").as[(Long, Double)].collect().toMap
    assert(q(2L) === Seq(1L, 2L, 3L).map(q).max)
    assert(q(5L) === Seq(4L, 5L).map(q).max)
  }

  test("ivfTopK probes nearest cells and scores exactly like brute force") {
    val emb = (0L until 40L).map { i =>
      (i, Array.tabulate(64)(d => math.sin(i * 17.0 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val brute = Similarity.bruteForceTopK(emb, col("vec_id") === 0, k = 40)
      .select($"neighbor_id", $"cosine").as[(Long, Double)].collect().toMap
    val ivf = Similarity.ivfTopK(emb, col("vec_id") === 0, k = 5,
        nCells = 8, nProbe = 3)
      .orderBy("rank")
      .select($"neighbor_id", $"cosine", $"rank").as[(Long, Double, Int)].collect()
    assert(ivf.nonEmpty)
    assert(ivf.map(_._3).toSeq === (1 to ivf.length)) // contiguous ranks
    ivf.foreach { case (id, c, _) => assert(brute(id) === c) } // exact scores
    // cosines are non-increasing in rank
    assert(ivf.map(_._2).toSeq === ivf.map(_._2).sorted.reverse.toSeq)
  }

  test("semanticDedup finds within-cell pairs with exact cosines") {
    // two exact-duplicate vectors (cosine 1.0) plus distinct fillers —
    // the dup pair must land in one cell and surface; cross-checked
    // against the brute-force scorer
    val emb = ((0L until 20L).map { i =>
      (i, Array.tabulate(64)(d => math.sin(i * 17.0 + d).toFloat))
    } :+ (20L, Array.tabulate(64)(d => math.sin(5 * 17.0 + d).toFloat)))
      .toDF("vec_id", "embedding")
    // sin(i·17+d) is near-periodic: (i, i+17) pairs also score ~0.9996,
    // so assert at 0.9999 where only the exact duplicate survives
    val pairs = Similarity.semanticDedup(emb, threshold = 0.9999, nCells = 4)
      .select($"vec_a", $"vec_b", $"cosine").as[(Long, Long, Double)].collect()
    assert(pairs.toSeq === Seq((5L, 20L, 1.0)))
    // ordering invariant: vec_a < vec_b always
    val loose = Similarity.semanticDedup(emb, threshold = 0.0, nCells = 4)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect()
    assert(loose.forall { case (a, b) => a < b })
  }

  test("spanCoverage: interval merge of overlapping duplicate spans") {
    val d = docs(
      1L -> "a b c d e f g h X",  // shares 8-gram [0,8) with doc 2
      2L -> "a b c d e f g h Y",
      3L -> "p q r s t u v w x y", // identical to doc 4: starts 0,1,2 dup
      4L -> "p q r s t u v w x y",
      5L -> "nothing here repeats across documents at all ok")
    val out = Dedup.spanCoverage(d, k = 8)
      .select("doc_id", "n_tokens", "n_covered", "covered_frac")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 9L, 8L, 0.888889))) // one span of 8
    assert(out(2L) === ((2L, 9L, 8L, 0.888889)))
    // overlapping spans 0,1,2 merge to cover all 10 positions, not 24
    assert(out(3L) === ((3L, 10L, 10L, 1.0)))
    assert(out(4L) === ((4L, 10L, 10L, 1.0)))
    assert(out(5L) === ((5L, 8L, 0L, 0.0)))
  }

  test("removeSpans deletes exactly what spanCoverage measures") {
    val d = docs(
      1L -> "a b c d e f g h X",
      2L -> "a b c d e f g h Y",
      3L -> "p q r s t u v w x y",
      4L -> "p q r s t u v w x y",
      5L -> "nothing here repeats across documents at all ok")
    val out = Dedup.removeSpans(d, k = 8)
      .select("doc_id", "n_tokens", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 9L, 1L, "X")))
    assert(out(2L) === ((2L, 9L, 1L, "Y")))
    assert(out(3L) === ((3L, 10L, 0L, ""))) // fully duplicated
    assert(out(4L) === ((4L, 10L, 0L, "")))
    assert(out(5L)._4 === "nothing here repeats across documents at all ok")
    // the invariant tying the transform to the signal: kept = total − covered
    val cov = Dedup.spanCoverage(d, k = 8)
      .select("doc_id", "n_covered").as[(Long, Long)].collect().toMap
    out.values.foreach { case (id, nTok, nKept, _) =>
      assert(nKept == nTok - cov(id), s"doc $id")
    }
  }

  test("ngramCoverage: dup fraction of shared spans, short docs zero") {
    val d = docs(
      1L -> "one two three four five six seven eight nine",   // 2 shingles
      2L -> "one two three four five six seven eight ten",    // shares 1st
      3L -> "totally different words with nothing shared here at all",
      4L -> "short")
    val out = Dedup.ngramCoverage(d, k = 8)
      .select("doc_id", "n_shingles", "n_dup", "dup_frac")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 2L, 1L, 0.5))) // "one..eight" shared with doc 2
    assert(out(2L) === ((2L, 2L, 1L, 0.5)))
    assert(out(3L)._3 === 0L)
    assert(out(4L) === ((4L, 0L, 0L, 0.0))) // < k words
  }

  test("pqCodes: seed vectors self-assign, every vector gets nSub codes") {
    val emb = (0L until 24L).map { i =>
      (i, Array.tabulate(64)(d => math.sin(i * 17.0 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val out = Similarity.pqCodes(emb, nSub = 8, k = 4)
      .select($"vec_id", $"sub", $"code").as[(Long, Long, Long)].collect()
    assert(out.length === 24 * 8)
    // a codebook seed vector is its own nearest codeword in EVERY subspace
    // (d2 = 0 exactly)
    for (seed <- 0L until 4L)
      assert(out.filter(_._1 == seed).forall(_._3 == seed))
    // codes come from the codebook id set only
    assert(out.map(_._3).toSet.subsetOf((0L until 4L).toSet))
  }

  test("misra-gries heavy hitters: guaranteed words surface under any partitioning") {
    // N=100 words, k=3 → guarantee threshold N/(k+1)=25: "hot" (30
    // occurrences) MUST be in the sketch no matter how rows scatter;
    // 70 unique fillers keep the decrement step busy
    val d = ((0 until 30).map(i => (i.toLong, "hot")) ++
      (30 until 100).map(i => (i.toLong, s"w$i")))
      .toDF("doc_id", "text").repartition(7)
    val out = TextStats.heavyHitters(d, k = 3)
      .select("word", "n", "in_sketch").as[(String, Long, Boolean)].collect()
    assert(out.toSeq === Seq(("hot", 30L, true)))
  }

  test("count-min sketch: never underestimates, exact when collision-free") {
    // 3 heavy words (n=40/35/30) + 45 unique fillers, N=150, k=3 →
    // guarantee threshold 150/4=37.5, so only "aa" (40) surfaces
    val d = ((0 until 40).map(i => (i.toLong, "aa")) ++
      (40 until 75).map(i => (i.toLong, "bb")) ++
      (75 until 105).map(i => (i.toLong, "cc")) ++
      (105 until 150).map(i => (i.toLong, s"w$i")))
      .toDF("doc_id", "text").repartition(5)
    val out = TextStats.countMin(d, width = 1024, depth = 4, k = 3)
      .select("word", "n", "est", "err").as[(String, Long, Long, Long)]
      .collect()
    assert(out.map(_._1).toSeq === Seq("aa"))
    val (_, n, est, err) = out.head
    assert(n === 40L)
    assert(err >= 0L && est === n + err) // CMS can only overestimate
    // ε = 2/width bound: with 48 distinct words in 1024 buckets the
    // min-over-4-rows estimate stays within 2N/width (< 1 → exact here)
    assert(err <= 2L * 150L / 1024L)

    // width=1 degenerates every row to the single global cell: est = N
    val deg = TextStats.countMin(d, width = 1, depth = 2, k = 3)
      .select("est").as[Long].collect()
    assert(deg.toSeq === Seq(150L))
  }

  test("pqTrain: trained codebooks never lose to the seed assignment") {
    val emb = (0L until 24L).map { i =>
      (i, Array.tabulate(64)(d => math.sin(i * 17.0 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val seed = Similarity.pqTrain(emb, nSub = 8, nCode = 4, iters = 1)
      .agg(sum("d2")).head().getLong(0)
    val trained = Similarity.pqTrain(emb, nSub = 8, nCode = 4, iters = 3)
      .select($"vec_id", $"sub", $"code", $"d2")
      .as[(Long, Long, Long, Long)].collect()
    // Lloyd never increases total distortion round over round
    assert(trained.map(_._4).sum <= seed)
    // every vector keeps exactly nSub codes, all drawn from the codebook
    assert(trained.length === 24 * 8)
    assert(trained.map(_._3).toSet.subsetOf((0L until 4L).toSet))
    // iters = 1 IS the seed assignment (same argmin pqCodes runs, modulo
    // code ids being seed ranks instead of seed vec_ids)
    val s1 = Similarity.pqTrain(emb, nSub = 8, nCode = 4, iters = 1)
      .select($"vec_id", $"sub", $"code").as[(Long, Long, Long)].collect()
    for (sd <- 0L until 4L)
      assert(s1.filter(_._1 == sd).forall(_._3 == sd), s"seed $sd self-assigns")
  }

  test("ivfPqTopK: exact duplicate of a seed ranks first at ADC zero") {
    // vec 20 duplicates vec 0 (a codebook seed): its PQ codes are 0's
    // self-assignments, so the query-0 lookup gathers distance 0 exactly
    val emb = ((0L until 20L).map { i =>
      (i, Array.tabulate(64)(d => math.sin(i * 17.0 + d).toFloat))
    } :+ (20L, Array.tabulate(64)(d => math.sin(0 * 17.0 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val out = Similarity.ivfPqTopK(emb, col("vec_id") === 0, k = 21,
        nCells = 4, nProbe = 2, nSub = 8, nCode = 4)
      .orderBy("rank")
      .select($"neighbor_id", $"adc_e9", $"rank")
      .as[(Long, Long, Int)].collect()
    assert(out.nonEmpty)
    // the duplicate gathers distance 0 exactly; other vectors whose every
    // code collapses to codeword 0 legitimately tie (ADC quantization),
    // with ties broken on the smaller id
    assert(out.exists(r => r._1 == 20L && r._2 == 0L))
    assert(out.map(_._3).toSeq === (1 to out.length)) // contiguous ranks
    assert(out.map(_._2).toSeq === out.map(_._2).sorted.toSeq) // non-decreasing
  }

  test("ivfPqRerankTopK: full-probe deep shortlist reproduces brute force") {
    // nProbe = nCells means every cell is probed, and rerank >= corpus-1
    // means no candidate is cut by the ADC shortlist — so the exact
    // refine stage must reproduce bruteForceTopK bit for bit. This pins
    // the refine stage's scoring/ranking as genuinely exact; divergence
    // at tighter settings can then only come from shortlist pruning.
    val emb = ((0L until 20L).map { i =>
      (i, Array.tabulate(64)(d => math.sin(i * 17.0 + d).toFloat))
    } :+ (20L, Array.tabulate(64)(d => math.sin(0 * 17.0 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val isQ = col("vec_id") === 0
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"neighbor_id", $"cosine", $"rank")
        .as[(Long, Long, Double, Int)].collect().toSet
    val exact = rows(Similarity.bruteForceTopK(emb, isQ, k = 5))
    val rerank = rows(Similarity.ivfPqRerankTopK(emb, isQ, k = 5,
      rerank = 25, nCells = 4, nProbe = 4, nSub = 8, nCode = 4))
    assert(rerank === exact)
    // the duplicate of the query vector is the exact top neighbor —
    // ADC can only tie it with quantization-collapsed vectors
    // (see the ivfPqTopK test above); the refine stage must not
    assert(rerank.exists(r => r._2 == 20L && r._4 == 1))
  }

  test("ivfPqRerankRecall: refine never loses to the ADC-only ranking") {
    // 120 vectors at default index shapes: quantization misses are
    // repaired by the refine stage, cell misses are not — so rerank
    // recall must sit at or above ADC recall (and within [0, 1]).
    val emb = (0L until 120L).map { i =>
      (i, Array.tabulate(64)(d => math.sin(i * 17.0 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val isQ = pmod(col("vec_id"), lit(50)) === 0
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      df.select($"recall_at_k").as[Double].collect().head
    val adc = recall(Similarity.ivfPqRecall(emb, isQ, k = 10))
    val rr = recall(Similarity.ivfPqRerankRecall(emb, isQ, k = 10))
    assert(rr >= adc, s"rerank recall $rr lost to ADC-only $adc")
    assert(rr >= 0.0 && rr <= 1.0)
  }

  test("vocabSketch: HLL estimate within the rsd contract of exact") {
    // one language, 2000 distinct words spread over docs
    val d = docs((0L until 40L).map(i =>
      i -> ((i * 50) until (i * 50 + 50)).map(j => s"word$j")
        .mkString("the a is of and ", " ", "")): _*)
    val row = TextStats.vocabSketch(d, rsd = 0.02).collect().head
    val approx = row.getAs[Long]("approx_vocab")
    val exact = 2000 + 5 // 2000 unique + the 5 en markers
    assert(math.abs(approx - exact).toDouble / exact < 3 * 0.02,
      s"approx=$approx exact=$exact")
  }

  test("token stats and quality formulas") {
    val d = docs(1L -> "the cat sat on the mat")
    val ts = TextStats.tokenStats(d).collect().head
    assert(ts.getAs[Long]("n_words") === 6L)
    assert(ts.getAs[Long]("sum_word_len") === 17L)
    val q = TextStats.quality(d).collect().head
    // stopwords here: the, on, the → 3/6
    assert(q.getAs[Double]("stop_ratio") === 0.5)
    assert(q.getAs[Double]("quality_score") === 0.06) // (1 - 0.5) * 6/50
  }

  test("language id picks marker-majority language, und on none") {
    val d = docs(
      1L -> "der hund und die katze ist da",
      2L -> "el gato es de los perros",
      3L -> "zzz qqq www")
    val out = TextStats.languageId(d).select("doc_id", "lang_pred")
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "de")
    assert(out(2L) === "es")
    assert(out(3L) === "und")
  }

  test("fingerprint is order-sensitive and stable") {
    val fp = TextStats.fingerprint(docs(1L -> "a b c", 2L -> "c b a", 3L -> "a b c"))
      .select("doc_id", "fingerprint").as[(Long, Long)].collect().toMap
    assert(fp(1L) === fp(3L))
    assert(fp(1L) !== fp(2L))
    assert(fp.values.forall(v => v >= 0 && v < 1000000007L))
  }

  test("editDistance verifies simhash candidates with exact levenshtein") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = Seq(
      1L -> base,
      2L -> base.replace("kappa", "kappo"), // 1 char edit, simhash-close
      3L -> "totally different words entirely here now then") // far
      .toDF("doc_id", "text")
    val out = Dedup.editDistance(d, maxDist = 8)
      .select("doc_a", "doc_b", "edit_dist")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L, 1L)))
  }

  test("charEntropy: hand-computed values, empty doc reports zero") {
    val d = Seq(1L -> "aabb", 2L -> "aaaa", 3L -> "")
      .toDF("doc_id", "text")
    val out = TextStats.charEntropy(d)
      .select("doc_id", "n_chars", "n_distinct", "char_entropy")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // "aabb": ln4 - (2ln2 + 2ln2)/4 = ln2; "aaaa": uniform single char = 0
    assert(out.toSeq === Seq(
      (1L, 4L, 2L, math.round(math.log(2) * 1e6) / 1e6),
      (2L, 4L, 1L, 0.0),
      (3L, 0L, 0L, 0.0)))
  }

  test("saltedJoin equals the plain join on a hot-keyed fixture") {
    val big = (1L to 100L).map(i => (i, i % 3, i.toDouble)) // key 0/1/2, hot
      .toDF("event_id", "k", "v")
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c"), (9L, "never"))
      .toDF("k", "tag")
    val salted = Joins.saltedJoin(big, small, "k", col("event_id"), nSalts = 4)
      .select("event_id", "k", "v", "tag")
    val plain = big.join(small, "k").select("event_id", "k", "v", "tag")
    assert(salted.count() === 100)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the join must actually run on the widened key
    val p = Joins.saltedJoin(big, small, "k", col("event_id"), 4)
      .queryExecution.executedPlan.toString
    assert(p.contains("__salt"), s"salt key absent from join plan:\n$p")
  }

  test("kmeans replays an in-memory Lloyd reference exactly (int-quantized)") {
    val k = 3
    val iters = 3
    // 3 well-separated lobes + ids interleaved so seeds span lobes
    val vecs: Seq[(Long, Array[Float])] = (0L until 30L).map { i =>
      val lobe = (i % 3).toInt
      (i, Array.tabulate(8)(d =>
        (math.sin(lobe * 100.0 + d) * 5 + math.sin(i * 13.0 + d) * 0.3).toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding")

    // reference Lloyd, identical arithmetic
    val scale = vecs.flatMap(_._2.map(x => math.abs(x.toDouble))).max
    val q = vecs.sortBy(_._1).map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 127.0 / scale + 0.5).toLong)
    }
    var cents = q.take(k).map(_._2.clone()).toArray
    def assign(v: Array[Long]): (Int, Long) = {
      var bc = 0; var bd = Long.MaxValue
      cents.zipWithIndex.foreach { case (c, ci) =>
        val d2 = v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
        if (d2 < bd) { bd = d2; bc = ci }
      }
      (bc, bd)
    }
    for (_ <- 1 until iters) {
      val byC = q.groupBy { case (_, v) => assign(v)._1 }
      cents = cents.zipWithIndex.map { case (old, ci) =>
        byC.get(ci) match {
          case Some(members) =>
            Array.tabulate(old.length) { d =>
              val s = members.map(_._2(d)).sum
              math.floor(s.toDouble / members.length.toDouble).toLong
            }
          case None => old
        }
      }
    }
    val expected = q.map { case (id, v) =>
      val (c, d2) = assign(v); (id, c.toLong, d2)
    }.toSet

    val got = Similarity.kmeans(emb, k = k, iters = iters)
      .select("vec_id", "cluster", "dist2").as[(Long, Long, Long)]
      .collect().toSet
    assert(got === expected)
    assert(got.map(_._2).size === k) // all three lobes survive as clusters
  }

  test("oracleParamMaxN pins the exact auto-parameter floor boundary") {
    // Verify refuses auto-param queries above oracleParamMaxN because the
    // auto-scaled index parameters would diverge from the fixed-parameter
    // oracle SQL. That guard is only sound if oracleParamMaxN really IS
    // the largest corpus where every auto parameter equals its floor —
    // this test fails if anyone retunes autoBits/autoCells without moving
    // the constant (both functions are monotone in n, so boundary checks
    // suffice). Registered-query shapes: lshTopK floors at 16/4 = 4
    // bits/band, ivfTopK/ivfPqTopK/semanticDedup at 16 cells.
    val maxN = Similarity.oracleParamMaxN
    assert(Similarity.autoBits(maxN, 4) === 4,
      "autoBits off its floor AT oracleParamMaxN — guard refuses valid runs")
    assert(Similarity.autoCells(maxN, 16) === 16,
      "autoCells off its floor AT oracleParamMaxN — guard refuses valid runs")
    assert(Similarity.autoBits(maxN + 1, 4) > 4 ||
           Similarity.autoCells(maxN + 1, 16) > 16,
      "no parameter diverges just above oracleParamMaxN — the floor moved " +
        "and the Verify guard is stale (would stop refusing invalid runs)")
    // the non-binding constraint's own boundary, as documented: integer
    // division n/5000 first exceeds 16 at n = 85000
    assert(Similarity.autoCells(84999L, 16) === 16)
    assert(Similarity.autoCells(85000L, 16) === 17)
  }

  test("snapshotDrift: planted mean shift on one dimension, smd isolates it") {
    // snapshot A (even ids) centered at origin on dim 1; snapshot B (odd
    // ids) shifted +10 on dim 1 only — spread 0.5 on both dims/snapshots
    val emb = Seq(
      (0L, Array(0.5f, 1.0f)), (2L, Array(-0.5f, 2.0f)),
      (1L, Array(0.5f, 11.0f)), (3L, Array(-0.5f, 12.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.snapshotDrift(emb, pmod(col("vec_id"), lit(2)) === 1)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // dim 0: identical distributions -> delta 0, smd 0
    assert(out(0L) === ((0.0, 0.0, 0.0, 0.0)))
    // dim 1: means 1.5 vs 11.5, var_pop 0.25 both -> smd = 10 / 0.5 = 20
    assert(out(1L) === ((1.5, 11.5, 10.0, 20.0)))
  }

  test("ivfAssignIncremental: batch rows assigned to standing-corpus centroids only") {
    // standing ids 0,1 define the two seed centroids (orthogonal axes);
    // batch ids 100,101 each hug one axis -> assigned to that seed
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (100L, Array(0.9f, 0.1f)), (101L, Array(0.1f, 0.9f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.ivfAssignIncremental(emb, col("vec_id") >= 100L,
        nCells = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(100L -> 0L, 101L -> 1L))
    // only batch rows appear — the standing corpus is never re-assigned
    assert(out.keySet === Set(100L, 101L))
  }

  test("pcaTop: dominant axis recovered with ~all variance explained") {
    import spark.implicits._
    // variance lives on dim 0 (±10 alternating); dim 1 is 1% noise
    val emb = (0 until 8).map { i =>
      (i.toLong, Array((if (i % 2 == 0) 10f else -10f), 0.1f * (i % 3)))
    }.toDF("vec_id", "embedding")
    val out = Similarity.pcaTop(emb)
      .orderBy("i").select("i", "loading", "evr")
      .as[(Long, Double, Double)].collect()
    assert(out.length === 2)
    assert(math.abs(math.abs(out(0)._2) - 1.0) < 1e-3) // unit top component
    assert(math.abs(out(1)._2) < 0.05)
    assert(out(0)._3 > 0.99 && out(0)._3 === out(1)._3) // evr constant per row
  }

  test("pcaTop refuses degenerate corpora instead of emitting NaN") {
    import spark.implicits._
    val zero = (0 until 4).map(i => (i.toLong, Array(0f, 0f)))
      .toDF("vec_id", "embedding")
    val ez = intercept[IllegalArgumentException](Similarity.pcaTop(zero))
    assert(ez.getMessage.contains("all-zero"))
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val ee = intercept[IllegalArgumentException](Similarity.pcaTop(empty))
    assert(ee.getMessage.contains("empty"))
  }

  test("int8TopK ranking: a zero vector scores 0, never NaN") {
    import spark.implicits._
    // vec 3 is all-zero: its per-row scale and norm are both 0; without
    // the guard its quantization is NaN, which sorts ABOVE every real
    // cosine in a desc ordering and steals rank 1 from vec 1
    val emb = Seq(
      (0L, Array(10f, 0f)), (1L, Array(9f, 1f)),
      (2L, Array(-10f, 0f)), (3L, Array(0f, 0f)))
      .toDF("vec_id", "embedding")
    val ranks = Similarity.int8TopK(emb, col("vec_id") === 0, k = 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(ranks === Seq(1L, 3L, 2L)) // zero vec scores 0: below +, above −
  }

  test("int8Recall: separated clusters survive quantization at full recall") {
    import spark.implicits._
    // two tight, well-separated clusters: int8 quantization cannot flip
    // any top-1 across the gap → recall@1 = 1.0
    val emb = ((0 until 4).map(i => (i.toLong, Array(10f + i * 0.1f, 0f, 0f, 0f))) ++
      (4 until 8).map(i => (i.toLong, Array(0f, -10f - i * 0.1f, 0f, 0f))))
      .toDF("vec_id", "embedding")
    val r = Similarity.int8Recall(emb, col("vec_id") % 4 === 0, k = 1)
      .select("recall_at_k").as[Double].head()
    assert(r === 1.0)
  }

  test("pcaProject: coefficients recover the dominant-axis coordinate") {
    import spark.implicits._
    val emb = (0 until 8).map { i =>
      (i.toLong, Array((if (i % 2 == 0) 10f else -10f), 0f))
    }.toDF("vec_id", "embedding")
    val out = Similarity.pcaProject(emb)
      .orderBy("vec_id").select("vec_id", "coeff", "residual2")
      .as[(Long, Double, Double)].collect()
    // u = ±e1 → coeff = ±10 (one consistent sign), residual ≈ 0
    assert(out.forall(r => math.abs(math.abs(r._2) - 10.0) < 1e-3))
    assert(out.map(r => math.signum(r._2)).distinct.length === 2)
    assert(out.forall(r => math.abs(r._3) < 1e-2))
  }

  test("matryoshkaRecall: prefix-preserved neighbors score 1, prefix-flipped score 0") {
    import spark.implicits._
    def emb(rows: (Long, Array[Float])*) = rows.toDF("vec_id", "embedding")
    // neighborhood preserved under truncation to the first 2 dims
    val good = emb(
      0L -> Array(1f, 0f, 1f, 0f),
      1L -> Array(1f, 0f, 1f, 0f),
      2L -> Array(-1f, 0f, -1f, 0f))
    val r1 = Similarity.matryoshkaRecall(good, col("vec_id") === 0, k = 1, dims = 2)
      .select("recall_at_k").as[Double].head()
    assert(r1 === 1.0)
    // the informative signal lives in dims 3-4 → truncation flips top-1
    val bad = emb(
      0L -> Array(0.1f, 0f, 1f, 0f),
      1L -> Array(0f, 0.1f, 1f, 0f), // full cos ≈ 0.99, truncated cos 0
      2L -> Array(1f, 0f, 0.1f, 0f)) // full cos ≈ 0.20, truncated cos 1
    val r0 = Similarity.matryoshkaRecall(bad, col("vec_id") === 0, k = 1, dims = 2)
      .select("recall_at_k").as[Double].head()
    assert(r0 === 0.0)
  }

  test("cellTopK ≡ ivfTopK(all queries, nProbe=1) — kernel rewrite preserves results") {
    // 60 deterministic pseudo-random 8-dim vectors, 4 cells: enough
    // occupancy for real per-cell competition and id/rounding ties
    val emb = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        (Similarity.planeWeight(i, d) / 1000.0).toFloat))
    }.toDF("vec_id", "embedding")
    val kernel = Similarity.cellTopK(emb, k = 5, nCells = 4)
      .select("query_id", "neighbor_id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val reference = Similarity.ivfTopK(emb, lit(true), k = 5, nCells = 4,
        nProbe = 1)
      .select("query_id", "neighbor_id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(kernel === reference)
    assert(kernel.nonEmpty)
  }

  test("two-level quantizer with exhaustive super-probe is bit-equal to flat") {
    // superProbe >= nSuper means every super-cell's children get scanned,
    // so the two-level path must reproduce the flat scan EXACTLY on any
    // corpus — pseudo-random vectors, no clustering assumption. nCells=12
    // gives nSuper = ceil(sqrt(12)) = 4.
    val emb = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        (Similarity.planeWeight(i, d) / 1000.0).toFloat))
    }.toDF("vec_id", "embedding")
    val e = Similarity.normed(emb)
    def cells(twoLevelMin: Int, superProbe: Int) =
      Similarity.withCellRanks(e, nCells = 12, keep = 3,
          twoLevelMin = twoLevelMin, superProbe = superProbe)
        .select($"vec_id", $"cells")
        .as[(Long, Seq[Long])].collect().toMap
    val flat = cells(Int.MaxValue, Similarity.defaultSuperProbe)
    val two = cells(1, 4)
    assert(two === flat)
    assert(flat.values.forall(_.length === 3))
  }

  test("two-level rank-1 assignment matches flat on separated clusters at superProbe=1") {
    // 4 orthogonal cluster directions (dims 0-3), 3 centroids per cluster
    // among ids 0-11 (the seed-centroid window), members 12-59 jittered on
    // dims 4-7 only. The super-quantizer's 4 super-cells recover the 4
    // clusters, so probing a SINGLE super-cell still contains each
    // vector's true nearest centroid.
    val emb = (0 until 60).map { i =>
      val c = i % 4
      val jitter = ((i * 7) % 5 - 2) * 0.03f
      val v = Array.fill(8)(0.0f)
      v(c) = 10.0f
      v(4 + c) = jitter
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val e = Similarity.normed(emb)
    def rank1(twoLevelMin: Int, superProbe: Int) =
      Similarity.withCellRanks(e, nCells = 12, keep = 1,
          twoLevelMin = twoLevelMin, superProbe = superProbe)
        .select($"vec_id", element_at($"cells", 1))
        .as[(Long, Long)].collect().toMap
    val flat = rank1(Int.MaxValue, 1)
    val two = rank1(1, 1)
    assert(two === flat)
    // sanity on the fixture itself: assignments land within-cluster
    assert(flat.forall { case (id, cell) => cell % 4 === id % 4 })
  }

  test("superQuantizer children partition the centroid set into ceil(sqrt(n)) groups") {
    val cents = (0 until 12).map { i =>
      val v = Array.tabulate(8)(d => Similarity.planeWeight(100 + i, d))
      val n = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v, n)
    }.toArray
    val (sup, children) = Similarity.superQuantizer(cents)
    assert(sup.length === 4) // ceil(sqrt(12))
    assert(children.length === 4)
    assert(children.flatten.sorted.toSeq === (0 until 12))
    // super-centroids are unit-norm (spherical k-means invariant)
    sup.foreach { s =>
      assert(math.abs(math.sqrt(s.map(x => x * x).sum) - 1.0) < 1e-9)
    }
  }

  test("zero-vector convention: cosine 0, never NaN, across every ANN entry point") {
    // Spark and DuckDB both order NaN ABOVE every real double, so an
    // unguarded 0/0 would rank a single all-zero embedding FIRST at every
    // query. The pinned convention (round 8's int8TopK, swept across the
    // rest of the surface in round 9): cosine against a zero vector is 0.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.1f, 0.9f)),
      (4L, Array(0.0f, 0.0f)), // the zero vector
      (5L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val isQ = col("vec_id") === 0
    // bruteForceTopK: zero vector scores EXACTLY 0 — below the aligned
    // neighbors, above the anti-aligned one
    val bf = Similarity.bruteForceTopK(emb, isQ, k = 5).collect()
      .map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Double]("cosine")).toMap
    assert(bf(4L) === 0.0)
    assert(!bf.values.exists(_.isNaN))
    assert(bf(1L) > bf(4L) && bf(4L) > bf(5L))
    // zero vector AS the query: every cosine 0, ranking = id tie-break
    val bq = Similarity.bruteForceTopK(emb, col("vec_id") === 4, k = 5)
      .orderBy("rank").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(bq === Seq(0L, 1L, 2L, 3L, 5L))
    // lshTopK: any zero-vector pair that surfaces from the band buckets
    // scores 0, never NaN
    val lsh = Similarity.lshTopK(emb, lit(true), k = 5, dim = 2).collect()
    assert(!lsh.exists(r => r.getAs[Double]("cosine").isNaN))
    // ivfTopK / ivfAssign: the zero vector's all-cosines-equal tie
    // resolves to the lowest centroid id; candidate scoring yields 0
    val ivf = Similarity.ivfTopK(emb, isQ, k = 5, nCells = 2, nProbe = 2)
      .collect()
    assert(!ivf.exists(r => r.getAs[Double]("cosine").isNaN))
    val assign = Similarity.ivfAssign(emb, nCells = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assign(4L) === 0L)
    // kmeans: distance-based (no division) — the zero vector joins its
    // nearest-to-origin cluster without error
    val km = Similarity.kmeans(emb, k = 2, iters = 2).collect()
    assert(km.length === 6)
    // semanticDedup: a zero-vector pair can never leak a NaN past the
    // threshold gate
    val sd = Similarity.semanticDedup(emb, threshold = 0.5, nCells = 2)
      .collect()
    assert(!sd.exists(r => r.getAs[Double]("cosine").isNaN))
  }

  test("ivfAssignAgreement is exactly 1.0 below the two-level threshold") {
    val emb = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        (Similarity.planeWeight(i, d) / 1000.0).toFloat))
    }.toDF("vec_id", "embedding")
    val row = Similarity.ivfAssignAgreement(emb, nCells = 12)
      .select("n_vectors", "n_agree", "agreement")
      .as[(Long, Long, Double)].head()
    assert(row === ((60L, 60L, 1.0)))
  }
}
