package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unit coverage for the corpus-curation operators on micro-corpora (the
  * sf-scale oracle check is the driver's t2 gate).
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("topicBalance caps full topics at quota, under-full topics keep all") {
    // two well-separated topics: 24 vecs near +10·e1, 4 near -10·e2
    val emb = ((0 until 24).map { i =>
      (i.toLong, Array.tabulate(8)(d => if (d == 0) 10f + i * 0.01f else 0f))
    } ++ (24 until 28).map { i =>
      (i.toLong, Array.tabulate(8)(d => if (d == 1) -10f - i * 0.01f else 0f))
    }).toDF("vec_id", "embedding")
    val out = Curation.topicBalance(emb, total = 10L, k = 2, iters = 3)
      .select("doc_id", "topic", "rk", "quota")
      .as[(Long, Long, Long, Long)].collect()
    // every quota is 5; the 24-member topic is capped at 5, the 4-member
    // topic keeps all 4 (seats are not redistributed)
    assert(out.forall(_._4 === 5L))
    val byTopic = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byTopic.values.toSet === Set(5, 4))
    // the capped topic kept exactly the 5 smallest salted-hash ranks
    assert(out.filter(_._3 > 5L).isEmpty)
  }

  test("splitLeakage flags clusters straddling the split, skips singletons") {
    val d = docs((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val real = Curation.splitLeakage(d, pairs)
      .select("cluster_id", "n_docs", "leaky")
      .as[(Long, Long, Boolean)].collect().toSeq
    // invariants that hold for ANY hash assignment: only the two
    // multi-doc clusters appear, and leaky matches the actual split
    val actualSplit = Curation.assignSplit(d)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    def leakyOf(ids: Seq[Long]) = {
      val ss = ids.map(actualSplit)
      ss.contains("train") && ss.exists(s => s == "val" || s == "test")
    }
    assert(real.map(_._1).toSet === Set(1L, 3L))
    assert(real.map(r => r._1 -> r._2).toMap === Map(1L -> 2L, 3L -> 2L))
    assert(real.find(_._1 == 1L).get._3 === leakyOf(Seq(1L, 2L)))
    assert(real.find(_._1 == 3L).get._3 === leakyOf(Seq(3L, 4L)))
  }

  test("curriculum: dense 0..n-1 order, phases monotone, best quality first") {
    val good = (1 to 60).map(i => s"signal$i").mkString(" ") // q ≈ 1
    val soup = "the and is of to the and is of to"           // q = 0
    val mid = (1 to 20).map(i => s"word$i").mkString(" ")    // q = 0.4
    val d = docs((1L, soup), (2L, good), (3L, mid), (4L, good + " x"),
      (5L, soup + " the"), (6L, mid + " more"))
    val out = Curation.curriculum(d, nPhases = 4, nShards = 3)
      .select("doc_id", "phase", "train_pos")
      .as[(Long, Int, Long)].collect().sortBy(_._3)
    // dense positions 0..5
    assert(out.map(_._3).toSeq === (0L until 6L))
    // phase sequence is non-decreasing along the training order
    assert(out.map(_._2).toSeq === out.map(_._2).sortBy(identity).toSeq)
    // best-quality docs (2, 4) occupy the earliest phase present
    val firstPhase = out.head._2
    assert(out.filter(_._2 == firstPhase).map(_._1).toSet === Set(2L, 4L))
    // stopword soup (1, 5) lands in the last phase present
    val lastPhase = out.last._2
    assert(out.filter(_._2 == lastPhase).map(_._1).toSet === Set(1L, 5L))
  }

  test("decontaminate flags benchmark docs and their shingle-sharers only") {
    val d = docs(
      1L -> "one two three four five six seven eight nine", // benchmark
      2L -> "zz one two three four five six seven eight yy", // shares an 8-gram
      3L -> "totally different words with no overlap at all nine")
    val out = Curation.decontaminate(d, col("doc_id") === 1L, k = 8)
      .select("doc_id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(out === Map(1L -> true, 2L -> true, 3L -> false))
  }

  test("decontaminateBloom equals the exact pass bit-for-bit") {
    val d = docs(
      1L -> "one two three four five six seven eight nine",
      2L -> "zz one two three four five six seven eight yy",
      3L -> "totally different words with no overlap at all nine")
    val exact = Curation.decontaminate(d, col("doc_id") === 1L, k = 8).collect()
    val bloom = Curation.decontaminateBloom(d, col("doc_id") === 1L, k = 8).collect()
    assert(exact.map(_.toSeq).toSet === bloom.map(_.toSeq).toSet)
  }

  test("assignSplit is deterministic, exhaustive, and threshold-consistent") {
    val d = docs((0L until 100L).map(i => i -> s"doc $i"): _*)
    val a = Curation.assignSplit(d, trainPct = 80, valPct = 10).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bucket"), r.getAs[String]("split")))
    val b = Curation.assignSplit(d, trainPct = 80, valPct = 10).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bucket"), r.getAs[String]("split")))
    assert(a.sortBy(_._1).sameElements(b.sortBy(_._1))) // rerun-stable
    assert(a.length === 100)
    a.foreach { case (_, bucket, split) =>
      val expected = if (bucket < 80) "train" else if (bucket < 90) "val" else "test"
      assert(split === expected)
    }
  }

  test("stratifiedSample keeps unlisted strata whole and rate-0 strata empty") {
    // "the a is of and" markers -> en; "der die das und ist" -> de
    val en = (0L until 20L).map(i => i -> "the a is of and common words here")
    val de = (100L until 120L).map(i => i -> "der die das und ist andere woerter")
    val d = docs((en ++ de): _*)
    val kept = Curation.stratifiedSample(d, Map("de" -> 0.0), defaultRate = 1.0)
      .select("doc_id", "lang_pred").as[(Long, String)].collect()
    assert(kept.forall(_._2 == "en"))
    assert(kept.length === 20) // every en doc kept at rate 1.0
  }

  test("quotaSample: exact K, largest-remainder allocation, shortfall visible") {
    // three sources: a(10 docs, w2), b(10, w1), c(2, w1); K=8, Σw=4 →
    // base a=(8·2)div4=4, b=2, c=2 — remainders all 0, no leftovers
    val d = ((0L until 10L).map(i => (i, "a")) ++
      (10L until 20L).map(i => (i, "b")) ++
      (20L until 22L).map(i => (i, "c")))
      .toDF("doc_id", "source").withColumn("text", lit("x"))
    val out = Curation.quotaSample(d, total = 8L, weights = Map("a" -> 2L))
      .select("doc_id", "source", "rk", "quota")
      .as[(Long, String, Int, Long)].collect()
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc === Map("a" -> 4, "b" -> 2, "c" -> 2))
    assert(out.length === 8)
    // deterministic: a second run draws the identical doc set
    val again = Curation.quotaSample(d, total = 8L, weights = Map("a" -> 2L))
      .select("doc_id").as[Long].collect().toSet
    assert(again === out.map(_._1).toSet)

    // K=21 uniform over the same sources: base 7 each, but c has only
    // 2 docs — shortfall stays visible (no silent redistribution)
    val short = Curation.quotaSample(d, total = 21L)
      .select("source", "quota").as[(String, Long)].collect()
    assert(short.count(_._1 == "c") === 2) // all of c, under its quota 7
    assert(short.count(_._1 == "a") === 7)

    // leftover seats: K=7, uniform, Σbase=3·2=6 → one +1 seat goes to
    // the lexicographically-first tied remainder (source a)
    val lr = Curation.quotaSample(d, total = 7L)
      .select("source", "quota").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).head).toMap
    assert(lr === Map("a" -> 3L, "b" -> 2L, "c" -> 2L))
  }

  test("repetitionStats flags repeated-bigram docs, handles short docs") {
    val d = docs(
      1L -> "spam spam spam spam spam spam", // one bigram repeated 5x
      2L -> "all words here are fully distinct tokens",
      3L -> "x") // too short for bigrams
    val out = Curation.repetitionStats(d)
      .select("doc_id", "n_grams", "max_gram_n", "flagged")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 5L, 5L, true)))   // 5 grams, all "spam spam"
    assert(out(2L)._4 === false)
    assert(out(3L) === ((3L, 0L, 0L, false)))  // zero grams, not dropped
  }

  test("packSequences: contiguous offsets per shard, windows chop at maxTokens") {
    val d = docs((0L until 30L).map(i => i -> ("w " * 7).trim): _*) // 7 tokens each
    val out = Curation.packSequences(d, maxTokens = 10, nShards = 4)
      .select("shard", "doc_id", "n_tokens", "pack_id", "pack_off")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.length === 30)
    out.groupBy(_._1).foreach { case (_, rows) =>
      // within a shard (doc_id order): start offsets are the running sum
      var off = 0L
      rows.sortBy(_._2).foreach { case (_, _, n, packId, packOff) =>
        assert(packId === off / 10)
        assert(packOff === off % 10)
        off += n
      }
    }
  }

  test("lengthQuantiles: exact interpolated quantiles per language") {
    // single-language corpus with word counts 2, 4, 6, 8 -> q50 = 5
    val d = docs(
      1L -> "the a", 2L -> "the a is of", 3L -> "the a is of and w",
      4L -> "the a is of and w x y")
    val out = Curation.lengthQuantiles(d).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("lang_pred") === "en")
    assert(r.getAs[Double]("q50") === 5.0)
    assert(r.getAs[Double]("q25") === 3.5) // 2 + 0.75*(4-2)
  }

  test("topTerms ranks by count with word tie-break, capped at k") {
    val d = docs(
      1L -> "the the the aa aa bb",
      2L -> "the aa cc cc cc cc")
    val out = Curation.topTerms(d, k = 2)
      .select("lang_pred", "word", "n", "rank")
      .as[(String, String, Long, Long)].collect().sortBy(_._4)
    // counts: the=4, cc=4, aa=3, bb=1 -> tie on 4 broken by word order
    assert(out.toSeq === Seq(("en", "cc", 4L, 1L), ("en", "the", 4L, 2L)))
  }

  test("redact counts and scrubs injected emails, urls and ips") {
    // doc 105 = 3·5·7 → all three injections; doc 1 → none
    val d = docs(105L -> "plain words", 1L -> "plain words")
    val out = Curation.redact(d)
      .select("doc_id", "n_emails", "n_urls", "n_ips")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, 0L, 0L, 0L), (105L, 1L, 1L, 1L)))
    // the redacted text must contain no residual pii (sig over the
    // scrubbed form equals the sig over a manually scrubbed string)
    val sig = Curation.redact(d).where(col("doc_id") === 105)
      .select("sig").as[String].head()
    val expected = "plain words reach <EMAIL> see <URL> from <IP>"
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(sig === md)
  }

  test("redact is a pure scan: no exchange in the plan") {
    val p = Curation.redact(docs(1L -> "a")).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"))
  }

  test("tfidfTerms ranks per-doc terms by tf*idf with term tie-break") {
    // 'rare' appears only in doc 1 (idf ln(3)), 'the' in all (idf 0)
    val d = docs(
      1L -> "the the rare",
      2L -> "the boat",
      3L -> "the fish fish")
    val out = Curation.tfidfTerms(d, k = 2)
      .select("doc_id", "term", "rank")
      .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._3))
    assert(out.toSeq === Seq(
      (1L, "rare", 1L), (1L, "the", 2L),   // idf(the)=0 < idf(rare)
      (2L, "boat", 1L), (2L, "the", 2L),
      (3L, "fish", 1L), (3L, "the", 2L)))
    // doc 3: tf(fish)=2 · ln(3) ranks above tf(the)=1 · ln(1)=0
    val score = Curation.tfidfTerms(d, k = 1)
      .where(col("doc_id") === 3).select("score").as[Double].head()
    assert(math.abs(score - math.round(2 * math.log(3.0) * 1e6) / 1e6) < 1e-9)
  }

  test("perplexity: hand-computed cross-entropy under the corpus unigram LM") {
    // tokens: a×3, b×1, c×1 → T = 5
    val d = docs(1L -> "a a b", 2L -> "a c")
    val out = Curation.perplexity(d)
      .select("doc_id", "n_tokens", "xent_nats")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    val ln = math.log _
    assert(out.toSeq === Seq(
      (1L, 3L, r6(ln(5) - 2 * ln(3) / 3)), // slc = ln3+ln3+ln1
      (2L, 2L, r6(ln(5) - ln(3) / 2))))    // slc = ln3+ln1
  }

  test("datasetCard: one-row corpus summary with exact counts") {
    val d = docs(1L -> "the cat", 2L -> "the cat", 3L -> "der hund und")
    val row = Curation.datasetCard(d).collect().head
    assert(row.getAs[Long]("n_docs") === 3L)
    assert(row.getAs[Long]("n_tokens") === 7L)
    assert(row.getAs[Long]("n_unique_texts") === 2L)
    assert(row.getAs[Double]("dup_rate") === 0.333333)
    assert(row.getAs[Long]("n_langs") === 2L) // en (×2), de
    // H = ln3 - (2·ln2)/3 over lang counts {en:2, de:1}
    val h = math.round((math.log(3) - 2 * math.log(2) / 3) * 1e6) / 1e6
    assert(row.getAs[Double]("lang_entropy") === h)
  }

  test("chunk: overlapped windows cover every word, tail chunk short") {
    // 10 words, window 4, stride 3 -> starts 0,3,6,9
    val d = docs(1L -> (1 to 10).map(i => s"w$i").mkString(" "), 2L -> "a")
    val out = Curation.chunk(d, window = 4, stride = 3)
      .select("doc_id", "chunk_id", "start_word", "n_tokens")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq === Seq(
      (1L, 0L, 0L, 4L), (1L, 1L, 3L, 4L), (1L, 2L, 6L, 4L), (1L, 3L, 9L, 1L),
      (2L, 0L, 0L, 1L)))
    // the chunk signature really is the windowed text: md5("w4 w5 w6 w7")
    val sig = Curation.chunk(d, window = 4, stride = 3)
      .where($"doc_id" === 1L && $"chunk_id" === 1L)
      .select("sig").as[String].collect().head
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = md.digest("w4 w5 w6 w7".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    assert(sig === expect)
  }

  test("sourceMix: token shares and the uniform-rebalance weights") {
    val d = Seq(
      (1L, "a b c d e f", "s1"), (2L, "a b", "s1"), // s1: 8 tokens
      (3L, "x y", "s2"))                            // s2: 2 tokens
      .toDF("doc_id", "text", "source")
    val out = Curation.sourceMix(d)
      .select("source", "n_docs", "n_tokens", "token_share", "uniform_weight")
      .as[(String, Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("s1") === (("s1", 2L, 8L, 0.8, 0.625)))  // 0.5 / 0.8
    assert(out("s2") === (("s2", 1L, 2L, 0.2, 2.5)))    // 0.5 / 0.2
  }

  test("qualityBuckets: equal-population tiers, monotone in score") {
    // 20 docs with spread-out word counts -> spread-out quality scores
    val d = docs((1L to 20L).map(i =>
      i -> (Seq.fill(i.toInt * 3)("w" + i).mkString(" ") + " extra unique words here")): _*)
    val out = Curation.qualityBuckets(d, nBuckets = 4)
      .select("doc_id", "quality_score", "bucket")
      .as[(Long, Double, Long)].collect()
    assert(out.length === 20)
    assert(out.map(_._3).forall(b => b >= 1 && b <= 4))
    // bucket is monotone in the score
    val sorted = out.sortBy(_._2)
    assert(sorted.map(_._3).toSeq === sorted.map(_._3).sorted.toSeq)
    // roughly equal population (interpolated quantiles: 5 +/- 1 per tier)
    val sizes = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(sizes.values.forall(n => n >= 3 && n <= 7), sizes.toString)
  }

  test("qualityBuckets returns an empty frame on an empty corpus") {
    val empty = docs().where($"doc_id" > 0)
    assert(Curation.qualityBuckets(empty).collect().isEmpty)
  }

  test("snapshotDiff classifies added/removed/modified/unchanged") {
    val a = docs(1L -> "same", 2L -> "old text", 3L -> "gone")
    val b = docs(1L -> "same", 2L -> "new text", 4L -> "brand new")
    val out = Curation.snapshotDiff(a, b)
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "unchanged", 2L -> "modified",
      3L -> "removed", 4L -> "added"))
  }

  test("vocabOov: top-V vocabulary with count/word tie-break, per-doc rate") {
    val d = docs(
      1L -> "the the the cat cat dog",
      2L -> "rare words only here")
    // vocabSize 2 -> vocab = {the(3), cat(2)}; doc1 oov = dog (1/6)
    val out = Curation.vocabOov(d, vocabSize = 2)
      .select("doc_id", "n_tokens", "n_oov", "oov_rate")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 6L, 1L, 0.166667)))
    assert(out(2L) === ((2L, 4L, 4L, 1.0))) // nothing in vocab
  }

  test("packSweep: waste and split counts on a hand-packed shard") {
    // one shard (nShards=1): docs of 3, 4, 5 tokens concat to offsets
    // [0,3) [3,7) [7,12), total 12
    val d = Seq(1L -> "a b c", 2L -> "d e f g", 3L -> "h i j k l")
      .toDF("doc_id", "text")
    val out = Curation.packSweep(d, grid = Seq(8, 24), nShards = 1)
      .select("max_tokens", "n_seqs", "total_tokens", "waste_pct", "n_split_docs")
      .as[(Long, Long, Long, Double, Long)].collect().map(r => r._1 -> r).toMap
    // m=8: ceil(12/8)=2 seqs, waste (16-12)/16; doc3 [7,12) crosses 8
    assert(out(8L) === ((8L, 2L, 12L, 0.25, 1L)))
    // m=24: everything in one padded seq, no splits
    assert(out(24L) === ((24L, 1L, 12L, 0.5, 0L)))
  }

  test("lengthQuantilesSketch: rank-error contract holds under heavy ties") {
    // 40 docs, word-lengths heavily tied (1,1,...,2,...,8): the rank
    // window [count(<v)+1, count(<=v)] of any returned value must
    // intersect [q ± eps]·n — ties make the window wide, not wrong
    val d = (0L until 40L).map { i =>
      (i, Seq.fill((i % 8 + 1).toInt)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val out = Curation.lengthQuantilesSketch(d, accuracy = 100)
      .select("n_docs", "p50_ok", "p95_ok")
      .as[(Long, Boolean, Boolean)].collect()
    assert(out.nonEmpty)
    out.foreach { case (n, p50, p95) =>
      assert(n > 0 && p50 && p95, s"contract failed on ($n, $p50, $p95)")
    }
  }

  test("bpeMerges replays an in-memory BPE reference (greedy leftmost)") {
    // 'aaab' stresses the overlap rule: merge (a,a) applied to a-a-a-b
    // must yield (aa)-a-b, never a-(aa)-b
    val d = Seq(
      1L -> "low low low lower lower newest newest newest aaab",
      2L -> "wider wider new newest aaab aaab").toDF("doc_id", "text")

    // reference BPE on the word-frequency dict, same arithmetic
    val words = d.as[(Long, String)].collect()
      .flatMap(_._2.split(" ")).filter(_.matches("^[a-z0-9]+$"))
    val wf = scala.collection.mutable.Map.empty[List[String], Long]
    words.foreach { w =>
      val k = w.split("").toList
      wf(k) = wf.getOrElse(k, 0L) + 1L
    }
    val expected = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (t <- 1L to 6L) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      wf.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      val ((a, b), cnt) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
      expected += ((t, a, b, cnt))
      def merge(s: List[String]): List[String] = s match {
        case x :: y :: rest if x == a && y == b => (a + b) :: merge(rest)
        case x :: rest => x :: merge(rest)
        case Nil => Nil
      }
      val merged = wf.toSeq.map { case (k, f) => merge(k) -> f }
      wf.clear()
      merged.foreach { case (k, f) => wf(k) = wf.getOrElse(k, 0L) + f }
    }

    // batch = 1 degenerates to the classical strictly-sequential BPE
    val got = Curation.bpeMerges(d, nMerges = 6, batch = 1)
      .select("step", "pair_a", "pair_b", "cnt")
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq === expected.toSeq)
  }

  test("batched bpeMerges: greedy symbol-disjoint picks per round") {
    // round-start pair counts: (a,b):3 (ab×2 + abcd), (c,d):2 (cd + abcd),
    // (b,c):1 (abcd). Greedy in (cnt DESC, a, b) order with cap 8:
    // (a,b) picked; (c,d) picked (disjoint); (b,c) skipped (b and c both
    // used). Round 2 then sees the ONE remaining pair (ab, cd) in 'abcd'.
    val d = Seq(1L -> "ab ab cd", 2L -> "abcd").toDF("doc_id", "text")
    val got = Curation.bpeMerges(d, nMerges = 16, batch = 8)
      .select("step", "pair_a", "pair_b", "cnt")
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, "a", "b", 3L), (2L, "c", "d", 2L), (3L, "ab", "cd", 1L)))
    // the same corpus under batch=1 orders the SAME merges sequentially
    // (each merge here survives recount), at three driver rounds
    val seqGot = Curation.bpeMerges(d, nMerges = 16, batch = 1)
      .select("step", "pair_a", "pair_b", "cnt")
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(seqGot.toSeq === got.toSeq)
  }

  test("bpeMerges stops early when the corpus is fully merged") {
    // 'ab' exhausts after one merge; 'a' alone never produces a pair
    val d = Seq(1L -> "ab ab a").toDF("doc_id", "text")
    val got = Curation.bpeMerges(d, nMerges = 5)
      .select("step", "pair_a", "pair_b", "cnt")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got === Seq((1L, "a", "b", 2L)))
  }

  test("bpeMergesToVocab reaches the requested vocab where fixed rounds fall short") {
    // small batch-disjointness ceiling: with batch 4, round 1 can select
    // at most 2 disjoint pairs from a 4-symbol alphabet, so the
    // fixed-round form (ceil(8/4) = 2 rounds) ends short of 8 merges;
    // the to-vocab form keeps going until it has exactly 8
    val d = Seq(1L -> "abcd abcd dcba badc cabd abdc acbd",
                2L -> "ab cd dc ba bd ca ad cb").toDF("doc_id", "text")
    val fixed = Curation.bpeMerges(d, nMerges = 8, batch = 4).count()
    assert(fixed < 8, s"premise: fixed rounds fell short (got $fixed)")
    val got = Curation.bpeMergesToVocab(d, targetMerges = 8, batch = 4)
      .select("step", "pair_a", "pair_b", "cnt")
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(got.length === 8)
    assert(got.map(_._1).toSeq === (1L to 8L)) // dense merge steps
  }

  test("bpeMergesToVocab: batch=1 is step-for-step bpeMerges; exhaustion stops it") {
    // at batch 1 both modes run one merge per round with identical caps,
    // so the merge sequences must be identical
    val d = Seq(1L -> "low low low lower lower newest newest newest aaab",
                2L -> "wider wider new newest aaab aaab").toDF("doc_id", "text")
    val a = Curation.bpeMerges(d, nMerges = 6, batch = 1)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    val b = Curation.bpeMergesToVocab(d, targetMerges = 6, batch = 1)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(a === b)
    // an unreachable target terminates at corpus exhaustion, not a hang
    val tiny = Seq(1L -> "ab ab a").toDF("doc_id", "text")
    val got = Curation.bpeMergesToVocab(tiny, targetMerges = 50, batch = 8)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got === Seq((1L, "a", "b", 2L)))
  }

  test("bpeEncode: tokens_per_word reflects the trained merges") {
    // after enough merges 'ab' is a single token; 'cd cd' likewise
    val d = Seq(1L -> "ab ab cd", 2L -> "abcd").toDF("doc_id", "text")
    // batch=1: 8 strictly-sequential rounds fully merge this tiny corpus
    // (batched rounds are an UPPER bound on merges — a round that cannot
    // fill its batch ends training early; see the batched test above)
    val out = Curation.bpeEncode(d, nMerges = 8, batch = 1)
      .select("doc_id", "n_words", "n_bpe_tokens")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 === 3) // 3 words
    // every word fully merged by 8 rounds on this tiny corpus → 1
    // token per word
    assert(out(1L)._3 === 3)
    assert(out(2L) === ((2L, 1L, 1L)))
  }

  test("bpeFertility: per-language token/word rollup of the encode pass") {
    // en docs carry marker words; zz is unmergeable filler whose chars
    // stay separate tokens at 0 merges of its pairs
    val d = Seq(
      1L -> "the a is of and xyx",
      2L -> "the a is of and xyx xyx",
      3L -> "der die das und ist qq").toDF("doc_id", "text")
    val enc = Curation.bpeEncode(d, nMerges = 4, batch = 1)
      .select("doc_id", "n_words", "n_bpe_tokens")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val out = Curation.bpeFertility(d, nMerges = 4, batch = 1)
      .select("lang_pred", "n_docs", "sum_words", "sum_tokens", "fertility")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // the rollup must be exactly the sum of the per-doc encode rows
    val enWords = enc(1L)._2 + enc(2L)._2
    val enToks = enc(1L)._3 + enc(2L)._3
    assert(out("en")._2 === 2L)
    assert(out("en")._3 === enWords && out("en")._4 === enToks)
    assert(math.abs(out("en")._5 - enToks.toDouble / enWords) < 1e-6)
    assert(out("de")._2 === 1L)
    assert(out("de")._3 === enc(3L)._2 && out("de")._4 === enc(3L)._3)
  }

  test("distShift: disjoint-vocab sources carry KL = ln(2), single source zero") {
    // source A emits only "a", B only "b", equal mass: q(w) = 1/2,
    // p_src(w) = 1 → KL = ln(2) for both
    val d = ((1 to 10).map(i => (i.toLong, "a a a", "A")) ++
      (11 to 20).map(i => (i.toLong, "b b b", "B")))
      .toDF("doc_id", "text", "source")
    val out = Curation.distShift(d)
      .select("source", "n_vocab_words", "kl_nats")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("A")._2 === 1L && out("B")._2 === 1L)
    assert(math.abs(out("A")._3 - math.log(2)) < 1e-6)
    assert(math.abs(out("B")._3 - math.log(2)) < 1e-6)

    val single = ((1 to 5).map(i => (i.toLong, "a b c", "S")))
      .toDF("doc_id", "text", "source")
    val kl = Curation.distShift(single).select("kl_nats").as[Double].head()
    assert(math.abs(kl) < 1e-6) // source distribution IS the corpus distribution
  }

  test("distShift: vocabCap restricts the comparison to the global top words") {
    // "z" is rarest globally; vocabCap 2 keeps {a, b} only — a source
    // whose capped distribution matches the capped corpus scores 0
    val d = Seq(
      (1L, "a a b b", "A"),
      (2L, "a a b b z", "B")).toDF("doc_id", "text", "source")
    val out = Curation.distShift(d, vocabCap = 2)
      .select("source", "n_vocab_words", "n_tokens_capped", "kl_nats")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("A")._3 === 4L && out("B")._3 === 4L) // z excluded from B's mass
    assert(math.abs(out("A")._4) < 1e-6 && math.abs(out("B")._4) < 1e-6)
  }

  test("dsirWeights: target-like docs score positive, disjoint docs negative") {
    val d = Seq(
      (1L, "t t t"), // target
      (2L, "t t t"), // target
      (3L, "t t t"), // corpus doc identical to the target distribution
      (4L, "c c c"), // corpus doc disjoint from it
      (5L, "x"))     // < 2 words: no grams
      .toDF("doc_id", "text")
    val out = Curation.dsirWeights(d, col("doc_id") <= 2)
      .select("doc_id", "n_grams", "log_ratio")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // grams: "t t" ct=4 cc=6, "c c" ct=0 cc=2; nt=4 nc=8 V=2
    val lrT = math.log(5.0 / 6) - math.log(7.0 / 10)
    val lrC = math.log(1.0 / 6) - math.log(3.0 / 10)
    assert(out(3L)._2 === 2L)
    assert(math.abs(out(3L)._3 - 2 * lrT) < 1e-6 && out(3L)._3 > 0)
    assert(math.abs(out(4L)._3 - 2 * lrC) < 1e-6 && out(4L)._3 < 0)
    assert(out(5L) === ((5L, 0L, 0.0)))
  }

  test("zipfFit recovers a planted power-law slope") {
    // counts follow c(r) = round(1000·r^-1): a near-exact slope −1 line
    // in log-log space (micro-rounding + count integering add the noise)
    val words = (1 to 50).flatMap { r =>
      val c = math.max(1, math.round(1000.0 / r).toInt)
      Seq.fill(c)(s"w$r")
    }
    val d = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val out = Curation.zipfFit(d, vocabCap = 50)
      .select("n_vocab", "slope", "intercept")
      .as[(Long, Double, Double)].collect().head
    assert(out._1 === 50L)
    assert(math.abs(out._2 - (-1.0)) < 0.02)
    assert(math.abs(out._3 - math.log(1000.0)) < 0.05)
  }

  test("lengthBuckets: power-of-two assignment, truncation at maxLen, waste math") {
    def mkText(n: Int) = Seq.fill(n)("w").mkString(" ")
    val d = Seq(
      (1L, mkText(10)),   // bucket 16
      (2L, mkText(16)),   // bucket 16 (boundary inclusive)
      (3L, mkText(17)),   // bucket 32
      (4L, mkText(3000))) // truncated to 2048 → bucket 2048, zero waste
      .toDF("doc_id", "text")
    val out = Curation.lengthBuckets(d)
      .select("bucket", "n_docs", "sum_tokens", "padded_tokens", "waste_frac")
      .as[(Long, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(16L)._2 === 2L && out(16L)._3 === 26L && out(16L)._4 === 32L)
    assert(math.abs(out(16L)._5 - (1.0 - 26.0 / 32.0)) < 1e-6)
    assert(out(32L)._2 === 1L && out(32L)._3 === 17L)
    assert(out(2048L)._3 === 2048L && out(2048L)._5 === 0.0)
    assert(out.keySet === Set(16L, 32L, 2048L))
  }

  test("topicKeywords: exclusive terms score positive, ubiquitous terms zero, stopwords absent") {
    // two separable clusters; kmeans seeds are vec 0 (→ x-axis) and
    // vec 1 (→ y-axis), so membership is deterministic by construction
    val emb = (0L until 10L).map { i =>
      val a = if (i == 0 || (i >= 2 && i < 6)) 1f else 0f
      (i, Seq(a, 1f - a, 0f, 0f))
    }.toDF("vec_id", "embedding")
    val docs = (0L until 10L).map { i =>
      val marker = if (i == 0 || (i >= 2 && i < 6)) "quartz" else "lattice"
      (i, s"the $marker shared shared")
    }.toDF("doc_id", "text")
    val out = Curation.topicKeywords(emb, docs, k = 2, iters = 2, topN = 5)
      .select("topic", "word", "df_topics", "score_micro", "rnk")
      .as[(Long, String, Long, Long, Int)].collect().toSeq
    assert(!out.exists(_._2 === "the"), "stopword leaked into keywords")
    // each topic's rank-1 keyword is its exclusive marker, positive score
    val r1 = out.filter(_._5 === 1).map(r => r._2 -> r._4)
    assert(r1.map(_._1).toSet === Set("quartz", "lattice"))
    assert(r1.forall(_._2 > 0L))
    // a word present in every topic carries exactly zero score
    assert(out.filter(_._2 === "shared").forall(r => r._3 === 2L && r._4 === 0L))
    assert(out.groupBy(_._1).forall(_._2.size <= 5))
  }

  test("qualityLr replicates driver-side integer GD over its own features") {
    // mixed corpus: stopword-heavy short docs (teacher 0) vs long
    // content-word docs (teacher 1)
    val d = ((0L until 10L).map(i => (i, Seq.fill(30)("the in of it").mkString(" "))) ++
      (10L until 20L).map(i => (i, Seq.fill(60)("quartz lattice phonon").mkString(" "))))
      .toDF("doc_id", "text")
    val iters = 2
    val lr = 4.0
    val out = Curation.qualityLr(d, iters = iters, lr = lr)
      .orderBy("iter")
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSeq
    // replicate the exact integer GD from the collected feature rows
    val feats = Curation.lrFeats(d, 0.9)
      .select("x1", "x2", "x3", "x4", "y")
      .as[(Double, Double, Double, Double, Int)].collect()
    val n = feats.length
    var w = Array.fill(5)(0L)
    val expect = (1 to iters).map { it =>
      def rnd6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
      val grads = Array.fill(5)(0L)
      feats.foreach { case (x1, x2, x3, x4, y) =>
        val z = rnd6((w(0).toDouble + w(1).toDouble * x1 + w(2).toDouble * x2
          + w(3).toDouble * x3 + w(4).toDouble * x4) / 1e6)
        val p = rnd6(1.0 / (1.0 + math.exp(-z)))
        val xs = Array(1.0, x1, x2, x3, x4)
        for (i <- 0 until 5)
          grads(i) += math.floor((p - y) * xs(i) * 1e6 + 0.5).toLong
      }
      w = w.indices.toArray.map(i =>
        w(i) - math.floor(lr * grads(i) / n + 0.5).toLong)
      (it, w(0), w(1), w(2), w(3), w(4))
    }
    assert(out === expect)
  }

  test("qualityLrScores: audit fields are self-consistent, degenerates excluded") {
    val d = ((0L until 8L).map(i => (i, Seq.fill(40)("the in of it and").mkString(" "))) ++
      (8L until 16L).map(i => (i, Seq.fill(60)("quartz lattice phonon").mkString(" "))) :+
      (99L, "")).toDF("doc_id", "text") // empty doc must be excluded
    val out = Curation.qualityLrScores(d, iters = 4)
      .select("doc_id", "score_micro", "predicted", "teacher", "agree")
      .as[(Long, Long, Boolean, Boolean, Boolean)].collect().toSeq
    assert(!out.exists(_._1 === 99L), "degenerate doc leaked into scoring")
    assert(out.size === 16)
    assert(out.forall(r => r._2 >= 0L && r._2 <= 1000000L))
    assert(out.forall(r => r._5 === ((r._3 === r._4))), "agree flag inconsistent")
    // the two blocks have opposite teacher labels (threshold 0.9)
    assert(out.count(_._4) === 8)
  }
}
