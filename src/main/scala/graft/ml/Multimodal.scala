package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus the batch-shaped decode → feature-extract /
  * resize / frame-sample operators a training-data pipeline needs.
  *
  * Design (the Scala analogue of `mapInPandas` batch processing):
  *  - media rows are `(media_id, kind, bytes, width, height, n_frames)` —
  *    the payload stays opaque to Catalyst; only metadata is columnar;
  *  - decode runs in `mapPartitions`, pulling rows through a pluggable
  *    [[Decoder]] in bounded batches (`BatchSize`), so a real codec gets
  *    amortized dispatch and bounded memory exactly like an Arrow batch;
  *    partition parallelism is Spark's — no driver involvement;
  *  - THE CODEC IS A STUB: this container has no image/audio libraries,
  *    so [[FakeDecoder]] "decodes" by interpreting the raw payload bytes
  *    as 8-bit gray pixels (deterministic, metadata-shaped). A production
  *    build replaces ONE function (`Decoder.decode`) with e.g. TwelveMonkeys
  *    ImageIO or ffmpeg bindings; every schema, batch shape, and operator
  *    downstream is real and stays unchanged.
  *
  * The synthetic corpus ([[syntheticMedia]]) derives payload bytes from
  * md5 chains of the media id — generated with Spark column expressions,
  * reproducible bit-for-bit in DuckDB from the hex form, which is what
  * makes the decode/feature/resize/frame operators oracle-checkable
  * end-to-end despite the stubbed codec.
  */
object Multimodal {

  /** 16×16 gray "image" = 256 bytes = 16 md5 blocks. */
  val Width = 16
  val Height = 16
  val FrameBytes = 64 // video: 4 frames of 64 bytes over the same payload
  val NFrames = 4
  private val Blocks = Width * Height / 16

  /** Bounded decode batch (the "Arrow batch" of the Scala path). */
  val BatchSize = 64

  final case class Media(media_id: Long, kind: String, bytes: Array[Byte],
                         width: Int, height: Int, n_frames: Int)

  /** Pluggable codec: payload bytes + metadata → row-major 8-bit pixels. */
  trait Decoder extends Serializable {
    def decode(bytes: Array[Byte], width: Int, height: Int): Array[Int]
  }

  /** STUB codec — identity over the payload (bytes ARE the pixels).
    * Replace with a real image library in production; nothing else moves.
    */
  object FakeDecoder extends Decoder {
    def decode(bytes: Array[Byte], width: Int, height: Int): Array[Int] = {
      require(bytes.length >= width * height, "payload shorter than metadata shape")
      Array.tabulate(width * height)(i => bytes(i) & 0xff)
    }
  }

  /** Deterministic opaque payloads for every document id: 256 bytes from
    * 16 chained md5 blocks, kind round-robined image/audio/video. Pure
    * column expressions — distributed, no UDF, no driver state.
    */
  def syntheticMedia(docs: DataFrame): DataFrame = {
    val hexCol = concat((0 until Blocks).map(b =>
      md5(concat(col("doc_id").cast("string"), lit(s":media:$b")))): _*)
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      unhex(hexCol).as("bytes"),
      lit(Width).as("width"), lit(Height).as("height"),
      lit(NFrames).as("n_frames"))
  }

  /** The same payload in DuckDB as a hex string relation
    * `media(media_id, kind, hex, width, height, n_frames)`.
    */
  val syntheticMediaSqlCte: String = {
    val hexExpr = (0 until Blocks)
      .map(b => s"md5(doc_id::VARCHAR || ':media:$b')").mkString(" || ")
    s"""media AS (
       |  SELECT doc_id AS media_id,
       |         (['image','audio','video'])[(((doc_id % 3) + 3) % 3)::INT + 1] AS kind,
       |         $hexExpr AS hex,
       |         $Width AS width, $Height AS height, $NFrames AS n_frames
       |  FROM documents)""".stripMargin
  }

  /** DuckDB pixel table from the hex payload: (media_id, i, px), i 0-based
    * row-major — the oracle twin of Decoder.decode.
    */
  val pixelsSqlCte: String =
    s"""pixels AS (
       |  SELECT media_id, i,
       |         ('0x' || substr(hex, 2 * i + 1, 2))::INT AS px
       |  FROM media, unnest(range(0, width * height)) AS r(i))""".stripMargin

  private def decodedPixels(media: DataFrame): Dataset[(Long, Array[Int])] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes", "width", "height").as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        // bounded batches through the codec, like an Arrow batch would be
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes, w, h) =>
            (id, FakeDecoder.decode(bytes, w, h))
          }
        }
      }
  }

  /** Per-image features over the decoded pixels: count, mean (6 dp),
    * min/max, and a polynomial rolling hash (order-sensitive content
    * fingerprint, exact integer math).
    */
  def imageFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val M = 1000000007L
    decodedPixels(media).map { case (id, px) =>
      var h = 0L
      var s = 0L
      var mn = 255
      var mx = 0
      px.foreach { p =>
        h = (h * 31 + p) % M; s += p
        if (p < mn) mn = p
        if (p > mx) mx = p
      }
      (id, px.length.toLong,
        math.floor(s.toDouble / px.length * 1e6 + 0.5) / 1e6,
        mn.toLong, mx.toLong, h)
    }.toDF("media_id", "n_px", "mean_px", "min_px", "max_px", "px_hash")
  }

  def imageFeaturesOracleSql: String = {
    // closed form of the iterative hash: Σ px_i · 31^(n−1−i) mod M, with
    // the 256 powers precomputed (1-indexed: pows[k] = 31^(k-1) mod M)
    val M = 1000000007L
    val pows = Iterator.iterate(1L)(p => p * 31 % M).take(Width * Height)
      .mkString("[", ", ", "]")
    s"""WITH $syntheticMediaSqlCte,
       |$pixelsSqlCte,
       |feat AS (
       |  SELECT media_id, count(*) AS n_px,
       |         floor(avg(px::DOUBLE) * 1e6 + 0.5) / 1e6 AS mean_px,
       |         min(px)::BIGINT AS min_px, max(px)::BIGINT AS max_px,
       |         (sum((px::BIGINT * ($pows)[${Width * Height} - i]) % $M) % $M)::BIGINT AS px_hash
       |  FROM pixels GROUP BY media_id)
       |SELECT media_id, n_px, mean_px, min_px, max_px, px_hash FROM feat""".stripMargin
  }

  /** Nearest-neighbor resize to `ow`×`oh`: out(y,x) = in(y·h/oh, x·w/ow)
    * (the standard integer NN mapping). Long-form output keeps it
    * columnar and oracle-friendly: (media_id, y, x, px).
    */
  def resize(media: DataFrame, ow: Int, oh: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "bytes", "width", "height").as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, bytes, w, h) =>
            val px = FakeDecoder.decode(bytes, w, h)
            for (y <- 0 until oh; x <- 0 until ow)
              yield (id, y.toLong, x.toLong, px((y * h / oh) * w + (x * w / ow)).toLong)
          }
        }
      }.toDF("media_id", "y", "x", "px")
  }

  def resizeOracleSql(ow: Int, oh: Int): String =
    s"""WITH $syntheticMediaSqlCte,
       |$pixelsSqlCte,
       |coords AS (
       |  SELECT m.media_id, y.y, x.x,
       |         ((y.y * m.height) // $oh) * m.width + ((x.x * m.width) // $ow) AS src_i
       |  FROM media m, unnest(range(0, $oh)) AS y(y), unnest(range(0, $ow)) AS x(x))
       |SELECT c.media_id, c.y, c.x, p.px::BIGINT AS px
       |FROM coords c JOIN pixels p ON c.media_id = p.media_id AND c.src_i = p.i""".stripMargin

  /** Windowed RMS levels for audio payloads (the shape of a loudness /
    * silence-trim feature): window w = samples [w·n, (w+1)·n), rms =
    * sqrt(mean(sample²)). All-exact arithmetic when n is a power of two
    * (integer square sums, exact binary division, IEEE sqrt), so the
    * 6-dp floor-round matches the oracle bit-for-bit.
    */
  def audioRms(media: DataFrame, windowSamples: Int = 32): DataFrame = {
    require(Integer.bitCount(windowSamples) == 1, "power-of-two window")
    val spark = media.sparkSession
    import spark.implicits._
    media.where(col("kind") === "audio")
      .select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, bytes) =>
            bytes.grouped(windowSamples).zipWithIndex
              .filter(_._1.length == windowSamples) // drop trailing partial
              .map { case (win, w) =>
                var ss = 0L
                win.foreach { b => val v = b & 0xff; ss += v.toLong * v }
                val rms = math.sqrt(ss.toDouble / windowSamples)
                (id, w.toLong, math.floor(rms * 1e6 + 0.5) / 1e6)
              }
          }
        }
      }.toDF("media_id", "win_idx", "rms")
  }

  def audioRmsOracleSql(windowSamples: Int = 32): String =
    s"""WITH $syntheticMediaSqlCte,
       |$pixelsSqlCte,
       |wins AS (
       |  SELECT p.media_id, p.i // $windowSamples AS win_idx,
       |         sum(p.px::BIGINT * p.px::BIGINT) AS ss, count(*) AS n
       |  FROM pixels p JOIN media m ON p.media_id = m.media_id
       |  WHERE m.kind = 'audio'
       |  GROUP BY p.media_id, p.i // $windowSamples)
       |SELECT media_id, win_idx::BIGINT AS win_idx,
       |       floor(sqrt(ss::DOUBLE / $windowSamples) * 1e6 + 0.5) / 1e6 AS rms
       |FROM wins WHERE n = $windowSamples""".stripMargin

  /** Frame sampling for video payloads: frame f = bytes
    * [f·FrameBytes, (f+1)·FrameBytes); keep every `stride`-th frame and
    * emit its mean level — the shape of a real key-frame extractor.
    */
  def frameSample(media: DataFrame, stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.where(col("kind") === "video")
      .select("media_id", "bytes", "n_frames").as[(Long, Array[Byte], Int)]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, bytes, nf) =>
            (0 until nf by stride).map { f =>
              val frame = bytes.slice(f * FrameBytes, (f + 1) * FrameBytes)
              val mean = frame.map(_ & 0xff).sum.toDouble / frame.length
              (id, f.toLong, math.floor(mean * 1e6 + 0.5) / 1e6)
            }
          }
        }
      }.toDF("media_id", "frame_idx", "mean_px")
  }

  def frameSampleOracleSql(stride: Int): String =
    s"""WITH $syntheticMediaSqlCte,
       |$pixelsSqlCte,
       |frames AS (
       |  SELECT p.media_id, p.i // $FrameBytes AS frame_idx, p.px
       |  FROM pixels p JOIN media m ON p.media_id = m.media_id
       |  WHERE m.kind = 'video' AND p.i < m.n_frames * $FrameBytes)
       |SELECT media_id, frame_idx::BIGINT AS frame_idx,
       |       floor(avg(px::DOUBLE) * 1e6 + 0.5) / 1e6 AS mean_px
       |FROM frames
       |WHERE frame_idx % $stride = 0
       |GROUP BY media_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------------
  // Perceptual-hash image near-dup
  // ---------------------------------------------------------------------

  /** Synthetic media variant where docs in groups of `groupSize` share
    * one payload (seed = doc_id DIV groupSize) — gives the perceptual-
    * hash dedup real duplicate images to find; the per-doc media_id
    * stays unique. Same shape as [[syntheticMedia]].
    */
  def syntheticMediaGrouped(docs: DataFrame, groupSize: Int = 7,
                            kind: String = "image"): DataFrame = {
    val hexCol = concat((0 until Blocks).map(b =>
      md5(concat(expr(s"doc_id DIV $groupSize").cast("string"),
        lit(s":media:$b")))): _*)
    docs.select(
      col("doc_id").as("media_id"),
      lit(kind).as("kind"),
      unhex(hexCol).as("bytes"),
      lit(Width).as("width"), lit(Height).as("height"),
      lit(NFrames).as("n_frames"))
  }

  def syntheticMediaGroupedSqlCte(groupSize: Int = 7,
                                  kind: String = "image"): String = {
    val hexExpr = (0 until Blocks)
      .map(b => s"md5((doc_id // $groupSize)::VARCHAR || ':media:$b')")
      .mkString(" || ")
    s"""media AS (
       |  SELECT doc_id AS media_id, '$kind' AS kind, $hexExpr AS hex,
       |         $Width AS width, $Height AS height, $NFrames AS n_frames
       |  FROM documents)""".stripMargin
  }

  /** Perceptual average-hash (aHash) near-dup pairs over decoded images:
    * 16×16 pixels → 8×8 block sums → bit j = "block j brighter than the
    * image mean" (the integer-exact compare s_j·64 > Σs), packed into the
    * 60-bit convention shared with [[Dedup.simHash]]; candidate pairs
    * from the same 15-bit-band pigeonhole (exact for hamming ≤ 3).
    * Output: (media_a, media_b, hamming).
    *
    * This is the multimodal twin of text SimHash: decode runs in batched
    * mapPartitions through the pluggable codec, everything after the
    * hash is columnar. A production build swaps the codec only.
    */
  /** (media_id, phash) aHash signatures — factored out so the pair and
    * chain variants share one decode+hash pass.
    */
  def imagePHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    decodedPixels(media.where(col("kind") === "image"))
      .map { case (id, px) =>
        val s = Array.tabulate(64) { b =>
          val r = b / 8; val c = b % 8; val base = 2 * r * Width + 2 * c
          px(base) + px(base + 1) + px(base + Width) + px(base + Width + 1)
        }
        val tot = s.map(_.toLong).sum
        var h = 0L; var b = 0
        while (b < 60) { if (s(b) * 64L > tot) h |= 1L << b; b += 1 }
        (id, h)
      }.toDF("media_id", "phash")
      .localCheckpoint() // both band-join sides reuse the decode+hash pass
  }

  def imagePHash(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-band prefilter is exact only for <= 3")
    val band = imagePHashes(media)
      .withColumn("b", explode(lit((0 until 4).toArray)))
      .withColumn("bkey", expr("shiftright(phash, 15 * b) & 32767"))
    band.as("a").join(band.as("b"),
        col("a.b") === col("b.b") && col("a.bkey") === col("b.bkey") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        expr("bit_count(a.phash ^ b.phash)").as("hamming"))
      // filter before distinct (see Dedup.simHash): result-identical,
      // and the dedup hash set holds matches, not band collisions
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Cluster-oriented aHash — the [[Dedup.simHashChain]] pattern on media:
    * within each 15-bit band bucket, lag-window chain edges (m−1 per
    * m-member bucket instead of C(m,2)), hamming-verified in place from
    * the lagged signature. Linear in bucket occupancy however large the
    * duplicate-media families grow; output is a SUBSET of [[imagePHash]]
    * pairs intended to feed [[Dedup.components]].
    */
  def imagePHashChain(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-band prefilter is exact only for <= 3")
    val band = imagePHashes(media)
      .withColumn("b", explode(lit((0 until 4).toArray)))
      .withColumn("bkey", expr("shiftright(phash, 15 * b) & 32767"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("b", "bkey").orderBy("media_id")
    band
      .withColumn("prev_id", lag("media_id", 1).over(w))
      .withColumn("prev_ph", lag("phash", 1).over(w))
      .where(col("prev_id").isNotNull)
      .select(col("prev_id").as("media_a"), col("media_id").as("media_b"),
        expr("bit_count(prev_ph ^ phash)").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Scene-cut detection over video payloads: per video, the mean level
    * of every frame (stride-1 [[frameSample]]), then a lag() delta along
    * the frame axis — a cut is a frame whose mean jumps more than
    * `threshold` from its predecessor (the shape of a key-frame /
    * shot-boundary extractor). The first frame has no predecessor: delta
    * 0, never a cut. One batched decode pass + one window partitioned by
    * media_id. Output: (media_id, frame_idx, delta, is_cut).
    */
  def sceneCuts(media: DataFrame, threshold: Double = 8.0): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_idx")
    val delta = round(abs(col("mean_px") - lag(col("mean_px"), 1).over(w)), 6)
    frameSample(media, 1)
      .select(col("media_id"), col("frame_idx"),
        coalesce(delta, lit(0.0)).as("delta"))
      .withColumn("is_cut", col("delta") > threshold)
  }

  def sceneCutsOracleSql(threshold: Double = 8.0): String =
    s"""WITH $syntheticMediaSqlCte,
       |$pixelsSqlCte,
       |frames AS (
       |  SELECT p.media_id, p.i // $FrameBytes AS frame_idx,
       |         floor(avg(p.px::DOUBLE) * 1e6 + 0.5) / 1e6 AS mean_px
       |  FROM pixels p JOIN media m ON p.media_id = m.media_id
       |  WHERE m.kind = 'video' AND p.i < m.n_frames * $FrameBytes
       |  GROUP BY p.media_id, p.i // $FrameBytes),
       |deltas AS (
       |  SELECT media_id, frame_idx::BIGINT AS frame_idx,
       |         coalesce(round(abs(mean_px - lag(mean_px) OVER (
       |           PARTITION BY media_id ORDER BY frame_idx)), 6), 0.0) AS delta
       |  FROM frames)
       |SELECT media_id, frame_idx, delta, delta > $threshold AS is_cut
       |FROM deltas""".stripMargin

  // ---------------------------------------------------------------------
  // Audio fingerprint near-dup
  // ---------------------------------------------------------------------

  /** Audio-fingerprint near-dup pairs — the audio twin of [[imagePHash]]
    * (and of text SimHash): per payload, 64 windows of `winSamples`
    * samples each yield an energy (sum of squares — INTEGER, so the
    * "energy rising" compare needs no sqrt and no float rounding);
    * signature bit w = energy(w+1) > energy(w), the classic
    * spectral-delta fingerprint shape collapsed to the time domain the
    * stub codec exposes. 60 delta bits pack into the shared 60-bit
    * convention; candidates come from the same 15-bit-band pigeonhole
    * (exact for hamming ≤ 3). Output: (media_a, media_b, hamming).
    */
  def audioFingerprint(media: DataFrame, maxHamming: Int = 3,
                       winSamples: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    require(maxHamming <= 3, "4-band prefilter is exact only for <= 3")
    val hashes = media.where(col("kind") === "audio")
      .select("media_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            val ss = bytes.grouped(winSamples).map { win =>
              var s = 0L
              win.foreach { b => val v = b & 0xff; s += v.toLong * v }
              s
            }.toArray
            var h = 0L
            var w = 0
            while (w < 60 && w + 1 < ss.length) {
              if (ss(w + 1) > ss(w)) h |= 1L << w
              w += 1
            }
            (id, h)
          }
        }
      }.toDF("media_id", "afp")
      .localCheckpoint() // both band-join sides reuse the decode+hash pass
    val band = hashes.withColumn("b", explode(lit((0 until 4).toArray)))
      .withColumn("bkey", expr("shiftright(afp, 15 * b) & 32767"))
    band.as("a").join(band.as("b"),
        col("a.b") === col("b.b") && col("a.bkey") === col("b.bkey") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        expr("bit_count(a.afp ^ b.afp)").as("hamming"))
      // filter before distinct (see Dedup.simHash)
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  def audioFingerprintOracleSql(maxHamming: Int = 3, winSamples: Int = 4,
                                groupSize: Int = 7): String = {
    val nWins = Width * Height / winSamples
    val ssCols = (0 until nWins).map(w =>
      s"sum(CASE WHEN i // $winSamples = $w THEN px::BIGINT * px::BIGINT ELSE 0 END) AS ss$w")
      .mkString(",\n         ")
    val bits = (0 until 60).map(w =>
      s"(CASE WHEN ss${w + 1} > ss$w THEN ${1L << w}::BIGINT ELSE 0 END)")
      .mkString(" + ")
    s"""WITH ${syntheticMediaGroupedSqlCte(groupSize, "audio")},
       |$pixelsSqlCte,
       |wins AS (
       |  SELECT media_id,
       |         $ssCols
       |  FROM pixels GROUP BY media_id),
       |hashes AS (SELECT media_id, $bits AS afp FROM wins),
       |band AS (
       |  SELECT media_id, afp, b, (afp >> (15 * b)) & 32767 AS bkey
       |  FROM hashes, unnest(range(0, 4)) AS r(b))
       |SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
       |       bit_count(xor(a.afp, b.afp))::BIGINT AS hamming
       |FROM band a JOIN band b
       |  ON a.b = b.b AND a.bkey = b.bkey AND a.media_id < b.media_id
       |WHERE bit_count(xor(a.afp, b.afp)) <= $maxHamming""".stripMargin
  }

  def imagePHashOracleSql(maxHamming: Int = 3, groupSize: Int = 7): String = {
    val bits = (0 until 60).map(b =>
      s"(CASE WHEN s$b * 64 > tot THEN ${1L << b}::BIGINT ELSE 0 END)")
      .mkString(" + ")
    val sCols = (0 until 60).map { b =>
      val r = b / 8; val c = b % 8; val base = 2 * r * Width + 2 * c
      s"sum(CASE WHEN i IN ($base, ${base + 1}, ${base + Width}, ${base + Width + 1}) THEN px ELSE 0 END) AS s$b"
    }.mkString(",\n         ")
    s"""WITH ${syntheticMediaGroupedSqlCte(groupSize)},
       |$pixelsSqlCte,
       |blocks AS (
       |  SELECT media_id, sum(px) AS tot,
       |         $sCols
       |  FROM pixels GROUP BY media_id),
       |hashes AS (SELECT media_id, $bits AS phash FROM blocks),
       |band AS (
       |  SELECT media_id, phash, b, (phash >> (15 * b)) & 32767 AS bkey
       |  FROM hashes, unnest(range(0, 4)) AS r(b))
       |SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
       |       bit_count(xor(a.phash, b.phash))::BIGINT AS hamming
       |FROM band a JOIN band b
       |  ON a.b = b.b AND a.bkey = b.bkey AND a.media_id < b.media_id
       |WHERE bit_count(xor(a.phash, b.phash)) <= $maxHamming""".stripMargin
  }

  /** Oracle for [[imagePHashChain]]: the identical lag-window chain. */
  def imagePHashChainOracleSql(maxHamming: Int = 3, groupSize: Int = 7): String = {
    val bits = (0 until 60).map(b =>
      s"(CASE WHEN s$b * 64 > tot THEN ${1L << b}::BIGINT ELSE 0 END)")
      .mkString(" + ")
    val sCols = (0 until 60).map { b =>
      val r = b / 8; val c = b % 8; val base = 2 * r * Width + 2 * c
      s"sum(CASE WHEN i IN ($base, ${base + 1}, ${base + Width}, ${base + Width + 1}) THEN px ELSE 0 END) AS s$b"
    }.mkString(",\n         ")
    s"""WITH ${syntheticMediaGroupedSqlCte(groupSize)},
       |$pixelsSqlCte,
       |blocks AS (
       |  SELECT media_id, sum(px) AS tot,
       |         $sCols
       |  FROM pixels GROUP BY media_id),
       |hashes AS (SELECT media_id, $bits AS phash FROM blocks),
       |band AS (
       |  SELECT media_id, phash, b, (phash >> (15 * b)) & 32767 AS bkey
       |  FROM hashes, unnest(range(0, 4)) AS r(b)),
       |chain AS (
       |  SELECT lag(media_id) OVER (PARTITION BY b, bkey ORDER BY media_id) AS media_a,
       |         lag(phash) OVER (PARTITION BY b, bkey ORDER BY media_id) AS ph_a,
       |         media_id AS media_b, phash AS ph_b
       |  FROM band)
       |SELECT DISTINCT media_a, media_b,
       |       bit_count(xor(ph_a, ph_b))::BIGINT AS hamming
       |FROM chain
       |WHERE media_a IS NOT NULL
       |  AND bit_count(xor(ph_a, ph_b)) <= $maxHamming""".stripMargin
  }
}
