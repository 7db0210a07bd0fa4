package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming-under-load harness: drives the Structured Streaming operators
  * from a scale-corpus file source and measures STATE, not just wall time —
  * per micro-batch state-store rows/bytes, watermark progress, and row
  * eviction, the numbers that decide whether an unbounded deployment
  * plateaus or leaks.
  *
  * The unit suites prove the streaming operators bit-equal their batch
  * twins on toy inputs; what they cannot show is the state story under
  * real volume: a windowed aggregation whose watermark never evicts, or a
  * session store that grows with events instead of open sessions, only
  * reveals itself when millions of rows flow through. This main stages the
  * scale corpus's events table as a CHRONOLOGICAL file stream (time-range
  * chunks written in order, `maxFilesPerTrigger=1`, so event time — and
  * with it the watermark — advances across micro-batches the way a live
  * source's would), runs each streaming stage against it, and dumps one
  * JSON line per micro-batch from the engine's own progress metrics.
  *
  * Stages measured:
  *  - `trend`: [[streaming.StreamingTrend.rebinStream]] keyed per-user
  *    (~136k counters at the 100× corpus — the per-event_type keying of
  *    the oracle queries has 5 keys, load-free by construction), hourly
  *    bins, 2-hour watermark slack. Expected plateau: open windows =
  *    active counters × (slack/bin + 1), independent of events consumed.
  *  - `sessions`: [[streaming.StreamingSessions.sessionizeStream]], the
  *    native session_window store, 1800 s gap, same slack. Expected
  *    plateau: open sessions per active user, with the five whale users
  *    (~180k events each) exercising single-key state merge.
  *  - `select`: [[ml.StreamingSelect.scoreStream]] over the corpus's
  *    non-seed documents against the standing BM25 profile — stateless
  *    by construction; the measurement is score-at-ingest THROUGHPUT.
  *  - `neardup`: [[ml.StreamingNearDup.nearDupProbeStream]] — 1% of
  *    documents arrive as the stream, the other 99% stand as the
  *    snapshot whose index relations materialize once; per-batch cost
  *    must be the indexed probe, not an O(corpus) re-index.
  *  - `drift`: [[ml.StreamingDrift.driftStream]] over the embeddings —
  *    the one ml stream WITH state; its plateau must pin at the
  *    DIMENSION count (64 rows) while the whole corpus flows through.
  *
  * Output: `BENCH_streaming.json` — per-stage per-batch
  * (inputRows, stateRows, stateBytes, rowsRemoved, watermark) plus a
  * summary with the plateau verdict: state in the last third of batches
  * must not exceed `plateauTolerance` × the middle third's peak (a leak
  * grows monotonically with consumed input; a plateau oscillates).
  */
object StreamBench {

  private case class BatchRow(batch: Long, inputRows: Long, stateRows: Long,
                              stateBytes: Long, rowsRemoved: Long,
                              watermark: String)

  private def runStage(spark: SparkSession, name: String, out: DataFrame,
                       ckpt: String, outputMode: String = "append")
      : (Seq[BatchRow], Double) = {
    val t0 = System.nanoTime()
    val q: StreamingQuery = out.writeStream
      .format("noop")
      .outputMode(outputMode)
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    q.stop()
    val wall = (System.nanoTime() - t0) / 1e9
    val rows = q.recentProgress.toSeq.map { p =>
      val so = p.stateOperators.headOption
      BatchRow(p.batchId, p.numInputRows,
        so.map(_.numRowsTotal).getOrElse(0L),
        so.map(_.memoryUsedBytes).getOrElse(0L),
        so.map(_.numRowsRemoved).getOrElse(0L),
        Option(p.eventTime.get("watermark")).getOrElse(""))
    }.filter(_.inputRows > 0)
    rows.foreach { r =>
      println(s"""{"stage":"$name","batch":${r.batch},"inputRows":${r.inputRows},""" +
        s""""stateRows":${r.stateRows},"stateBytes":${r.stateBytes},""" +
        s""""rowsRemoved":${r.rowsRemoved},"watermark":"${r.watermark}"}""")
    }
    (rows, wall)
  }

  /** A leak grows with total input; a plateau oscillates. Compare the last
    * third's peak state against the middle third's (the first third is
    * still ramping up from empty).
    */
  private def plateau(rows: Seq[BatchRow], tol: Double = 1.3): (Boolean, Long, Long) = {
    if (rows.size < 6) return (true, 0L, 0L)
    val n = rows.size
    val mid = rows.slice(n / 3, 2 * n / 3).map(_.stateRows).max
    val last = rows.slice(2 * n / 3, n).map(_.stateRows).max
    (last <= (mid * tol).toLong, mid, last)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sfL")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nChunks = sys.env.getOrElse("SPARK_GRAFT_STREAM_CHUNKS", "40").toInt
    val outPath = sys.env.getOrElse("SPARK_GRAFT_STREAM_OUT", "BENCH_streaming.json")
    val work = sys.env.getOrElse("SPARK_GRAFT_STREAM_DIR", "/tmp/graft_stream")
    // stage filter (comma list) — at the 1000x corpus the full five-stage
    // run is impractically long (select alone streams 5M docs at its
    // md5-bound rate), so scale runs pick the stages whose cost model
    // makes an XL measurement informative
    // *_recover stages are the kill-and-restart recovery proofs (run
    // explicitly, not part of the default load suite): one uninterrupted
    // reference run, then a run stopped MID-STREAM (q.stop() interrupts
    // the micro-batch thread; an in-flight batch's offsets are never
    // committed, so the restart must replay it) and restarted from the
    // same checkpoint. Pass = the restart resumes with its state at the
    // kill-time plateau (not empty) and the final output is bit-equal to
    // the uninterrupted run (exactly-once sink contract).
    val known = Set("trend", "sessions", "select", "neardup", "drift",
      "trend_recover", "drift_recover", "scorer_recover", "drift_killexec",
      "serve_recover", "lex_serve_recover")
    val stages = sys.env.getOrElse("SPARK_GRAFT_STREAM_STAGES",
      "trend,sessions,select,neardup,drift")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    // a typo'd stage name must fail loudly, not silently produce an
    // empty (and malformed) result file after paying session startup
    require(stages.nonEmpty && stages.subsetOf(known),
      s"SPARK_GRAFT_STREAM_STAGES: unknown stage(s) ${stages -- known}; " +
        s"known: ${known.mkString(",")}")
    val results = scala.collection.mutable.LinkedHashMap
      .empty[String, (Seq[BatchRow], Double)]
    // recovery stages emit a self-contained JSON object each
    val recResults = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // SPARK_GRAFT_MASTER mirrors Bench: local-cluster[n,cores,mem] forks
    // real executor JVMs — required by drift_killexec, whose whole point
    // is SIGKILLing one of them mid-stream. Same executor-classpath and
    // heap-from-worker-offer handling as Bench.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // keep every micro-batch's progress (sized to the chunk count):
      // dropped progress rows would silently hide the ramp-up phase from
      // the plateau check and undercount inputRows in the throughput sum
      .config("spark.sql.streaming.numRecentProgressUpdates",
        math.max(256, nChunks + 16).toString)
    sys.env.get("SPARK_GRAFT_EXEC_CP").foreach { cp =>
      builder.config("spark.executor.extraClassPath", cp)
    }
    val LocalClusterMem = """local-cluster\[\s*\d+\s*,\s*\d+\s*,\s*(\d+)\s*\]""".r
    master match {
      case LocalClusterMem(mem) => builder.config("spark.executor.memory", s"${mem}m")
      case _ => ()
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- stage the corpus as a chronological file stream ----
    // Time-ordered chunks written sequentially: zero-padded names AND
    // increasing mod-times agree, so whatever order FileStreamSource
    // lists by, micro-batches consume event time monotonically — the
    // watermark advances per batch exactly as against a live source.
    val inDir = s"$work/events_in"
    def clean(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(clean)
      f.delete(); ()
    }
    // clean the whole work root, not just the input: a stale streaming
    // CHECKPOINT would silently resume committed offsets and replay
    // nothing — the run would report an empty, trivially-plateaued state
    val workRoot = new java.io.File(work)
    if (workRoot.exists()) clean(workRoot)
    val dir = new java.io.File(inDir)
    dir.mkdirs()
    if (stages("trend") || stages("sessions") || stages("trend_recover") ||
        stages("scorer_recover")) {
      val ev = Tables.load(spark, sfDir, "events")
      val tsCol = ev.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          timestamp_seconds(expr("ts DIV 1000000000"))
        case _ => date_trunc("second", col("ts"))
      }
      val events = ev.select(tsCol.as("ts"), col("user_id"), col("value"))
        .localCheckpoint()
      val Row2 = events.agg(min("ts"), max("ts")).head()
      val (loTs, hiTs) = (Row2.getTimestamp(0).getTime, Row2.getTimestamp(1).getTime)
      val span = math.max(1L, hiTs - loTs + 1)
      // scorer_recover streams the BINNED table, not raw events — skip
      // the event-chunk staging when it is the only stage requested
      if (stages("trend") || stages("sessions") || stages("trend_recover")) {
        val total = (0 until nChunks).map { i =>
          val lo = loTs + span * i / nChunks
          val hi = if (i == nChunks - 1) hiTs + 1 else loTs + span * (i + 1) / nChunks
          val tmp = s"$work/chunk_tmp"
          val chunk = events.where(col("ts") >= lit(new java.sql.Timestamp(lo)) &&
                                   col("ts") <  lit(new java.sql.Timestamp(hi)))
          chunk.coalesce(1).write.mode("overwrite").parquet(tmp)
          val part = new java.io.File(tmp).listFiles()
            .find(f => f.getName.endsWith(".parquet")).get
          val dest = new java.io.File(dir, f"chunk-$i%04d.parquet")
          java.nio.file.Files.move(part.toPath, dest.toPath)
          dest.length()
        }.sum
        System.err.println(s"[streambench] staged $nChunks chunks, $total bytes")
      }

      val schema = events.schema
      def src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)

      // ---- trend stage: per-user hourly rebin ----
      if (stages("trend")) {
        val trendOut = streaming.StreamingTrend.rebinStream(
          src.select(col("ts"), concat(lit("u"), col("user_id")).as("counter"),
            lit(1.0).as("count")),
          "hours", 1, watermarkSlack = "2 hours")
        results("trend") = runStage(spark, "trend", trendOut, s"$work/ckpt_trend")
      }

      // ---- sessions stage: native session_window store ----
      if (stages("sessions")) {
        val sessOut = streaming.StreamingSessions.sessionizeStream(
          src.select(col("ts"), col("user_id"), col("value")),
          gapSec = 1800L, watermarkSlack = "2 hours")
        results("sessions") =
          runStage(spark, "sessions", sessOut, s"$work/ckpt_sessions")
      }

      // ---- trend recovery: kill mid-stream, restart, prove bit-equal ----
      if (stages("trend_recover")) {
        def mkTrend() = streaming.StreamingTrend.rebinStream(
          src.select(col("ts"), concat(lit("u"), col("user_id")).as("counter"),
            lit(1.0).as("count")),
          "hours", 1, watermarkSlack = "2 hours")
        // order-independent content checksum over the finalized windows:
        // count + two 60-bit sums of md5 slices of canonical JSON rows —
        // collecting millions of output rows to the driver would not scale
        def checksum(df: DataFrame): String = {
          val j = md5(to_json(struct(df.columns.sorted.map(col): _*)))
          val r = df.select(count(lit(1)).cast("decimal(38,0)"),
            sum(conv(substring(j, 1, 15), 16, 10).cast("decimal(38,0)")),
            sum(conv(substring(j, 17, 15), 16, 10).cast("decimal(38,0)"))).head()
          (0 until 3).map(i => Option(r.getDecimal(i)).map(_.toString)
            .getOrElse("0")).mkString(":")
        }
        // parquet sink: its _spark_metadata commit log is what makes the
        // restart exactly-once — files from the replayed in-flight batch
        // are only visible once committed, and a reader goes through the
        // log, never the raw directory listing
        def runTrend(out: String, ckpt: String, killAfter: Int)
            : (Double, Int, Long) = {
          val t0 = System.nanoTime()
          val q = mkTrend().writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .outputMode("append").start()
          if (killAfter > 0) {
            while (q.isActive &&
                q.recentProgress.count(_.numInputRows > 0) < killAfter)
              Thread.sleep(100)
            q.stop() // interrupts the micro-batch thread mid-flight
          } else { q.processAllAvailable(); q.stop() }
          val prog = q.recentProgress.filter(_.numInputRows > 0)
          val firstState = prog.headOption
            .flatMap(_.stateOperators.headOption).map(_.numRowsTotal)
            .getOrElse(0L)
          ((System.nanoTime() - t0) / 1e9, prog.length, firstState)
        }
        val refOut = s"$work/rec_trend_ref_out"
        val (refWall, refBatches, _) =
          runTrend(refOut, s"$work/rec_trend_ref_ckpt", 0)
        val recOut = s"$work/rec_trend_out"
        val recCkpt = s"$work/rec_trend_ckpt"
        val (killWall, killedAfter, _) = runTrend(recOut, recCkpt, nChunks / 2)
        val (resumeWall, resumeBatches, resumeState) = runTrend(recOut, recCkpt, 0)
        val refSum = checksum(spark.read.parquet(refOut))
        val recSum = checksum(spark.read.parquet(recOut))
        recResults("trend_recover") =
          s"""{"refWallSec":$refWall,"refBatches":$refBatches,""" +
          s""""killWallSec":$killWall,"killedAfterBatches":$killedAfter,""" +
          s""""resumeWallSec":$resumeWall,"resumeBatches":$resumeBatches,""" +
          s""""resumeFirstStateRows":$resumeState,""" +
          s""""refChecksum":"$refSum","recChecksum":"$recSum",""" +
          s""""bitEqual":${refSum == recSum}}"""
        println(s"""{"stage":"trend_recover","killedAfterBatches":$killedAfter,""" +
          s""""resumeFirstStateRows":$resumeState,"bitEqual":${refSum == recSum}}""")
      }

      // ---- scorer recovery: the flatMapGroupsWithState state store ----
      // trend_recover proves the WINDOWED-AGG store restores and
      // drift_recover the streaming-agg store; this stage proves the
      // third state flavor — the CUSTOM GroupState the model scorers
      // keep (poissonLcStream: per-counter (lastTs, lastCount), one row
      // per counter ≈ 136k at 100×). The scorer is the second job of the
      // two-stage trend pipeline (rebin composes with it through a
      // sink), so its input here is the binned table itself, staged as
      // chronological time-range chunks — the arrival order the
      // scorer's lastTs regression filter assumes, identical in the
      // reference and recovery runs so a divergence can only come from
      // state restore or batch replay.
      if (stages("scorer_recover")) {
        val binned = events
          .select(concat(lit("u"), col("user_id")).as("counter"), col("ts"))
          .groupBy(col("counter"), window(col("ts"), "3600 seconds"))
          .agg(count(lit(1)).cast("double").as("count"))
          .select(col("counter"), col("window.start").as("ts"),
            lit(3600.0).as("duration_sec"), col("count"))
          .localCheckpoint()
        val binDir = new java.io.File(s"$work/binned_rec_in")
        binDir.mkdirs()
        val ext = binned.agg(min("ts"), max("ts")).head()
        val (bLo, bHi) = (ext.getTimestamp(0).getTime, ext.getTimestamp(1).getTime)
        val bSpan = math.max(1L, bHi - bLo + 1)
        (0 until nChunks).foreach { i =>
          val lo = bLo + bSpan * i / nChunks
          val hi = if (i == nChunks - 1) bHi + 1 else bLo + bSpan * (i + 1) / nChunks
          val tmp = s"$work/chunk_tmp"
          binned.where(col("ts") >= lit(new java.sql.Timestamp(lo)) &&
                       col("ts") <  lit(new java.sql.Timestamp(hi)))
            .coalesce(1).write.mode("overwrite").parquet(tmp)
          val part = new java.io.File(tmp).listFiles()
            .find(f => f.getName.endsWith(".parquet")).get
          java.nio.file.Files.move(part.toPath,
            new java.io.File(binDir, f"chunk-$i%04d.parquet").toPath)
          ()
        }
        def mkScorer() = streaming.StreamingTrend.poissonLcStream(
          spark.readStream.schema(binned.schema)
            .option("maxFilesPerTrigger", "1").parquet(binDir.getPath)).toDF()
        def checksum(df: DataFrame): String = {
          val j = md5(to_json(struct(df.columns.sorted.map(col): _*)))
          val r = df.select(count(lit(1)).cast("decimal(38,0)"),
            sum(conv(substring(j, 1, 15), 16, 10).cast("decimal(38,0)")),
            sum(conv(substring(j, 17, 15), 16, 10).cast("decimal(38,0)"))).head()
          (0 until 3).map(i => Option(r.getDecimal(i)).map(_.toString)
            .getOrElse("0")).mkString(":")
        }
        def runScorer(out: String, ckpt: String, killAfter: Int)
            : (Double, Int, Long) = {
          val t0 = System.nanoTime()
          val q = mkScorer().writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .outputMode("append").start()
          if (killAfter > 0) {
            while (q.isActive &&
                q.recentProgress.count(_.numInputRows > 0) < killAfter)
              Thread.sleep(100)
            q.stop() // interrupts the micro-batch thread mid-flight
          } else { q.processAllAvailable(); q.stop() }
          val prog = q.recentProgress.filter(_.numInputRows > 0)
          val firstState = prog.headOption
            .flatMap(_.stateOperators.headOption).map(_.numRowsTotal)
            .getOrElse(0L)
          ((System.nanoTime() - t0) / 1e9, prog.length, firstState)
        }
        val refOut = s"$work/rec_scorer_ref_out"
        val (refWall, refBatches, _) =
          runScorer(refOut, s"$work/rec_scorer_ref_ckpt", 0)
        val recOut = s"$work/rec_scorer_out"
        val recCkpt = s"$work/rec_scorer_ckpt"
        val (killWall, killedAfter, _) = runScorer(recOut, recCkpt, nChunks / 2)
        val (resumeWall, resumeBatches, resumeState) = runScorer(recOut, recCkpt, 0)
        val refSum = checksum(spark.read.parquet(refOut))
        val recSum = checksum(spark.read.parquet(recOut))
        recResults("scorer_recover") =
          s"""{"refWallSec":$refWall,"refBatches":$refBatches,""" +
          s""""killWallSec":$killWall,"killedAfterBatches":$killedAfter,""" +
          s""""resumeWallSec":$resumeWall,"resumeBatches":$resumeBatches,""" +
          s""""resumeFirstStateRows":$resumeState,""" +
          s""""refChecksum":"$refSum","recChecksum":"$recSum",""" +
          s""""bitEqual":${refSum == recSum}}"""
        println(s"""{"stage":"scorer_recover","killedAfterBatches":$killedAfter,""" +
          s""""resumeFirstStateRows":$resumeState,"bitEqual":${refSum == recSum}}""")
      }
    }

    // ---- corpus-ingest stages: the ml streaming operators ----
    // These are stateless (select, neardup) or dim-bounded-state (drift)
    // by construction; the measurement here is THROUGHPUT under real
    // volume and, for drift, that state actually pins at the dimension
    // count. No watermarks anywhere, so chunk order is irrelevant —
    // chunk by key modulus (one pass per chunk over a checkpointed
    // projection, bench-staging cost only).
    def stageChunks(df: DataFrame, key: String, sub: String,
                    n: Int): String = {
      val d = new java.io.File(s"$work/$sub"); d.mkdirs()
      // track the checkpoint's RDD ids so the corpus-sized blocks can be
      // freed when staging is done: Dataset.unpersist goes through the
      // SQL CacheManager, which never tracked a localCheckpoint's RDD —
      // the bpeTrain checkpointTracked pattern is the one that works
      val sc = spark.sparkContext
      val before = sc.getPersistentRDDs.keySet.toSet
      val proj = df.localCheckpoint()
      val created = sc.getPersistentRDDs.keySet.toSet -- before
      (0 until n).foreach { i =>
        val tmp = s"$work/chunk_tmp"
        // chunk on a HASH of the key: key-modulus would collapse onto a
        // few chunks whenever the key itself has modular structure (the
        // neardup arrivals are doc_id ≡ 0 mod 100, which mod 40 hits
        // only two residues — 38 empty chunks, 2 mega-batches)
        proj.where(pmod(hash(col(key)), lit(n)) === i)
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(f => f.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          new java.io.File(d, f"chunk-$i%04d.parquet").toPath)
      }
      created.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      d.getPath
    }
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val docSchema = docs.schema

    // select: score-at-ingest against the standing BM25 seed profile.
    // Stream side = every non-seed document; profile = broadcast map.
    if (stages("select")) {
      val (profile, avgdl) = ml.StreamingSelect.collectProfile(
        ml.Retrieval.profileWeights(docs, ml.Retrieval.defaultIsQuery))
      val selDir = stageChunks(
        docs.where(!ml.Retrieval.defaultIsQuery), "doc_id", "docs_in", nChunks)
      val selOut = ml.StreamingSelect.scoreStream(
        spark.readStream.schema(docSchema)
          .option("maxFilesPerTrigger", "1").parquet(selDir),
        profile, avgdl)
      results("select") = runStage(spark, "select", selOut, s"$work/ckpt_select")
    }

    // neardup: 1% of documents arrive as the stream, the other 99% are
    // the standing snapshot (its three index relations materialize ONCE
    // — the stream-static join must not re-run the minhash pass per
    // micro-batch; per-batch cost is the indexed probe only).
    if (stages("neardup")) {
      val arriving = docs.where(pmod(col("doc_id"), lit(100)) === 0)
      val ndDir = stageChunks(arriving, "doc_id", "nd_in", nChunks)
      val ndOut = ml.StreamingNearDup.nearDupProbeStream(
        spark.readStream.schema(docSchema)
          .option("maxFilesPerTrigger", "1").parquet(ndDir),
        docs.where(pmod(col("doc_id"), lit(100)) =!= 0))
      results("neardup") = runStage(spark, "neardup", ndOut, s"$work/ckpt_neardup")
    }

    // drift: per-dimension cumulative means vs the standing baseline —
    // the one ml stream WITH state; the plateau check proves it pins at
    // the dimension count (64 rows) while the full corpus flows through.
    if (stages("drift")) {
      val emb = Tables.load(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val embDir = stageChunks(emb, "vec_id", "emb_in", nChunks)
      val driftOut = ml.StreamingDrift.driftStream(
        spark.readStream.schema(emb.schema)
          .option("maxFilesPerTrigger", "1").parquet(embDir),
        Tables.load(spark, sfDir, "embeddings"))
      results("drift") = runStage(spark, "drift", driftOut, s"$work/ckpt_drift", "update")
    }

    // ---- drift recovery: the STATEFUL recovery proof ----
    // Cumulative per-dimension means live in the aggregation state store;
    // a mid-stream kill and restart must restore that state exactly (the
    // restart's first batch reports the 64-row plateau, not 0) and the
    // final per-dimension values must bit-equal an uninterrupted run.
    // Update-mode aggregations cannot use the parquet sink; the sink here
    // is a foreachBatch UPSERT into a driver map keyed by dimension — the
    // idempotent-sink pattern an update-mode deployment uses, where a
    // replayed batch overwrites with identical values.
    if (stages("drift_recover")) {
      val emb = Tables.load(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val embDir = stageChunks(emb, "vec_id", "emb_rec_in", nChunks)
      def mkDrift() = ml.StreamingDrift.driftStream(
        spark.readStream.schema(emb.schema)
          .option("maxFilesPerTrigger", "1").parquet(embDir),
        Tables.load(spark, sfDir, "embeddings"))
      def runDrift(ckpt: String,
                   sinkMap: java.util.concurrent.ConcurrentHashMap[Long, String],
                   killAfter: Int): (Double, Int, Long) = {
        val t0 = System.nanoTime()
        val upsert: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
          (df, _) => df.collect().foreach { r =>
            sinkMap.put(r.getAs[Long]("i"), r.mkString("|")); ()
          }
        val q = mkDrift().writeStream.outputMode("update")
          .option("checkpointLocation", ckpt)
          .foreachBatch(upsert).start()
        if (killAfter > 0) {
          while (q.isActive &&
              q.recentProgress.count(_.numInputRows > 0) < killAfter)
            Thread.sleep(100)
          q.stop()
        } else { q.processAllAvailable(); q.stop() }
        val prog = q.recentProgress.filter(_.numInputRows > 0)
        val firstState = prog.headOption
          .flatMap(_.stateOperators.headOption).map(_.numRowsTotal)
          .getOrElse(0L)
        ((System.nanoTime() - t0) / 1e9, prog.length, firstState)
      }
      val refMap = new java.util.concurrent.ConcurrentHashMap[Long, String]()
      val (refWall, refBatches, _) =
        runDrift(s"$work/rec_drift_ref_ckpt", refMap, 0)
      val recMap = new java.util.concurrent.ConcurrentHashMap[Long, String]()
      val recCkpt = s"$work/rec_drift_ckpt"
      val (killWall, killedAfter, _) = runDrift(recCkpt, recMap, nChunks / 2)
      val (resumeWall, resumeBatches, resumeState) = runDrift(recCkpt, recMap, 0)
      val equal = refMap.equals(recMap)
      recResults("drift_recover") =
        s"""{"refWallSec":$refWall,"refBatches":$refBatches,""" +
        s""""killWallSec":$killWall,"killedAfterBatches":$killedAfter,""" +
        s""""resumeWallSec":$resumeWall,"resumeBatches":$resumeBatches,""" +
        s""""resumeFirstStateRows":$resumeState,""" +
        s""""refDims":${refMap.size},"recDims":${recMap.size},""" +
        s""""bitEqual":$equal}"""
      println(s"""{"stage":"drift_recover","killedAfterBatches":$killedAfter,""" +
        s""""resumeFirstStateRows":$resumeState,"bitEqual":$equal}""")
    }

    // ---- ANN serve recovery: the zero-state stream's offset-log claim ----
    // StreamingAnnServe holds NO stream state (per-query top-k completes
    // within its own micro-batch); its documented recovery contract is
    // "the sink's offset log". This stage converts that claim into a
    // measurement: the sink writes each micro-batch's answers to a
    // batchId-keyed directory with mode=overwrite — the standard
    // foreachBatch idempotence pattern, where a replayed in-flight batch
    // overwrites its own partial output instead of duplicating it. Kill
    // mid-stream, restart from the same checkpoint: every query must be
    // answered exactly once and the union of answers must bit-equal an
    // uninterrupted run.
    if (stages("serve_recover")) {
      val emb = Tables.load(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val idxPath = s"$work/serve_rec_idx"
      ml.Index.saveIvf(emb, idxPath)
      val queries = emb.where(pmod(col("vec_id"), lit(100)) === 0)
      val qDir = stageChunks(queries, "vec_id", "serve_rec_in", nChunks)
      def mkServe(out: String) = ml.StreamingAnnServe.serveIvf(
        spark.readStream.schema(queries.schema)
          .option("maxFilesPerTrigger", "1").parquet(qDir),
        idxPath, k = 10) { (res, batchId) =>
        res.write.mode("overwrite").parquet(s"$out/batch=$batchId")
      }
      def runServe(out: String, ckpt: String, killAfter: Int): (Double, Int) = {
        val t0 = System.nanoTime()
        val q = mkServe(out).option("checkpointLocation", ckpt).start()
        if (killAfter > 0) {
          // count ALL committed batches, not just non-empty ones: a
          // small-corpus smoke stages query chunks whose value ranges can
          // be empty, and a rows>0 threshold would never be met. A
          // deadline bounds the wait either way.
          val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
          while (q.isActive && System.nanoTime() < deadline &&
              q.recentProgress.length < killAfter)
            Thread.sleep(100)
          q.stop() // interrupts the micro-batch thread mid-flight
        } else { q.processAllAvailable(); q.stop() }
        ((System.nanoTime() - t0) / 1e9,
          q.recentProgress.count(_.numInputRows > 0))
      }
      def checksum(df: DataFrame): String = {
        val j = md5(to_json(struct(df.columns.sorted.map(col): _*)))
        val r = df.select(count(lit(1)).cast("decimal(38,0)"),
          sum(conv(substring(j, 1, 15), 16, 10).cast("decimal(38,0)")),
          sum(conv(substring(j, 17, 15), 16, 10).cast("decimal(38,0)"))).head()
        (0 until 3).map(i => Option(r.getDecimal(i)).map(_.toString)
          .getOrElse("0")).mkString(":")
      }
      val refOut = s"$work/serve_rec_ref_out"
      val (refWall, refBatches) = runServe(refOut, s"$work/serve_rec_ref_ckpt", 0)
      val recOut = s"$work/serve_rec_out"
      val recCkpt = s"$work/serve_rec_ckpt"
      val (killWall, killedAfter) = runServe(recOut, recCkpt, nChunks / 2)
      val (resumeWall, resumeBatches) = runServe(recOut, recCkpt, 0)
      val refDf = spark.read.parquet(refOut)
      val recDf = spark.read.parquet(recOut)
      // exactly-once: no query answered in two different micro-batches
      val dupQueries = recDf.groupBy("query_id")
        .agg(countDistinct("batch").as("nb")).where(col("nb") > 1).count()
      val refSum = checksum(refDf.drop("batch"))
      val recSum = checksum(recDf.drop("batch"))
      recResults("serve_recover") =
        s"""{"refWallSec":$refWall,"refBatches":$refBatches,""" +
        s""""killWallSec":$killWall,"killedAfterBatches":$killedAfter,""" +
        s""""resumeWallSec":$resumeWall,"resumeBatches":$resumeBatches,""" +
        s""""dupAnsweredQueries":$dupQueries,""" +
        s""""refChecksum":"$refSum","recChecksum":"$recSum",""" +
        s""""bitEqual":${refSum == recSum}}"""
      println(s"""{"stage":"serve_recover","killedAfterBatches":$killedAfter,""" +
        s""""dupAnsweredQueries":$dupQueries,"bitEqual":${refSum == recSum}}""")
    }

    // ---- lexical serve recovery: the sparse twin of serve_recover ----
    // StreamingAnnServe.serveLexical is the same zero-state foreachBatch
    // contract over the persisted BM25 store; same idempotent
    // batchId-keyed sink, same kill-mid-stream/restart proof: every seed
    // answered exactly once, union bit-equal to an uninterrupted run.
    if (stages("lex_serve_recover")) {
      val docs = Tables.load(spark, sfDir, "documents")
      val corpus = docs.where(!ml.Retrieval.boundedIsQuery)
      val idxPath = s"$work/lex_serve_rec_idx"
      ml.LexIndex.saveLexical(corpus, idxPath)
      val queries = docs.where(ml.Retrieval.boundedIsQuery)
        .select(col("doc_id"), col("text"))
      val qDir = stageChunks(queries, "doc_id", "lex_serve_rec_in", nChunks)
      def mkServe(out: String) = ml.StreamingAnnServe.serveLexical(
        spark.readStream.schema(queries.schema)
          .option("maxFilesPerTrigger", "1").parquet(qDir),
        idxPath, k = 10) { (res, batchId) =>
        res.write.mode("overwrite").parquet(s"$out/batch=$batchId")
      }
      def runServe(out: String, ckpt: String, killAfter: Int): (Double, Int) = {
        val t0 = System.nanoTime()
        val q = mkServe(out).option("checkpointLocation", ckpt).start()
        if (killAfter > 0) {
          val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
          while (q.isActive && System.nanoTime() < deadline &&
              q.recentProgress.length < killAfter)
            Thread.sleep(100)
          q.stop() // interrupts the micro-batch thread mid-flight
        } else { q.processAllAvailable(); q.stop() }
        ((System.nanoTime() - t0) / 1e9,
          q.recentProgress.count(_.numInputRows > 0))
      }
      def checksum(df: DataFrame): String = {
        val j = md5(to_json(struct(df.columns.sorted.map(col): _*)))
        val r = df.select(count(lit(1)).cast("decimal(38,0)"),
          sum(conv(substring(j, 1, 15), 16, 10).cast("decimal(38,0)")),
          sum(conv(substring(j, 17, 15), 16, 10).cast("decimal(38,0)"))).head()
        (0 until 3).map(i => Option(r.getDecimal(i)).map(_.toString)
          .getOrElse("0")).mkString(":")
      }
      val refOut = s"$work/lex_serve_rec_ref_out"
      val (refWall, refBatches) = runServe(refOut, s"$work/lex_serve_rec_ref_ckpt", 0)
      val recOut = s"$work/lex_serve_rec_out"
      val recCkpt = s"$work/lex_serve_rec_ckpt"
      val (killWall, killedAfter) = runServe(recOut, recCkpt, nChunks / 2)
      val (resumeWall, resumeBatches) = runServe(recOut, recCkpt, 0)
      val refDf = spark.read.parquet(refOut)
      val recDf = spark.read.parquet(recOut)
      val dupQueries = recDf.groupBy("query_id")
        .agg(countDistinct("batch").as("nb")).where(col("nb") > 1).count()
      val refSum = checksum(refDf.drop("batch"))
      val recSum = checksum(recDf.drop("batch"))
      recResults("lex_serve_recover") =
        s"""{"refWallSec":$refWall,"refBatches":$refBatches,""" +
        s""""killWallSec":$killWall,"killedAfterBatches":$killedAfter,""" +
        s""""resumeWallSec":$resumeWall,"resumeBatches":$resumeBatches,""" +
        s""""dupAnsweredQueries":$dupQueries,""" +
        s""""refChecksum":"$refSum","recChecksum":"$recSum",""" +
        s""""bitEqual":${refSum == recSum}}"""
      println(s"""{"stage":"lex_serve_recover","killedAfterBatches":$killedAfter,""" +
        s""""dupAnsweredQueries":$dupQueries,"bitEqual":${refSum == recSum}}""")
    }

    // ---- executor-loss proof: SIGKILL a real executor JVM mid-stream ----
    // The recovery stages stop the QUERY; this stage kills a PROCESS.
    // Under local-cluster the executors are separate JVMs
    // (CoarseGrainedExecutorBackend): one of them is kill -9'd a third of
    // the way through the stateful drift stream. The standalone worker
    // relaunches the executor, lost tasks retry, state partitions that
    // lived on the dead JVM reload from the checkpoint — and the final
    // per-dimension values must still be bit-equal to an undisturbed run.
    // This is the closest a single box gets to node failure: real process
    // death, real task retry, real state reload, loopback transport.
    if (stages("drift_killexec")) {
      require(master.startsWith("local-cluster"),
        "drift_killexec needs SPARK_GRAFT_MASTER=local-cluster[n,cores,mem]" +
          " — the point is killing a REAL executor JVM, and local[] has none")
      import scala.sys.process._
      def executorPids(): Seq[Long] =
        (try "pgrep -f CoarseGrainedExecutorBackend".!!
         catch { case _: Throwable => "" })
          .split("\n").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq
      val emb = Tables.load(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val embDir = stageChunks(emb, "vec_id", "emb_kill_in", nChunks)
      def mkDrift() = ml.StreamingDrift.driftStream(
        spark.readStream.schema(emb.schema)
          .option("maxFilesPerTrigger", "1").parquet(embDir),
        Tables.load(spark, sfDir, "embeddings"))
      def runKill(ckpt: String,
                  sinkMap: java.util.concurrent.ConcurrentHashMap[Long, String],
                  killAt: Int): (Double, Int, Long, Int, Int) = {
        val t0 = System.nanoTime()
        val upsert: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
          (df, _) => df.collect().foreach { r =>
            sinkMap.put(r.getAs[Long]("i"), r.mkString("|")); ()
          }
        val q = mkDrift().writeStream.outputMode("update")
          .option("checkpointLocation", ckpt)
          .foreachBatch(upsert).start()
        var killedPid = 0L
        var execsBefore = 0
        if (killAt > 0) {
          while (q.isActive &&
              q.recentProgress.count(_.numInputRows > 0) < killAt)
            Thread.sleep(100)
          val pids = executorPids()
          execsBefore = pids.length
          killedPid = pids.headOption.getOrElse(0L)
          if (killedPid > 0L) {
            System.err.println(s"[streambench] kill -9 executor $killedPid " +
              s"(of ${pids.length}) after $killAt batches")
            s"kill -9 $killedPid".!
          }
        }
        q.processAllAvailable()
        q.stop()
        val prog = q.recentProgress.filter(_.numInputRows > 0)
        ((System.nanoTime() - t0) / 1e9, prog.length,
          killedPid, execsBefore, executorPids().length)
      }
      val refMap = new java.util.concurrent.ConcurrentHashMap[Long, String]()
      val (refWall, refBatches, _, _, _) =
        runKill(s"$work/kill_drift_ref_ckpt", refMap, 0)
      val recMap = new java.util.concurrent.ConcurrentHashMap[Long, String]()
      val (killWall, killBatches, killedPid, execsBefore, execsAfter) =
        runKill(s"$work/kill_drift_ckpt", recMap, nChunks / 3)
      val equal = refMap.equals(recMap)
      recResults("drift_killexec") =
        s"""{"refWallSec":$refWall,"refBatches":$refBatches,""" +
        s""""killWallSec":$killWall,"killRunBatches":$killBatches,""" +
        s""""killedPid":$killedPid,"executorsBefore":$execsBefore,""" +
        s""""executorsAfterCompletion":$execsAfter,""" +
        s""""refDims":${refMap.size},"recDims":${recMap.size},""" +
        s""""bitEqual":$equal}"""
      println(s"""{"stage":"drift_killexec","killedPid":$killedPid,""" +
        s""""executorsBefore":$execsBefore,"executorsAfterCompletion":$execsAfter,""" +
        s""""bitEqual":$equal}""")
    }

    def stageJson(name: String, rows: Seq[BatchRow], wall: Double): String = {
      val (ok, mid, last) = plateau(rows)
      val batches = rows.map(r =>
        s"""{"batch":${r.batch},"inputRows":${r.inputRows},"stateRows":${r.stateRows},""" +
        s""""stateBytes":${r.stateBytes},"rowsRemoved":${r.rowsRemoved},""" +
        s""""watermark":"${r.watermark}"}""").mkString("[", ",", "]")
      s""""$name":{"wallSec":$wall,"batches":$batches,""" +
      s""""inputRowsTotal":${rows.map(_.inputRows).sum},""" +
      s""""peakStateRows":${if (rows.isEmpty) 0 else rows.map(_.stateRows).max},""" +
      s""""peakStateBytes":${if (rows.isEmpty) 0 else rows.map(_.stateBytes).max},""" +
      s""""midThirdPeakStateRows":$mid,"lastThirdPeakStateRows":$last,""" +
      s""""plateau":$ok}"""
    }
    val json = "{" +
      (results.map { case (n, (rows, wall)) => stageJson(n, rows, wall) } ++
        recResults.map { case (n, body) => s""""$n":$body""" })
        .mkString(",") +
      s""","sf":"$sfDir","chunks":$nChunks}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    def tput(rows: Seq[BatchRow], wall: Double): Long =
      if (wall <= 0) 0 else (rows.map(_.inputRows).sum / wall).toLong
    val summary = (results.map { case (n, (rows, wall)) =>
      val (ok, _, _) = plateau(rows)
      val peak = if (rows.isEmpty) 0L else rows.map(_.stateRows).max
      s""""$n":{"wallSec":$wall,"rowsPerSec":${tput(rows, wall)},""" +
      s""""peakStateRows":$peak,"plateau":$ok}"""
    } ++ recResults.map { case (n, body) => s""""$n":$body""" }).mkString(",")
    println(s"""{"metric":"streaming",$summary,"out":"$outPath"}""")
    spark.stop()
  }
}
