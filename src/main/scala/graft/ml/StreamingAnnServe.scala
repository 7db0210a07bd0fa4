package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** ONLINE ANN serving: a stream of arriving query vectors answered from
  * a PERSISTED [[Index]] store — the query-side complement of the ingest
  * streams (StreamingSelect admits documents, StreamingNearDup probes
  * them, StreamingDrift watches the distribution; this one ANSWERS
  * retrieval queries against the standing index).
  *
  * Shape: `foreachBatch`, deliberately. Per-query top-k is a global rank
  * per key; in pure append-mode streaming that is an unbounded stateful
  * aggregation (query ids never expire — no watermark can bound the
  * state). The correct bound is the serving contract itself: a query's
  * results are complete within its OWN micro-batch — exactly
  * `foreachBatch`'s semantics, and the shape every production vector
  * store uses (queries are micro-batched, each batch answered whole).
  * Inside the batch the full BATCH serving path runs unchanged —
  * including the probed-cell static partition prune, which NEEDS a
  * materialized batch (the probe list is collected driver-side) and is
  * exactly what a plan-time stream-static join could never do. The
  * stream holds ZERO state; recovery is the sink's offset log.
  *
  * Bit-equality with the batch path across arbitrary micro-batch splits
  * is pinned in StreamingAnnServeSpec.
  */
object StreamingAnnServe {

  private def writer(queryStream: DataFrame)
                    (serve: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    queryStream.writeStream
      .foreachBatch { (batch: Dataset[Row], id: java.lang.Long) =>
        serve(batch.toDF(), id.longValue())
      }

  /** Serve each arriving (vec_id, embedding) micro-batch from a stored
    * IVF-Flat index; `sink` receives ([[Index.ivfTopKIndexed]] rows,
    * batchId). Configure trigger/checkpoint on the returned writer,
    * then `.start()`.
    */
  def serveIvf(queryStream: DataFrame, path: String, k: Int,
               nProbe: Int = 4,
               candWhere: org.apache.spark.sql.Column =
                 org.apache.spark.sql.functions.lit(true))
              (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    writer(queryStream) { (batch, id) =>
      sink(Index.ivfTopKIndexed(batch.sparkSession, path, batch, k, nProbe,
        candWhere), id)
    }

  /** The compressed twin: micro-batches answered by ADC over the stored
    * PQ codes ([[Index.ivfPqTopKIndexed]]). `candWhere` serves FILTERED
    * queries (label/language/tenant predicate against metaCols persisted
    * in the store) — pushed into the per-batch store scan like the batch
    * path, because it IS the batch path.
    */
  def serveIvfPq(queryStream: DataFrame, path: String, k: Int,
                 nProbe: Int = 4,
                 candWhere: org.apache.spark.sql.Column =
                   org.apache.spark.sql.functions.lit(true))
                (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    writer(queryStream) { (batch, id) =>
      sink(Index.ivfPqTopKIndexed(batch.sparkSession, path, batch, k, nProbe,
        candWhere), id)
    }

  /** The scalar-quantized serving twin: micro-batches answered by the
    * exact integer code dot over the stored SQ8 codes
    * ([[Index.ivfSqTopKIndexed]]) — the fastest of the three tiers'
    * serves (SCALING.md round 12's tier matrix).
    */
  def serveIvfSq(queryStream: DataFrame, path: String, k: Int,
                 nProbe: Int = 4,
                 candWhere: org.apache.spark.sql.Column =
                   org.apache.spark.sql.functions.lit(true))
                (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    writer(queryStream) { (batch, id) =>
      sink(Index.ivfSqTopKIndexed(batch.sparkSession, path, batch, k, nProbe,
        candWhere), id)
    }

  /** The SQ ingest twin ([[Index.appendIvfSq]] per micro-batch —
    * per-vector scales, so only the coarse centroids freeze; a combined
    * SQ+raw store keeps its refine flavor in step).
    */
  def appendStreamSq(vecStream: DataFrame, path: String,
                     metaCols: Seq[String] = Nil): DataStreamWriter[Row] =
    writer(vecStream) { (batch, _) =>
      if (!batch.isEmpty)
        Index.appendIvfSq(batch.sparkSession, path, batch, metaCols = metaCols)
    }

  /** The MATRYOSHKA serve twin: each query micro-batch answered by the
    * prefix-shortlist + full-width-refine serve
    * ([[Index.ivfMrlRerankTopKIndexed]]) — zero stream state, the store
    * is the only state, exactly the [[serveIvfSq]] contract.
    */
  def serveIvfMrl(queryStream: DataFrame, path: String, k: Int,
                  rerank: Int = 0, nProbe: Int = 4,
                  candWhere: org.apache.spark.sql.Column =
                    org.apache.spark.sql.functions.lit(true))
                 (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    writer(queryStream) { (batch, id) =>
      sink(Index.ivfMrlRerankTopKIndexed(batch.sparkSession, path, batch, k,
        rerank, nProbe, candWhere), id)
    }

  /** The MRL ingest twin ([[Index.appendIvfMrl]] per micro-batch —
    * frozen centroids, recorded prefix width; both flavors appended
    * under one mutation seq).
    */
  def appendStreamMrl(vecStream: DataFrame, path: String,
                      metaCols: Seq[String] = Nil): DataStreamWriter[Row] =
    writer(vecStream) { (batch, _) =>
      if (!batch.isEmpty)
        Index.appendIvfMrl(batch.sparkSession, path, batch, metaCols = metaCols)
    }

  /** The INGEST side of the same loop: each arriving (vec_id, embedding)
    * micro-batch is [[Index.appendIvf]]'d into the store — assignment
    * against the frozen stored centroids, postings appended to their
    * cell partitions. foreachBatch again, and again deliberately: the
    * append is a batch write whose atomicity unit is the micro-batch,
    * its offset log is the recovery contract, and serves planned between
    * appends read consistent pre/post-append snapshots (parquet listings
    * are plan-time). Together with [[serveIvf]] this closes the
    * streaming index lifecycle: vectors stream IN, queries stream OUT,
    * the store is the only state. Periodic [[Index.compact]] folds the
    * per-append files back to one per cell.
    */
  def appendStream(vecStream: DataFrame, path: String,
                   metaCols: Seq[String] = Nil)
                  : DataStreamWriter[Row] =
    writer(vecStream) { (batch, _) =>
      if (!batch.isEmpty)
        Index.appendIvf(batch.sparkSession, path, batch, metaCols = metaCols)
    }

  /** The compressed ingest twin: arriving vectors are
    * [[Index.appendIvfPq]]'d — coarse-assigned against the frozen stored
    * centroids AND PQ-encoded against the frozen stored codebook — so a
    * deployment can run the whole lifecycle on the 30–40×-smaller codes
    * store alone.
    */
  def appendStreamPq(vecStream: DataFrame, path: String,
                     metaCols: Seq[String] = Nil)
                    : DataStreamWriter[Row] =
    writer(vecStream) { (batch, _) =>
      if (!batch.isEmpty)
        Index.appendIvfPq(batch.sparkSession, path, batch, metaCols = metaCols)
    }

  /** The SPARSE serving twin: a stream of arriving (doc_id, text) seed
    * batches answered from a persisted [[LexIndex]] BM25 store. Same
    * zero-state foreachBatch contract as [[serveIvf]] — and for the same
    * structural reason: the seed-bucket partition prune collects the
    * batch's term hashes driver-side, which needs a materialized batch.
    * `sink` receives ([[LexIndex.bm25TopKIndexed]] rows, batchId).
    */
  def serveLexical(queryStream: DataFrame, path: String, k: Int,
                   nQueryTerms: Int = 8)
                  (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    writer(queryStream) { (batch, id) =>
      sink(LexIndex.bm25TopKIndexed(batch.sparkSession, path, batch, k,
        nQueryTerms = nQueryTerms), id)
    }

  /** The sparse INGEST twin: each arriving (doc_id, text) micro-batch is
    * [[LexIndex.appendLexical]]'d — postings into their term-hash bucket
    * partitions, df / n_docs / avgdl frozen at build values (the
    * frozen-stats trade; [[LexIndex.stats]] measures the accumulated
    * blind spot, a rebuild clears it). With [[serveLexical]] this closes
    * the streaming lexical lifecycle: documents stream IN, seed queries
    * stream OUT, the store is the only state. Periodic
    * [[LexIndex.compactLexical]] folds the per-append files back to one
    * per bucket.
    */
  def appendStreamLex(docStream: DataFrame, path: String)
                     : DataStreamWriter[Row] =
    writer(docStream) { (batch, _) =>
      if (!batch.isEmpty)
        LexIndex.appendLexical(batch.sparkSession, path, batch)
    }

  /** Streamed DELETION: each arriving micro-batch of ids is tombstoned
    * ([[Index.delete]]) — an O(batch) sidecar write per batch, no store
    * partition touched. REPLAY-IDEMPOTENT by construction: foreachBatch
    * is at-least-once under crash recovery, and a replayed delete writes
    * a second tombstone with a later `del_seq` that masks exactly the
    * same rows — the served result is identical, so at-least-once replay
    * has exactly-once EFFECT (no offset bookkeeping needed).
    */
  def deleteStream(idStream: DataFrame, path: String): DataStreamWriter[Row] =
    writer(idStream) { (batch, _) =>
      if (!batch.isEmpty) Index.delete(batch.sparkSession, path, batch)
    }

  /** Streamed UPSERT (the CDC ingest shape): each arriving
    * (vec_id, embedding) micro-batch replaces its ids in place via
    * [[Index.upsertIvf]] — tombstone (seq s) + append (seq s+1). Also
    * replay-idempotent, and for a sharper reason than the delete
    * stream: a REPLAYED upsert's own tombstone (seq s') masks the
    * previous replay's appended rows (s' > s+1), so however many times
    * the batch replays, exactly one version — the newest — serves.
    * Delete-then-add turns at-least-once ingest into exactly-once
    * serving without a dedup log, which is the entire reason the
    * tombstones are sequence-stamped rather than id-only.
    */
  def upsertStream(vecStream: DataFrame, path: String,
                   metaCols: Seq[String] = Nil): DataStreamWriter[Row] =
    writer(vecStream) { (batch, _) =>
      if (!batch.isEmpty)
        Index.upsertIvf(batch.sparkSession, path, batch, metaCols = metaCols)
    }

  /** The compressed upsert-ingest twin ([[Index.upsertIvfPq]] per
    * micro-batch; combined stores keep the raw refine flavor in step).
    */
  def upsertStreamPq(vecStream: DataFrame, path: String,
                     metaCols: Seq[String] = Nil): DataStreamWriter[Row] =
    writer(vecStream) { (batch, _) =>
      if (!batch.isEmpty)
        Index.upsertIvfPq(batch.sparkSession, path, batch, metaCols = metaCols)
    }

  /** The sparse deletion twin: arriving doc-id batches tombstoned via
    * [[LexIndex.deleteDocs]] — same replay-idempotence as
    * [[deleteStream]].
    */
  def deleteStreamLex(idStream: DataFrame, path: String)
                     : DataStreamWriter[Row] =
    writer(idStream) { (batch, _) =>
      if (!batch.isEmpty) LexIndex.deleteDocs(batch.sparkSession, path, batch)
    }

  /** The sparse upsert twin: arriving (doc_id, text) batches replace
    * their documents via [[LexIndex.upsertDocs]] — replay-idempotent for
    * SERVING like [[upsertStream]] (each replay's tombstone masks the
    * previous replay's postings). One sparse-specific caveat: every
    * replay appends its df sidecar again, so a later
    * [[LexIndex.foldStats]] over a replayed history double-counts those
    * terms' df until a rebuild — the sidecars are best-effort accounting
    * under at-least-once delivery, the serve path is not.
    */
  def upsertStreamLex(docStream: DataFrame, path: String)
                     : DataStreamWriter[Row] =
    writer(docStream) { (batch, _) =>
      if (!batch.isEmpty) LexIndex.upsertDocs(batch.sparkSession, path, batch)
    }
}
