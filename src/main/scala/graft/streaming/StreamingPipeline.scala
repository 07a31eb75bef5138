package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** The full training-data preprocessing pipeline — exact dedup →
  * quality gate → seeded corpus mix → fixed-cap sequence packing, the
  * d18 composition — as a STREAM with an incrementally maintained
  * packing manifest. This is the backfill→live shape of a corpus
  * build: the batch pipeline lays out the ingested history once, and
  * every new micro-batch of documents extends the SAME packed layout
  * from the running corpus offset without rescanning anything.
  *
  * Stage contract (StreamingPipelineSpec + the st7 registry query pin
  * stream ≡ batch):
  *  - dedup: first-filed doc per 128-bit content hash survives. State
  *    per distinct content is the 16-byte key + a filed marker —
  *    O(distinct docs), the d22/StreamingDedup discipline.
  *  - gate/mix: stateless projections — the exact d13/d16 expressions
  *    the batch plan uses.
  *  - packing: each micro-batch's kept docs are placed at the running
  *    corpus offset with the same chunk-partitioned prefix sum as the
  *    batch `packedStarts` (no single-partition Exchange), and the
  *    clipped per-bin contributions fold into three ADDITIVE
  *    accumulators (docs, tokens, Σ bin·tokens). Driver state is
  *    O(1); per-batch work is one distributed pass over the batch.
  *
  * Equality with the batch pipeline requires id-ordered ingest ACROSS
  * micro-batches (the natural order of a backfill replay / append-only
  * ingest log); order WITHIN a micro-batch is arbitrary — dedup takes
  * the min id per content and placement sorts within the batch.
  */
object StreamingPipeline {

  final case class Doc(doc_id: Long, text: String)

  /** additive packing-manifest state: with straddling packing every
    * bin except the last holds exactly `cap` tokens, so the manifest
    * summary is derivable from (docs, tokens, Σ bin·tokens) alone —
    * and Σ bin·tokens pins the whole per-bin layout, not just totals. */
  final case class PackState(nDocs: Long, totalTokens: Long, checksum: Long) {
    def nFullBins(cap: Long): Long = totalTokens / cap
    def nBins(cap: Long): Long = (totalTokens + cap - 1) / cap
  }

  /** stage 1 — streaming exact dedup: first-filed doc per content hash
    * survives; with id-ordered ingest this is the batch min-id rule. */
  def dedup(docs: Dataset[Doc]): Dataset[Doc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(d => StreamingChunkDedup.contentKey(d.text))
      .flatMapGroupsWithState[Boolean, Doc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { case (_, it, state) =>
        if (state.getOption.contains(true)) Iterator.empty
        else {
          state.update(true)
          Iterator.single(it.minBy(_.doc_id))
        }
      }
  }

  /** stages 2–3 — stateless quality gate (token count ≥ `minTokens`)
    * and the seeded-hash corpus mix: THE batch expressions, by
    * construction — both sides import [[graft.operators.CorpusPipeline]],
    * so a rule change cannot desynchronize the stream≡batch pin. */
  def gateAndMix(docs: Dataset[Doc], minTokens: Long = 30L): DataFrame =
    docs.toDF()
      .withColumn("n_tokens", graft.operators.CorpusPipeline.tokenCount(col("text")))
      .filter(col("n_tokens") >= minTokens)
      .filter(graft.operators.CorpusPipeline.mixKeep)
      .select("doc_id", "n_tokens")

  /** stage 4 — the incremental packing MV. Call [[advance]] from a
    * foreachBatch sink; micro-batches arrive sequentially, so the
    * running offset threads through without locking beyond the
    * defensive synchronized.
    *
    * Crash recovery: with a `stateDir` the manifest (plus the ingest
    * high-water doc id and the last folded batch id) persists via
    * [[DriverState]] after every fold — a maintainer constructed over
    * the same dir after a killed JVM resumes exactly where the crash
    * left it, and a micro-batch REDELIVERED by the restarted stream
    * (crash after the fold, before the checkpoint commit) is
    * recognized by its batch id and skipped instead of double-counted.
    * StreamingPipelineSpec pins kill → restart ≡ uninterrupted. */
  final class PackingMv(cap: Long = 512L, chunk: Long = 1024L,
                        stateDir: Option[String] = None) {
    private val stateFile = stateDir.map(d => java.nio.file.Paths.get(d, "pack_state"))
    @volatile private var st = PackState(0L, 0L, 0L)
    // highest doc_id already placed: the layout is only batch-equal
    // under id-ordered ingest ACROSS micro-batches, so a late smaller
    // id must fail the batch loudly instead of silently producing a
    // manifest no batch run can reproduce
    @volatile private var lastDoc = Long.MinValue
    // last folded micro-batch id (replay detection); MinValue = none
    @volatile private var lastBatch = Long.MinValue
    stateFile.foreach { p =>
      DriverState.read(p) { in =>
        st = PackState(in.readLong(), in.readLong(), in.readLong())
        lastDoc = in.readLong()
        lastBatch = in.readLong()
      }
    }
    def state: PackState = st

    /** place one micro-batch of (doc_id, n_tokens) rows at the running
      * corpus offset — the SAME [[graft.operators.CorpusPipeline]]
      * placement/span kernels as the batch pipeline, with `base` set
      * to the running offset — and fold its bin contributions into
      * the state. The only driver-resident data is the per-chunk
      * subtotal map (|batch|/chunk entries — metadata). */
    def advance(batch: DataFrame, batchId: Long = Long.MinValue): PackState = synchronized {
      import graft.operators.CorpusPipeline
      // a redelivered micro-batch (restart replayed it after a crash
      // landed the fold but not the checkpoint) is already in the
      // state — folding it again would double-count. Redelivery only
      // ever replays the LAST applied id; an id STRICTLY below it
      // means the stream was restarted with a fresh checkpoint (ids
      // renumbered from 0) over a retained stateDir — silently
      // dropping every "old-id" batch would corrupt the manifest, so
      // fail loudly instead.
      if (batchId != Long.MinValue) {
        require(batchId >= lastBatch,
          s"batch id regression: got $batchId after $lastBatch was applied — " +
            "fresh checkpoint over a retained stateDir? wipe the stateDir or restore the checkpoint")
        if (batchId == lastBatch) return st
      }
      val base = st.totalTokens
      val byChunk = CorpusPipeline
        .chunked(batch.select(col("doc_id"), col("n_tokens")), chunk).persist()
      try {
        // the placement's own subtotal collect carries the batch
        // totals — two jobs per micro-batch total, not three
        val (placed, stats) = CorpusPipeline.placedFrameWithStats(byChunk, base)
        if (stats.docs > 0L) {
          require(stats.minDoc > lastDoc,
            s"out-of-order ingest: doc ${stats.minDoc} arrived after doc $lastDoc " +
              "was already placed — micro-batches must be id-ordered (backfill-replay order)")
          val ck = CorpusPipeline.binSpans(placed, cap)
            .agg(coalesce(sum(col("bin") * col("contrib")), lit(0L)))
            .collect()(0).getLong(0)
          st = PackState(st.nDocs + stats.docs, base + stats.tokens, st.checksum + ck)
          lastDoc = stats.maxDoc
        }
        if (batchId != Long.MinValue) lastBatch = batchId
        stateFile.foreach { p =>
          DriverState.writeAtomic(p) { out =>
            out.writeLong(st.nDocs); out.writeLong(st.totalTokens)
            out.writeLong(st.checksum); out.writeLong(lastDoc)
            out.writeLong(lastBatch)
          }
        }
        st
      } finally { byChunk.unpersist(); () }
    }
  }

  /** end-to-end runner: dedup → gate/mix → incremental packing MV.
    * Returns the started streaming query; `mv` carries the manifest.
    * With a `checkpointDir` (and an MV built over a stateDir) the
    * composition is restartable: the dedup stage's
    * flatMapGroupsWithState store recovers from the checkpoint, the
    * MV from its own state file, and replayed batches are skipped by
    * batch id. */
  def run(docs: Dataset[Doc], mv: PackingMv, minTokens: Long = 30L,
          checkpointDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = gateAndMix(dedup(docs), minTokens)
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) => mv.advance(b, id); () }
    checkpointDir.fold(w)(w.option("checkpointLocation", _)).start()
  }
}
