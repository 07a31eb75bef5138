package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
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
    * and the seeded-hash corpus mix, bit-identical to the batch d18
    * expressions (same md5-based uniform, same per-class rates). */
  def gateAndMix(docs: Dataset[Doc], minTokens: Long = 30L): DataFrame = {
    val toks = docs.toDF()
      .withColumn("n_tokens",
        size(filter(split(col("text"), " "), w => w =!= "")).cast("long"))
      .filter(col("n_tokens") >= minTokens)
    val u = (expr("CAST(conv(substring(md5(concat('mix|', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)") + 1)
      .cast("double") / lit(math.pow(2, 60))
    toks
      .filter(u <= expr("CASE doc_id % 3 WHEN 0 THEN 0.9 WHEN 1 THEN 0.5 ELSE 0.2 END"))
      .select("doc_id", "n_tokens")
  }

  /** stage 4 — the incremental packing MV. Call [[advance]] from a
    * foreachBatch sink; micro-batches arrive sequentially, so the
    * running offset threads through without locking beyond the
    * defensive synchronized. */
  final class PackingMv(cap: Long = 512L, chunk: Long = 1024L) {
    @volatile private var st = PackState(0L, 0L, 0L)
    def state: PackState = st

    /** place one micro-batch of (doc_id, n_tokens) rows at the running
      * corpus offset and fold its bin contributions into the state.
      * One distributed pass; the only driver-resident data is the
      * per-chunk subtotal map (|batch|/chunk entries — metadata). */
    def advance(batch: DataFrame): PackState = synchronized {
      val base = st.totalTokens
      val byChunk = batch.select(col("doc_id"), col("n_tokens"))
        .withColumn("_ck", expr(s"doc_id div $chunk")).persist()
      val subs = byChunk.groupBy("_ck")
        .agg(sum("n_tokens").as("_sub"), count(lit(1)).as("_cnt"))
        .collect().sortBy(_.getLong(0))
      var acc = 0L
      var docs = 0L
      val offs: Map[Long, Long] = subs.map { r =>
        val e = (r.getLong(0), acc); acc += r.getLong(1); docs += r.getLong(2); e
      }.toMap
      if (docs > 0L) {
        val localW = Window.partitionBy("_ck").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val placed = byChunk.withColumn("start",
          lit(base) + coalesce(element_at(typedLit(offs), col("_ck")), lit(0L)) +
            coalesce(sum("n_tokens").over(localW), lit(0L)))
        val ck = placed
          .withColumn("bin", explode(sequence(
            expr(s"start div $cap"), expr(s"(start + n_tokens - 1) div $cap"))))
          .withColumn("contrib",
            least(col("start") + col("n_tokens"), (col("bin") + 1) * cap) -
              greatest(col("start"), col("bin") * cap))
          .agg(coalesce(sum(col("bin") * col("contrib")), lit(0L)))
          .collect()(0).getLong(0)
        st = PackState(st.nDocs + docs, base + acc, st.checksum + ck)
      }
      byChunk.unpersist()
      st
    }
  }

  /** end-to-end runner: dedup → gate/mix → incremental packing MV.
    * Returns the started streaming query; `mv` carries the manifest. */
  def run(docs: Dataset[Doc], mv: PackingMv, minTokens: Long = 30L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    gateAndMix(dedup(docs), minTokens)
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) => mv.advance(b); () }
      .start()
}
