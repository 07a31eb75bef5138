package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared kernels of the training-data pipeline composition — ONE
  * definition each for the seeded corpus-mix predicate, the chunked
  * prefix-sum placement, and the bin-span explode, used by the batch
  * queries (d9/d16/d18 and st7's batch twin) AND the streaming twin
  * ([[graft.streaming.StreamingPipeline]]). The stream≡batch pin is
  * only meaningful while both sides share these definitions: a rule
  * change edits one place and both sides move together (or the DuckDB
  * oracle fails loudly, never silently).
  */
object CorpusPipeline {

  /** deterministic seeded uniform in (0,1]: the top 60 bits of
    * md5('mix|' || doc_id) — exact integer arithmetic on both
    * engines. Requires a `doc_id` column in scope. */
  def mixU: Column =
    (expr("CAST(conv(substring(md5(concat('mix|', CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)") + 1)
      .cast("double") / lit(math.pow(2, 60))

  /** per-source sampling rate keyed by doc_id % 3 (web/code/books). */
  def mixRate: Column =
    expr("CASE doc_id % 3 WHEN 0 THEN 0.9 WHEN 1 THEN 0.5 ELSE 0.2 END")

  /** the corpus-mix keep predicate (d16's rule, also the d18/st7
    * pipeline stage). */
  def mixKeep: Column = mixU <= mixRate

  /** non-empty whitespace token count of `text` — the column form of
    * the tokens() explode, for stateless (streaming-safe) gating. */
  def tokenCount(text: Column): Column =
    size(filter(split(text, " "), w => w =!= "")).cast("long")

  /** chunk key for the two-pass prefix sum (requires `doc_id`). */
  def chunked(toks: DataFrame, chunk: Long): DataFrame =
    toks.withColumn("_ck", expr(s"doc_id div $chunk"))

  /** The chunk-partitioned prefix-sum placement: per-chunk subtotals
    * collected (|corpus|/chunk rows — metadata), folded into
    * cumulative offsets on the driver, re-entered as a broadcast map
    * literal so `start = offset(_ck) + local running sum` is a pure
    * projection over partitioned windows — no single-partition
    * Exchange. `base` shifts the whole layout: 0 for a batch corpus,
    * the running corpus offset for the streaming manifest's
    * micro-batch placement. */
  def placedFrame(byChunk: DataFrame, base: Long = 0L): DataFrame =
    placedFrameWithStats(byChunk, base)._1

  /** totals of one placement input, read off the SAME per-chunk
    * subtotal collect the placement needs anyway — the streaming
    * manifest consumes these instead of running a second aggregate
    * over the micro-batch. minDoc/maxDoc are Long.MaxValue/MinValue
    * when the input is empty. */
  final case class BatchStats(tokens: Long, docs: Long, minDoc: Long, maxDoc: Long)

  def placedFrameWithStats(byChunk: DataFrame, base: Long = 0L): (DataFrame, BatchStats) = {
    val subs = byChunk.groupBy("_ck")
      .agg(sum("n_tokens").as("_sub"), count(lit(1)).as("_cnt"),
        min("doc_id").as("_mn"), max("doc_id").as("_mx"))
      .collect().sortBy(_.getLong(0))
    var acc = base
    var docs = 0L
    var mn = Long.MaxValue
    var mx = Long.MinValue
    val offs: Map[Long, Long] = subs.map { r =>
      val e = (r.getLong(0), acc)
      acc += r.getLong(1); docs += r.getLong(2)
      mn = math.min(mn, r.getLong(3)); mx = math.max(mx, r.getLong(4))
      e
    }.toMap
    val localW = Window.partitionBy("_ck").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val placed = byChunk
      .withColumn("start",
        coalesce(element_at(typedLit(offs), col("_ck")), lit(base)) +
          coalesce(sum("n_tokens").over(localW), lit(0L)))
      .drop("_ck")
    (placed, BatchStats(acc - base, docs, mn, mx))
  }

  /** explode each placed doc over the `cap`-token bins its
    * [start, start + n_tokens) span touches, with the clipped per-bin
    * contribution. Integer `div` throughout — exact past 2⁵³. */
  def binSpans(placed: DataFrame, cap: Long): DataFrame =
    placed
      .withColumn("bin", explode(sequence(
        expr(s"start div $cap"),
        expr(s"(start + n_tokens - 1) div $cap"))))
      .withColumn("contrib",
        least(col("start") + col("n_tokens"), (col("bin") + 1) * cap) -
          greatest(col("start"), col("bin") * cap))
}
