package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.IvfIndex
import graft.sources.VersionedTable

/** Streaming ANN index maintenance: embeddings arrive as a stream and
  * the serving index stays continuously queryable — the ingestion-side
  * composition of the IVF index with the transactional versioned sink:
  *
  *   - the coarse quantizer is trained ONCE (on a bootstrap set) and
  *     broadcast; per batch, new vectors are assigned to their posting
  *     list (`IvfIndex.assign`) and MERGEd into the versioned table —
  *     only the buckets the new vector ids hash into are rewritten;
  *   - readers probe a SNAPSHOT (`table.read()`): they are never
  *     disturbed by an in-flight batch, and a probe mid-stream simply
  *     sees the vectors ingested so far — the index is always
  *     consistent, just possibly behind the stream head;
  *   - re-training (quantizer drift after heavy ingest) is a separate
  *     offline `compact`-style rebuild, exactly like a table-format
  *     re-clustering — the serving path never blocks on it.
  */
class VectorIndexMaintainer(spark: SparkSession, baseDir: String,
                            val model: IvfIndex.Model, nBuckets: Int = 16) {

  private val table = new VersionedTable(spark, baseDir, nBuckets)

  def currentVersion(): Option[Int] = table.currentVersion()

  def indexedCount(): Long = table.read().map(_.count()).getOrElse(0L)

  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val assigned = IvfIndex.assign(batch, model)
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      try {
        table.merge(assigned, Seq("vec_id"), table.currentVersion())
        done = true
      } catch {
        case _: table.CommitConflict if attempts < 5 => // retry on new base
      }
    }
  }

  /** `trigger` defaults to draining the available backlog and
    * stopping (spec/bench shape); pass a processing-time trigger for
    * continuous ingestion against a live source. */
  def start(embeddings: DataFrame, checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    embeddings.writeStream
      .foreachBatch(processBatch _)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** top-k probe against the CURRENT snapshot (same plan as the batch
    * `IvfIndex.probe`). */
  def probe(query: Array[Float], nprobe: Int, k: Int): DataFrame = {
    val snapshot = table.read().getOrElse(
      throw new IllegalStateException("index is empty — nothing ingested yet"))
    IvfIndex.probe(snapshot, model, query, nprobe, k)
  }
}
