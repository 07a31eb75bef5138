package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally maintained DRIFT profile — the streaming twin of the
  * dq5 monitor: the reference window's binned frequency profile is
  * computed once (batch), and the CURRENT window's profile is
  * accumulated micro-batch by micro-batch as additive per-(feature,
  * bin) counters — no rescan of earlier batches, ever. The score is
  * then pure integer arithmetic over the two profiles (ppm rates by
  * floor division, (pa−pb)² DIV (pa+pb+1)), identical to the batch
  * formula symbol for symbol.
  *
  * Driver state is the current profile itself: one counter per
  * (feature, bin), bounded by the PROFILE cardinality (languages,
  * sources, histogram buckets — tens of entries), NOT by the stream
  * length; [[MaxBins]] fails loudly if a feature column is
  * accidentally high-cardinality (profiling an id column would
  * otherwise grow driver state with the corpus). A real deployment
  * would keep the same counters in a state store or a tiny table —
  * the additivity is what matters: profile(b₁ ∪ b₂) =
  * profile(b₁) + profile(b₂).
  */
final class StreamingDrift(stateDir: Option[String] = None) {

  /** per-(feature, bin) ceiling on tracked bins — a drift profile is
    * only meaningful over bounded-cardinality features. */
  val MaxBins = 10000

  private val stateFile = stateDir.map(d => java.nio.file.Paths.get(d, "drift_state"))
  private val counts = scala.collection.mutable.Map.empty[(String, String), Long]
  // last folded micro-batch id (replay detection); MinValue = none
  private var lastBatch = Long.MinValue
  stateFile.foreach { p =>
    DriverState.read(p) { in =>
      lastBatch = in.readLong()
      val n = in.readInt()
      (0 until n).foreach { _ =>
        counts((in.readUTF(), in.readUTF())) = in.readLong()
      }
    }
  }

  /** fold one micro-batch's (feature, bin) long-format rows into the
    * profile: ONE distributed aggregation per batch (map-side partial
    * counts), then a bins-sized merge on the driver. The collect is
    * LIMIT-bounded so an unbounded feature fails the require below
    * instead of OOMing the driver on the fetch itself.
    *
    * Crash recovery (with a `stateDir`): the profile + last batch id
    * persist atomically after every fold — additivity makes the
    * resumed profile exact, and a REDELIVERED batch id is skipped
    * instead of double-counted (StreamingDriftSpec pins kill →
    * restart ≡ uninterrupted). */
  def processBatch(long: DataFrame, batchId: Long = Long.MinValue): Unit = {
    // replay/regression gate BEFORE the distributed aggregation — a
    // redelivered batch skips without paying a Spark job (the window
    // is safe: lastBatch only grows, so a stale read can only let a
    // replay through to the inner gate, never drop a new batch)
    if (batchId != Long.MinValue) {
      val lb = this.synchronized(lastBatch)
      require(batchId >= lb,
        s"batch id regression: got $batchId after $lb was applied — " +
          "fresh checkpoint over a retained stateDir? wipe the stateDir or restore the checkpoint")
      if (batchId == lb) return
    }
    val deltas = long.groupBy("feature", "bin").agg(count(lit(1)).as("c"))
      .limit(MaxBins + 1).collect()
    this.synchronized {
      if (batchId != Long.MinValue && batchId <= lastBatch) return
      deltas.foreach { r =>
        val key = (r.getString(0), Option(r.getString(1)).getOrElse("∅"))
        counts(key) = counts.getOrElse(key, 0L) + r.getLong(2)
      }
      require(counts.size <= MaxBins,
        s"drift profile exceeded $MaxBins bins — feature cardinality is unbounded")
      if (batchId != Long.MinValue) lastBatch = batchId
      stateFile.foreach { p =>
        DriverState.writeAtomic(p) { out =>
          out.writeLong(lastBatch)
          out.writeInt(counts.size)
          counts.foreach { case ((f, b), c) =>
            out.writeUTF(f); out.writeUTF(b); out.writeLong(c)
          }
        }
      }
    }
  }

  /** current-window profile snapshot. */
  def profile: Map[(String, String), Long] = this.synchronized(counts.toMap)

  /** the batch formula over (reference, current) profiles: per
    * feature, ppm rates by floor division against each side's total
    * (guarded like the batch twin), Σ (pa−pb)² DIV (pa+pb+1) over the
    * UNION of bins present on either side. */
  def scores(ref: Map[(String, String), Long]): Map[String, (Long, Long, Long, Long)] = {
    val cur = profile
    val feats = (ref.keySet ++ cur.keySet).map(_._1)
    feats.map { f =>
      val rb = ref.collect { case ((`f`, b), c) => b -> c }
      val cb = cur.collect { case ((`f`, b), c) => b -> c }
      val ta = math.max(rb.values.sum, 1L)
      val tb = math.max(cb.values.sum, 1L)
      val bins = rb.keySet ++ cb.keySet
      val score = bins.toSeq.map { b =>
        val pa = rb.getOrElse(b, 0L) * 1000000L / ta
        val pb = cb.getOrElse(b, 0L) * 1000000L / tb
        (pa - pb) * (pa - pb) / (pa + pb + 1)
      }.sum
      f -> (bins.size.toLong, rb.values.sum, cb.values.sum, score)
    }.toMap
  }
}
