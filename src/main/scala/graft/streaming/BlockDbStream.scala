package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.core.{Bytes, Commitments}

/** Append-only block-DB maintenance as Structured Streaming (SURVEY
  * §2.8 St1–St4; reference `block/mod.rs:1-6,152-293`):
  *
  *   - St1 IVC append: each accepted block row carries `root_after`,
  *     the block-DB root with that block inserted (the reference's
  *     carried IVC proof becomes a carried column).
  *   - St2 sequencing: a block is accepted iff `block_number ==
  *     last_accepted + 1` (strict, no gaps, no reorder).
  *   - St3 bootstrap: an empty sink accepts any first block and seeds
  *     the chain from it (the reference's dummy-proof first step).
  *   - St4 late/out-of-order data is rejected *by design*: offending
  *     rows land in a quarantine sink with a reason, the stream keeps
  *     running.
  *
  * Scale shape: the block DB is one tiny row per block — the
  * sequential per-batch fold below is O(batch) driver work by design
  * (the reference's IVC is just as sequential); all heavy per-block
  * aggregation happened upstream in the storage/state DB builds.
  * `foreachBatch` + checkpoint gives exactly-once appends; replayed
  * batches are no-ops because duplicates fail the St2 check.
  */
class BlockDbAppender(spark: SparkSession, sinkDir: String, quarantineDir: String) {

  import spark.implicits._

  private def sinkHasData: Boolean = {
    val p = Paths.get(sinkDir)
    Files.exists(p) && {
      val s = Files.list(p)
      try s.anyMatch(f => f.getFileName.toString.endsWith(".parquet"))
      finally s.close()
    }
  }

  private def readSink(): Array[(Long, String)] =
    if (sinkHasData)
      spark.read.parquet(sinkDir).select("block_number", "leaf_hash_hex")
        .as[(Long, String)].collect().sortBy(_._1)
    else Array.empty

  /** one micro-batch: strictly-sequential prefix accepted, rest
    * quarantined. Exposed for direct (batch) testing too. */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val existing = readSink()
    var leaves = existing.map { case (_, h) => Bytes.fromHex(h) }.toVector
    var last = existing.lastOption.map(_._1)

    val rows = batch
      .select(col("block_number").cast("long"), col("block_hash"), col("state_root"))
      .collect()
      .sortBy(_.getLong(0))

    val accepted = Vector.newBuilder[(Long, Array[Byte], Array[Byte], Array[Byte], Array[Byte])]
    val rejected = Vector.newBuilder[(Long, String)]
    rows.foreach { r =>
      val bn = r.getLong(0)
      val ok = last match {
        case None       => true // St3 bootstrap
        case Some(prev) => bn == prev + 1
      }
      if (ok) {
        val leaf = Commitments.blockLeafHash(bn, r.getAs[Array[Byte]](1), r.getAs[Array[Byte]](2))
        leaves = leaves :+ leaf
        val rootAfter = Commitments.merkleRoot(leaves)
        accepted += ((bn, r.getAs[Array[Byte]](1), r.getAs[Array[Byte]](2), leaf, rootAfter))
        last = Some(bn)
      } else {
        val reason = if (last.exists(bn <= _)) "duplicate_or_reorder" else "gap"
        rejected += ((bn, reason))
      }
    }

    val acc = accepted.result()
    if (acc.nonEmpty)
      acc.map { case (bn, bh, sr, leaf, root) =>
        (bn, Bytes.toHex(bh), Bytes.toHex(sr), Bytes.toHex(leaf), Bytes.toHex(root))
      }.toDF("block_number", "block_hash_hex", "state_root_hex", "leaf_hash_hex", "root_after_hex")
        .repartition(1)
        .write.mode(SaveMode.Append).parquet(sinkDir)

    val rej = rejected.result()
    if (rej.nonEmpty)
      rej.toDF("block_number", "reason")
        .withColumn("batch_id", lit(batchId))
        .repartition(1)
        .write.mode(SaveMode.Append).parquet(quarantineDir)
  }

  /** start the streaming append with exactly-once checkpointing. */
  def start(blocks: DataFrame, checkpointDir: String): StreamingQuery =
    blocks.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((df: DataFrame, id: Long) => processBatch(df, id))
      .start()
}

/** Streaming event-time aggregation (the general streaming surface the
  * engine adds beyond the reference's strict-append model): the same
  * declarative plan serves batch and streaming DataFrames — tumbling
  * windows with a watermark bound the state store. */
object EventWindows {

  /** tumbling 1-hour counts with a 2-hour watermark (streaming) or a
    * plain windowed groupBy (batch) — identical code path. */
  def hourly(events: DataFrame): DataFrame = {
    val base = if (events.isStreaming) events.withWatermark("ts", "2 hours") else events
    base
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total"))
  }
}
