package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.pipeline.ZkPipeline

/** Streaming storage-DB maintenance: each micro-batch carries the FULL
  * entry set of the (block, contract) groups it touches; the
  * maintainer rebuilds exactly those groups (`storageDbIncremental` —
  * the reference's dirty-path-only recomputation) and publishes a new
  * immutable snapshot version. Readers always see a consistent
  * version via the LATEST pointer — the storage layout a table format
  * (Delta/Iceberg) would provide, reduced to its mechanism.
  */
class StorageDbMaintainer(spark: SparkSession, baseDir: String) {

  private val latestFile = Paths.get(baseDir, "LATEST")

  def currentVersion(): Option[String] =
    if (Files.exists(latestFile)) Some(Files.readString(latestFile).trim) else None

  def current(): Option[DataFrame] =
    currentVersion().map(v => spark.read.parquet(s"$baseDir/$v"))

  def processBatch(delta: DataFrame, batchId: Long): Unit = {
    if (delta.isEmpty) return
    val next = current() match {
      case None       => ZkPipeline.storageDb(delta)
      case Some(prev) => ZkPipeline.storageDbIncremental(prev, delta)
    }
    val version = f"v$batchId%06d"
    next.write.mode(SaveMode.Overwrite).parquet(s"$baseDir/$version")
    Files.writeString(latestFile, version,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  def start(deltas: DataFrame, checkpointDir: String): StreamingQuery =
    deltas.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((df: DataFrame, id: Long) => processBatch(df, id))
      .start()
}
