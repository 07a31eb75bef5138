package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transactional versioned table — the reference's appendable
  * versioned block DB (`block/mod.rs:152-293`) generalized into the
  * minimal table-format mechanism (what Delta/Iceberg provide,
  * reduced to its essentials), for sinks that need concurrent-reader
  * correctness at scale:
  *
  *   - **Immutable data files**, hash-bucketed by the table key; a
  *     version only WRITES its dirty buckets and inherits every
  *     untouched bucket's files from its base manifest — partition-
  *     level copy-on-write, no full-table rewrite.
  *   - **Atomic commits**: a manifest (bucket → data path) is staged
  *     to a temp file and atomically renamed to `v%06d.manifest`;
  *     `CREATE_NEW` rename semantics double as optimistic concurrency
  *     control — two writers committing the same next version race on
  *     the rename and exactly one wins ([[CommitConflict]] for the
  *     loser). The `LATEST` pointer is then swapped atomically.
  *   - **Snapshot isolation / time travel**: readers resolve a
  *     version once and read only that manifest's immutable files;
  *     later commits never disturb them. [[read]] accepts an explicit
  *     version for time travel.
  *   - **Retention**: [[vacuum]] deletes data files unreferenced by
  *     the kept manifests (age out old versions without breaking
  *     pinned readers inside the retention window).
  */
class VersionedTable(spark: SparkSession, baseDir: String, nBuckets: Int = 16) {
  require(nBuckets > 0)

  final class CommitConflict(msg: String) extends RuntimeException(msg)

  private val manifestDir = Paths.get(baseDir, "_manifests")
  private val latestFile = Paths.get(baseDir, "LATEST")

  private def manifestPath(v: Int): Path = manifestDir.resolve(f"v$v%06d.manifest")

  def currentVersion(): Option[Int] =
    if (Files.exists(latestFile)) Some(Files.readString(latestFile).trim.toInt) else None

  /** bucket assignment expression for the table key columns. */
  def bucketCol(keys: Seq[String]): org.apache.spark.sql.Column =
    pmod(xxhash64(keys.map(col): _*), lit(nBuckets.toLong)).cast("int")

  private def readManifest(v: Int): Map[Int, String] =
    Files.readAllLines(manifestPath(v)).asScala.filter(_.nonEmpty).map { line =>
      val Array(b, p) = line.split("\t", 2)
      b.toInt -> p
    }.toMap

  /** snapshot read at `version` (default: latest); None if the table
    * has no committed version yet. The `__bucket` partition column is
    * internal and dropped. */
  def read(version: Option[Int] = None): Option[DataFrame] =
    version.orElse(currentVersion()).map { v =>
      // each bucket dir is read as its own root (no cross-version
      // partition inference) and unioned — bucket count is small and
      // fixed, the per-dir scans stay fully parallel
      val dirs = readManifest(v).values.toSeq.distinct.map(rel => s"$baseDir/$rel")
      dirs.map(d => spark.read.parquet(d)).reduce(_ unionByName _)
    }

  /** Write `rows` (which must hold the COMPLETE contents of every
    * bucket they touch) as the dirty buckets of the next version;
    * untouched buckets inherit the base manifest's files. Returns the
    * committed version. Throws [[CommitConflict]] if another writer
    * committed first (retry against the new base). */
  def commit(rows: DataFrame, keys: Seq[String], expectedBase: Option[Int]): Int = {
    val base = currentVersion()
    if (base != expectedBase)
      throw new CommitConflict(s"base moved: expected $expectedBase, found $base")
    val next = base.getOrElse(-1) + 1
    val dataRel = f"data/v$next%06d"

    val bucketed = rows.withColumn("__bucket", bucketCol(keys))
    bucketed.write.partitionBy("__bucket").mode("overwrite").parquet(s"$baseDir/$dataRel")
    val dirty = bucketed.select("__bucket").distinct().collect().map(_.getInt(0)).toSet

    val inherited = base.map(readManifest).getOrElse(Map.empty)
    val mapping = inherited.filter { case (b, _) => !dirty.contains(b) } ++
      dirty.map(b => b -> s"$dataRel/__bucket=$b")

    Files.createDirectories(manifestDir)
    val tmp = Files.createTempFile(manifestDir, "stage", ".tmp")
    Files.writeString(tmp, mapping.toSeq.sortBy(_._1).map { case (b, p) => s"$b\t$p" }.mkString("\n"))
    try {
      // ATOMIC_MOVE without REPLACE: exactly one writer can create
      // v<next> — the losing racer lands here
      Files.move(tmp, manifestPath(next), StandardCopyOption.ATOMIC_MOVE)
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new CommitConflict(s"version $next already committed by another writer")
    }
    val ptrTmp = Files.createTempFile(Paths.get(baseDir), "latest", ".tmp")
    Files.writeString(ptrTmp, next.toString)
    Files.move(ptrTmp, latestFile, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    next
  }

  /** drop manifests older than the newest `keepVersions` and delete
    * data directories no surviving manifest references. */
  def vacuum(keepVersions: Int): Unit = {
    require(keepVersions >= 1)
    if (!Files.exists(manifestDir)) return
    val versions = Files.list(manifestDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".manifest"))
      .map(n => n.stripPrefix("v").stripSuffix(".manifest").toInt).toSeq.sorted
    val (drop, keep) = versions.splitAt(math.max(0, versions.size - keepVersions))
    if (drop.isEmpty) return
    val live = keep.flatMap(v => readManifest(v).values).toSet
    val dead = drop.flatMap(v => readManifest(v).values).toSet -- live
    // data paths are per-version bucket dirs; delete dead ones
    dead.foreach { rel =>
      val dir = Paths.get(baseDir, rel)
      if (Files.exists(dir)) {
        Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      }
    }
    drop.foreach(v => Files.deleteIfExists(manifestPath(v)))
  }
}
