package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor index — the
  * coarse-quantizer scale path from the builder brief (alternative to
  * the sign-projection LSH in `queries.Similarity`):
  *
  *   1. train: k-means over a sample → `nlist` centroids;
  *   2. assign: every vector joins its nearest centroid's posting list
  *      (this becomes the partitioning/bucketing key at rest);
  *   3. probe: a query scans only the `nprobe` nearest posting lists,
  *      with exact rerank inside them.
  *
  * At 100 TB the posting-list id is the partition key, so a probe
  * reads nprobe/nlist of the data; centroids are a tiny broadcast.
  * Deterministic under a fixed seed.
  */
object IvfIndex {

  final case class Model(centroids: Array[(Int, Array[Float])]) {
    /** list selection by L2 distance to the centroid (standard
      * IVF-Flat quantizer); the in-list rerank metric is separate. */
    def nearest(v: Array[Float], n: Int): Seq[Int] =
      centroids.map { case (id, c) => (id, IvfIndex.l2(c, v)) }
        .sortBy { case (id, d) => (d, id) }.take(n).map(_._1).toSeq
  }

  private[operators] def l2(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
    s
  }

  private[operators] def ip(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** rows the quantizer trains on — k-means centroid quality plateaus
    * far below this; at 100 TB the fit must never see the full table. */
  val TrainCap = 1000000L

  /** cache-key token for persisted stores: any change to the training
    * path (sampling, layout, k-means params) must bump this so an
    * `_OK`-gated store built under the old trainer re-keys instead of
    * being served silently. */
  val TrainerVersion = "t2"

  /** train the coarse quantizer (k-means over a bounded sample, fixed
    * seed). count() is answered from parquet footers; the fit input is
    * ≤ [[TrainCap]] rows regardless of table size. The sample is
    * hash-repartitioned to a FIXED layout before the fit: k-means||
    * init samples per-partition, so without this the centroid
    * placement depends on the session's core count / input split —
    * the fixed layout makes the fit machine-independent under a fixed
    * seed. */
  def train(embeddings: DataFrame, nlist: Int, seed: Long = 42L): Model = {
    val total = embeddings.count()
    val sampled =
      if (total <= TrainCap) embeddings
      // 1.2× oversample so the Bernoulli draw lands ≥ cap with margin
      else embeddings.sample(withReplacement = false, math.min(1.0, 1.2 * TrainCap / total), seed)
    val withVec = sampled.repartition(16, col("embedding"))
      .withColumn("features", array_to_vector(col("embedding")))
    val km = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10).setFeaturesCol("features")
    val model = km.fit(withVec)
    Model(model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray.map(_.toFloat)) })
  }

  /** build a quantizer from KNOWN centers (no fit): the deterministic
    * path when the cluster structure is given a priori — e.g. a
    * planted/grid corpus, or centroids agreed across systems. Nearest-
    * center assignment is a pure function of the centers, so results
    * are identical on any machine and Spark ML version. */
  def modelFromCenters(centers: Array[Array[Float]]): Model =
    Model(centers.zipWithIndex.map { case (c, i) => (i, c) })

  /** assign every vector to its posting list (the at-rest layout). */
  def assign(embeddings: DataFrame, model: Model): DataFrame = {
    val spark = embeddings.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val listUdf = udf((emb: Seq[Float]) => bc.value.nearest(emb.toArray, 1).head)
    embeddings.withColumn("list_id", listUdf(col("embedding")))
  }

  /** mean L2² of assigned vectors to their posting-list centroid —
    * the residual-distortion measure quantizer drift is judged by
    * (rises as ingested data walks away from the trained centroids). */
  def distortion(assigned: DataFrame, model: Model): Double = {
    val bc = assigned.sparkSession.sparkContext.broadcast(model)
    val dUdf = udf((emb: Seq[Float], l: Int) =>
      l2(emb.toArray, bc.value.centroids.find(_._1 == l).get._2))
    assigned.select(avg(dUdf(col("embedding"), col("list_id")))).head().getDouble(0)
  }

  // ---------------------------------------------------- at-rest store
  /** per-row generation stamp: the `_stats` epoch the row was written
    * under. A tombstone at epoch e suppresses rows with `__seq <= e`,
    * so a later RE-INSERT of a deleted id (higher stamp) is live again
    * without touching the tombstone set — the standard sequence-number
    * retract/add contract (Lucene's docvalue generations, Delta's
    * deletion-vector epoch). Underscore-prefixed so it reads as store
    * bookkeeping, not corpus data. */
  val SeqCol = "__seq"

  /** Write the assigned corpus as the at-rest serving layout: parquet
    * partitioned BY THE POSTING LIST, so a probe's `list_id IN (…)`
    * filter becomes directory-level partition pruning — the probe
    * reads nprobe/nlist of the data from disk, which is the entire
    * point of IVF at 100 TB. */
  def writeStore(assigned: DataFrame, dir: String): Unit = {
    assigned.withColumn(SeqCol, lit(1L))
      .write.mode("overwrite").partitionBy("list_id").parquet(dir)
    // a fresh overwrite's footer recount reads exactly the files just
    // written — O(write), not O(store history); epoch restarts at 1
    writeStats(assigned.sparkSession, dir,
      assigned.sparkSession.read.parquet(dir).count(), epoch = 1L)
  }

  /** Incremental maintenance: assign a delta under the EXISTING model
    * and append it into the per-list directories — no rebuild, no
    * touch of resident data. Assignment is a pure function of the
    * model, so probe(append-store) ≡ probe(full rebuild) exactly
    * (IvfIndexSpec pins it); model drift is watched separately via
    * [[distortion]] and a retrain swaps the store wholesale. */
  def appendStore(delta: DataFrame, model: Model, dir: String): Unit =
    writeAppend(assign(delta, model), dir, extraRemoved = 0L)

  private def writeAppend(assigned: DataFrame, dir: String, extraRemoved: Long): Unit = {
    val spark = assigned.sparkSession
    // the manifest advances INCREMENTALLY (previous value + delta) — a
    // micro-append never pays an O(all store files) footer listing
    // that grows with the store. A legacy store with no manifest falls
    // back to one full footer recount and enters the incremental
    // regime from there. Stats are read FIRST: the new rows' __seq
    // stamp is the epoch this append commits.
    val (prevN, prevEpoch) = readStats(spark, dir, heal = false)
      .getOrElse((spark.read.parquet(dir).count(), 0L))
    val a = assigned.withColumn(SeqCol, lit(prevEpoch + 1)).persist()
    val deltaN = a.count()
    a.write.mode("append").partitionBy("list_id").parquet(dir)
    a.unpersist()
    writeStats(spark, dir, prevN + deltaN - extraRemoved, prevEpoch + 1)
  }

  // ----------------------------------------- retract/add (CDC follow)
  private def tombDir(dir: String) = new java.io.File(s"$dir/_tombstones")

  /** the LIVE rows of the store: the at-rest scan minus tombstoned
    * generations. With no tombstones this IS the raw scan (zero serve
    * cost); with tombstones the suppression set is a broadcast hash
    * lookup sized by the UNRECLAIMED delete/update volume — O(delta),
    * never O(corpus) — and [[compactStore]] periodically folds it back
    * to zero. Every probe of a maintained store must read THIS:
    * a deleted id must never be served at any nprobe. */
  def liveStore(spark: SparkSession, dir: String): DataFrame = {
    val td = tombDir(dir)
    if (!td.exists()) spark.read.parquet(dir)
    else {
      // mergeSchema: a pre-seq legacy store that later took CDC writes
      // is MIXED-schema parquet, and without merging, which footer wins
      // inference is arbitrary — if an old file won, post-CDC rows
      // would read as legacy and a tombstone could suppress an update
      // postimage along with its preimage (ADVICE r10). Merging makes
      // __seq present whenever ANY file carries it; rows from pre-seq
      // files read as null → generation 1 PER ROW, not per store. Only
      // the tombstoned path pays the extra footer reads.
      val store = spark.read.option("mergeSchema", "true").parquet(dir)
      val t = spark.read.parquet(td.getPath)
        .groupBy("vec_id").agg(max("tomb_seq").as("__tomb_seq"))
      val withSeq =
        if (store.columns.contains(SeqCol))
          store.withColumn(SeqCol, coalesce(col(SeqCol), lit(1L)))
        else store.withColumn(SeqCol, lit(1L)) // pre-seq legacy layout
      withSeq.join(broadcast(t), Seq("vec_id"), "left")
        .filter(col("__tomb_seq").isNull || col(SeqCol) > col("__tomb_seq"))
        .drop("__tomb_seq")
    }
  }

  /** Full CDC follow — the retract/add contract over a
    * [[graft.sources.VersionedTable.cdc]] feed (columns: the corpus
    * columns + `change_type`):
    *
    *   - `insert` / `update_postimage` → assign under the PERSISTED
    *     model, append at the new epoch (ADD);
    *   - `delete` / `update_preimage` → tombstone the id at the
    *     PREVIOUS epoch (RETRACT): every resident generation of that
    *     id is suppressed, while the postimage appended in this same
    *     apply (higher stamp) stays live.
    *
    * One apply = one epoch: the tombstone write lands BEFORE the data
    * append, so a crash between them leaves extra suppression (the
    * postimage missing) but never a served ghost; re-applying the SAME
    * batch heals that window (the re-written tombstones are dominated
    * by the re-appended higher epoch). The idempotency claim is scoped
    * to exactly that window: a crash AFTER the data append but before
    * the `_stats` swap must be healed by [[verifyStats]] (footer
    * recount), NOT by blind re-apply — re-appending would duplicate
    * the add rows at the same epoch (ADVICE r10). The `_stats` count
    * is maintained as the LIVE row count: + adds − retracts, still
    * O(delta) bookkeeping.
    * Upstream CDC guarantees each retracted id was present in the
    * followed version — this consumes that contract rather than
    * re-checking it with a store scan. */
  def applyCdc(cdc: DataFrame, model: Model, dir: String): Unit = {
    val spark = cdc.sparkSession
    val c = cdc.persist()
    try {
      val (prevN, prevEpoch) = readStats(spark, dir, heal = false)
        .getOrElse((spark.read.parquet(dir).count(), 0L))
      val removed = c.filter(col("change_type").isin("delete", "update_preimage"))
        .select(col("vec_id"), lit(prevEpoch).as("tomb_seq"))
      val removedN = removed.count()
      if (removedN > 0)
        removed.coalesce(1).write.mode("append").parquet(tombDir(dir).getPath)
      val added = c.filter(col("change_type").isin("insert", "update_postimage"))
        .drop("change_type")
      // writeAppend re-reads stats (unchanged by the tombstone write)
      // and stamps the adds at prevEpoch + 1 > every tombstone
      writeAppend(assign(added, model), dir, extraRemoved = removedN)
    } finally c.unpersist()
  }

  /** Reclaim tombstoned generations: rewrite ONLY the posting lists
    * that still hold a suppressed row (dirty-list rewrite — the
    * VersionedTable bucket discipline), then clear the tombstone set.
    * O(dirty lists), not O(store); the live row set — and therefore
    * every probe — is bit-identical before and after (IvfIndexSpec
    * pins it). OFFLINE maintenance: the per-list delete+rename swap
    * assumes no concurrent reader mid-list (serve traffic should be
    * drained or pointed at a sibling store during compaction, exactly
    * like a VersionedTable compact commit). */
  def compactStore(spark: SparkSession, dir: String): Unit = {
    // heal a previous interrupted compaction FIRST (see
    // [[recoverParkedLists]]): through round 10 the swap deleted the
    // live list dir before renaming the rebuilt copy in, and a re-run
    // cleared the stage up front — a crash inside that window
    // permanently lost the list (ADVICE r10, medium). The swap now
    // parks the live dir aside instead of deleting it, so every crash
    // point leaves a recoverable copy.
    recoverParkedLists(dir)
    val td = tombDir(dir)
    if (!td.exists()) return
    val store = spark.read.option("mergeSchema", "true").parquet(dir)
    val t = spark.read.parquet(td.getPath)
      .groupBy("vec_id").agg(max("tomb_seq").as("__tomb_seq"))
    val withSeq =
      if (store.columns.contains(SeqCol))
        store.withColumn(SeqCol, coalesce(col(SeqCol), lit(1L)))
      else store.withColumn(SeqCol, lit(1L))
    val dirtyLists = withSeq.join(broadcast(t), Seq("vec_id"), "inner")
      .filter(col(SeqCol) <= col("__tomb_seq"))
      .select("list_id").distinct().collect().map(_.getInt(0))
    val (prevN, prevEpoch) = readStats(spark, dir, heal = false)
      .getOrElse((liveStore(spark, dir).count(), 0L))
    val stage = new java.io.File(s"$dir/_compact")
    graft.core.Fs.deleteRecursively(stage)
    dirtyLists.foreach { l =>
      val listPath = new java.io.File(s"$dir/list_id=$l")
      val parked = new java.io.File(s"$dir/${ParkedPrefix}list_id=$l")
      val live = liveStore(spark, dir).filter(col("list_id") === l).drop("list_id")
      live.write.mode("overwrite").parquet(s"${stage.getPath}/list_id=$l")
      // park-then-swap: the live dir is RENAMED aside (never deleted
      // before the rebuilt copy is in place), so between park and swap
      // the original remains on disk under the parked name and
      // recovery can always restore it; only after a successful swap
      // is the parked copy dropped
      graft.core.Fs.deleteRecursively(parked)
      if (listPath.exists() && !listPath.renameTo(parked))
        throw new IllegalStateException(s"compaction park failed for list $l at $dir")
      val rebuilt = new java.io.File(s"${stage.getPath}/list_id=$l")
      if (!rebuilt.renameTo(listPath))
        throw new IllegalStateException(s"compaction swap failed for list $l at $dir")
      graft.core.Fs.deleteRecursively(parked)
    }
    graft.core.Fs.deleteRecursively(stage)
    graft.core.Fs.deleteRecursively(td)
    // live count is invariant under compaction; the epoch advances so
    // post-compaction appends stamp above every reclaimed generation
    writeStats(spark, dir, prevN, prevEpoch + 1)
  }

  private val ParkedPrefix = "_compact_parked."

  /** restore lists parked by an interrupted [[compactStore]]: a parked
    * dir with NO live sibling is the only copy of that list (the crash
    * landed between park and swap) — rename it back; a parked dir WITH
    * a live sibling is a completed swap's leftover — drop it. The
    * underscore prefix keeps parked dirs invisible to every parquet
    * scan of the store in the meantime. */
  private def recoverParkedLists(dir: String): Unit = {
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty[java.io.File])
    files.filter(f => f.isDirectory && f.getName.startsWith(ParkedPrefix)).foreach { p =>
      val livePath = new java.io.File(dir, p.getName.stripPrefix(ParkedPrefix))
      if (!livePath.exists()) {
        if (!p.renameTo(livePath))
          throw new IllegalStateException(s"compaction recovery failed for ${livePath.getName} at $dir")
      } else graft.core.Fs.deleteRecursively(p)
    }
  }

  /** `_stats` manifest maintained at write/append time: the committed
    * row count of the store. Serve paths that size knobs by corpus
    * size read THIS instead of re-counting the store: at 100 TB a
    * per-query count() is a full-store job for a number that is a
    * property of the committed index. Underscore prefix keeps it
    * invisible to [[readStore]]'s data scan, like `_model`.
    *
    * Swapped in place via the park/rename pair (the StreamingNearDup
    * compaction discipline): the new manifest lands at `_stats.tmp`,
    * the live one parks at `_stats.old`, the tmp renames live — so a
    * reader never sees a half-written manifest and a crash mid-swap
    * is healed on the next read. `epoch` counts commits; a crash in
    * the window between the data append and the stats swap leaves the
    * count stale WITH its epoch unchanged, which [[verifyStats]]
    * detects by footer recount (a maintenance audit, never the serve
    * path). */
  private def writeStats(spark: org.apache.spark.sql.SparkSession, dir: String,
                         n: Long, epoch: Long): Unit = {
    import spark.implicits._
    val tmp = new java.io.File(s"$dir/_stats.tmp")
    val live = new java.io.File(s"$dir/_stats")
    val old = new java.io.File(s"$dir/_stats.old")
    graft.core.Fs.deleteRecursively(tmp)
    Seq((n, epoch)).toDF("n", "epoch").coalesce(1)
      .write.mode("overwrite").parquet(tmp.getPath)
    graft.core.Fs.deleteRecursively(old)
    if (live.exists() && !live.renameTo(old))
      throw new IllegalStateException(s"could not park _stats at $dir")
    if (!tmp.renameTo(live))
      throw new IllegalStateException(s"could not swap _stats at $dir")
    graft.core.Fs.deleteRecursively(old)
  }

  /** (n, epoch) from the manifest. None = no manifest (legacy store or
    * pre-first-write). Pre-epoch single-column manifests read as
    * epoch 0. With `heal = false` (every read on or near the serve
    * path) a crashed swap — live manifest absent, parked `_stats.old`
    * present — is served FROM the parked copy without renaming it:
    * a rename here could land inside a concurrent writer's park
    * window and resurrect the manifest its swap is about to replace,
    * failing the writer spuriously. Only the maintenance audit
    * ([[verifyStats]]) heals by rename, where single-writer is the
    * documented precondition. */
  private def readStats(spark: org.apache.spark.sql.SparkSession,
                        dir: String, heal: Boolean): Option[(Long, Long)] = {
    val live = new java.io.File(s"$dir/_stats")
    val old = new java.io.File(s"$dir/_stats.old")
    if (heal && !live.exists() && old.exists() && !old.renameTo(live))
      throw new IllegalStateException(s"_stats recovery failed at $dir")
    val src = if (live.exists()) Some(live) else if (old.exists()) Some(old) else None
    src.map { f =>
      val r = spark.read.parquet(f.getPath).collect()(0)
      (r.getLong(0), if (r.schema.fieldNames.contains("epoch")) r.getAs[Long]("epoch") else 0L)
    }
  }

  /** committed LIVE row count from the `_stats` manifest (one tiny
    * file — no scan of the store itself). Read-only: a crashed-swap
    * store is served from the parked copy and healed later by
    * [[verifyStats]] maintenance, never by a serve-path rename. */
  def storedCount(spark: org.apache.spark.sql.SparkSession, dir: String): Long =
    readStats(spark, dir, heal = false).map(_._1).getOrElse(
      throw new IllegalStateException(s"no _stats manifest at $dir"))

  /** maintenance audit: does the manifest match a recount of the LIVE
    * rows? O(store footers) — for audits and specs; the serve path
    * never calls it. Heals a crashed `_stats` swap by rename first
    * (single-writer maintenance is the precondition here). False = a
    * writer crashed between its data append and the stats swap (the
    * count is stale until the next successful append rewrites it from
    * the stale base — re-run [[writeStore]]/[[appendStore]]
    * maintenance to restore truth). */
  def verifyStats(spark: org.apache.spark.sql.SparkSession, dir: String): Boolean =
    readStats(spark, dir, heal = true).exists(_._1 == liveStore(spark, dir).count())

  /** read the at-rest layout back (list_id is the partition column). */
  def readStore(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Persist the quantizer next to its store (`_model` is invisible
    * to the parquet reader), so probes are served by the EXACT model
    * the store was assigned under — k-means re-trained in a different
    * session (other partitioning/parallelism) may place centroids
    * differently, and a model/store mismatch silently breaks the
    * pruning contract. */
  def saveModel(spark: org.apache.spark.sql.SparkSession, model: Model, dir: String): Unit = {
    import spark.implicits._
    model.centroids.toSeq.map { case (i, c) => (i, c.toSeq) }
      .toDF("list_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_model")
  }

  def loadModel(spark: org.apache.spark.sql.SparkSession, dir: String): Model =
    Model(spark.read.parquet(s"$dir/_model").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray)).sortBy(_._1))

  /** top-k by L2 distance (IVF-Flat's native metric) over the probed
    * lists, in EXACT integer arithmetic: requires integer-valued
    * embedding coordinates with |x| < 3.7e8 (16-dim Σdiff² must stay
    * under 2⁶³) — the fixed-point planted corpora qualify, and the
    * integer form is what makes the result oracle-portable. */
  def probeL2(assigned: DataFrame, model: Model, query: Array[Float], nprobe: Int, k: Int): DataFrame = {
    val lists = model.nearest(query, nprobe)
    val qArr = array(query.map(x => lit(math.round(x.toDouble))): _*)
    val fx = transform(col("embedding"), x => x.cast("long"))
    assigned
      .filter(col("list_id").isin(lists: _*)) // partition-pruned at rest
      .withColumn("d2", aggregate(zip_with(fx, qArr, (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v))
      .orderBy(col("d2").asc, col("vec_id").asc)
      .limit(k)
  }

  /** top-k by inner product probing the query's nprobe nearest lists.
    * Scoring is the same codegen'd fixed-point `aggregate(zip_with)`
    * form as the exact-MIPS path (`queries/Similarity.scala`) — the
    * query vector is inlined as a literal array, so the whole probe
    * stays inside whole-stage codegen with no serde. */
  def probe(assigned: DataFrame, model: Model, query: Array[Float], nprobe: Int, k: Int): DataFrame = {
    val lists = model.nearest(query, nprobe)
    val qFx = array(query.map(x => lit(math.round(x * 1e7))): _*)
    val fx = transform(col("embedding"), x => round(x * lit(1e7)).cast("long"))
    assigned
      .filter(col("list_id").isin(lists: _*)) // partition-prunable at rest
      .withColumn("score", aggregate(zip_with(fx, qFx, (x, y) => x * y), lit(0L), (acc, v) => acc + v))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }
}
