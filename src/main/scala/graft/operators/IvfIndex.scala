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
  /** Write the assigned corpus as the at-rest serving layout: parquet
    * partitioned BY THE POSTING LIST, so a probe's `list_id IN (…)`
    * filter becomes directory-level partition pruning — the probe
    * reads nprobe/nlist of the data from disk, which is the entire
    * point of IVF at 100 TB. */
  def writeStore(assigned: DataFrame, dir: String): Unit = {
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(dir)
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
    writeAppend(assign(delta, model), dir)

  private def writeAppend(assigned: DataFrame, dir: String): Unit = {
    val spark = assigned.sparkSession
    // count the delta off the cached frame BEFORE the write so the
    // assignment isn't recomputed; the manifest then advances
    // INCREMENTALLY (previous value + delta) — a micro-append never
    // pays an O(all store files) footer listing that grows with the
    // store. A legacy store with no manifest falls back to one full
    // footer recount and enters the incremental regime from there.
    val a = assigned.persist()
    val deltaN = a.count()
    a.write.mode("append").partitionBy("list_id").parquet(dir)
    a.unpersist()
    val (prevN, prevEpoch) = readStats(spark, dir)
      .getOrElse((spark.read.parquet(dir).count() - deltaN, 0L))
    writeStats(spark, dir, prevN + deltaN, prevEpoch + 1)
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

  /** (n, epoch) from the manifest; heals a crashed swap (live absent,
    * parked copy present) first. None = no manifest (legacy store or
    * pre-first-write). Pre-epoch single-column manifests read as
    * epoch 0. */
  private def readStats(spark: org.apache.spark.sql.SparkSession,
                        dir: String): Option[(Long, Long)] = {
    val live = new java.io.File(s"$dir/_stats")
    val old = new java.io.File(s"$dir/_stats.old")
    if (!live.exists() && old.exists() && !old.renameTo(live))
      throw new IllegalStateException(s"_stats recovery failed at $dir")
    if (!live.exists()) None
    else {
      val r = spark.read.parquet(live.getPath).collect()(0)
      Some((r.getLong(0), if (r.schema.fieldNames.contains("epoch")) r.getAs[Long]("epoch") else 0L))
    }
  }

  /** committed store size from the `_stats` manifest (one tiny file —
    * no scan of the store itself). */
  def storedCount(spark: org.apache.spark.sql.SparkSession, dir: String): Long =
    readStats(spark, dir).map(_._1).getOrElse(
      throw new IllegalStateException(s"no _stats manifest at $dir"))

  /** maintenance audit: does the manifest match a footer recount of
    * the store? O(store footers) — for audits and specs; the serve
    * path never calls it. False = a writer crashed between its data
    * append and the stats swap (the count is stale until the next
    * successful append rewrites it from the stale base — re-run
    * [[writeStore]]/[[appendStore]] maintenance to restore truth). */
  def verifyStats(spark: org.apache.spark.sql.SparkSession, dir: String): Boolean =
    readStats(spark, dir).exists(_._1 == spark.read.parquet(dir).count())

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
