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

  /** train the coarse quantizer (k-means over a bounded sample, fixed
    * seed). count() is answered from parquet footers; the fit input is
    * ≤ [[TrainCap]] rows regardless of table size. */
  def train(embeddings: DataFrame, nlist: Int, seed: Long = 42L): Model = {
    val total = embeddings.count()
    val sampled =
      if (total <= TrainCap) embeddings
      // 1.2× oversample so the Bernoulli draw lands ≥ cap with margin
      else embeddings.sample(withReplacement = false, math.min(1.0, 1.2 * TrainCap / total), seed)
    val withVec = sampled.withColumn("features", array_to_vector(col("embedding")))
    val km = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10).setFeaturesCol("features")
    val model = km.fit(withVec)
    Model(model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray.map(_.toFloat)) })
  }

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
