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

  /** train the coarse quantizer (k-means, fixed seed). */
  def train(embeddings: DataFrame, nlist: Int, seed: Long = 42L): Model = {
    val withVec = embeddings.withColumn("features", array_to_vector(col("embedding")))
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

  /** top-k by inner product probing the query's nprobe nearest lists. */
  def probe(assigned: DataFrame, model: Model, query: Array[Float], nprobe: Int, k: Int): DataFrame = {
    val spark = assigned.sparkSession
    val lists = model.nearest(query, nprobe)
    val qBc = spark.sparkContext.broadcast(query)
    val ipUdf = udf((emb: Seq[Float]) => IvfIndex.ip(emb.toArray, qBc.value))
    assigned
      .filter(col("list_id").isin(lists: _*)) // partition-prunable at rest
      .withColumn("score", ipUdf(col("embedding")))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }
}
