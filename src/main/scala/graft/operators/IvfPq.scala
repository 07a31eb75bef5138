package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF-PQ — the composed index (IVF coarse quantizer + PQ over the
  * RESIDUALS, the FAISS `IVFx,PQy` shape): vectors are routed to a
  * posting list by the coarse quantizer, and what gets PQ-coded is the
  * residual `v − centroid(list)`, which has far less variance than `v`
  * itself, so the same code budget quantizes much finer.
  *
  * Search: for each probed list, the query's IP against a member
  * decomposes as `⟨q,v⟩ = ⟨q,c_l⟩ + ⟨q, r_v⟩` — a per-list scalar bias
  * (driver-computed) plus an ADC lookup-sum over the residual code
  * against the per-list table of `⟨q_j, codebook_{j,i}⟩`. The scan
  * per probed list is a filter on the partition-prunable `list_id`
  * plus m table lookups per row; raw vectors are touched only for the
  * exact rerank of the shortlist.
  */
object IvfPq {

  final case class Model(ivf: IvfIndex.Model, pq: PqIndex.Model) {
    def centroid(l: Int): Array[Float] = ivf.centroids.find(_._1 == l).get._2
  }

  /** residual column: embedding − centroid(list_id), via an inlined
    * centroid literal table (nlist × dims literals — tiny). */
  private def residualCol(model: IvfIndex.Model): Column = {
    val cents = array(model.centroids.sortBy(_._1).map { case (_, c) =>
      array(c.map(x => lit(x.toDouble)): _*)
    }: _*)
    zip_with(col("embedding"), element_at(cents, col("list_id") + 1),
      (x, c) => x.cast("double") - c)
  }

  def train(embeddings: DataFrame, nlist: Int = 16, m: Int = 8, ksub: Int = 16,
            seed: Long = 42L): Model =
    train(embeddings, IvfIndex.train(embeddings, nlist, seed), m, ksub, seed)

  /** compose a PRE-TRAINED coarse quantizer with a PQ fit over its
    * residuals — the serving path shares one IVF fit across the whole
    * index family instead of re-running k-means per composition. */
  def train(embeddings: DataFrame, ivf: IvfIndex.Model, m: Int, ksub: Int,
            seed: Long): Model = {
    val assigned = IvfIndex.assign(embeddings, ivf)
    // PQ codebooks fit on the residual distribution (cast back to
    // float — the PQ trainer's input column type)
    val residuals = assigned
      .withColumn("embedding", transform(residualCol(ivf), x => x.cast("float")))
      .select("embedding")
    Model(ivf, PqIndex.train(residuals, m, ksub, seed))
  }

  /** attach `list_id` and the residual `code` column. */
  def encode(embeddings: DataFrame, model: Model): DataFrame = {
    val assigned = IvfIndex.assign(embeddings, model.ivf)
    val bc = embeddings.sparkSession.sparkContext.broadcast(model.pq)
    val enc = udf((res: Seq[Double]) => bc.value.encodeOne(res.map(_.toFloat).toArray))
    assigned.withColumn("code", enc(residualCol(model.ivf)))
  }

  /** probe `nprobe` lists, ADC-shortlist, exact fixed-point rerank.
    * Per the decomposition ⟨q,v⟩ = ⟨q,c_l⟩ + ⟨q,r_v⟩, the residual
    * lookup table is built from the FULL query against the residual
    * codebooks (one table, shared by all probed lists); only the
    * scalar bias ⟨q,c_l⟩ varies per list — looked up from a tiny
    * map literal keyed by `list_id`. ONE scan of the encoded table
    * (a partition-prunable `isin` filter, like [[IvfIndex.probe]]),
    * not one scan per probed list. */
  def search(encoded: DataFrame, model: Model, query: Array[Float],
             nprobe: Int, shortlist: Int, k: Int): DataFrame = {
    val lists = model.ivf.nearest(query, nprobe)
    val lookup = PqIndex.lookupCol(model.pq.adcIpTable(query), model.pq.ksub)
    val bias = map(lists.flatMap(l =>
      Seq(lit(l), lit(IvfIndex.ip(query, model.centroid(l))))): _*)
    PqIndex.exactRerank(
      encoded.filter(col("list_id").isin(lists: _*))
        .withColumn("adc", element_at(bias, col("list_id")) + lookup)
        .orderBy(col("adc").desc, col("vec_id"))
        .limit(shortlist),
      query, k)
  }
}
