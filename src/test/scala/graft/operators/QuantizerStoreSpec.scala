package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The quantizer store must round-trip models bit-exactly (a loaded
  * quantizer routes every vector to the same posting list as the
  * trained one) and version refreshes atomically (latest snapshot
  * wins; old versions stay readable for pinned readers).
  */
class QuantizerStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .appName("quantizer-store-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("IVF + PQ models round-trip bit-exactly; refresh commits a new version") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val dir = Files.createTempDirectory("qstore").toString

    val ivfPq = IvfPq.train(emb, nlist = 8, m = 8, ksub = 16)
    val v0 = QuantizerStore.save(spark, dir, Some(ivfPq.ivf), Some(ivfPq.pq))

    val loaded = QuantizerStore.loadIvfPq(spark, dir).get
    assert(loaded.ivf.centroids.map(_._1).toSeq == ivfPq.ivf.centroids.map(_._1).toSeq)
    assert(loaded.ivf.centroids.map(_._2.toSeq).toSeq == ivfPq.ivf.centroids.map(_._2.toSeq).toSeq,
      "IVF centroids must survive the store byte-for-byte")
    assert(loaded.pq.m == ivfPq.pq.m && loaded.pq.ksub == ivfPq.pq.ksub &&
      loaded.pq.subDim == ivfPq.pq.subDim)
    assert(loaded.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      ivfPq.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq,
      "PQ codebooks must survive the store byte-for-byte")

    // loaded quantizer routes identically (the serving guarantee)
    val some = emb.limit(50).collect().map(_.getSeq[Float](1).toArray)
    assert(some.map(v => loaded.ivf.nearest(v, 1)).toSeq ==
      some.map(v => ivfPq.ivf.nearest(v, 1)).toSeq)
    assert(some.map(v => loaded.pq.encodeOne(v).toSeq).toSeq ==
      some.map(v => ivfPq.pq.encodeOne(v).toSeq).toSeq)

    // refresh: a different fit commits as the next version and wins
    val fresh = IvfIndex.train(emb, nlist = 8, seed = 7L)
    val v1 = QuantizerStore.save(spark, dir, Some(fresh), None)
    assert(v1 == v0 + 1)
    val latest = QuantizerStore.loadIvf(spark, dir).get
    assert(latest.centroids.map(_._2.toSeq).toSeq == fresh.centroids.map(_._2.toSeq).toSeq,
      "latest snapshot must serve the refreshed quantizer")
  }
}
