package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IvfIndex

/** Streaming ANN index maintenance: the index must stay probeable
  * mid-stream (seeing exactly what has been ingested) and, once the
  * stream is fully consumed, a probe must equal the batch IVF probe
  * over the same data with the same quantizer.
  */
class VectorIndexMaintainerSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("vector-index-maintainer-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("stream-maintained index converges to the batch probe") {
    implicit val sq = spark.sqlContext
    val s2 = spark
    import s2.implicits._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val model = IvfIndex.train(emb, nlist = 16)
    val q = emb.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray

    val maintainer = new VectorIndexMaintainer(
      spark, Files.createTempDirectory("vec-idx").toString, model)

    val rows = emb.filter(col("vec_id") =!= 0)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    val (first, second) = rows.partition(_._1 < 250)

    val stream = MemoryStream[(Long, Seq[Float], Int)]
    // ONE checkpoint reused across drains: the second run must resume
    // from recorded offsets and process only the new batch (replay
    // safety is separately guaranteed by the id-keyed upsert)
    val ckpt = Files.createTempDirectory("vec-ckpt").toString
    def drain(): Unit = {
      val query = maintainer.start(
        stream.toDS().toDF("vec_id", "embedding", "label")
          .withColumn("embedding", col("embedding").cast("array<float>")),
        ckpt)
      query.awaitTermination()
    }

    stream.addData(first.toSeq)
    drain()
    val midCount = maintainer.indexedCount()
    assert(midCount == first.length, s"mid-stream index holds $midCount of ${first.length}")
    // mid-stream probe works and only sees ingested ids
    val midIds = maintainer.probe(q, nprobe = 16, k = 10).select("vec_id")
      .collect().map(_.getLong(0))
    assert(midIds.forall(id => id < 250))

    stream.addData(second.toSeq)
    drain()
    assert(maintainer.indexedCount() == rows.length)

    val got = maintainer.probe(q, nprobe = 8, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val want = IvfIndex.probe(
      IvfIndex.assign(emb.filter(col("vec_id") =!= 0), model), model, q, nprobe = 8, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got == want, s"streamed index probe $got vs batch $want")
  }
}
