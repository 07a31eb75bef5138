package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal.{MediaMeta, MediaRecord}

class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("multimodal-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("mapPartitions decode: distributed output matches driver-side stub, schema is typed") {
    val s2 = spark
    import s2.implicits._
    val recs = (0L until 64L).map(i => MediaRecord(i, s"payload-$i".getBytes("UTF-8")))
    val ds = spark.createDataset(recs).repartition(8)
    val out = Multimodal.extractMeta(ds).collect().sortBy(_.doc_id)
    assert(out.length == 64)
    out.foreach { m =>
      val want = Multimodal.decodeStub(s"payload-${m.doc_id}".getBytes("UTF-8")).copy(doc_id = m.doc_id)
      assert(m == want)
      assert(m.width >= 64 && m.width < 1088 && m.height >= 64 && m.height < 1088)
      assert(Set("jpeg", "png", "webp").contains(m.format))
      assert(m.phash.length == 16)
    }
    // typed schema survives the partition hop
    assert(Multimodal.extractMeta(ds).schema.fieldNames.toSeq ==
      Seq("doc_id", "n_bytes", "width", "height", "format", "phash"))
  }

  test("decode is deterministic across partitionings") {
    val s2 = spark
    import s2.implicits._
    val recs = (0L until 32L).map(i => MediaRecord(i, s"xx-$i".getBytes("UTF-8")))
    val a = Multimodal.extractMeta(spark.createDataset(recs).repartition(2)).collect().sortBy(_.doc_id).toSeq
    val b = Multimodal.extractMeta(spark.createDataset(recs).repartition(11)).collect().sortBy(_.doc_id).toSeq
    assert(a == b)
  }
}
