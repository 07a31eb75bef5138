package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming chunk dedup vs the batch registry query: in-order arrival
  * must be bit-equal to `d22_chunk_dedup`'s first-occurrence rule, and
  * out-of-order arrival must still keep every distinct chunk exactly
  * once globally. */
class StreamingChunkDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("streaming-chunk-dedup-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docs(n: Int): Seq[StreamingChunkDedup.Doc] =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id").limit(n).collect()
      .map(r => StreamingChunkDedup.Doc(r.getLong(0), r.getString(1)))

  private def runStream(batches: Seq[Seq[StreamingChunkDedup.Doc]], name: String) = {
    val s = spark
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val es = MemoryStream[StreamingChunkDedup.Doc]
    val q = StreamingChunkDedup.keeps(es.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try batches.foreach { b => es.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(name)
  }

  test("in-order arrival across micro-batches equals the batch d22 per-doc summary") {
    val all = docs(60)
    val got = runStream(Seq(all.take(20), all.slice(20, 40), all.drop(40)), "scd_in_order")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))

    // batch twin: the registry query over the same 60 docs staged as a
    // documents.parquet fixture dir
    val dir = java.nio.file.Files.createTempDirectory("scd_batch").toString
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .orderBy("doc_id").limit(60)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val want = graft.SparkEntry.queries("d22_chunk_dedup")(spark, dir)
      .select("doc_id", "n_chunks", "n_kept")

    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(snap(got) == snap(want))
  }

  test("out-of-order arrival still keeps each distinct chunk exactly once") {
    val all = docs(60)
    val shuffled = all.reverse
    val rows = runStream(
      Seq(shuffled.take(15), shuffled.slice(15, 45), shuffled.drop(45)), "scd_ooo")
    val nKept = rows.filter(col("keep")).count()
    val nDistinct = spark.createDataFrame(
      spark.sparkContext.parallelize(all.flatMap(StreamingChunkDedup.chunksOf)))
      .select("chunk").distinct().count()
    assert(nKept == nDistinct)
    // and every occurrence got a verdict
    assert(rows.count() == all.flatMap(StreamingChunkDedup.chunksOf).size)
  }
}
