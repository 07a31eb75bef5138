package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** IVF ANN: deterministic under seed, and probing a fraction of the
  * lists recovers most of the exact top-k (recall sanity). */
class IvfIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .appName("ivf-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("IVF probe recall vs exact brute force; assignment is deterministic") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val model = IvfIndex.train(emb, nlist = 16)
    val assigned = IvfIndex.assign(emb, model).persist()

    val query = emb.filter(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Float](0).toArray

    // exact top-10 by the same metric (driver-side)
    val all = emb.filter(col("vec_id") =!= 0)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), IvfIndex.ip(r.getSeq[Float](1).toArray, query)))
    val exact = all.sortBy { case (id, d) => (-d, id) }.take(10).map(_._1).toSet

    val got = IvfIndex.probe(assigned.filter(col("vec_id") =!= 0), model, query, nprobe = 8, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(got).size
    assert(recall >= 5, s"recall@10 too low: $recall (got=$got exact=$exact)")

    // determinism: re-train + re-assign gives identical lists
    val model2 = IvfIndex.train(emb, nlist = 16)
    val a1 = assigned.select("vec_id", "list_id").collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    val a2 = IvfIndex.assign(emb, model2).select("vec_id", "list_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(a1 == a2)
  }

  test("posting lists cover all vectors and are reasonably balanced") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val model = IvfIndex.train(emb, nlist = 8)
    val sizes = IvfIndex.assign(emb, model).groupBy("list_id").count()
      .collect().map(_.getLong(1))
    assert(sizes.sum == emb.count())
    assert(sizes.forall(_ > 0), "no empty posting lists at this nlist")
  }

  test("at-rest store: model roundtrips, delta append equals rebuild, probes prune partitions") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val model = IvfIndex.train(emb, nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("ivfstore").toString
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0 && col("vec_id") =!= 0)
    IvfIndex.writeStore(IvfIndex.assign(base, model), dir)
    IvfIndex.saveModel(spark, model, dir)
    IvfIndex.appendStore(delta, model, dir)

    // the persisted quantizer is byte-identical to the trained one
    val loaded = IvfIndex.loadModel(spark, dir)
    assert(loaded.centroids.map(_._1).toSeq == model.centroids.map(_._1).toSeq)
    assert(loaded.centroids.zip(model.centroids).forall { case ((_, a), (_, b)) => a.sameElements(b) })

    // `_model` stays invisible to the data read; rows = base + delta
    val stored = IvfIndex.readStore(spark, dir)
    assert(stored.count() == base.count() + delta.count())

    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val p = IvfIndex.probe(stored, loaded, q, nprobe = 4, k = 10)
    // the probe's list filter must hit the partition layout, not a
    // post-scan filter — that is the at-rest pruning contract
    val plan = p.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("list_id"), plan.take(2000))
    val got = p.select("vec_id").collect().map(_.getLong(0)).toSeq
    val rebuilt = IvfIndex.probe(
      IvfIndex.assign(base.unionByName(delta), model), model, q, nprobe = 4, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got == rebuilt, s"store probe $got != rebuild probe $rebuilt")
  }

  test("_stats manifest: incremental on append, atomic swap heals, staleness detectable") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val model = IvfIndex.train(emb, nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("ivfstats").toString
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val d1 = emb.filter(col("vec_id") % 10 === 0)
    val d2 = emb.filter(col("vec_id") % 10 === 5)
    IvfIndex.writeStore(IvfIndex.assign(base, model), dir)
    assert(IvfIndex.storedCount(spark, dir) == base.count())
    // two micro-appends advance the manifest incrementally and the
    // count stays exact vs a footer recount
    IvfIndex.appendStore(d1, model, dir)
    IvfIndex.appendStore(d2, model, dir)
    assert(IvfIndex.storedCount(spark, dir) == base.count() + d1.count() + d2.count())
    assert(IvfIndex.verifyStats(spark, dir))

    // crashed swap: live manifest gone, parked copy present — the next
    // reader heals it and serves the same count
    val live = new java.io.File(s"$dir/_stats")
    val parked = new java.io.File(s"$dir/_stats.old")
    assert(live.renameTo(parked))
    assert(IvfIndex.storedCount(spark, dir) == base.count() + d1.count() + d2.count())
    assert(live.exists() && !parked.exists(), "reader must heal the crashed swap")

    // a writer that died between its data append and the stats swap
    // leaves a stale count — undetected on the serve path (by design:
    // no O(store) listing there), but visible to the verifyStats audit
    IvfIndex.assign(d1, model).withColumn("vec_id", col("vec_id") + 1000000L)
      .write.mode("append").partitionBy("list_id").parquet(dir)
    assert(!IvfIndex.verifyStats(spark, dir), "audit must flag the stale manifest")
    graft.core.Fs.deleteRecursively(new java.io.File(dir))
  }
}
