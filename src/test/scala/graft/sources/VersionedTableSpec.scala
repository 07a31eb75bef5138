package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Transactional guarantees of the versioned sink: snapshot isolation,
  * optimistic single-winner commits, partition-level copy-on-write
  * (untouched buckets' files inherited, not rewritten), time travel,
  * and vacuum retention. */
class VersionedTableSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("versioned-table-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def df(rows: Seq[(Long, String, Long)]) = {
    val s2 = spark
    import s2.implicits._
    rows.toDF("k", "name", "v")
  }

  test("commit/read roundtrip; dirty-bucket copy-on-write inherits untouched files") {
    val dir = Files.createTempDirectory("vt").toString
    val t = new VersionedTable(spark, dir, nBuckets = 8)
    val v0 = t.commit(df((0L until 64L).map(i => (i, s"n$i", i * 10))), Seq("k"), None)
    assert(v0 == 0 && t.currentVersion().contains(0))
    assert(t.read().get.count() == 64)

    // update ONE key: only its bucket is rewritten
    val hot = 7L
    val before = t.read().get.filter(col("k") === hot).head().getLong(2)
    val bucketOfHot = df(Seq((hot, "x", 0L)))
      .select(t.bucketCol(Seq("k"))).head().getInt(0)
    // full contents of that bucket with the update applied
    val bucketRows = t.read().get
      .withColumn("__b", t.bucketCol(Seq("k"))).filter(col("__b") === bucketOfHot).drop("__b")
      .withColumn("v", when(col("k") === hot, lit(777L)).otherwise(col("v")))
    val v1 = t.commit(bucketRows, Seq("k"), Some(0))
    assert(v1 == 1)
    assert(t.read().get.count() == 64)
    assert(t.read().get.filter(col("k") === hot).head().getLong(2) == 777L)
    assert(before != 777L)

    // manifest sharing: v1 inherits 7 of 8 bucket paths from v0
    val m0 = Files.readString(java.nio.file.Paths.get(dir, f"_manifests/v${0}%06d.manifest"))
    val m1 = Files.readString(java.nio.file.Paths.get(dir, f"_manifests/v${1}%06d.manifest"))
    val paths0 = m0.split("\n").map(_.split("\t")(1)).toSet
    val paths1 = m1.split("\n").map(_.split("\t")(1)).toSet
    assert((paths0 intersect paths1).size == paths0.size - 1, "exactly one bucket rewritten")
  }

  test("snapshot isolation + time travel: pinned reader unaffected by later commits") {
    val dir = Files.createTempDirectory("vt2").toString
    val t = new VersionedTable(spark, dir, nBuckets = 4)
    t.commit(df(Seq((1L, "a", 1L), (2L, "b", 2L))), Seq("k"), None)
    val pinned = t.read(Some(0)).get // resolve v0's files now
    t.commit(df(Seq((1L, "a", 100L), (2L, "b", 200L))), Seq("k"), Some(0))
    assert(t.read().get.agg(sum("v")).head().getLong(0) == 300L)
    assert(pinned.agg(sum("v")).head().getLong(0) == 3L, "pinned snapshot must not move")
    assert(t.read(Some(0)).get.agg(sum("v")).head().getLong(0) == 3L, "time travel to v0")
  }

  test("optimistic concurrency: stale base and duplicate version both lose") {
    val dir = Files.createTempDirectory("vt3").toString
    val t1 = new VersionedTable(spark, dir, nBuckets = 4)
    val t2 = new VersionedTable(spark, dir, nBuckets = 4)
    t1.commit(df(Seq((1L, "a", 1L))), Seq("k"), None)
    // writer 2 commits against base 0 first
    t2.commit(df(Seq((1L, "a", 2L))), Seq("k"), Some(0))
    // writer 1 still believes base is 0 → stale base detected
    intercept[t1.CommitConflict] {
      t1.commit(df(Seq((1L, "a", 3L))), Seq("k"), Some(0))
    }
    assert(t1.read().get.head().getLong(2) == 2L, "winner's data visible")
  }

  test("vacuum drops old versions' files but keeps the retained window readable") {
    val dir = Files.createTempDirectory("vt4").toString
    val t = new VersionedTable(spark, dir, nBuckets = 2)
    (0 until 4).foreach { i =>
      t.commit(df(Seq((1L, "a", i.toLong), (2L, "b", i.toLong))), Seq("k"),
        if (i == 0) None else Some(i - 1))
    }
    t.vacuum(keepVersions = 2)
    assert(t.read(Some(3)).get.count() == 2, "latest survives")
    assert(t.read(Some(2)).get.count() == 2, "retained version survives")
    intercept[Exception] { t.read(Some(0)).get.count() } // vacuumed away
  }
}
