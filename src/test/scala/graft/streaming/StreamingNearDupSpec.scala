package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** StreamingNearDup contract: exact/near/keep gate semantics in
  * arrival order, verdicts independent of micro-batch boundaries
  * (1 batch ≡ 3 batches ≡ a real foreachBatch stream), replayed
  * batches idempotent (same verdicts, no duplicate store rows), and
  * store probes pruned at the partition-directory level. */
object StreamingNearDupSpec {
  final case class ND(doc_id: Long, seq: Long, h: String, simhash: String)
}

class StreamingNearDupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .appName("streaming-neardup-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  import StreamingNearDupSpec.ND

  private def flip(sig: String, positions: Int*): String =
    positions.foldLeft(sig) { (acc, p) =>
      acc.updated(p, if (acc(p) == '0') '1' else '0')
    }

  private val sigA = "0" * 32
  private val sigB = "1" * 16 + "0" * 16
  private val sigD = "01" * 16
  private val sigE = "0011" * 8

  // corpus: doc 1 (sigA, h1). batch0: 10 exact-dup of 1; 20 within 2
  // flips of A; 30 a fresh signature B; 40 exact-dup of 30 (batch-
  // local, later seq); 50 four flips of B in ONE block (block-mate
  // candidate, hamming 4 — must be filtered to keep). batch1: 60
  // three flips of B (near-dup of 30 through the store; 7 from 50);
  // 70 exact-dup of corpus doc 1.
  private val corpus = Seq(ND(1L, -100L, "h1", sigA))
  private val batch0 = Seq(
    ND(10L, 10L, "h1", sigD),
    ND(20L, 20L, "h20", flip(sigA, 0, 1)),
    ND(30L, 30L, "h30", sigB),
    ND(40L, 40L, "h30", sigE),
    ND(50L, 50L, "h50", flip(sigB, 0, 1, 2, 3)))
  private val batch1 = Seq(
    ND(60L, 60L, "h60", flip(sigB, 8, 9, 10)),
    ND(70L, 70L, "h1", sigD))
  private val expected = Map(
    10L -> ("exact_dup", 1L),
    20L -> ("near_dup", 1L),
    30L -> ("keep", -1L),
    40L -> ("exact_dup", 30L),
    50L -> ("keep", -1L),
    60L -> ("near_dup", 30L),
    70L -> ("exact_dup", 1L))

  private def df(rows: Seq[ND]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF()
  }

  private def verdictMap(v: DataFrame): Map[Long, (String, Long)] =
    v.collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  private def withRoot(f: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("neardup_spec").toString
    try f(root)
    finally graft.core.Fs.deleteRecursively(new java.io.File(root))
  }

  test("gate semantics in arrival order; replay is idempotent; probes prune") {
    withRoot { root =>
      StreamingNearDup.bootstrap(df(corpus), root)
      val v0 = verdictMap(StreamingNearDup.processBatch(spark, df(batch0), root))
      val v1 = verdictMap(StreamingNearDup.processBatch(spark, df(batch1), root))
      assert(v0 ++ v1 == expected)

      val sigRows = spark.read.parquet(s"$root/sig").count()
      val hashRows = spark.read.parquet(s"$root/hash").count()
      assert(sigRows == (1 + 7) * 4 && hashRows == 1 + 7)

      // replayed batch: identical verdicts (its own first-run rows sit
      // at EQUAL seq and are ignored), zero new store rows
      val r1 = verdictMap(StreamingNearDup.processBatch(spark, df(batch1), root))
      assert(r1 == verdictMap(StreamingNearDup.processBatch(spark, df(batch1), root)) && r1 == v1)
      assert(spark.read.parquet(s"$root/sig").count() == sigRows)
      assert(spark.read.parquet(s"$root/hash").count() == hashRows)

      // the probe's bucket filter must hit the partition layout — a
      // post-scan filter would mean every batch reads the whole store.
      // The assertion matches a POPULATED PartitionFilters list naming
      // bucket (an empty list prints 'PartitionFilters: []' and would
      // also contain both substrings — vacuously)
      val plan = StreamingNearDup.probeStore(spark, s"$root/sig", Seq(0, 1, 2),
          StreamingNearDup.SigSchema)
        .queryExecution.executedPlan.toString
      assert("""PartitionFilters: \[[^\]]*bucket[^\]]*IN""".r.findFirstIn(plan).isDefined,
        plan.take(1500))
    }
  }

  test("verdicts are independent of micro-batch boundaries: one batch == two") {
    withRoot { root =>
      StreamingNearDup.bootstrap(df(corpus), root)
      val one = verdictMap(StreamingNearDup.processBatch(spark, df(batch0 ++ batch1), root))
      assert(one == expected)
    }
  }

  test("compactStore: one file per bucket, content preserved, gate unchanged") {
    withRoot { root =>
      StreamingNearDup.bootstrap(df(corpus), root)
      StreamingNearDup.processBatch(spark, df(batch0), root)
      def files(sub: String): Seq[Int] =
        new java.io.File(s"$root/$sub").listFiles().filter(_.isDirectory)
          .map(d => d.listFiles().count(_.getName.endsWith(".parquet"))).toSeq
      val before = spark.read.parquet(s"$root/sig").collect().map(_.toString).sorted.toSeq
      // corpus doc 1 and batch0's near-dups share blocks, so shared
      // bucket dirs hold a bootstrap file AND an append file
      assert(files("sig").exists(_ > 1))
      StreamingNearDup.compactStore(spark, root)
      assert(files("sig").forall(_ <= 1) && files("hash").forall(_ <= 1))
      val after = spark.read.parquet(s"$root/sig").collect().map(_.toString).sorted.toSeq
      assert(after == before)
      val v1 = verdictMap(StreamingNearDup.processBatch(spark, df(batch1), root))
      assert(v1 == batch1.map(d => d.doc_id -> expected(d.doc_id)).toMap)
    }
  }

  test("foreachBatch stream over MemoryStream matches the batch loop") {
    withRoot { root =>
      StreamingNearDup.bootstrap(df(corpus), root)
      val s = spark
      import s.implicits._
      implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
      val es = MemoryStream[ND]
      val ckpt = java.nio.file.Files.createTempDirectory("neardup_ckpt").toString
      val q = es.toDS().toDF()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch(StreamingNearDup.sinkBatch(root) _)
        .start()
      try {
        es.addData(batch0); q.processAllAvailable()
        es.addData(batch1); q.processAllAvailable()
      } finally {
        q.stop()
        graft.core.Fs.deleteRecursively(new java.io.File(ckpt))
      }
      assert(verdictMap(spark.read.parquet(s"$root/verdicts")) == expected)
      // a redelivered micro-batch overwrites its own batch_id
      // partition — no duplicate verdict rows after a sink replay
      StreamingNearDup.sinkBatch(root)(df(batch1).toDF(), 1L)
      val v = spark.read.parquet(s"$root/verdicts")
      assert(v.count() == expected.size && verdictMap(v) == expected)
    }
  }

  test("killed JVM mid-stream: restart from checkpoint redelivers, stores stay idempotent") {
    withRoot { root =>
      StreamingNearDup.bootstrap(df(corpus), root)
      val s = spark
      import s.implicits._
      implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
      val ckpt = java.nio.file.Files.createTempDirectory("neardup_kill_ckpt").toString
      try {
        val es = MemoryStream[ND]
        def startQuery() = es.toDS().toDF()
          .writeStream.option("checkpointLocation", ckpt)
          .foreachBatch(StreamingNearDup.sinkBatch(root) _)
          .start()
        val q1 = startQuery()
        es.addData(batch0); q1.processAllAvailable() // batch 0 committed
        es.addData(batch1)
        q1.stop() // the kill: batch 1 offsets exist, commit may be missing
        // the crash window: the first attempt's SINK write landed
        // (stores appended, verdicts written) but the checkpoint never
        // committed — the restarted stream WILL redeliver batch 1
        StreamingNearDup.sinkBatch(root)(df(batch1), 1L)
        val sigRows = spark.read.parquet(s"$root/sig").count()
        val hashRows = spark.read.parquet(s"$root/hash").count()

        val q2 = startQuery() // the restart, same checkpoint
        try q2.processAllAvailable() finally q2.stop()

        // redelivery must change nothing: same verdicts, zero new
        // store rows — the uninterrupted run's counts exactly
        assert(verdictMap(spark.read.parquet(s"$root/verdicts")) == expected)
        assert(spark.read.parquet(s"$root/sig").count() == sigRows)
        assert(spark.read.parquet(s"$root/hash").count() == hashRows)
        assert(sigRows == (1 + 7) * 4 && hashRows == 1 + 7,
          "post-restart stores must hold exactly the uninterrupted run's rows")
      } finally graft.core.Fs.deleteRecursively(new java.io.File(ckpt))
    }
  }

  test("a crash between the two store appends self-heals on replay (self-keyed appends)") {
    withRoot { root =>
      StreamingNearDup.bootstrap(df(corpus), root)
      StreamingNearDup.processBatch(spark, df(batch0), root)
      // park a copy of the HASH store, run batch1 (both appends land),
      // then restore the hash copy — simulating a JVM death after the
      // sig append but before the hash append
      val hashDir = new java.io.File(s"$root/hash")
      val park = new java.io.File(s"$root/hash.park")
      copyTree(hashDir, park)
      val v1 = verdictMap(StreamingNearDup.processBatch(spark, df(batch1), root))
      val sigAfter = spark.read.parquet(s"$root/sig").count()
      val hashAfter = spark.read.parquet(s"$root/hash").count()
      graft.core.Fs.deleteRecursively(hashDir)
      park.renameTo(hashDir)
      // the redelivered batch must land the MISSING hash rows without
      // double-appending the sig rows that already survived
      val v2 = verdictMap(StreamingNearDup.processBatch(spark, df(batch1), root))
      assert(v2 == v1, "replay verdicts must match the first attempt")
      assert(spark.read.parquet(s"$root/sig").count() == sigAfter,
        "sig rows double-appended after a half-landed batch")
      assert(spark.read.parquet(s"$root/hash").count() == hashAfter,
        "hash rows missing after replay of a half-landed batch")
    }
  }

  private def copyTree(src: java.io.File, dst: java.io.File): Unit = {
    if (src.isDirectory) {
      dst.mkdirs()
      src.listFiles().foreach(f => copyTree(f, new java.io.File(dst, f.getName)))
    } else java.nio.file.Files.copy(src.toPath, dst.toPath)
  }

  test("a crash between compaction renames is healed by the next processBatch, not only by compactStore") {
    withRoot { root =>
      StreamingNearDup.bootstrap(df(corpus), root)
      StreamingNearDup.processBatch(spark, df(batch0), root)
      // simulate the torn swap: live parked at .old, nothing live
      for (sub <- Seq("sig", "hash")) {
        assert(new java.io.File(s"$root/$sub")
          .renameTo(new java.io.File(s"$root/$sub.old")))
      }
      // a restarted stream's first micro-batch must heal and gate
      // correctly — no operator intervention (compactStore) required
      val v1 = verdictMap(StreamingNearDup.processBatch(spark, df(batch1), root))
      assert(v1 == batch1.map(d => d.doc_id -> expected(d.doc_id)).toMap)
      assert(new java.io.File(s"$root/sig").exists() &&
        !new java.io.File(s"$root/sig.old").exists())
    }
  }
}
