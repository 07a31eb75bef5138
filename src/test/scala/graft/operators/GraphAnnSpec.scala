package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Graph ANN quality gate, on the sf0.01 embeddings (near-random —
  * the query's best cosine is ≈0.37 against a ≈0.27 background, so
  * recall here is HARD; there is no planted easy cluster). The claim
  * under test is the serving tradeoff: greedy best-first search over
  * the NN-descent-refined graph must reach HIGHER recall@10 than
  * multi-probe LSH while scoring FEWER candidates. All inputs are
  * deterministic (fixed planes, fixed-point scores, id tiebreaks), so
  * the comparison is exact, not statistical.
  */
class GraphAnnSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graph-ann-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ip(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  test("best-first search: beats multi-probe LSH recall on a smaller candidate budget") {
    val fxAll = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => round(x * lit(1e7)).cast("long")).as("f"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toSeq
    val qf = fxAll.find(_._1 == 0L).get._2
    val base = fxAll.filter(_._1 != 0L)
    val n = base.size
    val brute = base.map { case (id, f) => (id, ip(f, qf)) }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet

    val fxDf = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => round(x * lit(1e7)).cast("long")).as("f"))
      .filter(col("vec_id") =!= 0)
    val graph = GraphAnn.buildGraph(fxDf).persist()
    val (topDf, budget) = GraphAnn.searchWithBudget(graph, fxDf, qf)
    val got = topDf.collect().map(_.getLong(0)).toSet
    graph.unpersist()
    val recall = (got intersect brute).size / 10.0

    assert(budget <= n / 2, s"graph search scored $budget of $n — must stay a bounded fraction")
    assert(recall >= 0.8, s"graph recall@10 = $recall (budget $budget of $n)")

    // multi-probe LSH baseline: 8-bit sign signature, probe every
    // bucket within hamming radius 4 of the query's signature — a
    // LARGER candidate set than the graph search spent
    val md = MessageDigest.getInstance("MD5")
    val planes = (0 until 8).map { j =>
      (0 until 64).map { i =>
        val h = md.digest(s"plane:$j:$i".getBytes("UTF-8"))
        if ((h(0) & 1) == 1) 1L else -1L
      }.toArray
    }
    def sig(f: Array[Long]): Int =
      planes.zipWithIndex.foldLeft(0) { case (acc, (p, j)) =>
        if (ip(f, p) >= 0) acc | (1 << j) else acc }
    val qSig = sig(qf)
    val probeCands = base.filter { case (_, f) => Integer.bitCount(sig(f) ^ qSig) <= 4 }
    val probeTop = probeCands.map { case (id, f) => (id, ip(f, qf)) }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
    val probeRecall = (probeTop intersect brute).size / 10.0

    assert(probeCands.size > budget,
      s"baseline must out-spend the graph for a fair claim: probe ${probeCands.size} vs graph $budget")
    assert(recall > probeRecall,
      s"graph recall $recall (budget $budget) must beat multi-probe recall $probeRecall " +
        s"(budget ${probeCands.size})")
  }

  test("layered entry: coarse-layer seeds reach >= flat recall at a smaller scored budget") {
    val fxDf = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => round(x * lit(1e7)).cast("long")).as("f"))
    val qf = fxDf.filter(col("vec_id") === 0).select("f").head().getSeq[Long](0).toArray
    val base = fxDf.filter(col("vec_id") =!= 0).persist()
    val fxAll = base.collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toSeq
    val brute = fxAll.map { case (id, f) => (id, ip(f, qf)) }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet

    val graph = GraphAnn.buildGraph(base).persist()
    val (flatTop, flatBudget) = GraphAnn.searchWithBudget(graph, base, qf)
    val flatRecall = (flatTop.collect().map(_.getLong(0)).toSet intersect brute).size / 10.0

    // the coarse layer is persisted state, like the quantizers — built
    // once, loaded at serve time; here built inline for the comparison
    val entry = GraphAnn.buildEntryLayer(base).collect().map(_.getLong(0)).toSeq
    assert(entry.size >= 8 && entry.size <= 32, s"coarse layer size ${entry.size}")
    // the spread entry lets the search cut its expansion budget
    val (layerTop, layerBudget) = GraphAnn.searchWithBudget(
      graph, base, qf, maxExpand = 22, entryIds = Some(entry))
    val layerRecall = (layerTop.collect().map(_.getLong(0)).toSet intersect brute).size / 10.0
    graph.unpersist(); base.unpersist()

    assert(layerBudget < flatBudget,
      s"layered search must spend less: $layerBudget vs flat $flatBudget")
    assert(layerRecall >= flatRecall,
      s"layered recall $layerRecall (budget $layerBudget) must be >= flat $flatRecall (budget $flatBudget)")
  }
}
