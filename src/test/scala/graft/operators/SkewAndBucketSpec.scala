package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Scale-path mechanics: salting must not change results; bucketed
  * co-located joins must eliminate the shuffle. */
class SkewAndBucketSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("skew-bucket-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("salted join is row-identical to the plain join") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet").select("l_orderkey", "l_linenumber", "l_quantity")
    val o = spark.read.parquet(s"$sf/orders.parquet").select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(o, Seq("l_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_totalprice")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = SkewTools.saltedJoin(li, o, "l_orderkey", salts = 7, saltSource = col("l_linenumber"))
      .select("l_orderkey", "l_linenumber", "o_totalprice")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(plain.length == salted.length && plain.sameElements(salted))
  }

  test("salted aggregation matches direct groupBy") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val direct = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_l_quantity"))
      .collect().map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100))).sortBy(_._1).toSeq
    val salted = SkewTools.saltedCountSum(li, "l_returnflag", "l_quantity", salts = 13, saltSource = col("l_orderkey"))
      .collect().map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2) * 100))).sortBy(_._1).toSeq
    assert(direct == salted)
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    val dir = java.nio.file.Files.createTempDirectory("buckets").toString
    val li = spark.read.parquet(s"$sf/lineitem.parquet").select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"$sf/orders.parquet").select("o_orderkey", "o_totalprice")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$dir/li").mode("overwrite").saveAsTable("b_lineitem")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$dir/o").mode("overwrite").saveAsTable("b_orders")
    try {
      val j = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(3000))
      assert(j.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
