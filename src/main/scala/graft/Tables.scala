package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver's synthetic star schema
  * (see TESTDATA.md). All reads are plain columnar parquet scans so
  * Catalyst pushes filters and prunes columns down to the file scan —
  * at 100 TB the scan cost is dominated by what reaches the reader,
  * so every query in this engine starts from these loaders and lets
  * predicate pushdown / column pruning do the heavy lifting.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` and this loader
    * rebuilds a micros timestamp (integer DIV — no double rounding on
    * 1e18-scale nanos).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // micros-encoded parquet reads as NTZ; sessions run UTC, so
        // the LTZ cast is instant-preserving — and unlike NTZ the
        // session type supports the numeric casts the queries use
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** One engine query: the Spark plan plus (when SQL-expressible) the
  * equivalent DuckDB oracle SQL the driver hash-compares against.
  * Keeping plan and oracle side-by-side is what keeps column names /
  * value semantics in sync (the driver sorts columns by name before
  * hashing, so aliases must match exactly).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** headline queries are timed by Bench */
    headline: Boolean = false,
    /** runs a streaming job EAGERLY and returns a local verdict row —
      * plan dumps must skip it (there is no batch plan to audit) */
    streamingDriver: Boolean = false,
)
