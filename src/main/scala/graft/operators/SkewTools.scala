package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (builder brief: "salting for skew,
  * AQE for runtime re-plan"). AQE's skew-join splitting covers
  * sort-merge joins; explicit salting is for the cases it can't touch:
  * a single hot key in a hash aggregation, or a broadcast-ineligible
  * join where one key dominates.
  */
object SkewTools {

  /** Salted equi-join: the big (skewed) side gets a deterministic salt
    * derived from `saltSource` (any column that spreads the hot key's
    * rows — a row id, a secondary column), the small side is
    * replicated once per salt value, and the join runs on
    * (key, salt) — the hot key's rows land on `salts` partitions
    * instead of one. Result is row-identical to `big.join(small, key)`
    * (inner). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int, saltSource: Column): DataFrame =
    saltedJoin(big, small, Seq(key), salts, saltSource)

  /** composite-key variant (e.g. an LSH band join on (band, sig)). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String], salts: Int,
      saltSource: Column): DataFrame = {
    require(salts > 0)
    val bigS = big.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts.toLong)).cast("int"))
    val smallS = small.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, keys :+ "__salt").drop("__salt")
  }

  /** max rows any single key holds — the cheap skew probe gating a
    * salted rewrite (one partial-aggregated job over the key frame). */
  def maxKeyCardinality(df: DataFrame, keys: Seq[String]): Long = {
    val r = df.groupBy(keys.map(col): _*).count().agg(max("count")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Two-phase salted aggregation for count/sum-like aggregates whose
    * partial state is small but whose group key is skewed: phase 1
    * aggregates on (key, salt), phase 2 merges the salt shards. Row-
    * identical to `df.groupBy(key).agg(count/sum)`. */
  def saltedCountSum(df: DataFrame, key: String, sumCol: String, salts: Int, saltSource: Column): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts.toLong)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(sumCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum("__n").as("n"), sum("__s").as(s"sum_$sumCol"))
}
