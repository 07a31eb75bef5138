package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality constraint operators — the reference's integrity
  * checks (count-vs-length match, digest equality, append-only
  * sequencing; SURVEY §0c) generalized into declarative dataset
  * constraints. Each check returns `(constraint, n_violations)` rows;
  * `union` them for a report. All checks are single aggregations or
  * anti-joins — shuffle-bounded, no collects.
  */
object Constraints {

  /** rows where any of `cols` is null. */
  def notNull(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*)
      .select(when(cols.map(col(_).isNull).reduce(_ || _), 1L).otherwise(0L).as("v"))
      .agg(sum("v").as("n_violations"))
      .select(lit(s"not_null(${cols.mkString(",")})").as("check_name"), col("n_violations"))

  /** duplicate occurrences of the key (0 when the key is unique). */
  def unique(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(when(col("n") > 1, col("n") - 1)), lit(0L)).as("n_violations"))
      .select(lit(s"unique(${keyCols.mkString(",")})").as("check_name"), col("n_violations"))

  /** values outside [lo, hi]. */
  def inRange(df: DataFrame, c: String, lo: Double, hi: Double): DataFrame =
    df.agg(sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L)).as("n_violations"))
      .select(lit(s"in_range($c,$lo,$hi)").as("check_name"), col("n_violations"))

  /** foreign-key rows with no parent (left anti-join count). */
  def refIntegrity(child: DataFrame, fk: String, parent: DataFrame, pk: String): DataFrame =
    child.select(col(fk)).join(parent.select(col(pk)), col(fk) === col(pk), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(s"ref_integrity($fk->$pk)").as("check_name"), col("n_violations"))

  /** groups holding more than `maxN` rows — the reference's
    * fixed-depth circuit bound generalized: a depth-d Merkle tree
    * holds at most 2^d leaves, and the reference pins the state DB to
    * depth 5 (`query2/state/mod.rs:278`), i.e. ≤ 32 contracts per
    * block. Run over `state_db` as
    * `maxGroupSize(storageDb, Seq("block_number"), 32)` before the
    * stage-7 aggregation. */
  def maxGroupSize(df: DataFrame, groupCols: Seq[String], maxN: Long): DataFrame =
    df.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(when(col("n") > maxN, 1L).otherwise(0L)), lit(0L)).as("n_violations"))
      .select(lit(s"max_group_size(${groupCols.mkString(",")},$maxN)").as("check_name"),
        col("n_violations"))

  /** per-group dense sequencing 1..n (the J1/W3 shape): groups where
    * max(seq) != count(seq) or min(seq) != 1. */
  def denseSequence(df: DataFrame, groupCol: String, seqCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), min(col(seqCol)).as("lo"), max(col(seqCol)).as("hi"))
      .agg(sum(when(col("lo") =!= 1 || col("hi") =!= col("n"), 1L).otherwise(0L)).as("n_violations"))
      .select(lit(s"dense_sequence($groupCol,$seqCol)").as("check_name"), col("n_violations"))
}
