package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-prior-event) join — the time-series lookup a
  * block-indexed database needs ("balance as of block b"); neither the
  * reference nor Spark has it natively. Built by *composing* existing
  * operators (the preferred ladder from SURVEY §7.3): tag both sides,
  * union, and take a running `last(...ignoreNulls)` over a window
  * partitioned by key and ordered by (time, side, tiebreak).
  *
  * Scale shape: ONE shuffle on the join key (the union's window
  * partition), no range-explosion, no O(n·m) pair enumeration — each
  * key's timeline is scanned once. Inclusive semantics (right.time <=
  * left.time) via the side ordering: right rows sort before left rows
  * at equal timestamps.
  */
object AsOfJoin {

  /** For every `left` row, attach `pick` from the latest `right` row
    * of the same `key` with `right.time <= left.time` (null when no
    * prior right row exists; drop with a filter for inner semantics).
    * Both inputs must expose `key` and `time` columns with those
    * names; `tiebreak` must be a unique right-side column making the
    * window order total. */
  def asofLookup(left: DataFrame, right: DataFrame, key: String, time: String,
      pick: String, as: String, tiebreak: String): DataFrame = {
    val leftCols = left.columns
    val l = left.select(
      col(key), col(time), lit(1).as("__src"), lit(null).cast(right.schema(tiebreak).dataType).as("__tb"),
      lit(null).cast(right.schema(pick).dataType).as("__pick"),
      struct(leftCols.map(col): _*).as("__row"))
    val r = right.select(
      col(key), col(time), lit(0).as("__src"), col(tiebreak).as("__tb"),
      col(pick).as("__pick"), lit(null).cast(l.schema("__row").dataType).as("__row"))
    val w = Window.partitionBy(key)
      .orderBy(col(time), col("__src"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn(as, last(col("__pick"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .select(leftCols.map(c => col(s"__row.$c")) :+ col(as): _*)
  }
}
