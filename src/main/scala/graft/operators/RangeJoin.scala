package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join as an *equi*-join.
  *
  * Spark's built-in answer to `p BETWEEN s AND e` with no equality key
  * is BroadcastNestedLoopJoin — O(|points| × |intervals|) comparisons,
  * a non-starter at scale. The standard fix (used by every warehouse
  * range-join implementation): pick a bin width, explode each interval
  * to the integer bins it covers, map each point to its single bin,
  * equi-join on the bin, then apply the exact range predicate as a
  * residual filter.
  *
  * Properties:
  *  - each (point, interval) match surfaces exactly once — a point
  *    lives in exactly one bin, and an interval covers that bin at
  *    most once — so no dedup pass is needed;
  *  - the join is a plain hash/sort-merge equi-join: shuffles by bin,
  *    broadcasts when one side is small, AQE-skew-splittable;
  *  - cost is |points| + Σ(interval_len/binWidth + 1) join rows. Pick
  *    binWidth near the median interval length so intervals explode to
  *    O(1) bins each.
  *
  * 100 TB note: when many points share an axis value (timestamps at
  * second grain, ship dates at day grain), pre-aggregate points to the
  * axis grain *before* calling this — the join then scales with
  * distinct axis values, not raw rows.
  */
object RangeJoin {

  /** Inclusive on both interval ends. `pointCol`, `startCol`, `endCol`
    * must be numeric (cast dates to day numbers first). Returns all
    * columns of both inputs.
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binWidth: Long,
  ): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"points and intervals must have disjoint column names (shared: ${overlap.mkString(",")}) — rename before joining")
    require(!points.columns.contains("__bin") && !intervals.columns.contains("__bin"),
      "__bin is reserved by RangeJoin")
    val iv = intervals.withColumn(
      "__bin",
      explode(sequence(
        floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
    val pt = points.withColumn("__bin", floor(col(pointCol) / binWidth).cast("long"))
    pt.join(iv, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
