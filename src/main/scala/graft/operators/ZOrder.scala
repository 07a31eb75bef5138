package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the multi-column data-layout key:
  * sorting by the interleaved bits of several columns gives every one
  * of them locality within a file/row-group, so min/max pruning works
  * for predicates on ANY of the interleaved columns (a plain sort
  * clusters only its leading column; every chunk of an x-sorted table
  * spans the full y range).
  *
  * Usage at write time: `df.repartitionByRange(n, zorderCol(...))
  * .sortWithinPartitions(zorderCol(...))` before a parquet write —
  * parquet row-group stats then prune on every interleaved dimension.
  * The key is a pure codegen bit-expression (no UDF).
  */
object ZOrder {

  /** interleave the low `bits` bits of each (non-negative, pre-scaled)
    * column: result bit `b*n + i` = bit `b` of column `i`. */
  def zorderCol(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty && bits * cols.length <= 63, "interleaved width must fit a signed long")
    val n = cols.length
    val terms = for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield (shiftright(c.cast("long"), b).bitwiseAND(lit(1L))) * lit(1L << (b * n + i))
    terms.reduce(_ + _)
  }

  /** driver-side reference interleave (spec twin). */
  def zorderValue(vals: Seq[Long], bits: Int = 16): Long = {
    val n = vals.length
    var out = 0L
    for (b <- 0 until bits; i <- 0 until n)
      out |= ((vals(i) >> b) & 1L) << (b * n + i)
    out
  }
}
