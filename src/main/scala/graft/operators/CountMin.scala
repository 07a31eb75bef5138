package graft.operators

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-min sketch as a mergeable Spark `Aggregator` — sublinear
  * frequency estimation for heavy-hitter detection over streams or
  * tables too wide to exact-count: the buffer is a fixed depth×width
  * counter matrix, `reduce` bumps one counter per row, `merge` is
  * element-wise addition (fully commutative/associative, so map-side
  * partial aggregation and shuffle order cannot change the result),
  * and the estimate for an item is the minimum of its counters —
  * a one-sided overestimate with error ≤ e/width · N at probability
  * 1 − (1/2)^depth (Cormode & Muthukrishnan 2005).
  *
  * At 100 TB the point is the fixed buffer: depth·width longs per
  * partial aggregate regardless of cardinality, where an exact
  * groupBy's shuffle is O(distinct items).
  */
object CountMin {

  final case class Sketch(depth: Int, width: Int, counters: Array[Long]) {
    def estimate(item: String): Long =
      (0 until depth).map { d =>
        counters(d * width + CountMin.bucket(item, d, width))
      }.min
    def total: Long = counters.slice(0, width).sum
  }

  private[operators] def bucket(item: String, d: Int, width: Int): Int = {
    val h = MurmurHash3.stringHash(item, 0x9747b28c + d)
    java.lang.Math.floorMod(h, width)
  }

  class CmsAgg(depth: Int, width: Int) extends Aggregator[String, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](depth * width)
    def reduce(buf: Array[Long], item: String): Array[Long] = {
      var d = 0
      while (d < depth) { buf(d * width + bucket(item, d, width)) += 1; d += 1 }
      buf
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(buf: Array[Long]): Array[Long] = buf
    def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** cms_agg(item) → flat depth×width counter array. */
  def cmsAgg(item: Column, depth: Int = 4, width: Int = 1024): Column =
    udaf(new CmsAgg(depth, width)).apply(item)

  def fromArray(counters: Seq[Long], depth: Int = 4, width: Int = 1024): Sketch =
    Sketch(depth, width, counters.toArray)
}
