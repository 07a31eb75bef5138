package graft.core

/** Block-coverage bitmask striped into 64-bit lanes: bit `off` of the
  * logical mask lives at `mask(off >> 6) & (1 << (off & 63))`. The
  * reference's block DB is unbounded append (block/mod.rs:1-6,
  * 233-293), so a range query's `[B_min, B_max]` can span thousands of
  * blocks — a single `Long` mask caps the MV at 64. The striped form
  * keeps state O(rangeWidth / 64) longs per key and every operation
  * O(stripes), with [[set]] growing the array on demand so streaming
  * state bootstrapped from a narrower batch snapshot widens seamlessly
  * as later blocks arrive.
  */
object StripedMask {

  /** number of 64-bit lanes needed to cover `width` blocks. */
  def stripes(width: Long): Int = {
    require(width > 0, s"mask width must be positive, got $width")
    (((width - 1) >> 6) + 1).toInt
  }

  /** set bit `off`, growing the array if the offset is past the end.
    * Mutates in place when no growth is needed (streaming-state
    * friendly); returns the array to use afterwards. */
  def set(mask: Array[Long], off: Long): Array[Long] = {
    require(off >= 0, s"bit offset must be non-negative, got $off")
    val stripe = (off >> 6).toInt
    val m = if (stripe < mask.length) mask else java.util.Arrays.copyOf(mask, stripe + 1)
    m(stripe) |= 1L << (off & 63)
    m
  }

  def count(mask: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < mask.length) { s += java.lang.Long.bitCount(mask(i)); i += 1 }
    s
  }

  def nonEmpty(mask: Array[Long]): Boolean = mask.exists(_ != 0L)

  /** index of the lowest set bit, or -1 when empty. */
  def lowestBit(mask: Array[Long]): Long = {
    var i = 0
    while (i < mask.length) {
      if (mask(i) != 0L) return i.toLong * 64 + java.lang.Long.numberOfTrailingZeros(mask(i))
      i += 1
    }
    -1L
  }

  /** index of the highest set bit, or -1 when empty. */
  def highestBit(mask: Array[Long]): Long = {
    var i = mask.length - 1
    while (i >= 0) {
      if (mask(i) != 0L) return i.toLong * 64 + (63 - java.lang.Long.numberOfLeadingZeros(mask(i)))
      i -= 1
    }
    -1L
  }

  /** the set bits form one gap-free run (the MV's `gap_free`). */
  def contiguous(mask: Array[Long]): Boolean =
    nonEmpty(mask) && count(mask) == highestBit(mask) - lowestBit(mask) + 1
}
