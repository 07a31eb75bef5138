package graft.core

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Fused per-row kernel for the 5M-vector LSH scale row
  * (`ss_scale_5m`) — the [[SimHash128]] lesson applied to the
  * similarity family: the sign-projection signature at 13 planes
  * unrolled to SQL is an ~850-term projection (13 planes × 64 ± reads
  * on top of 64 Lehmer coordinate chains), which hits the same
  * JIT-width cliff the 128-bit SimHash did whenever its rows are
  * materialized or shuffled. One compact kernel call per row keeps
  * whole-stage codegen a single call site.
  *
  * The arithmetic is EXACTLY the ss_scale family's portable recipe:
  * coordinate j of vector `id` comes from two Lehmer steps around a
  * quadratic mix (every intermediate < 2^63, identical in DuckDB),
  * and the hyperplane matrix is the same md5-derived ±1 family the
  * fixture-scale queries use (`Similarity.planeMatrix` delegates
  * here, so width-p buckets stay a prefix-refinement of width-p').
  *
  * PLANTED STRUCTURE (ids 8..87): id = 8 + 10·q + r is the r-th
  * near-copy of query vector q (q < 8) — every coordinate scaled by
  * (1000 − r)/1000. Coordinates are multiples of 10000, so the
  * scaling is EXACT integer arithmetic (c·(1000−r)/1000 =
  * (c/1000)·10·(1000−r); no truncation, no floor-vs-trunc skew
  * between engines), which gives three analytic facts the oracle
  * recomputes without regenerating the corpus: the copies land in
  * the SAME bucket as their query (plane sums scale by a positive
  * factor, signs unchanged), their inner products with the query are
  * |q|²·(1000−r)/1000 (strictly decreasing in r), and no random
  * vector plausibly reaches 0.991·|q|² (measured: none does — the
  * driver hash would fail loudly if one ever did).
  */
object LshScale {

  final val Dims = 64
  private final val M = 2147483647L // 2^31 − 1

  /** md5-derived ±1 hyperplane matrix — single definition shared with
    * the fixture-scale signature queries. */
  def planeMatrix(nPlanes: Int): IndexedSeq[IndexedSeq[Int]] = {
    val md = MessageDigest.getInstance("MD5")
    (0 until nPlanes).map { j =>
      (0 until Dims).map { i =>
        val h = md.digest(s"plane:$j:$i".getBytes("UTF-8"))
        if ((h(0) & 1) == 1) 1 else -1
      }
    }
  }

  // kernels are called once per row; cache the matrix per width
  private val matrixCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Int]]]()
  private def planesOf(nPlanes: Int): Array[Array[Int]] =
    matrixCache.computeIfAbsent(nPlanes, p => planeMatrix(p).map(_.toArray).toArray)

  /** coordinate j (1-based) of base vector `id` — the ss_scale Lehmer
    * recipe, verbatim. */
  def coord(id: Long, j: Int): Long = {
    val h1 = (id * 1299709L + j.toLong * 104395301L) % M
    val h2 = (h1 * 48271L) % M
    val h3 = (h2 * h2 + h1) % M
    ((h3 * 48271L) % M % 1001L - 500L) * 10000L
  }

  /** per-row kernel → Array(bucket, c1..c64). Bucket is the
    * sign-projection signature as a little-endian bit-packed long
    * (plane p → bit p); `nPlanes` ≤ 62. */
  def kernel(id: Long, nPlanes: Int): Array[Long] = {
    val m = planesOf(nPlanes)
    val out = new Array[Long](Dims + 1)
    if (id >= 8 && id < 88) {
      // planted near-copy: exact integer scaling of query q's coords
      val q = (id - 8) / 10
      val r = (id - 8) % 10
      var j = 1
      // c·(1000−r)/1000 with c = k·10000 ⇒ (c/1000)·(1000−r) = k·10·(1000−r), exact
      while (j <= Dims) { out(j) = coord(q, j) / 1000L * (1000L - r); j += 1 }
    } else {
      var j = 1
      while (j <= Dims) { out(j) = coord(id, j); j += 1 }
    }
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      val row = m(p)
      var s = 0L
      var j = 0
      while (j < Dims) { s += (if (row(j) > 0) out(j + 1) else -out(j + 1)); j += 1 }
      if (s >= 0) bucket |= 1L << p
      p += 1
    }
    out(0) = bucket
    out
  }

  /** codegen entry: boxes the kernel result for the expression. */
  def kernelArray(id: Long, nPlanes: Int): GenericArrayData =
    new GenericArrayData(kernel(id, nPlanes))
}
