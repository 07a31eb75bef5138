package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The fused lsh_scale_vec kernel vs the ss_scale SQL recipe it
  * fuses, plus the planted-copy invariants ss_scale_5m's oracle
  * relies on. Pure-JVM spec — the kernel is deterministic arithmetic,
  * no session needed. */
class LshScaleSpec extends AnyFunSuite {

  private val M = 2147483647L

  /** the ss_scale Lehmer coordinate, written out independently. */
  private def refCoord(id: Long, j: Int): Long = {
    val h1 = (id * 1299709L + j.toLong * 104395301L) % M
    val h2 = (h1 * 48271L) % M
    val h3 = (h2 * h2 + h1) % M
    ((h3 * 48271L) % M % 1001L - 500L) * 10000L
  }

  test("kernel coords equal the Lehmer recipe and buckets equal the plane votes") {
    val m = LshScale.planeMatrix(13)
    for (id <- Seq(0L, 7L, 88L, 123456L, 4999999L)) {
      val k = LshScale.kernel(id, 13)
      (1 to 64).foreach(j => assert(k(j) == refCoord(id, j), s"coord($id,$j)"))
      val bucket = (0 until 13).map { p =>
        val s = (0 until 64).map(i => if (m(p)(i) > 0) k(i + 1) else -k(i + 1)).sum
        if (s >= 0) 1L << p else 0L
      }.reduce(_ | _)
      assert(k(0) == bucket, s"bucket($id)")
    }
  }

  test("planted copies: exact scaling, same bucket, strictly decreasing ips") {
    for (q <- 0L until 8L) {
      val kq = LshScale.kernel(q, 13)
      val ipQQ = (1 to 64).map(j => kq(j) * kq(j)).sum
      var prevIp = Long.MaxValue
      for (r <- 0L until 10L) {
        val kp = LshScale.kernel(8 + 10 * q + r, 13)
        // exact integer scaling by (1000 - r)/1000 on every coordinate
        (1 to 64).foreach { j =>
          assert(kp(j) * 1000L == kq(j) * (1000L - r), s"scaling q=$q r=$r j=$j")
        }
        assert(kp(0) == kq(0), s"bucket drift q=$q r=$r")
        val ip = (1 to 64).map(j => kq(j) * kp(j)).sum
        assert(ip * 1000L == ipQQ * (1000L - r), s"ip formula q=$q r=$r")
        assert(ip < prevIp, s"ip not strictly decreasing q=$q r=$r")
        prevIp = ip
      }
    }
  }

  test("plane matrix is a prefix family (width bump only splits buckets)") {
    val m8 = LshScale.planeMatrix(8)
    val m13 = LshScale.planeMatrix(13)
    assert(m13.take(8) == m8)
  }
}
