package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The corpus-size banding rule behind dd2/dd2_scale_banded: the
  * oracled fixed config must be its fixture-scale output, widening
  * must be monotone, and the design recall at Jaccard 0.8 must hold
  * at every width the rule emits.
  */
class MinHashBandingSpec extends AnyFunSuite {

  test("bandsFor returns the oracled dd2 config at fixture scale") {
    assert(Dedup.bandsFor(500L) == ((2, 4)))
    assert(Dedup.bandsFor(2000L) == ((2, 4)))
  }

  test("bandsFor widens monotonically with corpus size") {
    val (r1, b1) = Dedup.bandsFor(200000L)
    assert(r1 == 4 && b1 >= 6)
    val (r2, b2) = Dedup.bandsFor(100000000L)
    assert(r2 > r1 && b2 >= b1)
  }

  test("design recall at Jaccard 0.8 stays >= 95% at every emitted width") {
    for (n <- Seq(500L, 2000L, 200000L, 10000000L, 100000000L, 10000000000L)) {
      val (r, b) = Dedup.bandsFor(n)
      val recall = 1 - math.pow(1 - math.pow(0.8, r), b)
      assert(recall >= 0.95, s"n=$n r=$r b=$b recall=$recall")
    }
  }

  test("false-candidate bound: n * s0^r stays <= cap at every emitted width") {
    for (n <- Seq(500L, 200000L, 10000000L, 10000000000L)) {
      val (r, _) = Dedup.bandsFor(n)
      assert(n * math.pow(0.3, r) <= 2000.0 + 1e-6, s"n=$n r=$r")
    }
  }
}
