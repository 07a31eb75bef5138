package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** StripedMask vs a reference Set[Long] model: every operation the
  * streaming MVs rely on (set/grow, count, bounds, contiguity) must
  * agree with the model at any offset pattern, and the width helper
  * must invert the lane layout. */
class StripedMaskSpec extends AnyFunSuite {

  private def build(offs: Seq[Long]): Array[Long] =
    offs.foldLeft(Array.empty[Long])((m, o) => StripedMask.set(m, o))

  test("stripes() covers exactly ceil(width/64) lanes") {
    assert(StripedMask.stripes(1L) === 1)
    assert(StripedMask.stripes(64L) === 1)
    assert(StripedMask.stripes(65L) === 2)
    assert(StripedMask.stripes(200L) === 4)
    assertThrows[IllegalArgumentException](StripedMask.stripes(0L))
  }

  test("set/count/lowest/highest/contiguous agree with a Set model across random offset patterns") {
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { trial =>
      val n = rnd.nextInt(60)
      val offs = Seq.fill(n)(rnd.nextLong(1001L))
      val m = build(offs)
      val model = offs.toSet
      assert(StripedMask.count(m) === model.size.toLong, s"trial $trial")
      assert(StripedMask.nonEmpty(m) === model.nonEmpty, s"trial $trial")
      if (model.nonEmpty) {
        assert(StripedMask.lowestBit(m) === model.min, s"trial $trial")
        assert(StripedMask.highestBit(m) === model.max, s"trial $trial")
        assert(StripedMask.contiguous(m) ===
          (model.max - model.min + 1 == model.size.toLong), s"trial $trial")
      } else {
        assert(StripedMask.lowestBit(m) === -1L)
        assert(StripedMask.highestBit(m) === -1L)
        assert(!StripedMask.contiguous(m))
      }
    }
  }

  test("lanes grow on demand and setting is idempotent") {
    var m = Array.empty[Long]
    m = StripedMask.set(m, 3L)
    assert(m.length === 1)
    m = StripedMask.set(m, 130L) // third lane
    assert(m.length === 3)
    val before = m.clone()
    m = StripedMask.set(m, 3L) // idempotent re-set, in place
    assert(m.toSeq === before.toSeq)
    assert(StripedMask.count(m) === 2L)
    assertThrows[IllegalArgumentException](StripedMask.set(m, -1L))
  }

  test("a full gap-free run is contiguous across lane boundaries; one hole breaks it") {
    val run = build(0L to 200L)
    assert(StripedMask.contiguous(run))
    val holed = build((0L to 200L).filterNot(_ == 64L)) // hole exactly at a lane seam
    assert(!StripedMask.contiguous(holed))
    val shifted = build(65L to 130L) // run not starting at bit 0
    assert(StripedMask.contiguous(shifted))
  }
}
