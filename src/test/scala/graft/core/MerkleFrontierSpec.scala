package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Law checks for the incremental Merkle accumulator: every prefix of
  * appends must produce bit-identical roots to the batch fold
  * (Commitments.merkleRoot), since the streaming block DB records
  * root_after per accepted block. */
class MerkleFrontierSpec extends AnyFunSuite {

  private def leaf(i: Int): Array[Byte] =
    Keccak.keccak256(Bytes.beBytes(i.toLong, 8))

  test("incremental root == batch merkleRoot for every prefix 0..130") {
    val leaves = (0 until 130).map(leaf)
    var f = MerkleFrontier.empty
    assert(Bytes.toHex(f.root) == Bytes.toHex(Commitments.ZeroDigest))
    leaves.zipWithIndex.foreach { case (l, i) =>
      f = f.push(l)
      val want = Commitments.merkleRoot(leaves.take(i + 1))
      assert(Bytes.toHex(f.root) == Bytes.toHex(want), s"prefix ${i + 1}")
    }
  }

  test("spine stays logarithmic: 10k appends keep <= 15 pending nodes") {
    var f = MerkleFrontier.empty
    (0 until 10000).foreach(i => f = f.push(leaf(i)))
    assert(f.nLeaves == 10000L)
    val livePending = f.pending.count(_.isDefined)
    assert(livePending <= 15, s"pending=$livePending") // log2(10k) ≈ 13.3
    assert(Bytes.toHex(f.root) ==
      Bytes.toHex(Commitments.merkleRoot((0 until 10000).map(leaf))))
  }

  test("serialize/deserialize roundtrip preserves root and count") {
    var f = MerkleFrontier.empty
    (0 until 77).foreach(i => f = f.push(leaf(i)))
    val g = MerkleFrontier.deserialize(f.serialize)
    assert(g.nLeaves == f.nLeaves)
    assert(Bytes.toHex(g.root) == Bytes.toHex(f.root))
    // and the revived frontier keeps appending identically
    val f2 = f.push(leaf(77))
    val g2 = g.push(leaf(77))
    assert(Bytes.toHex(g2.root) == Bytes.toHex(f2.root))
  }

  test("empty serialization roundtrip") {
    val g = MerkleFrontier.deserialize(MerkleFrontier.empty.serialize)
    assert(g.nLeaves == 0L && Bytes.toHex(g.root) == Bytes.toHex(Commitments.ZeroDigest))
  }
}
