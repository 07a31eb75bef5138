package graft.core

import java.math.BigInteger

import org.scalatest.funsuite.AnyFunSuite

/** Property-style kernel checks (seeded randomized inputs): algebraic
  * laws the distributed aggregation relies on must hold for arbitrary
  * inputs, not just the fixture shapes. */
class PropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(4242)
  private def bytes(n: Int): Array[Byte] = { val b = new Array[Byte](n); rnd.nextBytes(b); b }
  private def u256(): BigInteger = new BigInteger(1, bytes(32))

  test("u256 add/sub round-trip whenever no overflow occurred") {
    for (_ <- 1 to 500) {
      val a = u256(); val b = u256()
      val (s, ovf) = U256.add(a, b)
      if (!ovf) {
        val (d, borrow) = U256.sub(s, b)
        assert(!borrow && d == a)
      }
    }
  }

  test("u256 bytes32 round-trip") {
    for (_ <- 1 to 500) {
      val a = u256()
      assert(U256.fromBytes32(U256.toBytes32(a)) == a)
    }
  }

  test("digest combine: commutative, associative, identity, duplicate-sensitive") {
    for (_ <- 1 to 40) {
      // digests are curve points — derive them from random entries
      val a = Commitments.mappingLeafDigest(bytes(32), bytes(32))
      val b = Commitments.mappingLeafDigest(bytes(32), bytes(32))
      val c = Commitments.keyOnlyDigest(bytes(32))
      assert(Commitments.digestCombine(a, b).sameElements(Commitments.digestCombine(b, a)))
      assert(Commitments.digestCombine(Commitments.digestCombine(a, b), c)
        .sameElements(Commitments.digestCombine(a, Commitments.digestCombine(b, c))))
      assert(Commitments.digestCombine(a, Commitments.DigestIdentity).sameElements(a))
      // doubling a nonzero digest never cancels to the identity
      assert(!Commitments.digestCombine(a, a).sameElements(Commitments.DigestIdentity))
    }
  }

  test("merkle root: deterministic, and position-dependent (leaf swap changes the root)") {
    for (_ <- 1 to 100) {
      val n = 2 + rnd.nextInt(40)
      val v = IndexedSeq.fill(n)(bytes(32))
      val root = Commitments.merkleRoot(v)
      assert(Commitments.merkleRoot(v.map(_.clone)).sameElements(root))
      val swapped = v.updated(0, v(1)).updated(1, v(0))
      if (!v(0).sameElements(v(1)))
        assert(!Commitments.merkleRoot(swapped).sameElements(root))
    }
  }

  test("rolling hash: deterministic per content, window bigger than content is empty") {
    for (_ <- 1 to 200) {
      val b = bytes(10 + rnd.nextInt(100))
      val w = 1 + rnd.nextInt(16)
      assert(Bytes.rollingHashes(b, w).toSeq == Bytes.rollingHashes(b.clone, w).toSeq)
    }
    assert(Bytes.rollingHashes(bytes(3), 9).isEmpty)
  }
}
