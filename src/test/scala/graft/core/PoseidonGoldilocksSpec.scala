package graft.core

import java.math.BigInteger

import org.scalatest.funsuite.AnyFunSuite

/** Poseidon-Goldilocks parity checks. The constants are pinned at
  * class-init against plonky2's published leading table values (see
  * PoseidonGoldilocks.SelfTest); here we law-check the field ops
  * against BigInteger, the permutation structure, and the sponge
  * layouts used by the commitment kernels. */
class PoseidonGoldilocksSpec extends AnyFunSuite {

  private val P = new BigInteger("18446744069414584321") // 2^64 - 2^32 + 1
  private def toBig(x: Long): BigInteger =
    new BigInteger(java.lang.Long.toUnsignedString(x))

  test("field mul/add match BigInteger over deterministic pseudo-random u64s") {
    val rnd = new java.util.Random(7)
    (0 until 20000).foreach { _ =>
      val a = rnd.nextLong(); val b = rnd.nextLong()
      val wantMul = toBig(a).mod(P).multiply(toBig(b).mod(P)).mod(P)
      assert(toBig(PoseidonGoldilocks.canonical(PoseidonGoldilocks.mul(a, b))).mod(P) == wantMul)
      val wantAdd = toBig(a).mod(P).add(toBig(b).mod(P)).mod(P)
      assert(toBig(PoseidonGoldilocks.canonical(PoseidonGoldilocks.add(a, b))).mod(P) == wantAdd)
    }
  }

  test("Grain constants: 360 values, all canonical, pinned prefix held") {
    // class init already asserted the pinned plonky2 prefix
    assert(PoseidonGoldilocks.RoundConstants.length == 360)
    PoseidonGoldilocks.RoundConstants.foreach { c =>
      assert(java.lang.Long.compareUnsigned(c, PoseidonGoldilocks.P) < 0)
    }
    // print the first 8 for eyeball parity with plonky2's table
    info(PoseidonGoldilocks.RoundConstants.take(8).map(v => f"0x$v%016x").mkString(", "))
  }

  test("permutation is deterministic, length-preserving, and not identity") {
    val in = Array.tabulate(12)(_.toLong)
    val out1 = PoseidonGoldilocks.permute(in)
    val out2 = PoseidonGoldilocks.permute(in)
    assert(out1.sameElements(out2))
    assert(!out1.sameElements(in))
    out1.foreach(v => assert(java.lang.Long.compareUnsigned(v, PoseidonGoldilocks.P) < 0))
  }

  test("sponge: two_to_one equals hashNoPad of the 8-element concat") {
    val l = PoseidonGoldilocks.hashNoPad(Array(1L, 2L, 3L))
    val r = PoseidonGoldilocks.hashNoPad(Array(4L, 5L))
    assert(PoseidonGoldilocks.twoToOne(l, r)
      .sameElements(PoseidonGoldilocks.hashNoPad(l ++ r)))
  }

  test("hashOut bytes roundtrip little-endian") {
    val h = PoseidonGoldilocks.hashNoPad(Array(42L))
    val b = PoseidonGoldilocks.hashOutToBytes(h)
    assert(b.length == 32)
    assert(PoseidonGoldilocks.hashOutFromBytes(b).sameElements(h))
  }

  test("bytesToFields packs little-endian u32s with zero pad (utils.rs:235-245)") {
    val f = PoseidonGoldilocks.bytesToFields(Array[Byte](1, 0, 0, 0, 0, 0, 0, 1, 5))
    assert(f.sameElements(Array(1L, 1L << 24, 5L)))
  }

  test("distinct inputs produce distinct hashes (sanity over 1k inputs)") {
    val seen = scala.collection.mutable.Set[String]()
    (0 until 1000).foreach { i =>
      val h = Bytes.toHex(PoseidonGoldilocks.hashOutToBytes(
        PoseidonGoldilocks.hashNoPad(Array(i.toLong, (i * 31).toLong))))
      assert(seen.add(h), s"collision at $i")
    }
  }
}
