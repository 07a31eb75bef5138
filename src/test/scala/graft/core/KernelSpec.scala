package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.math.BigInteger
import java.nio.charset.StandardCharsets.UTF_8
import scala.util.Random

/** Golden-value + property tests for the pure kernels, mirroring the
  * reference's native-vs-circuit consistency style (SURVEY §5).
  * Property checks use a fixed-seed Random (scalatestplus bridge is
  * not in the offline cache). */
class KeccakSpec extends AnyFunSuite {
  private def hex(s: String) = Bytes.toHex(Keccak.keccak256(s.getBytes(UTF_8)))

  test("keccak256 golden vectors (public Ethereum test values)") {
    assert(hex("") === "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert(hex("abc") === "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    assert(hex("hello") === "1c8aff950685c2ed4bc3174f3472287b56d9517b9c948127319a09a7a36deac8")
  }

  test("keccak256 multi-block determinism + avalanche (> rate 136B)") {
    val in = Array.fill[Byte](200)(0x61)
    val in2 = in.clone(); in2(199) = 0x62
    assert(Keccak.keccak256(in).length === 32)
    assert(Bytes.toHex(Keccak.keccak256(in)) === Bytes.toHex(Keccak.keccak256(in.clone())))
    assert(Bytes.toHex(Keccak.keccak256(in)) !== Bytes.toHex(Keccak.keccak256(in2)))
  }
}

class RlpSpec extends AnyFunSuite {
  import Rlp._

  test("RLP golden vectors (Ethereum spec examples)") {
    assert(Bytes.toHex(encode(Str("dog".getBytes(UTF_8)))) === "83646f67")
    assert(Bytes.toHex(encode(Lst(Vector(Str("cat".getBytes(UTF_8)), Str("dog".getBytes(UTF_8)))))) ===
      "c88363617483646f67")
    assert(Bytes.toHex(encode(Str(Array.empty))) === "80")
    assert(Bytes.toHex(encode(Lst(Vector.empty))) === "c0")
    assert(Bytes.toHex(encodeLong(0)) === "80")
    assert(Bytes.toHex(encodeLong(15)) === "0f")
    assert(Bytes.toHex(encodeLong(1024)) === "820400")
    // long string (>55 bytes) — 0xb8 prefix
    val lorem = "Lorem ipsum dolor sit amet, consectetur adipisicing elit".getBytes(UTF_8)
    assert(Bytes.toHex(encode(Str(lorem))).startsWith("b838"))
  }

  test("decode inverts encode (randomized nested roundtrip)") {
    val rnd = new Random(42)
    def randItem(depth: Int): Item =
      if (depth == 0 || rnd.nextBoolean()) {
        val b = new Array[Byte](rnd.nextInt(80)); rnd.nextBytes(b); Str(b)
      } else Lst(Vector.fill(rnd.nextInt(5))(randItem(depth - 1)))
    def same(a: Item, b: Item): Boolean = (a, b) match {
      case (Str(x), Str(y)) => x.sameElements(y)
      case (Lst(x), Lst(y)) => x.size == y.size && x.zip(y).forall { case (i, j) => same(i, j) }
      case _                => false
    }
    (1 to 200).foreach { _ =>
      val item = randItem(3)
      assert(same(decode(encode(item)), item))
    }
  }

  test("leaf value extraction: [path, rlp(value)] -> left_pad32(value)") {
    val value = Bytes.fromHex("deadbeef")
    val leaf = encode(Lst(Vector(
      Str(hexPrefixEncode(Array(1, 2, 3), isLeaf = true)),
      Str(encode(Str(value))))))
    assert(Bytes.toHex(extractLeafValue32(leaf)) === "00" * 28 + "deadbeef")
  }

  test("hex-prefix roundtrip") {
    val rnd = new Random(7)
    (1 to 200).foreach { _ =>
      val nibbles = Array.fill(rnd.nextInt(65))(rnd.nextInt(16))
      val isLeaf = rnd.nextBoolean()
      val (back, leafFlag) = hexPrefixDecode(hexPrefixEncode(nibbles, isLeaf))
      assert(back.toSeq === nibbles.toSeq)
      assert(leafFlag === isLeaf)
    }
  }

  test("header field extraction by RLP position") {
    val parent = Array.fill[Byte](32)(0x11)
    val stateRoot = Array.fill[Byte](32)(0x22)
    val header = Lst(Vector(
      Str(parent),                      // 0 parentHash
      Str(Array.fill[Byte](32)(0x33)),  // 1 ommersHash
      Str(Array.fill[Byte](20)(0x44)),  // 2 beneficiary
      Str(stateRoot),                   // 3 stateRoot
      Str(Array.fill[Byte](32)(0x55)),  // 4 txRoot
      Str(Array.fill[Byte](32)(0x66)),  // 5 receiptsRoot
      Str(Array.fill[Byte](16)(0x00)),  // 6 logsBloom (shortened for test)
      Str(Array[Byte](1)),              // 7 difficulty
      Str(Bytes.beBytes(123456L, 4)),   // 8 number
    ))
    val f = headerFields(encode(header))
    assert(f.parentHash.sameElements(parent))
    assert(f.stateRoot.sameElements(stateRoot))
    assert(f.number === 123456L)
  }
}

class U256Spec extends AnyFunSuite {
  private val rnd = new Random(1234)
  private def randU256(): BigInteger = {
    val b = new Array[Byte](rnd.nextInt(33)); rnd.nextBytes(b); new BigInteger(1, b)
  }

  test("bytes32 roundtrip") {
    (1 to 200).foreach { _ =>
      val v = randU256()
      assert(U256.fromBytes32(U256.toBytes32(v)) === v)
      assert(U256.toBytes32(v).length === 32)
    }
  }

  test("add/sub/mul flags match BigInteger semantics") {
    (1 to 500).foreach { _ =>
      val a = randU256(); val b = randU256()
      val (s, ovf) = U256.add(a, b)
      assert(ovf === (a.add(b).compareTo(U256.Max) > 0))
      assert(s === a.add(b).mod(U256.Modulus))
      val (d, borrow) = U256.sub(a, b)
      assert(borrow === (a.compareTo(b) < 0))
      assert(d === a.subtract(b).mod(U256.Modulus))
      val (p, povf) = U256.mul(a, b)
      assert(povf === (a.multiply(b).compareTo(U256.Max) > 0))
      assert(p === a.multiply(b).mod(U256.Modulus))
    }
  }

  test("div by zero raises the flag, quotient zero") {
    val (q, flag) = U256.div(BigInteger.TEN, BigInteger.ZERO)
    assert(flag); assert(q === BigInteger.ZERO)
    val (q2, flag2) = U256.div(BigInteger.TEN, BigInteger.TWO)
    assert(!flag2); assert(q2 === BigInteger.valueOf(5))
  }
}

class CommitmentsSpec extends AnyFunSuite {
  import Commitments._
  private val rnd = new Random(99)
  private def b32(): Array[Byte] = { val b = new Array[Byte](32); rnd.nextBytes(b); b }

  test("digest combine is commutative + associative with infinity identity") {
    (1 to 20).foreach { _ =>
      val a = mappingLeafDigest(b32(), b32())
      val b = mappingLeafDigest(b32(), b32())
      val c = keyOnlyDigest(b32())
      assert(digestCombine(a, b).sameElements(digestCombine(b, a)))
      assert(digestCombine(digestCombine(a, b), c).sameElements(digestCombine(a, digestCombine(b, c))))
      assert(digestCombine(a, DigestIdentity).sameElements(a))
    }
  }

  test("merkle root is order-sensitive and deterministic") {
    val leaves = (1 to 5).map(i => mappingLeafHash(Bytes.beBytes(i.toLong, 32), Bytes.beBytes(100L + i, 32)))
    val r1 = merkleRoot(leaves)
    assert(r1.sameElements(merkleRoot(leaves)))
    assert(!r1.sameElements(merkleRoot(leaves.reverse)))
    assert(merkleRoot(IndexedSeq.empty).sameElements(ZeroDigest))
    assert(merkleRoot(IndexedSeq(leaves.head)).sameElements(leaves.head))
  }

  test("empty merkle root chain") {
    assert(emptyMerkleRoot(0).sameElements(ZeroDigest))
    assert(emptyMerkleRoot(2).sameElements(
      innerNodeHash(innerNodeHash(ZeroDigest, ZeroDigest), innerNodeHash(ZeroDigest, ZeroDigest))))
  }

  test("leaf hashes are domain-separated") {
    val k = Bytes.beBytes(7L, 32); val v = Bytes.beBytes(9L, 32)
    assert(!mappingLeafHash(k, v).sameElements(mappingLeafDigest(k, v)))
  }
}

class StorageKeySpec extends AnyFunSuite {
  test("mapping mpt key = keccak(keccak(pad32(key) || pad32(slot)))") {
    val key = Bytes.fromHex("aa" * 20)
    val loc = StorageKey.mappingLocation(key, 2)
    assert(loc.sameElements(Keccak.keccak256(
      Bytes.concat(Bytes.leftPad32(key), Bytes.leftPad32(Array[Byte](2))))))
    assert(StorageKey.mappingMptKey(key, 2).sameElements(Keccak.keccak256(loc)))
  }
}


/** F5 packing gadgets: u8→u32 LE limbs and BE integer round trips. */
class PackingSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("packU32LE groups 4 bytes little-endian with zero padding") {
    val in = Array[Byte](0x01, 0x02, 0x03, 0x04, 0x05)
    val out = Bytes.packU32LE(in)
    assert(out.toSeq == Seq(0x04030201, 0x00000005))
  }
  test("beBytes/beLong round trip at all widths") {
    for (w <- 1 to 8; v <- Seq(0L, 1L, 255L, 65535L, 1234567L).filter(x => w >= 1 && x < math.pow(256, w))) {
      assert(Bytes.beLong(Bytes.beBytes(v, w)) == v, s"w=$w v=$v")
    }
  }
}


/** Rabin-Karp rolling hash: incremental vs direct recomputation. */
class RollingHashSpec extends org.scalatest.funsuite.AnyFunSuite {
  private def direct(in: Array[Byte], off: Int, w: Int): Long = {
    var h = 0L
    for (i <- off until off + w) h = (h * 257L + (in(i) & 0xff)) % 1000000007L
    h
  }
  test("incremental hashes equal direct per-window recomputation") {
    val rnd = new scala.util.Random(7)
    val in = new Array[Byte](300); rnd.nextBytes(in)
    for (w <- Seq(1, 4, 16, 64)) {
      val hs = Bytes.rollingHashes(in, w)
      assert(hs.length == in.length - w + 1)
      for (o <- hs.indices) assert(hs(o) == direct(in, o, w), s"w=$w o=$o")
    }
  }
  test("window longer than input yields empty; min is -1 sentinel") {
    assert(Bytes.rollingHashes(Array[Byte](1, 2), 5).isEmpty)
    assert(Bytes.minRollingHash(Array[Byte](1, 2), 5) == -1L)
  }
  test("shifted content shares window hashes (locality property)") {
    val a = "the quick brown fox jumps over it".getBytes
    val b = "xx the quick brown fox jumps over it".getBytes
    val ha = Bytes.rollingHashes(a, 8).toSet
    val hb = Bytes.rollingHashes(b, 8).toSet
    assert(ha.intersect(hb).size >= a.length - 8) // all of a's windows appear in b
  }
}
