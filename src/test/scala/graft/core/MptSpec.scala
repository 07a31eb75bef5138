package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** MPT build + proof-verify kernels (S1/S2 shapes): positive walks,
  * tamper detection, non-membership, inline-child handling. */
class MptSpec extends AnyFunSuite {

  private def kv(i: Int): (Array[Byte], Array[Byte]) =
    (Keccak.keccak256(s"key:$i".getBytes), Bytes.leftPad32(Bytes.beBytes(1000L + i, 8)))

  test("proofs verify and extract the stored value for every key") {
    val entries = (0 until 16).map(kv)
    val trie = MptTrie.build(entries)
    val root = MptTrie.rootHash(trie)
    entries.foreach { case (k, v) =>
      val proof = MptTrie.proof(trie, k)
      val got = Mpt.verifyProof(proof, k, root)
      assert(got.isDefined, Bytes.toHex(k))
      assert(Bytes.leftPad32(got.get).sameElements(v))
    }
  }

  test("single-entry trie (root is the leaf)") {
    val Seq(e) = Seq(kv(7))
    val trie = MptTrie.build(Seq(e))
    val got = Mpt.verifyProof(MptTrie.proof(trie, e._1), e._1, MptTrie.rootHash(trie))
    assert(got.isDefined && Bytes.leftPad32(got.get).sameElements(e._2))
  }

  test("tampered node fails verification") {
    val entries = (0 until 8).map(kv)
    val trie = MptTrie.build(entries)
    val root = MptTrie.rootHash(trie)
    val proof = MptTrie.proof(trie, entries(3)._1).toArray
    val last = proof(proof.length - 1).clone()
    last(last.length - 1) = (last(last.length - 1) ^ 0x01).toByte
    proof(proof.length - 1) = last
    assert(Mpt.verifyProof(proof.toSeq, entries(3)._1, root).isEmpty)
  }

  test("wrong root fails verification") {
    val entries = (0 until 8).map(kv)
    val trie = MptTrie.build(entries)
    val proof = MptTrie.proof(trie, entries(0)._1)
    assert(Mpt.verifyProof(proof, entries(0)._1, new Array[Byte](32)).isEmpty)
  }

  test("proof for key A does not verify key B (path mismatch)") {
    val entries = (0 until 8).map(kv)
    val trie = MptTrie.build(entries)
    val root = MptTrie.rootHash(trie)
    val proofA = MptTrie.proof(trie, entries(0)._1)
    assert(Mpt.verifyProof(proofA, entries(1)._1, root).isEmpty)
  }

  test("property: random tries of varying size verify every key, reject every absent key") {
    val rnd = new scala.util.Random(42)
    for (size <- Seq(1, 2, 3, 5, 17, 64, 200)) {
      val entries = (0 until size).map { i =>
        (Keccak.keccak256(s"p:$size:$i".getBytes), {
          val v = new Array[Byte](1 + rnd.nextInt(31)); rnd.nextBytes(v); v
        })
      }
      val trie = MptTrie.build(entries)
      val root = MptTrie.rootHash(trie)
      entries.foreach { case (k, v) =>
        val got = Mpt.verifyProof(MptTrie.proof(trie, k), k, root)
        assert(got.isDefined, s"size=$size")
        assert(got.get.sameElements(v.dropWhile(_ == 0)), s"size=$size value")
      }
      // a key not in the trie cannot be proven with any stored key's proof
      val absent = Keccak.keccak256(s"absent:$size".getBytes)
      assert(Mpt.verifyProof(MptTrie.proof(trie, entries.head._1), absent, root).isEmpty)
    }
  }

  test("nodeInfos classifies every proof node and binds level 0 to the root") {
    val entries = (0 until 64).map { i =>
      (Keccak.keccak256(s"k$i".getBytes), Keccak.keccak256(s"v$i".getBytes).take(8))
    }
    val trie = MptTrie.build(entries)
    val root = MptTrie.rootHash(trie)
    entries.take(8).foreach { case (k, _) =>
      val proof = MptTrie.proof(trie, k)
      val infos = Mpt.nodeInfos(proof)
      assert(infos.size == proof.size)
      assert(infos.map(_.level) == proof.indices)
      // level 0 IS the root node
      assert(infos.head.node_hash.sameElements(root))
      // the walk ends at the leaf; interior nodes are branch/extension
      assert(infos.last.node_type == "leaf")
      infos.init.foreach(n => assert(Set("branch", "extension")(n.node_type), n.node_type))
      // arity matches the kind
      infos.foreach { n =>
        if (n.node_type == "branch") assert(n.n_items == 17) else assert(n.n_items == 2)
      }
    }
    // garbage bytes classify as malformed instead of throwing
    assert(Mpt.nodeInfos(Seq(Array[Byte](1, 2, 3))).head.node_type == "malformed")
  }

  test("short keys / tiny values exercise inline (<32B) children") {
    // 2-byte keys -> 4-nibble paths, 1-byte values: leaf encodings are
    // well under 32 bytes, so branch children embed inline
    val entries = (0 until 6).map { i =>
      (Array((i * 37).toByte, (i * 11 + 1).toByte), Array((i + 1).toByte))
    }
    val trie = MptTrie.build(entries)
    val root = MptTrie.rootHash(trie)
    entries.foreach { case (k, v) =>
      val got = Mpt.verifyProof(MptTrie.proof(trie, k), k, root)
      assert(got.isDefined && got.get.sameElements(v))
    }
  }
}
