package graft.core

/** Merkle-Patricia-trie proof verification (public algorithm: Ethereum
  * Yellow Paper, appendix D). Behavioral contract mirrors the
  * reference's proof walk (`mrp2-utils/src/mpt_sequential/mod.rs:116-230`
  * in-circuit; `eth.rs:310-333` native re-verify): given the node list
  * root→leaf for an EIP-1186-shaped proof, check keccak linkage and
  * path-nibble consumption, and extract the proven value.
  *
  * Node kinds: branch = 17-item RLP list (16 children + value);
  * leaf/extension = 2-item list with hex-prefix-encoded partial path.
  * A child reference is keccak(rlp(child)) when the encoding is ≥ 32
  * bytes, else the child node is inlined.
  */
object Mpt {

  /** key (32B) → 64 nibbles, high first. */
  def keyNibbles(key: Array[Byte]): Array[Int] =
    key.flatMap(b => Array((b >> 4) & 0xf, b & 0xf))

  /** per-node structural metadata for `explode_mpt_proof` (§2.9
    * generator — S1 ingest validation): node kind from the RLP list
    * arity (17 = branch; 2 = leaf/extension by the hex-prefix
    * terminator flag, `mpt_sequential/mod.rs:51-68`), plus size and
    * keccak identity. */
  final case class NodeInfo(level: Int, node_type: String, n_items: Int,
      node_len: Int, node_hash: Array[Byte])

  def nodeInfos(proof: Seq[Array[Byte]]): Seq[NodeInfo] =
    proof.zipWithIndex.map { case (node, i) =>
      val (tpe, n) = scala.util.Try(Rlp.decode(node)).toOption match {
        case Some(Rlp.Lst(items)) if items.length == 17 => ("branch", 17)
        case Some(Rlp.Lst(items)) if items.length == 2 =>
          items.head match {
            case Rlp.Str(b) if b.nonEmpty =>
              (if (Rlp.hexPrefixDecode(b)._2) "leaf" else "extension", 2)
            case _ => ("malformed", 2)
          }
        case Some(Rlp.Lst(items)) => ("malformed", items.length)
        case _ => ("malformed", 0)
      }
      NodeInfo(i, tpe, n, node.length, Keccak.keccak256(node))
    }

  /** Verify and return the RLP-*decoded* leaf value (storage-trie
    * convention: the payload is RLP(bytes)). */
  def verifyProof(proof: Seq[Array[Byte]], mptKey: Array[Byte], rootHash: Array[Byte]): Option[Array[Byte]] =
    verifyProofRaw(proof, mptKey, rootHash).flatMap { raw =>
      Rlp.decode(raw) match {
        case Rlp.Str(v) => Some(v)
        case _          => None
      }
    }

  /** Verify `proof` (nodes from root to leaf) for `mptKey` against
    * `rootHash`; returns the *raw* leaf payload on success — for the
    * state trie this is RLP([nonce, balance, storageRoot, codeHash])
    * (account leaves hold lists, storage leaves hold byte strings). */
  def verifyProofRaw(proof: Seq[Array[Byte]], mptKey: Array[Byte], rootHash: Array[Byte]): Option[Array[Byte]] = {
    var expected: Either[Array[Byte], Array[Byte]] = Left(rootHash) // Left = hash ref, Right = inline node
    var nibbles = keyNibbles(mptKey).toSeq
    var i = 0
    while (i < proof.length) {
      val node = proof(i)
      expected match {
        case Left(h) =>
          if (!Keccak.keccak256(node).sameElements(h)) return None
        case Right(inline) =>
          if (!node.sameElements(inline)) return None
      }
      Rlp.decode(node) match {
        case Rlp.Lst(items) if items.length == 17 =>
          if (nibbles.isEmpty) return None // fixed-width keys never terminate at a branch here
          val child = items(nibbles.head)
          nibbles = nibbles.tail
          child match {
            case Rlp.Str(h) if h.length == 32 => expected = Left(h)
            case Rlp.Str(h) if h.isEmpty      => return None // empty slot: non-membership
            case other                        => expected = Right(Rlp.encode(other))
          }
        case Rlp.Lst(items) if items.length == 2 =>
          val (path, isLeaf) = (items(0), items(1)) match {
            case (Rlp.Str(p), _) => Rlp.hexPrefixDecode(p)
            case _               => return None
          }
          if (!nibbles.startsWith(path.toSeq)) return None
          nibbles = nibbles.drop(path.length)
          if (isLeaf) {
            if (nibbles.nonEmpty || i != proof.length - 1) return None
            return items(1) match {
              case Rlp.Str(valueRlp) => Some(valueRlp)
              case _                 => None
            }
          } else {
            items(1) match {
              case Rlp.Str(h) if h.length == 32 => expected = Left(h)
              case other                        => expected = Right(Rlp.encode(other))
            }
          }
        case _ => return None
      }
      i += 1
    }
    None // ran out of nodes before a leaf
  }
}
