package graft.core

/** Minimal Merkle-Patricia-trie *builder* (public algorithm: Ethereum
  * Yellow Paper, appendix D) — used to generate reference-shaped
  * storage-proof fixtures (FIXTURES.md §A2) the ingest-validation
  * operators (S1/S2) run against; the reference generates the same
  * shapes with `eth_trie` (`mrp2-test-utils/src/mpt_sequential.rs:12-60`).
  *
  * Storage-trie convention: key = keccak'd slot location (32B, so all
  * paths are 64 nibbles), stored value = RLP(minimal-big-endian bytes).
  */
object MptTrie {

  sealed trait Node
  final case class Leaf(path: Array[Int], value: Array[Byte]) extends Node
  final case class Ext(path: Array[Int], child: Node) extends Node
  final case class Branch(children: Vector[Option[Node]]) extends Node

  /** build from (mptKey32, rawValue) pairs; values are minimal-BE
    * encoded (leading zeros stripped) then RLP'd, per the storage-trie
    * convention. */
  def build(entries: Seq[(Array[Byte], Array[Byte])]): Node =
    buildRaw(entries.map { case (k, v) => (k, Rlp.encode(Rlp.Str(v.dropWhile(_ == 0)))) })

  /** build with caller-supplied leaf payloads (state-trie convention:
    * payload = RLP([nonce, balance, storageRoot, codeHash])). */
  def buildRaw(entries: Seq[(Array[Byte], Array[Byte])]): Node = {
    require(entries.nonEmpty, "empty trie")
    val nibbled = entries.map { case (k, p) => (Mpt.keyNibbles(k).toList, p) }
    require(nibbled.map(_._1).distinct.size == nibbled.size, "duplicate keys")
    buildRec(nibbled)
  }

  private def buildRec(entries: Seq[(List[Int], Array[Byte])]): Node =
    if (entries.size == 1) {
      val (path, v) = entries.head
      Leaf(path.toArray, v)
    } else {
      val prefix = entries.map(_._1).reduce((a, b) => a.zip(b).takeWhile { case (x, y) => x == y }.map(_._1))
      if (prefix.nonEmpty)
        Ext(prefix.toArray, buildRec(entries.map { case (p, v) => (p.drop(prefix.length), v) }))
      else {
        val byNibble = entries.groupBy(_._1.head)
        Branch(Vector.tabulate(16)(n =>
          byNibble.get(n).map(es => buildRec(es.map { case (p, v) => (p.tail, v) }))))
      }
    }

  /** RLP encoding of a node (children inlined when < 32 bytes). */
  def encode(n: Node): Array[Byte] = Rlp.encode(toItem(n))

  private def childRef(n: Node): Rlp.Item = {
    val enc = encode(n)
    if (enc.length >= 32) Rlp.Str(Keccak.keccak256(enc)) else toItem(n)
  }

  private def toItem(n: Node): Rlp.Item = n match {
    case Leaf(path, payload) =>
      Rlp.Lst(Vector(Rlp.Str(Rlp.hexPrefixEncode(path, isLeaf = true)), Rlp.Str(payload)))
    case Ext(path, child) =>
      Rlp.Lst(Vector(Rlp.Str(Rlp.hexPrefixEncode(path, isLeaf = false)), childRef(child)))
    case Branch(children) =>
      Rlp.Lst(children.map(_.map(childRef).getOrElse(Rlp.Str(Array.empty[Byte]))) :+ Rlp.Str(Array.empty[Byte]))
  }

  def rootHash(n: Node): Array[Byte] = Keccak.keccak256(encode(n))

  /** proof node list root→leaf for `mptKey` (every node on the path,
    * inlined or hashed — matching [[Mpt.verifyProof]]'s walk). */
  def proof(root: Node, mptKey: Array[Byte]): Seq[Array[Byte]] = {
    def walk(n: Node, nibbles: List[Int], acc: Vector[Array[Byte]]): Vector[Array[Byte]] = {
      val acc2 = acc :+ encode(n)
      n match {
        case Leaf(path, _) =>
          require(nibbles == path.toList, "key not in trie (leaf mismatch)")
          acc2
        case Ext(path, child) =>
          require(nibbles.startsWith(path.toList), "key not in trie (ext mismatch)")
          walk(child, nibbles.drop(path.length), acc2)
        case Branch(children) =>
          require(nibbles.nonEmpty, "key exhausted at branch")
          children(nibbles.head) match {
            case Some(c) => walk(c, nibbles.tail, acc2)
            case None    => throw new IllegalArgumentException("key not in trie (empty slot)")
          }
      }
    }
    walk(root, Mpt.keyNibbles(mptKey).toList, Vector.empty)
  }
}
