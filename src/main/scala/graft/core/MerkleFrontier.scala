package graft.core

/** Incremental (append-only) Merkle accumulator — the O(log n) carried
  * state of the reference's IVC block-DB append
  * (`block/mod.rs:152-207`: each step consumes the previous proof's
  * public root and emits the next; nothing re-reads history).
  *
  * [[Commitments.merkleRoot]] pairs nodes level by level and passes an
  * odd last node through unchanged. That scheme is exactly a binary
  * counter: appending the 2^k-th leaf at a level "carries" an inner
  * hash up one level, so the only live state is one pending (not yet
  * paired) node per level — the tree's right spine, ≤ log2(n)+1
  * hashes. [[root]] folds the spine bottom-up; pass-through odd nodes
  * mean a missing level contributes nothing.
  *
  * Bit-parity with the batch fold is law-checked in MerkleFrontierSpec
  * (incremental root == [[Commitments.merkleRoot]] for every prefix).
  *
  * @param nLeaves total leaves appended so far
  * @param pending pending[k] = the unpaired subtree root covering 2^k
  *                leaves, if bit k of nLeaves is set
  */
final case class MerkleFrontier(nLeaves: Long, pending: Vector[Option[Array[Byte]]]) {

  /** append one leaf: binary-counter carry, O(log n) worst case,
    * O(1) amortized. */
  def push(leaf: Array[Byte]): MerkleFrontier = {
    val p = pending.toBuffer
    var carry = leaf
    var lvl = 0
    while (lvl < p.length && p(lvl).isDefined) {
      carry = Commitments.innerNodeHash(p(lvl).get, carry)
      p(lvl) = None
      lvl += 1
    }
    if (lvl == p.length) p += Some(carry) else p(lvl) = Some(carry)
    MerkleFrontier(nLeaves + 1, p.toVector)
  }

  /** current root == Commitments.merkleRoot of all pushed leaves. */
  def root: Array[Byte] = {
    var running: Array[Byte] = null
    var lvl = 0
    while (lvl < pending.length) {
      pending(lvl).foreach { h =>
        running = if (running == null) h else Commitments.innerNodeHash(h, running)
      }
      lvl += 1
    }
    if (running == null) Commitments.ZeroDigest else running
  }

  /** spine serialization: one "level:hex" token per pending node. */
  def serialize: String =
    s"$nLeaves;" + pending.zipWithIndex
      .collect { case (Some(h), lvl) => s"$lvl:${Bytes.toHex(h)}" }
      .mkString(",")
}

object MerkleFrontier {

  val empty: MerkleFrontier = MerkleFrontier(0L, Vector.empty)

  def apply(leaves: IterableOnce[Array[Byte]]): MerkleFrontier =
    leaves.iterator.foldLeft(empty)(_.push(_))

  def deserialize(s: String): MerkleFrontier = {
    val Array(n, rest @ _*) = s.split(";", 2)
    val entries = rest.headOption.filter(_.nonEmpty).map(_.split(",").map { tok =>
      val Array(lvl, hex) = tok.split(":", 2)
      lvl.toInt -> Bytes.fromHex(hex)
    }.toMap).getOrElse(Map.empty[Int, Array[Byte]])
    val depth = if (entries.isEmpty) 0 else entries.keys.max + 1
    MerkleFrontier(n.toLong, Vector.tabulate(depth)(entries.get))
  }
}
