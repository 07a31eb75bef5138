package graft.core

/** Commitment kernels: the Spark-engine analogs of the reference's
  * native "golden" functions (`storage/lpn/mod.rs:30-88`,
  * `state/lpn/mod.rs:25-57`, `block/mod.rs:55-82`,
  * `group_hashing/mod.rs:19-60`).
  *
  * Hash swap, documented (SURVEY §7.4.4): the reference commits with
  * Poseidon over the Goldilocks field and an EcGFp5 additive curve
  * digest; those constants live in the (unvendored) plonky2 crate, so
  * bit-parity is untestable here. We keep the exact *structure* —
  * same leaf layouts, same tree shapes, same algebraic properties
  * (the set digest is commutative/associative with an identity, the
  * merkle root is position-dependent) — over Keccak-256:
  *
  *   - leaf/inner hashes: keccak with one-byte domain separation tags
  *     in place of `Poseidon(...)`;
  *   - set digest: sum of keccak(entry) mod 2^256 in place of
  *     `Σ map_to_curve_point(entry)` — both are order-insensitive
  *     *additive* monoids (merge in any shuffle order, duplicates
  *     accumulate rather than cancel), which is the property the
  *     distributed aggregation relies on.
  */
object Commitments {

  /** domain-separation tags (keccak's first input byte) */
  private val TagMappingLeaf: Byte = 0x00
  private val TagInner: Byte = 0x01
  private val TagDigestLeaf: Byte = 0x02
  private val TagStateLeaf: Byte = 0x03
  private val TagBlockLeaf: Byte = 0x04

  val DigestLen = 32
  val ZeroDigest: Array[Byte] = new Array[Byte](DigestLen)

  /** `leaf_hash_for_mapping` (storage/lpn/mod.rs:44-56): storage-DB
    * leaf over one mapping entry. */
  def mappingLeafHash(key32: Array[Byte], value32: Array[Byte]): Array[Byte] =
    Keccak.keccak256(Bytes.concat(Array(TagMappingLeaf), Bytes.leftPad32(key32), Bytes.leftPad32(value32)))

  /** `intermediate_node_hash` (storage/lpn/inner_node.rs:28-64). */
  def innerNodeHash(left: Array[Byte], right: Array[Byte]): Array[Byte] =
    Keccak.keccak256(Bytes.concat(Array(TagInner), left, right))

  /** `leaf_digest_for_mapping` (storage/lpn/mod.rs:30-42): per-entry
    * set-digest contribution; combine with [[digestCombine]]. */
  def mappingLeafDigest(key32: Array[Byte], value32: Array[Byte]): Array[Byte] =
    Keccak.keccak256(Bytes.concat(Array(TagDigestLeaf), Bytes.leftPad32(key32), Bytes.leftPad32(value32)))

  /** digest-on-key-only variant (query2/storage/leaf.rs:46-49): lets
    * the revelation stage re-derive the aggregate digest from just the
    * L result keys. */
  def keyOnlyDigest(key32: Array[Byte]): Array[Byte] =
    Keccak.keccak256(Bytes.concat(Array(TagDigestLeaf), Bytes.leftPad32(key32)))

  /** curve_add analog: 256-bit modular addition — commutative,
    * associative, identity = zeros, and (unlike XOR) *multiset*-
    * sensitive: N copies of an entry contribute N·x, never cancel —
    * matching the additive-group semantics the reference's digest
    * relies on (a duplicated pair of entries must NOT vanish from the
    * commitment). */
  def digestCombine(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](DigestLen)
    var carry = 0
    var i = DigestLen - 1
    while (i >= 0) {
      val s = (a(i) & 0xff) + (b(i) & 0xff) + carry
      out(i) = (s & 0xff).toByte
      carry = s >>> 8
      i -= 1
    }
    out
  }

  /** `state_leaf_hash` (state/lpn/leaf/mod.rs:34-72):
    * Poseidon(contract ‖ mapping_slot ‖ length_slot ‖ storage_root). */
  def stateLeafHash(contract20: Array[Byte], mappingSlot: Int, lengthSlot: Int,
      storageRoot: Array[Byte]): Array[Byte] =
    Keccak.keccak256(Bytes.concat(
      Array(TagStateLeaf), Bytes.leftPad(contract20, 20),
      Bytes.beBytes(mappingSlot.toLong, 4), Bytes.beBytes(lengthSlot.toLong, 4),
      storageRoot))

  /** `block_leaf_hash` (block/mod.rs:55-82):
    * Poseidon(block_number ‖ block_hash ‖ state_root). */
  def blockLeafHash(blockNumber: Long, blockHash: Array[Byte], stateRoot: Array[Byte]): Array[Byte] =
    Keccak.keccak256(Bytes.concat(
      Array(TagBlockLeaf), Bytes.beBytes(blockNumber, 8), blockHash, stateRoot))

  /** Merkle root over leaves in a *fixed, documented order* (we sort by
    * mapping_key — the reference takes prover-supplied tree positions;
    * SURVEY §7.4.2). Odd node at a level is passed through unchanged,
    * matching the reference's partial-node circuits
    * (query2/storage/partial_inner.rs). Empty set → [[ZeroDigest]].
    */
  def merkleRoot(sortedLeafHashes: IndexedSeq[Array[Byte]]): Array[Byte] = {
    if (sortedLeafHashes.isEmpty) return ZeroDigest
    var level = sortedLeafHashes
    while (level.size > 1) {
      level = level.grouped(2).map {
        case Seq(l, r) => innerNodeHash(l, r)
        case Seq(l)    => l
      }.toIndexedSeq
    }
    level.head
  }

  /** `empty_merkle_root(depth)` (block/mod.rs, used at
    * query2/revelation/circuit.rs:68-75): root of an all-empty
    * fixed-depth tree. */
  def emptyMerkleRoot(depth: Int): Array[Byte] = {
    var h = ZeroDigest
    var i = 0
    while (i < depth) { h = innerNodeHash(h, h); i += 1 }
    h
  }
}
