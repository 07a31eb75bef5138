package graft.core

/** Commitment kernels: the Spark-engine analogs of the reference's
  * native "golden" functions (`storage/lpn/mod.rs:30-88`,
  * `state/lpn/mod.rs:25-57`, `block/mod.rs:55-82`,
  * `group_hashing/mod.rs:19-60`).
  *
  * Tree hashes are **bit-exact** with the reference since round 2:
  * every leaf/inner hash is the same Poseidon-Goldilocks sponge
  * plonky2's `PoseidonHash` computes ([[PoseidonGoldilocks]]), over
  * the reference's exact preimages — u32-LE packed bytes for raw
  * inputs, 4-u64 `HashOut` elements for child hashes.
  *
  * Remaining documented swap (SURVEY §7.4.4): the *set digest* — the
  * reference sums EcGFp5 curve points (`Σ map_to_curve_point(entry)`,
  * `group_hashing/mod.rs`); we sum keccak(entry) mod 2^256. Both are
  * order-insensitive *additive* monoids (merge in any shuffle order,
  * duplicates accumulate rather than cancel), which is the property
  * the distributed aggregation relies on.
  */
object Commitments {

  /** domain-separation tags for the keccak-based set digest */
  private val TagDigestLeaf: Byte = 0x02

  val DigestLen = 32
  val ZeroDigest: Array[Byte] = new Array[Byte](DigestLen)

  /** `leaf_hash_for_mapping` (storage/lpn/mod.rs:33-56): storage-DB
    * leaf = Poseidon(u32-LE-packed left_pad32(key) ‖ left_pad32(value)),
    * 16 field elements. Bit-exact with the reference. */
  def mappingLeafHash(key32: Array[Byte], value32: Array[Byte]): Array[Byte] = {
    val preimage = Bytes.concat(Bytes.leftPad32(key32), Bytes.leftPad32(value32))
    PoseidonGoldilocks.hashOutToBytes(
      PoseidonGoldilocks.hashNoPad(PoseidonGoldilocks.bytesToFields(preimage)))
  }

  /** `intermediate_node_hash` (storage/lpn/mod.rs:59-67):
    * Poseidon(left.elements ‖ right.elements), 8 elements — also
    * `state_node_hash` and `block_node_hash` (two_to_one compresses
    * identically). Bit-exact with the reference. */
  def innerNodeHash(left: Array[Byte], right: Array[Byte]): Array[Byte] =
    PoseidonGoldilocks.hashOutToBytes(PoseidonGoldilocks.hashNoPad(
      PoseidonGoldilocks.hashOutFromBytes(left) ++ PoseidonGoldilocks.hashOutFromBytes(right)))

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

  /** `state_leaf_hash` (state/lpn/mod.rs:25-45): Poseidon over
    * 5×u32(address LE-packed) ‖ mapping_slot ‖ length_slot ‖
    * storage_root.elements — 11 field elements. Bit-exact with the
    * reference (slots are u8 there; we range-check). */
  def stateLeafHash(contract20: Array[Byte], mappingSlot: Int, lengthSlot: Int,
      storageRoot: Array[Byte]): Array[Byte] = {
    require(mappingSlot >= 0 && mappingSlot <= 255 && lengthSlot >= 0 && lengthSlot <= 255,
      s"slots are u8 in the reference: $mappingSlot/$lengthSlot")
    val fields = PoseidonGoldilocks.bytesToFields(Bytes.leftPad(contract20, 20)) ++
      Array(mappingSlot.toLong, lengthSlot.toLong) ++
      PoseidonGoldilocks.hashOutFromBytes(storageRoot)
    PoseidonGoldilocks.hashOutToBytes(PoseidonGoldilocks.hashNoPad(fields))
  }

  /** `block_leaf_hash` (block/mod.rs:59-74): Poseidon over
    * block_number ‖ 8×u32(block_hash LE-packed) ‖
    * state_root.elements — 13 field elements. Bit-exact with the
    * reference (block_number is u32 there; we range-check). */
  def blockLeafHash(blockNumber: Long, blockHash: Array[Byte], stateRoot: Array[Byte]): Array[Byte] = {
    require(blockNumber >= 0 && blockNumber <= 0xffffffffL,
      s"block_number is u32 in the reference: $blockNumber")
    val fields = blockNumber +: (PoseidonGoldilocks.bytesToFields(blockHash) ++
      PoseidonGoldilocks.hashOutFromBytes(stateRoot))
    PoseidonGoldilocks.hashOutToBytes(PoseidonGoldilocks.hashNoPad(fields))
  }

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
