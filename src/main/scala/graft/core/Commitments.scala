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
  * The set digest is bit-exact too: `Σ map_to_curve_point(entry)`
  * over the EcGFp5 curve ([[EcGFp5]], `group_hashing/mod.rs`), the
  * same order-insensitive additive group the reference aggregates in
  * (merge in any shuffle order, duplicates accumulate rather than
  * cancel). Digest wire format: 81-byte affine point
  * ([[EcGFp5.serialize]]); identity = the point at infinity.
  */
object Commitments {

  val DigestLen = 32
  val ZeroDigest: Array[Byte] = new Array[Byte](DigestLen)

  /** additive identity of the curve-digest group (point at infinity);
    * [[EcGFp5.SerLen]] bytes. */
  val DigestIdentity: Array[Byte] = EcGFp5.serialize(EcGFp5.Point.Infinity)

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
    PoseidonGoldilocks.twoToOneBytes(left, right)

  /** `leaf_digest_for_mapping` (storage/lpn/mod.rs:70-88):
    * map_to_curve_point over the 16 u32-packed key‖value elements.
    * Bit-exact with the reference; combine with [[digestCombine]]. */
  def mappingLeafDigest(key32: Array[Byte], value32: Array[Byte]): Array[Byte] = {
    val preimage = Bytes.concat(Bytes.leftPad32(key32), Bytes.leftPad32(value32))
    EcGFp5.serialize(EcGFp5.mapToCurvePoint(PoseidonGoldilocks.bytesToFields(preimage)))
  }

  /** fused leaf hash + leaf digest over ONE sponge: [[mappingLeafHash]]
    * is the first 4 squeezed elements and [[mappingLeafDigest]]'s
    * curve input the first 5 — of the SAME final sponge state over the
    * SAME key‖value preimage (plonky2's `hash_n_to_m_no_pad` squeezes
    * m ≤ rate elements of one absorb). Computing them separately (as
    * the storage-DB build did through round 10) pays the 2-permutation
    * absorb twice per entry. Output: hash(32) ‖ serialized digest
    * point (81) = 113 bytes, bit-identical to the two kernels. */
  def mappingLeafCommit(key32: Array[Byte], value32: Array[Byte]): Array[Byte] = {
    val preimage = Bytes.concat(Bytes.leftPad32(key32), Bytes.leftPad32(value32))
    val sq = PoseidonGoldilocks.hashNoPadN(PoseidonGoldilocks.bytesToFields(preimage), 5)
    val hash = PoseidonGoldilocks.hashOutToBytes(java.util.Arrays.copyOfRange(sq, 0, 4))
    val digest = EcGFp5.serialize(EcGFp5.simpleSwu(EcGFp5.F5(sq)))
    val out = new Array[Byte](32 + EcGFp5.SerLen)
    System.arraycopy(hash, 0, out, 0, 32)
    System.arraycopy(digest, 0, out, 32, EcGFp5.SerLen)
    out
  }

  /** digest-on-key-only variant (query2/storage/leaf.rs:46-49):
    * map_to_curve_point over the 8 packed key elements — lets the
    * revelation stage re-derive the aggregate digest from just the L
    * result keys. Bit-exact with the reference. */
  def keyOnlyDigest(key32: Array[Byte]): Array[Byte] =
    EcGFp5.serialize(EcGFp5.mapToCurvePoint(
      PoseidonGoldilocks.bytesToFields(Bytes.leftPad32(key32))))

  /** `add_curve_point` (group_hashing/curve_add.rs:17-21): EcGFp5
    * point addition — commutative, associative, identity =
    * [[DigestIdentity]], and *multiset*-sensitive: N copies of an
    * entry contribute N·P, never cancel. Bit-exact with the
    * reference's digest group. */
  def digestCombine(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    EcGFp5.addSerialized(a, b)

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
