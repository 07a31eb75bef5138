package graft.operators

import java.math.BigInteger

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import graft.core.{Bytes, Commitments, U256}

/** Custom aggregation surface (SURVEY §2.4 A2/A3/A6). All three are
  * `Aggregator`s exposed through `functions.udaf`, which Spark plans as
  * ObjectHashAggregate with map-side partial aggregation — the child-
  * proof merge tree of the reference (recursion-framework) becomes
  * partial buffers merged across the shuffle.
  */
object Aggregators {

  // ---------------------------------------------------------------- A2
  /** Additive set digest (group_hashing: Σ map_to_curve(entry)). Input
    * rows are per-entry serialized EcGFp5 points
    * ([[graft.functions.GraftFunctions.mappingLeafDigest]]); the
    * combine is curve-point addition ([[Commitments.digestCombine]])
    * — commutative + associative, so ANY merge order across
    * partitions/shuffles yields the same result, and multiset-sensitive
    * (duplicate entries shift the digest; an XOR combine would cancel
    * them, which must NOT hold — see Commitments). The identity buffer
    * is the point at infinity. O(1) state per group regardless of
    * group size: this aggregator is safe at any scale.
    */
  class DigestAgg extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = Commitments.DigestIdentity
    def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] =
      if (in == null) buf else Commitments.digestCombine(buf, in)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Commitments.digestCombine(a, b)
    def finish(buf: Array[Byte]): Array[Byte] = buf
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  // ---------------------------------------------------------------- A6
  /** U256 SUM with overflow abort (query_erc20/block/full_node.rs:52-66:
    * overflow flag pinned false). The buffer is an unbounded BigInteger
    * (as minimal bytes), so partial sums never wrap; the 2^256 bound is
    * enforced once on the final value — equivalent to the reference's
    * per-merge check because non-negative addition is monotonic.
    */
  class U256SumAgg extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = Array.empty[Byte]
    private def big(b: Array[Byte]): BigInteger = if (b.isEmpty) BigInteger.ZERO else new BigInteger(1, b)
    def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] =
      if (in == null) buf else big(buf).add(new BigInteger(1, in)).toByteArray
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = big(a).add(big(b)).toByteArray
    def finish(buf: Array[Byte]): Array[Byte] = {
      val v = big(buf)
      if (v.compareTo(U256.Max) > 0) throw new ArithmeticException("u256 sum overflow")
      U256.toBytes32(v)
    }
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  // ---------------------------------------------------------------- A3/A4
  /** Order-sensitive Merkle root (storage/lpn, state/lpn). NOT a
    * commutative monoid — the fix (SURVEY §7.4.2): the buffer carries
    * (sortKey → leafHash) pairs and the tree is folded ONCE, in
    * `finish`, after an explicit sort by key. Shuffle merge order is
    * irrelevant because merge is map-union.
    *
    * Scale contract: state per group is O(entries-in-group) — fine for
    * the reference's group shapes (one contract-block's mapping
    * entries; thousands, not billions). For degenerate groups larger
    * than executor memory, build the root with level-wise DataFrame
    * self-joins instead (documented fallback, not needed for v0).
    */
  class MerkleRootAgg extends Aggregator[(Array[Byte], Array[Byte]), List[(Array[Byte], Array[Byte])], Array[Byte]] {
    // Buffer = unsorted (key, leaf) cons list: O(1) per-row reduce with
    // a natively-encoded (UnsafeRow array-of-struct) buffer — the r10
    // Map[hexString, leaf] + kryo form paid a 64-char hex conversion
    // and map node per ROW plus kryo (de)serialization per shuffled
    // partial, ~2 s of the 1M-entry storage-DB wall. The ONE sort
    // moves to finish (unsigned byte-lex == hex-string order, because
    // hex is order-isomorphic to unsigned bytes), where it always was
    // conceptually. Duplicate-key handling is unchanged: equal
    // duplicates collapse, a duplicate sort key with DIFFERING leaves
    // is corrupt input — fail loudly instead of committing to the
    // wrong root (the reference's tree has unique keys by
    // construction).
    def zero: List[(Array[Byte], Array[Byte])] = Nil
    def reduce(buf: List[(Array[Byte], Array[Byte])], in: (Array[Byte], Array[Byte])): List[(Array[Byte], Array[Byte])] =
      in :: buf
    def merge(a: List[(Array[Byte], Array[Byte])], b: List[(Array[Byte], Array[Byte])]): List[(Array[Byte], Array[Byte])] =
      a ::: b
    def finish(buf: List[(Array[Byte], Array[Byte])]): Array[Byte] = {
      val arr = buf.toArray
      java.util.Arrays.sort(arr, (x: (Array[Byte], Array[Byte]), y: (Array[Byte], Array[Byte])) =>
        java.util.Arrays.compareUnsigned(x._1, y._1))
      val leaves = scala.collection.immutable.IndexedSeq.newBuilder[Array[Byte]]
      leaves.sizeHint(arr.length)
      var i = 0
      while (i < arr.length) {
        if (i > 0 && java.util.Arrays.equals(arr(i)._1, arr(i - 1)._1)) {
          if (!java.util.Arrays.equals(arr(i)._2, arr(i - 1)._2))
            throw new IllegalStateException(
              s"MerkleRootAgg: duplicate sort key ${Bytes.toHex(arr(i)._1)} with differing leaves")
          // equal duplicate: collapse (identical to the map semantics)
        } else leaves += arr(i)._2
        i += 1
      }
      Commitments.merkleRoot(leaves.result())
    }
    def bufferEncoder: Encoder[List[(Array[Byte], Array[Byte])]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Array[Byte], Array[Byte])]]()
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  // ---------------------------------------------------------------- top-k
  /** Grouped top-k as an aggregate: the buffer is a bounded sorted
    * list (score desc, id asc), so map-side partial aggregation sends
    * at most k rows per group per partition across the shuffle — the
    * scalable alternative to a window `row_number` filter, which
    * shuffles and sorts EVERY row of every group. Output is the
    * ranked (score, id) list. */
  class TopKAgg(k: Int) extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {
    private def insert(buf: List[(Double, Long)], in: (Double, Long)): List[(Double, Long)] = {
      val merged = (in :: buf).sortBy { case (s, id) => (-s, id) }
      if (merged.length > k) merged.take(k) else merged
    }
    def zero: List[(Double, Long)] = Nil
    def reduce(buf: List[(Double, Long)], in: (Double, Long)): List[(Double, Long)] = insert(buf, in)
    def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
      b.foldLeft(a)(insert)
    def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf
    def bufferEncoder: Encoder[List[(Double, Long)]] = Encoders.kryo[List[(Double, Long)]]
    def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  // ---------------------------------------------------------------- St (MV coverage)
  /** Striped block-coverage mask as a mergeable aggregate: input is a
    * bit offset (`block_number - B_min`), the buffer a fixed
    * `Array[Long]` of [[graft.core.StripedMask]] lanes, merge a
    * lane-wise OR — commutative/associative, O(rangeWidth/64) state,
    * map-side combined across the shuffle. This is the batch twin of
    * the streaming MVs' keyed state, with no cap on the range width
    * (the reference's block DB is unbounded append, block/mod.rs:1-6).
    * Null offsets (e.g. a `when` guard) are skipped. */
  class StripedMaskAgg(nStripes: Int)
      extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](nStripes)
    def reduce(buf: Array[Long], in: java.lang.Long): Array[Long] =
      if (in == null) buf
      else {
        val off = in.longValue()
        require(off >= 0 && (off >> 6) < nStripes,
          s"bit offset $off outside the declared ${nStripes}-stripe range")
        buf((off >> 6).toInt) |= 1L << (off & 63)
        buf
      }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(buf: Array[Long]): Array[Long] = buf
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** striped_mask(offset) over a declared range width — St MV state */
  def stripedMask(offset: Column, nStripes: Int): Column =
    udaf(new StripedMaskAgg(nStripes), Encoders.LONG).apply(offset)

  /** digest_agg(entryDigest) — A2 as a Column aggregate */
  def digestAgg(entryDigest: Column): Column = udaf(new DigestAgg).apply(entryDigest)

  /** u256_sum(value32) — A6 as a Column aggregate */
  def u256Sum(value32: Column): Column = udaf(new U256SumAgg).apply(value32)

  /** merkle_root(sortKey, leafHash) — A3/A4 as a Column aggregate */
  def merkleRoot(sortKey: Column, leafHash: Column): Column =
    udaf(new MerkleRootAgg, Encoders.tuple(Encoders.BINARY, Encoders.BINARY)).apply(sortKey, leafHash)
}
