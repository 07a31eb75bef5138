package graft.operators

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}

/** Distributed Bloom-filter runtime filter — the join-pruning trick
  * that matters at 100 TB: build a fixed-size bit array over the
  * *small* join side with a mergeable `Aggregator` (reduce sets bits,
  * merge ORs — fully commutative, so map-side partials and shuffle
  * order cannot change the bits), ship the finished filter to every
  * executor as a plan constant, and drop non-matching fact rows at the
  * scan — *before* they pay the shuffle/join. The exact join then runs
  * on the survivors only, so Bloom false positives cannot leak into
  * the result: the prefilter changes cost, never semantics.
  *
  * This is the same shape as Spark's own `InjectRuntimeFilter` /
  * DPP subquery filters, expressed as a first-class operator with an
  * explicitly sized filter. Sizing: `numBits = 1<<20` (128 KiB) with
  * `k = 5` holds ~10⁵ keys at fpp ≈ 10⁻⁴; the filter is O(1) per
  * executor regardless of fact-side size, where a broadcast hash set
  * would be O(distinct keys).
  *
  * Membership is a native codegen expression (`BloomMightContainExpr`)
  * so the prefilter stays inside whole-stage codegen; the bit array
  * rides along as a codegen reference object, not a literal.
  *
  * Bits are indexed by Kirsch–Mitzenhauer double hashing
  * (index_i = h1 + i·h2 mod m) over two murmur3 hashes of the key
  * bytes — deterministic across JVMs, so build and probe can happen
  * on different executors (or different jobs) and still agree.
  */
object BloomFilter {

  /** serialized layout: [0..3] numHashes (BE int), [4..] bit array. */
  def numHashesOf(filter: Array[Byte]): Int =
    ((filter(0) & 0xff) << 24) | ((filter(1) & 0xff) << 16) | ((filter(2) & 0xff) << 8) | (filter(3) & 0xff)

  private def indexes(item: Array[Byte], numBits: Long, numHashes: Int): Array[Long] = {
    val h1 = MurmurHash3.bytesHash(item, 0x9747b28c).toLong & 0xffffffffL
    val h2 = MurmurHash3.bytesHash(item, 0x5bd1e995).toLong & 0xffffffffL
    Array.tabulate(numHashes)(i => java.lang.Math.floorMod(h1 + i * h2, numBits))
  }

  /** static kernel used by both eval paths and generated code. */
  def mightContain(filter: Array[Byte], item: Array[Byte]): Boolean = {
    if (item == null) return false
    val k = numHashesOf(filter)
    val numBits = (filter.length - 4).toLong * 8L
    val idx = indexes(item, numBits, k)
    var i = 0
    while (i < idx.length) {
      val bit = idx(i)
      if ((filter(4 + (bit >>> 3).toInt) & (1 << (bit & 7L).toInt)) == 0) return false
      i += 1
    }
    true
  }

  /** Mergeable build aggregate: buffer = bit array as longs. */
  class BloomAgg(numBits: Int, numHashes: Int)
      extends Aggregator[Array[Byte], Array[Long], Array[Byte]] {
    require(numBits % 64 == 0, "numBits must be a multiple of 64")
    def zero: Array[Long] = new Array[Long](numBits / 64)
    def reduce(buf: Array[Long], item: Array[Byte]): Array[Long] = {
      if (item != null) {
        val idx = indexes(item, numBits.toLong, numHashes)
        var i = 0
        while (i < idx.length) { buf((idx(i) >>> 6).toInt) |= 1L << (idx(i) & 63L).toInt; i += 1 }
      }
      buf
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(buf: Array[Long]): Array[Byte] = {
      val out = new Array[Byte](4 + numBits / 8)
      out(0) = (numHashes >>> 24).toByte; out(1) = (numHashes >>> 16).toByte
      out(2) = (numHashes >>> 8).toByte; out(3) = numHashes.toByte
      var i = 0
      while (i < buf.length) {
        var j = 0
        while (j < 8) { out(4 + i * 8 + j) = (buf(i) >>> (8 * j)).toByte; j += 1 }
        i += 1
      }
      out
    }
    def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** bloom_agg(keyBytes) → serialized filter (one row). */
  def bloomAgg(key: Column, numBits: Int = 1 << 20, numHashes: Int = 5): Column =
    udaf(new BloomAgg(numBits, numHashes)).apply(key)

  /** might_contain(filter, keyBytes) as a codegen expression. */
  def mightContainCol(filter: Array[Byte], key: Column): Column = {
    import org.apache.spark.sql.GraftBridge.{column => toCol, expression => toExpr}
    toCol(BloomMightContainExpr(filter, toExpr(key)))
  }

  /** Canonical key bytes for any key column (build and probe must use
    * the same canonicalization — string form covers mixed types). */
  def keyBytes(c: Column): Column = c.cast("string").cast("binary")

  /** Bloom-prefiltered semi join: exact results (the residual semi
    * join removes false positives), but the fact side is cut at the
    * scan. The single collected row is the filter itself — O(numBits),
    * independent of either table's cardinality.
    *
    * The dim subquery feeds two consumers (the bloom build, which
    * executes eagerly here, and the residual broadcast at result
    * execution) — the distinct key frame is persisted so the dim
    * scan+filter runs once, then RELEASED before returning: the
    * residual join gets the collected key rows as a local relation
    * (broadcast-sized by assumption), so repeated semiJoin calls leak
    * nothing into executor storage memory. */
  def semiJoin(
      fact: DataFrame,
      factKey: Column,
      dim: DataFrame,
      dimKey: Column,
      numBits: Int = 1 << 20,
      numHashes: Int = 5): DataFrame = {
    val dimKeys = dim.select(dimKey.as("__bloom_key")).distinct().persist()
    val filter =
      try dimKeys
        .select(bloomAgg(keyBytes(col("__bloom_key")), numBits, numHashes).as("bf"))
        .head().getAs[Array[Byte]](0)
      catch { case t: Throwable => dimKeys.unpersist(); throw t }
    // the residual join no longer needs the cache once its broadcast is
    // built; collect the key rows now and hand the join a local
    // relation so the cached frame can be released immediately instead
    // of leaking into executor storage for the session's lifetime
    // (the dim side is broadcast-sized by assumption)
    val spark = dim.sparkSession
    val keyRows = dimKeys.collect().toIndexedSeq
    dimKeys.unpersist()
    val localDim = spark.createDataFrame(
      spark.sparkContext.parallelize(keyRows, 1), dimKeys.schema)
    fact
      .filter(mightContainCol(filter, keyBytes(factKey)))
      .join(broadcast(localDim), factKey === col("__bloom_key"), "left_semi")
  }
}

/** `bloom_might_contain(filter, key)` — BooleanType, codegen. The
  * filter bytes are a constructor parameter (shipped via
  * `ctx.addReferenceObj`), NOT a child literal: a 128 KiB literal in
  * the expression tree would bloat every plan string and defeat
  * canonicalization. */
case class BloomMightContainExpr(filter: Array[Byte], child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a binary key argument")
  override def prettyName: String = "bloom_might_contain"
  override protected def nullSafeEval(input: Any): Any =
    BloomFilter.mightContain(filter, input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilterBits", filter, "byte[]")
    defineCodeGen(ctx, ev, c => s"graft.operators.BloomFilter.mightContain($ref, $c)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}
