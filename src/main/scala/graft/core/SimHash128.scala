package graft.core

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Fused 128-bit SimHash kernel for the synthetic 10M-doc dedup decade
  * (dd_scale_10m).
  *
  * Semantically this is EXACTLY the flat Spark-SQL formulation the
  * 1M-doc row uses (word strings from the planted (seed, uid) recipe,
  * `xxhash64` per word, per-bit majority vote), doubled to two 64-bit
  * halves — `SimHash128Spec` pins the equivalence column-for-column
  * against the SQL expression chain. It exists because the UNROLLED
  * SQL form at 128 bits is 40 hash columns + 16 lanes x 20 shift-adds
  * per row: measured on 10M rows, that projection aggregates fine
  * (~3 s) but falls off a cliff the moment its rows are materialized
  * (cache/checkpoint/shuffle all ~12-20 s extra — the row-producing
  * generated method is too wide for the JIT to compile well, and
  * `-XX:-DontCompileHugeMethods` only lifts the exclusion, not the
  * inlining budget). Rolling the same arithmetic into one compact
  * per-row kernel keeps the generated code a single call site inside
  * whole-stage codegen — the builder brief's option (b): a native
  * Expression over composing 300+ built-in ops.
  *
  * Hash derivations (all `XXH64`, the same kernel class Spark's
  * `xxhash64` evaluates):
  *   word_j (j<20)  = "w" + pmod(xxhash64(seed, j), 50000)
  *   word_20        = "u" + uid
  *   hlo_j          = xxhash64(word_j)           (string bytes)
  *   hhi_j          = xxhash64(hlo_j)            (long rehash — the
  *                    avalanche makes the halves independent at ~10x
  *                    less cost than re-hashing the string)
  *   f1 | f2        = xxhash64(hlo_1..hlo_20) | xxhash64(1L, hlo_*) —
  *                    a 128-bit exact-content fingerprint (md5-width)
  *                    computed from the already-hashed words
  *   lo | hi bit i  = majority vote of hlo_j / hhi_j bit i
  */
object SimHash128 {

  final val NWords = 20
  private final val Prime = 50000L
  private final val SqlSeed = 42L
  private final val LaneMask = 0x0101010101010101L
  private final val LoMask = 0x00FFFFFFFFFFFFFFL
  private final val VMask = 0x0001010101010101L
  // SWAR majority threshold: count + (128 - NWords/2) >= 128
  private final val Thresh = (128 - NWords / 2).toLong
  private final val AddT = {
    var t = 0L; var b = 0
    while (b < 7) { t |= Thresh << (8 * b); b += 1 }
    t
  }

  private def pmod(x: Long, m: Long): Long = { val r = x % m; if (r < 0) r + m else r }

  private def hashStr(s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), SqlSeed)
  }

  /** majority-vote fold of one 64-bit half via the same SWAR byte
    * lanes the SQL formulation uses (8 packed-byte counters, parallel
    * threshold add, top byte voted separately so the add cannot carry
    * into the sign bit). */
  private def vote(hs: Array[Long]): Long = {
    val lane = new Array[Long](8)
    var j = 0
    while (j < NWords) {
      val h = hs(j)
      var i = 0
      while (i < 8) { lane(i) += (h >>> i) & LaneMask; i += 1 }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 8) {
      val l = lane(i)
      val low7 = (((l & LoMask) + AddT) >>> 7) & VMask
      val top = ((((l >>> 56) + Thresh) >>> 7) & 1L) << 56
      sig |= (low7 | top) << i
      i += 1
    }
    sig
  }

  /** per-row kernel → Array(f1, f2, lo, hi). */
  def kernel(seed: Long, uid: Long): Array[Long] = {
    val hlo = new Array[Long](NWords)
    val hhi = new Array[Long](NWords)
    var j = 0
    while (j < NWords - 1) {
      // xxhash64(seed, j+1) folded from SQL seed 42 — j is an INT
      // literal in the SQL twin, so it goes through hashInt
      val wh = XXH64.hashInt(j + 1, XXH64.hashLong(seed, SqlSeed))
      hlo(j) = hashStr("w" + pmod(wh, Prime))
      hhi(j) = XXH64.hashLong(hlo(j), SqlSeed)
      j += 1
    }
    hlo(NWords - 1) = hashStr("u" + uid)
    hhi(NWords - 1) = XXH64.hashLong(hlo(NWords - 1), SqlSeed)

    var f1 = SqlSeed
    var f2 = XXH64.hashLong(1L, SqlSeed)
    j = 0
    while (j < NWords) {
      f1 = XXH64.hashLong(hlo(j), f1)
      f2 = XXH64.hashLong(hlo(j), f2)
      j += 1
    }
    Array(f1, f2, vote(hlo), vote(hhi))
  }
}
