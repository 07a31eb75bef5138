package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Incremental (streaming) maintenance of the Query2 answer — the
  * materialized-view form of `ZkPipeline.query2` (reference semantics:
  * an NFT id qualifies iff the watched owner held it in EVERY block of
  * the proven range, `query2/storage/mod.rs` path): storage entries
  * stream in block by block; per-id keyed state tracks WHICH blocks of
  * the range have witnessed ownership, and each update emits the id's
  * current coverage count. The serving filter `n_blocks == range
  * width` reproduces the batch answer at every point in the stream —
  * no rescan of prior blocks, ever.
  *
  * State is one Long bitmask per id (the proven range is bounded and
  * small in the reference — depth-2 block DB = 4 blocks in its e2e
  * tests; extend to Array[Long] lanes for wider ranges), so state size
  * is O(ids), independent of stream length.
  */
object Query2Mv {

  final case class KeyedEntry(nft_id: Long, block_number: Long)
  final case class Coverage(nft_id: Long, n_blocks: Long)

  /** pre-filter + key extraction, mirroring the batch plan's predicate
    * (contract, slot, owner, range) and id derivation. */
  def keyed(entries: DataFrame, contract: Array[Byte], slot: Int, owner: Array[Byte],
            minB: Long, maxB: Long): Dataset[KeyedEntry] = {
    import entries.sparkSession.implicits._
    import graft.functions.GraftFunctions.bytesToLong
    entries
      .filter(col("contract") === lit(contract) && col("mapping_slot") === slot &&
        col("block_number").between(minB, maxB) &&
        col("value") === lit(graft.core.Bytes.leftPad32(owner)))
      .select(
        bytesToLong(expr("substring(mapping_key, 29, 4)")).as("nft_id"),
        col("block_number"))
      .as[KeyedEntry]
  }

  /** streaming coverage updates (Update output mode): one row per
    * touched id per micro-batch with its block-coverage count so far. */
  def updates(entries: Dataset[KeyedEntry], minB: Long, maxB: Long): Dataset[Coverage] = {
    require(maxB - minB + 1 <= 64, "single-Long bitmask covers ranges up to 64 blocks")
    import entries.sparkSession.implicits._
    entries
      .groupByKey(_.nft_id)
      .mapGroupsWithState[Long, Coverage](GroupStateTimeout.NoTimeout) {
        (id, it, state) =>
          var mask = state.getOption.getOrElse(0L)
          it.foreach { e => mask |= 1L << (e.block_number - minB) }
          state.update(mask)
          Coverage(id, java.lang.Long.bitCount(mask).toLong)
      }
  }
}
