package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.core.StripedMask

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
  * State is one [[StripedMask]] (`Array[Long]`, one lane per 64
  * blocks) per id: the reference's block DB is unbounded append
  * (block/mod.rs:1-6,233-293), so the proven range has no a-priori
  * width cap — state is O(ids × rangeWidth/64), still independent of
  * stream length, and the lanes grow on demand when a stream extends
  * past the width a batch snapshot was taken at.
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

  private def fold(minB: Long, maxB: Long)(id: Long, it: Iterator[KeyedEntry],
      state: org.apache.spark.sql.streaming.GroupState[Array[Long]]): Coverage = {
    var mask = state.getOption.getOrElse(Array.empty[Long])
    it.foreach { e =>
      // fail fast on a misrouted block: [[keyed]] bounds the planned
      // range, but a raw feed bypassing it must not grow per-key state
      // past the declared width (one corrupt offset would otherwise
      // copyOf a multi-GB lane array inside the state store)
      require(e.block_number >= minB && e.block_number <= maxB,
        s"block ${e.block_number} outside the MV range [$minB, $maxB]")
      mask = StripedMask.set(mask, e.block_number - minB)
    }
    state.update(mask)
    Coverage(id, StripedMask.count(mask))
  }

  /** streaming coverage updates (Update output mode): one row per
    * touched id per micro-batch with its block-coverage count so far. */
  def updates(entries: Dataset[KeyedEntry], minB: Long, maxB: Long): Dataset[Coverage] = {
    import entries.sparkSession.implicits._
    entries
      .groupByKey(_.nft_id)
      .mapGroupsWithState[Array[Long], Coverage](GroupStateTimeout.NoTimeout)(fold(minB, maxB))
  }

  /** per-id coverage mask computed in BATCH over already-ingested
    * blocks — the snapshot the stream bootstraps from. One shuffle on
    * id; the mask aggregator map-side combines lane-wise ORs. */
  def snapshotState(entries: DataFrame, contract: Array[Byte], slot: Int, owner: Array[Byte],
                    minB: Long, snapshotMaxB: Long): Dataset[(Long, Array[Long])] = {
    import entries.sparkSession.implicits._
    val nS = StripedMask.stripes(snapshotMaxB - minB + 1)
    keyed(entries, contract, slot, owner, minB, snapshotMaxB)
      .toDF()
      .groupBy("nft_id")
      .agg(graft.operators.Aggregators.stripedMask(col("block_number") - minB, nS).as("mask"))
      .as[(Long, Array[Long])]
  }

  /** snapshot-then-stream handoff: keyed state starts from the batch
    * snapshot's coverage masks (mapGroupsWithState initial state) and
    * the stream continues from the NEXT block — the MV never rescans
    * the ingested history yet ends bit-identical to the full-history
    * batch answer. This is how a 100-TB backfill meets a live stream:
    * one batch pass over the past, O(delta) forever after. The stream
    * may extend past the snapshot's range width; state lanes grow on
    * demand. */
  def updatesFrom(entries: Dataset[KeyedEntry], minB: Long, maxB: Long,
                  initial: Dataset[(Long, Array[Long])]): Dataset[Coverage] = {
    import entries.sparkSession.implicits._
    entries
      .groupByKey(_.nft_id)
      .mapGroupsWithState[Array[Long], Coverage](
        GroupStateTimeout.NoTimeout,
        initial.groupByKey(_._1).mapValues(_._2))(fold(minB, maxB))
  }
}

/** Incremental maintenance of the ERC20 reward query — the streaming
  * MV form of `ZkPipeline.queryErc20` (Σ_b rate·balance/total_supply,
  * absent-user blocks contribute 0 but still count): per-query state
  * is (blocks-seen mask, user-blocks-seen mask, running U256 sum),
  * with both masks striped ([[StripedMask]]) so the proven range has
  * no width cap. The per-entry reward is computed BEFORE the stateful
  * fold by the same codegen `u256MulDiv` kernel the batch plan uses,
  * so the MV adds exactly the batch plan's per-block contributions — a
  * block's non-user entries can arrive before the user's (the block
  * counts immediately, its reward lands when the user entry does), and
  * the result matches the batch answer once the range is fully
  * witnessed.
  */
object Erc20Mv {

  final case class RewardEntry(block_number: Long, is_user: Boolean, reward: Array[Byte])
  final case class State(seen: Array[Long], userSeen: Array[Long], sum: Array[Byte])
  final case class Result(n_blocks: Long, gap_free: Boolean, result_hex: String)

  /** pre-filter + per-entry reward, mirroring the batch predicate. */
  def keyed(entries: DataFrame, contract: Array[Byte], slot: Int, user: Array[Byte],
            rate: java.math.BigInteger, totalSupply: java.math.BigInteger,
            minB: Long, maxB: Long): Dataset[RewardEntry] = {
    import entries.sparkSession.implicits._
    import graft.functions.GraftFunctions.u256MulDiv
    import graft.core.{Bytes, U256}
    entries
      .filter(col("contract") === lit(contract) && col("mapping_slot") === slot &&
        col("block_number").between(minB, maxB))
      .select(
        col("block_number"),
        (col("mapping_key") === lit(Bytes.leftPad32(user))).as("is_user"),
        u256MulDiv(lit(U256.toBytes32(rate)), col("value"),
          lit(U256.toBytes32(totalSupply))).as("reward"))
      .as[RewardEntry]
  }

  /** batch snapshot of the MV state over already-ingested blocks —
    * distributed aggregates (striped-mask lanes + the mergeable U256
    * sum aggregator), one state row out. Pair with [[updatesFrom]] for
    * the backfill→live handoff. */
  def snapshotState(entries: DataFrame, contract: Array[Byte], slot: Int, user: Array[Byte],
                    rate: java.math.BigInteger, totalSupply: java.math.BigInteger,
                    minB: Long, snapshotMaxB: Long): Dataset[(Int, State)] = {
    import entries.sparkSession.implicits._
    import graft.operators.Aggregators.stripedMask
    val nS = StripedMask.stripes(snapshotMaxB - minB + 1)
    val k = keyed(entries, contract, slot, user, rate, totalSupply, minB, snapshotMaxB)
    val zero = graft.core.U256.toBytes32(java.math.BigInteger.ZERO)
    val row = k.toDF().agg(
      stripedMask(col("block_number") - minB, nS).as("seen"),
      stripedMask(when(col("is_user"), col("block_number") - minB), nS).as("user_seen"),
      coalesce(graft.operators.Aggregators.u256Sum(when(col("is_user"), col("reward"))), lit(zero)).as("sum"))
      .head()
    entries.sparkSession.createDataset(Seq(
      0 -> State(row.getSeq[Long](0).toArray, row.getSeq[Long](1).toArray,
        Option(row.getAs[Array[Byte]](2)).getOrElse(zero))))
  }

  /** stream continuation from a batch snapshot (initial keyed state). */
  def updatesFrom(entries: Dataset[RewardEntry], minB: Long, maxB: Long,
                  initial: Dataset[(Int, State)]): Dataset[Result] = {
    import entries.sparkSession.implicits._
    entries
      .groupByKey(_ => 0)
      .mapGroupsWithState[State, Result](
        GroupStateTimeout.NoTimeout,
        initial.groupByKey(_._1).mapValues(_._2))(fold(minB, maxB))
  }

  private def fold(minB: Long, maxB: Long)(key: Int, it: Iterator[RewardEntry],
      state: org.apache.spark.sql.streaming.GroupState[State]): Result = {
    val zero = graft.core.U256.toBytes32(java.math.BigInteger.ZERO)
    var s = state.getOption.getOrElse(State(Array.empty[Long], Array.empty[Long], zero))
    it.foreach { e =>
      // same fail-fast bound as Query2Mv.fold: a misrouted block must
      // not grow the lane arrays past the declared range width
      require(e.block_number >= minB && e.block_number <= maxB,
        s"block ${e.block_number} outside the MV range [$minB, $maxB]")
      val off = e.block_number - minB
      val stripe = (off >> 6).toInt
      val userHasBit = stripe < s.userSeen.length && (s.userSeen(stripe) & (1L << (off & 63))) != 0L
      val seen = StripedMask.set(s.seen, off)
      if (e.is_user && !userHasBit) {
        val next = new java.math.BigInteger(1, s.sum)
          .add(new java.math.BigInteger(1, e.reward))
        require(next.bitLength() <= 256, "U256 overflow in streaming reward sum")
        s = State(seen, StripedMask.set(s.userSeen, off), graft.core.U256.toBytes32(next))
      } else s = State(seen, s.userSeen, s.sum)
    }
    state.update(s)
    Result(StripedMask.count(s.seen), StripedMask.contiguous(s.seen),
      graft.core.Bytes.toHex(s.sum))
  }

  def updates(entries: Dataset[RewardEntry], minB: Long, maxB: Long): Dataset[Result] = {
    import entries.sparkSession.implicits._
    entries
      .groupByKey(_ => 0)
      .mapGroupsWithState[State, Result](GroupStateTimeout.NoTimeout)(fold(minB, maxB))
  }
}
