package graft.pipeline

import java.math.BigInteger

import org.apache.spark.sql.SparkSession

import graft.core.{Bytes, Keccak}

/** Driver-oracle ground truth for the zk fixture queries.
  *
  * The crypto columns (digests, Merkle roots, keccak hashes) are not
  * SQL-expressible, but the *relational spine* of the reference's two
  * query plans is plain SQL (`query2/revelation/circuit.rs:62-169`,
  * `query_erc20/revelation/circuit.rs:74-97`): filter → per-key
  * block-count → having → sort → limit, and clamp → per-block max →
  * gap-free sum. This object materializes the PURE-SCALA fixture rows
  * (computed from [[Fixtures]]' driver-side seqs — no Spark
  * expressions involved, so nothing the Spark plans compute is fed
  * back to the oracle) to parquet under `target/`, and the zk
  * queries' DuckDB oracle SQL reads them via `read_parquet`.
  *
  * Convenience columns are plain types DuckDB can aggregate:
  * hex strings for byte columns (uppercase, matching Spark's `hex()`),
  * `nft_id` (big-endian u32 in the mapping key's last 4 bytes, the id
  * layout `query2/storage/leaf.rs` fixes) and `balance` (the u256
  * value as a BIGINT when it fits — always true for the ERC20 fixture
  * balances; NULL for the NFT owner-address values).
  */
object FixtureStore {

  val cfg: Fixtures.Cfg = Fixtures.Cfg()

  final case class EntryRel(
      block_number: Long,
      contract: String,
      mapping_slot: Int,
      length_slot: Int,
      mapping_key: String,
      value: String,
      nft_id: Long,
      balance: Option[Long])

  final case class HeaderRel(block_number: Long, block_hash: String, parent_hash: String)

  /** uppercase hex — identical to Spark's `hex()` rendering. */
  private def hx(b: Array[Byte]): String = b.map(x => f"$x%02X").mkString

  lazy val entriesRel: Seq[EntryRel] = Fixtures.entriesSeq(cfg).map { e =>
    val id = new BigInteger(1, e.mapping_key.takeRight(4)).longValueExact()
    val v = new BigInteger(1, e.value)
    EntryRel(e.block_number, hx(e.contract), e.mapping_slot, e.length_slot,
      hx(e.mapping_key), hx(e.value), id,
      if (v.bitLength <= 62) Some(v.longValueExact()) else None)
  }

  lazy val headersRel: Seq[HeaderRel] = Fixtures.headersSeq(cfg).map { h =>
    HeaderRel(h.block_number, hx(h.block_hash), hx(h.parent_hash))
  }

  /** content-fingerprinted location: a fixture change can never serve
    * a stale dump (same discipline as the zk_ingest_rpc tmp cache). */
  lazy val dir: String = {
    val canon = (entriesRel.map(e =>
      s"${e.block_number}|${e.contract}|${e.mapping_slot}|${e.length_slot}|${e.mapping_key}|${e.value}") ++
      headersRel.map(h => s"${h.block_number}|${h.block_hash}|${h.parent_hash}")).mkString("\n")
    val tag = Bytes.toHex(Keccak.keccak256(canon.getBytes("UTF-8")).take(8))
    new java.io.File(s"target/zkfix_$tag").getAbsolutePath
  }

  /** DuckDB-side relations (absolute paths — the driver's DuckDB
    * process may run with a different cwd). */
  def entriesPq: String = s"read_parquet('$dir/entries/*.parquet')"
  def headersPq: String = s"read_parquet('$dir/headers/*.parquet')"

  // SQL literals the oracle filters need (driver-side pure Scala).
  def contractHex(i: Int): String = hx(Fixtures.contractAddr(i))
  def userPad32Hex(i: Int): String = hx(Bytes.leftPad32(Fixtures.userAddr(i)))

  /** idempotent write-once (marker-gated; synchronized — Verify runs
    * queries sequentially, but Bench may share the JVM). */
  def ensure(spark: SparkSession): Unit = synchronized {
    val marker = new java.io.File(dir, "_OK")
    if (!marker.exists()) {
      import spark.implicits._
      spark.createDataset(entriesRel).toDF().coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/entries")
      spark.createDataset(headersRel).toDF().coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/headers")
      marker.createNewFile()
    }
  }
}
