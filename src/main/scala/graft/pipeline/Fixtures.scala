package graft.pipeline

import java.math.BigInteger

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{Bytes, Commitments, Keccak, MptTrie, Rlp, StorageKey, U256}

/** Reference-shaped blockchain fixtures (FIXTURES.md §A): deterministic
  * synthetic `storage_entries` + `headers`, plus *driver-side golden
  * values* computed with the pure kernels only (no Spark) — the same
  * native-vs-circuit cross-check strategy the reference uses in its
  * own tests (`storage/lpn/mod.rs:30-88` golden functions vs circuit
  * outputs; SURVEY §5).
  *
  * Two contracts: contract 0 is an NFT-style mapping (id → owner,
  * ids 1..5 held by user 0 to match the reference e2e constants,
  * `groth16-framework/tests/queries.rs:22`); contract 1 is an
  * ERC20-style mapping (holder → u256 balance varying per block).
  */
object Fixtures {

  final case class Cfg(
      firstBlock: Long = 100L,
      nBlocks: Int = 10,
      nNftIds: Int = 8,
      nHolders: Int = 8,
      nftSlot: Int = 3,
      nftLengthSlot: Int = 4,
      erc20Slot: Int = 5,
      erc20LengthSlot: Int = 6)

  def contractAddr(i: Int): Array[Byte] = Keccak.keccak256(s"contract:$i".getBytes("UTF-8")).take(20)
  def userAddr(i: Int): Array[Byte] = Keccak.keccak256(s"user:$i".getBytes("UTF-8")).take(20)

  /** NFT id → owner (ids 1..5 → user 0; others → per-id user). */
  def nftOwner(id: Int): Array[Byte] = if (id <= 5) userAddr(0) else userAddr(id)

  /** holder h's balance at block b (deterministic, block-varying). */
  def erc20Balance(h: Int, b: Long, cfg: Cfg): BigInteger =
    BigInteger.valueOf((h + 1).toLong * 1000000L + (b - cfg.firstBlock) * 10L)

  final case class Entry(
      block_number: Long,
      contract: Array[Byte],
      mapping_slot: Int,
      length_slot: Int,
      mapping_key: Array[Byte],
      value: Array[Byte])

  final case class HeaderRow(
      block_number: Long,
      header_rlp: Array[Byte],
      block_hash: Array[Byte],
      parent_hash: Array[Byte])

  def entriesSeq(cfg: Cfg): Seq[Entry] = {
    val nft = for {
      i <- 0 until cfg.nBlocks
      b = cfg.firstBlock + i
      id <- 1 to cfg.nNftIds
    } yield Entry(b, contractAddr(0), cfg.nftSlot, cfg.nftLengthSlot,
      Bytes.leftPad32(Bytes.beBytes(id.toLong, 4)), Bytes.leftPad32(nftOwner(id)))
    val erc20 = for {
      i <- 0 until cfg.nBlocks
      b = cfg.firstBlock + i
      h <- 0 until cfg.nHolders
    } yield Entry(b, contractAddr(1), cfg.erc20Slot, cfg.erc20LengthSlot,
      Bytes.leftPad32(userAddr(h)), U256.toBytes32(erc20Balance(h, b, cfg)))
    nft ++ erc20
  }

  // ---------------------------------------------------------- goldens
  /** storage-DB golden per (block, contract): (n, digest, root) —
    * leaves sorted by mapping_key hex (SURVEY §7.4.2 ordering
    * convention). */
  def goldenStorageDb(cfg: Cfg): Map[(Long, String), (Long, Array[Byte], Array[Byte])] =
    entriesSeq(cfg).groupBy(e => (e.block_number, Bytes.toHex(e.contract))).map { case (k, es) =>
      val sorted = es.sortBy(e => Bytes.toHex(e.mapping_key))
      val root = Commitments.merkleRoot(sorted.map(e => Commitments.mappingLeafHash(e.mapping_key, e.value)).toIndexedSeq)
      val digest = es.map(e => Commitments.mappingLeafDigest(e.mapping_key, e.value))
        .foldLeft(Commitments.DigestIdentity)(Commitments.digestCombine)
      k -> ((es.size.toLong, digest, root))
    }

  /** state-DB golden per block: leaves sorted by contract hex. */
  def goldenStateDb(cfg: Cfg): Map[Long, Array[Byte]] = {
    val storage = goldenStorageDb(cfg)
    val slots = Map(
      Bytes.toHex(contractAddr(0)) -> ((cfg.nftSlot, cfg.nftLengthSlot)),
      Bytes.toHex(contractAddr(1)) -> ((cfg.erc20Slot, cfg.erc20LengthSlot)))
    storage.groupBy(_._1._1).map { case (b, m) =>
      val leaves = m.toSeq.sortBy(_._1._2).map { case ((_, cHex), (_, _, root)) =>
        val (ms, ls) = slots(cHex)
        Commitments.stateLeafHash(Bytes.fromHex(cHex), ms, ls, root)
      }
      b -> Commitments.merkleRoot(leaves.toIndexedSeq)
    }
  }

  /** headers chained by parent hash; the embedded stateRoot (field 3)
    * is the *Ethereum* state root — the account-trie root — which the
    * J3 block-linking join verifies account proofs against. Header
    * layout: 9-field RLP list with the Ethereum positions the
    * extractor reads (parentHash@0, stateRoot@3, number@8). */
  def headersSeq(cfg: Cfg): Seq[HeaderRow] = {
    val stateRoots = ethStateRoots(cfg)
    var parent = new Array[Byte](32)
    (0 until cfg.nBlocks).map { i =>
      val b = cfg.firstBlock + i
      val fields = Vector[Rlp.Item](
        Rlp.Str(parent), // 0 parentHash
        Rlp.Str(new Array[Byte](32)), // 1 unclesHash
        Rlp.Str(new Array[Byte](20)), // 2 coinbase
        Rlp.Str(stateRoots(b)), // 3 stateRoot
        Rlp.Str(new Array[Byte](32)), // 4 txRoot
        Rlp.Str(new Array[Byte](32)), // 5 receiptRoot
        Rlp.Str(new Array[Byte](8)), // 6 bloom (shrunk)
        Rlp.Str(Array.empty), // 7 difficulty = 0
        Rlp.Str(if (b == 0) Array.empty else Bytes.beBytes(b, 8).dropWhile(_ == 0))) // 8 number
      val rlp = Rlp.encode(Rlp.Lst(fields))
      val hash = Keccak.keccak256(rlp)
      val row = HeaderRow(b, rlp, hash, parent)
      parent = hash
      row
    }
  }

  /** block-DB golden: leaf hashes in block order + final root. */
  def goldenBlockDb(cfg: Cfg): (Seq[Array[Byte]], Array[Byte]) = {
    val stateRoots = goldenStateDb(cfg)
    val leaves = headersSeq(cfg).map(h => Commitments.blockLeafHash(h.block_number, h.block_hash, stateRoots(h.block_number)))
    (leaves, Commitments.merkleRoot(leaves.toIndexedSeq))
  }

  /** ERC20 golden: Σ_b rate·balance(user,b)/totalSupply over the
    * clamped block range, BigInteger arithmetic (full-precision product
    * before the divide, like the circuit). */
  def goldenErc20Sum(cfg: Cfg, user: Int, rate: BigInteger, totalSupply: BigInteger,
      minB: Long, maxB: Long): BigInteger = {
    val lo = math.max(minB, cfg.firstBlock)
    val hi = math.min(maxB, cfg.firstBlock + cfg.nBlocks - 1)
    (lo to hi).foldLeft(BigInteger.ZERO) { (acc, b) =>
      val bal = if (user < cfg.nHolders) erc20Balance(user, b, cfg) else BigInteger.ZERO
      acc.add(rate.multiply(bal).divide(totalSupply))
    }
  }

  // ---------------------------------------------------------- storage proofs (A2)
  final case class ProofRow(
      block_number: Long,
      contract: Array[Byte],
      mapping_slot: Int,
      mapping_key: Array[Byte],
      mpt_key: Array[Byte],
      nodes: Seq[Array[Byte]],
      mpt_root: Array[Byte],
      value: Array[Byte])

  /** storage MPT per (block, contract) over its mapping entries PLUS
    * the simple length slot (reference stage 2, `length_extract.rs`:
    * the mapping's declared length lives at its own storage slot in
    * the same trie). */
  private def storageTries(cfg: Cfg): Map[(Long, String), MptTrie.Node] =
    entriesSeq(cfg).groupBy(e => (e.block_number, Bytes.toHex(e.contract))).map { case (k, es) =>
      val lengthSlot = es.head.length_slot
      val lengthEntry = (StorageKey.simpleSlotMptKey(lengthSlot),
        Bytes.leftPad32(Bytes.beBytes(es.size.toLong, 8)))
      k -> MptTrie.build(es.map(e =>
        (StorageKey.mappingMptKey(e.mapping_key, e.mapping_slot), e.value)) :+ lengthEntry)
    }

  /** EIP-1186-shaped storage proofs: one MPT per (block, contract)
    * over the mapping entries (key = keccak'd slot location), one
    * proof path per entry (FIXTURES.md §A2). */
  def storageProofsSeq(cfg: Cfg): Seq[ProofRow] = {
    val tries = storageTries(cfg)
    entriesSeq(cfg).map { e =>
      val trie = tries((e.block_number, Bytes.toHex(e.contract)))
      val mk = StorageKey.mappingMptKey(e.mapping_key, e.mapping_slot)
      ProofRow(e.block_number, e.contract, e.mapping_slot, e.mapping_key, mk,
        MptTrie.proof(trie, mk), MptTrie.rootHash(trie), e.value)
    }
  }

  final case class LengthProofRow(
      block_number: Long,
      contract: Array[Byte],
      length_slot: Int,
      mpt_key: Array[Byte],
      nodes: Seq[Array[Byte]],
      mpt_root: Array[Byte])

  /** proof of the simple length slot per (block, contract) — the input
    * to the LengthExtract stage (§3.1 stage 2). */
  def lengthProofsSeq(cfg: Cfg): Seq[LengthProofRow] = {
    val tries = storageTries(cfg)
    entriesSeq(cfg).groupBy(e => (e.block_number, Bytes.toHex(e.contract))).toSeq.map {
      case ((b, cHex), es) =>
        val trie = tries((b, cHex))
        val mk = StorageKey.simpleSlotMptKey(es.head.length_slot)
        LengthProofRow(b, Bytes.fromHex(cHex), es.head.length_slot, mk,
          MptTrie.proof(trie, mk), MptTrie.rootHash(trie))
    }
  }

  def lengthProofs(spark: SparkSession, cfg: Cfg = Cfg()): DataFrame = {
    import spark.implicits._
    spark.createDataset(lengthProofsSeq(cfg)).toDF()
  }

  // ---------------------------------------------------------- account proofs (A3)
  final case class AccountProofRow(
      block_number: Long,
      contract: Array[Byte],
      account_mpt_key: Array[Byte],
      nodes: Seq[Array[Byte]],
      eth_state_root: Array[Byte])

  /** account leaf payload: RLP([nonce, balance, storageRoot, codeHash])
    * (state-trie convention; `state/block_linking/account/leaf.rs`). */
  def accountPayload(storageRoot: Array[Byte], codeSeed: String): Array[Byte] =
    Rlp.encode(Rlp.Lst(Vector(
      Rlp.Str(Array(1.toByte)), // nonce
      Rlp.Str(Array.empty), // balance 0
      Rlp.Str(storageRoot),
      Rlp.Str(Keccak.keccak256(codeSeed.getBytes("UTF-8"))))))

  /** per-block state MPT: the two fixture contracts (storage roots =
    * their storage-trie roots) + noise accounts; key = keccak(addr). */
  private def accountTrie(cfg: Cfg, b: Long, tries: Map[(Long, String), MptTrie.Node]): MptTrie.Node = {
    val contracts = (0 until 2).map { i =>
      val addr = contractAddr(i)
      val sroot = MptTrie.rootHash(tries((b, Bytes.toHex(addr))))
      (Keccak.keccak256(addr), accountPayload(sroot, s"code:$i"))
    }
    val noise = (0 until 4).map { j =>
      val addr = userAddr(40 + j)
      (Keccak.keccak256(addr), accountPayload(Keccak.keccak256(s"fake-root:$j".getBytes), s"noise:$j"))
    }
    MptTrie.buildRaw(contracts ++ noise)
  }

  /** Ethereum-side state root per block (what headers embed). */
  def ethStateRoots(cfg: Cfg): Map[Long, Array[Byte]] = {
    val tries = storageTries(cfg)
    (0 until cfg.nBlocks).map { i =>
      val b = cfg.firstBlock + i
      b -> MptTrie.rootHash(accountTrie(cfg, b, tries))
    }.toMap
  }

  def accountProofsSeq(cfg: Cfg): Seq[AccountProofRow] = {
    val tries = storageTries(cfg)
    for {
      i <- 0 until cfg.nBlocks
      b = cfg.firstBlock + i
      at = accountTrie(cfg, b, tries)
      c <- 0 until 2
    } yield {
      val addr = contractAddr(c)
      val ak = Keccak.keccak256(addr)
      AccountProofRow(b, addr, ak, MptTrie.proof(at, ak), MptTrie.rootHash(at))
    }
  }

  // ---------------------------------------------------------- Spark side
  def entries(spark: SparkSession, cfg: Cfg = Cfg()): DataFrame = {
    import spark.implicits._
    spark.createDataset(entriesSeq(cfg)).toDF()
  }

  def storageProofs(spark: SparkSession, cfg: Cfg = Cfg()): DataFrame = {
    import spark.implicits._
    spark.createDataset(storageProofsSeq(cfg)).toDF()
  }

  def accountProofs(spark: SparkSession, cfg: Cfg = Cfg()): DataFrame = {
    import spark.implicits._
    spark.createDataset(accountProofsSeq(cfg)).toDF()
  }

  /** quadratic-Lehmer mix of `k` (a SQL expression string) into
    * [0, mod) — plain BIGINT `*`/`%` both Spark and DuckDB evaluate
    * identically with no overflow (every intermediate < 2^62), so
    * fixture-derived pseudo-randomness is oracle-derivable. */
  def portableMixSql(k: String, mod: Long): String = {
    val M = 2147483647L
    // CAST keeps a literal k in BIGINT — DuckDB would otherwise stay
    // in INT32 and overflow at the second Lehmer step
    val h1 = s"((CAST($k AS BIGINT) * 1299709 + 104729) % $M)"
    val h2 = s"(($h1 * 48271) % $M)"
    s"((($h2 * $h2 + $h1) % $M) % $mod)"
  }

  /** owner 1..20 for key index `k` via [[portableMixSql]]. */
  def scaledOwnerSql(k: String): String =
    s"(${portableMixSql(k, 20)} + 1)"

  /** driver-side Scala twin of [[scaledOwnerSql]] (same Lehmer mix,
    * same no-overflow bound: every intermediate < 2^62) — lets the
    * pure-kernel golden path re-derive scaled-fixture ownership
    * without Spark. FixturesSpec pins it equal to the SQL form. */
  def scaledOwner(k: Long): Long = {
    val M = 2147483647L
    val h1 = (k * 1299709L + 104729L) % M
    val h2 = (h1 * 48271L) % M
    ((h2 * h2 + h1) % M) % 20L + 1L
  }

  /** Distributed synthetic `storage_entries` at arbitrary scale (for
    * ingest-throughput benchmarking): generated from `spark.range`, so
    * the data is born partitioned on the executors — no driver-side
    * materialization, the shape a real 100 TB backfill would have. */
  def entriesScaled(spark: SparkSession, nBlocks: Int, keysPerBlock: Int,
      nContracts: Int = 1): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions.longToBytes32
    // contract addresses as a tiny broadcast lookup (20-byte binaries
    // can't be built with pure column ops)
    val addrs = array((0 until nContracts).map(i => lit(contractAddr(i))): _*)
    // exact integer arithmetic throughout (`div`, not `/`): double
    // division wobbles in the last bits as the block number grows, so
    // a double-typed key index fed to the owner hash silently made
    // "the same key" hash differently in different blocks — breaking
    // both the constant-ownership property below and the content-
    // determinism the commitment scale checks assert (identical
    // per-block content must produce identical roots)
    val keyIdxSql = s"((id div $nContracts) % ${keysPerBlock.toLong})"
    spark.range(nBlocks.toLong * keysPerBlock * nContracts)
      .select(
        (lit(100L) + expr(s"id div ${keysPerBlock.toLong * nContracts}")).as("block_number"),
        element_at(addrs, (pmod(col("id"), lit(nContracts.toLong)) + 1).cast("int")).as("contract"),
        lit(3).as("mapping_slot"),
        lit(4).as("length_slot"),
        longToBytes32(expr(keyIdxSql) + 1).as("mapping_key"),
        // owner is a PORTABLE function of the KEY (constant across
        // blocks): ownership is consistent over the whole range, so
        // the scaled table exercises Query2's all-blocks qualification
        // for real — and the DuckDB oracle re-derives it exactly
        longToBytes32(expr(scaledOwnerSql(keyIdxSql))).as("value"))
  }

  def headers(spark: SparkSession, cfg: Cfg = Cfg()): DataFrame = {
    import spark.implicits._
    spark.createDataset(headersSeq(cfg)).toDF()
  }
}
