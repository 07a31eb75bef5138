package graft.core

/** Keccak-256 (original Keccak padding 0x01, as used by Ethereum), pure
  * JVM, allocation-light. Public algorithm (FIPS 202 / Keccak
  * reference); behavioral contract mirrors the reference's in/out-of-
  * circuit keccak (`mrp2-utils/src/keccak.rs:35-267`).
  *
  * Thread-safe: each call owns its state. One call hashes ≤650-byte
  * inputs here (MPT nodes / headers), so the sponge never loops more
  * than 5 times — cheap enough to sit inside a per-row Spark UDF; if
  * profiling ever shows it hot, the natural next step is a codegen
  * `Expression` wrapping this same kernel.
  */
object Keccak {

  private val RC: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808aL, 0x8000000080008000L,
    0x000000000000808bL, 0x0000000080000001L, 0x8000000080008081L, 0x8000000000008009L,
    0x000000000000008aL, 0x0000000000000088L, 0x0000000080008009L, 0x000000008000000aL,
    0x000000008000808bL, 0x800000000000008bL, 0x8000000000008089L, 0x8000000000008003L,
    0x8000000000008002L, 0x8000000000000080L, 0x000000000000800aL, 0x800000008000000aL,
    0x8000000080008081L, 0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)

  /** rho rotation offsets, indexed by lane x + 5y */
  private val ROT: Array[Int] = Array(
    0, 1, 62, 28, 27,
    36, 44, 6, 55, 20,
    3, 10, 43, 25, 39,
    41, 45, 15, 21, 8,
    18, 2, 61, 56, 14)

  private def rotl(v: Long, n: Int): Long = if (n == 0) v else (v << n) | (v >>> (64 - n))

  /** Keccak-f[1600] permutation over 25 lanes (x + 5y layout). */
  private def f1600(a: Array[Long]): Unit = {
    val b = new Array[Long](25)
    val c = new Array[Long](5)
    val d = new Array[Long](5)
    var round = 0
    while (round < 24) {
      // theta
      var x = 0
      while (x < 5) {
        c(x) = a(x) ^ a(x + 5) ^ a(x + 10) ^ a(x + 15) ^ a(x + 20)
        x += 1
      }
      x = 0
      while (x < 5) {
        d(x) = c((x + 4) % 5) ^ rotl(c((x + 1) % 5), 1)
        var y = 0
        while (y < 5) { a(x + 5 * y) ^= d(x); y += 1 }
        x += 1
      }
      // rho + pi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          val i = x + 5 * y
          b(y + 5 * ((2 * x + 3 * y) % 5)) = rotl(a(i), ROT(i))
          y += 1
        }
        x += 1
      }
      // chi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          a(x + 5 * y) = b(x + 5 * y) ^ (~b((x + 1) % 5 + 5 * y) & b((x + 2) % 5 + 5 * y))
          y += 1
        }
        x += 1
      }
      // iota
      a(0) ^= RC(round)
      round += 1
    }
  }

  private val Rate = 136 // bytes, for 256-bit output

  /** Ethereum's keccak256 (original Keccak, pad byte 0x01). */
  def keccak256(input: Array[Byte]): Array[Byte] = {
    val state = new Array[Long](25)
    // absorb
    var off = 0
    while (input.length - off >= Rate) {
      absorbBlock(state, input, off, Rate, last = false)
      off += Rate
    }
    absorbBlock(state, input, off, input.length - off, last = true)
    // squeeze 32 bytes (< rate, single block)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 32) {
      out(i) = (state(i / 8) >>> (8 * (i % 8))).toByte
      i += 1
    }
    out
  }

  private def absorbBlock(state: Array[Long], in: Array[Byte], off: Int, len: Int, last: Boolean): Unit = {
    val block = new Array[Byte](Rate)
    System.arraycopy(in, off, block, 0, len)
    if (last) {
      block(len) = (block(len) ^ 0x01).toByte
      block(Rate - 1) = (block(Rate - 1) ^ 0x80).toByte
    }
    var i = 0
    while (i < Rate / 8) {
      var lane = 0L
      var j = 7
      while (j >= 0) { lane = (lane << 8) | (block(i * 8 + j) & 0xffL); j -= 1 }
      state(i) ^= lane
      i += 1
    }
    f1600(state)
  }
}
