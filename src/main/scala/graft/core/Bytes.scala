package graft.core

/** Byte-vector gadget analogs (reference: `mrp2-utils/src/array.rs`,
  * `eth.rs:221-239`, `utils.rs:73-180`): big-endian left-padding,
  * hex, u32 limb packing. Pure JVM, shared by UDFs and aggregators.
  */
object Bytes {

  /** `left_pad32` (eth.rs:221-239): big-endian pad/truncate to 32 bytes. */
  def leftPad32(in: Array[Byte]): Array[Byte] = leftPad(in, 32)

  def leftPad(in: Array[Byte], n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    if (in.length >= n) System.arraycopy(in, in.length - n, out, 0, n)
    else System.arraycopy(in, 0, out, n - in.length, in.length)
    out
  }

  def toHex(b: Array[Byte]): String = {
    val sb = new StringBuilder(b.length * 2)
    b.foreach(x => sb.append(f"${x & 0xff}%02x"))
    sb.toString
  }

  def fromHex(s: String): Array[Byte] = {
    val t = if (s.startsWith("0x")) s.substring(2) else s
    val padded = if (t.length % 2 == 1) "0" + t else t
    padded.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
  }

  /** big-endian fixed-width encoding of a non-negative long */
  def beBytes(v: Long, width: Int): Array[Byte] = {
    val out = new Array[Byte](width)
    var i = width - 1
    var x = v
    while (i >= 0) { out(i) = (x & 0xff).toByte; x >>>= 8; i -= 1 }
    out
  }

  def beLong(b: Array[Byte]): Long = {
    var v = 0L
    b.foreach(x => v = (v << 8) | (x & 0xffL))
    v
  }

  /** u8→u32 LE limb packing (`utils.rs:122-158`): groups of 4 bytes,
    * little-endian within the limb; input padded to a 4-multiple. */
  def packU32LE(in: Array[Byte]): Array[Int] = {
    val n = (in.length + 3) / 4
    val out = new Array[Int](n)
    var i = 0
    while (i < in.length) {
      out(i / 4) |= (in(i) & 0xff) << (8 * (i % 4))
      i += 1
    }
    out
  }

  def concat(parts: Array[Byte]*): Array[Byte] = {
    val out = new Array[Byte](parts.map(_.length).sum)
    var off = 0
    parts.foreach { p => System.arraycopy(p, 0, out, off, p.length); off += p.length }
    out
  }

  /** Rabin-Karp polynomial rolling hash over a sliding byte window
    * (document fingerprinting, builder brief): returns one 64-bit hash
    * per window position, computed incrementally in O(n). Base/modulus
    * arithmetic in Long with the modulus < 2^31 so products never
    * overflow. */
  def rollingHashes(in: Array[Byte], window: Int): Array[Long] = {
    require(window > 0)
    if (in.length < window) return Array.empty
    val B = 257L
    val M = 1000000007L
    var pow = 1L // B^(window-1) mod M
    var i = 1
    while (i < window) { pow = pow * B % M; i += 1 }
    var h = 0L
    i = 0
    while (i < window) { h = (h * B + (in(i) & 0xff)) % M; i += 1 }
    val out = new Array[Long](in.length - window + 1)
    out(0) = h
    i = window
    while (i < in.length) {
      h = ((h - (in(i - window) & 0xff) * pow % M + M) % M * B + (in(i) & 0xff)) % M
      out(i - window + 1) = h
      i += 1
    }
    out
  }

  /** winnowing-style fingerprint: minimum rolling hash over the doc. */
  def minRollingHash(in: Array[Byte], window: Int): Long = {
    val hs = rollingHashes(in, window)
    if (hs.isEmpty) -1L else hs.min
  }

  def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length, s"xor length mismatch ${a.length} vs ${b.length}")
    val out = new Array[Byte](a.length)
    var i = 0
    while (i < a.length) { out(i) = (a(i) ^ b(i)).toByte; i += 1 }
    out
  }
}
