package graft.core

import java.math.BigInteger

/** U256 arithmetic with explicit overflow / div-by-zero flags, the
  * analog of the reference's 8×u32-limb gadget
  * (`mrp2-utils/src/u256.rs:43-355`). The reference *pins* the
  * overflow flag false — arithmetic must abort, never wrap — so every
  * op returns its flag and the Spark layer maps a raised flag to
  * `raise_error` (SURVEY §7.4.1).
  *
  * Representation at rest: 32-byte big-endian BinaryType columns
  * (DecimalType(38) tops out below 2^127). BigInteger kernels keep
  * exactness; promote to limb arithmetic only if bench demands.
  */
object U256 {
  val Modulus: BigInteger = BigInteger.ONE.shiftLeft(256)
  val Max: BigInteger = Modulus.subtract(BigInteger.ONE)

  def fromBytes32(b: Array[Byte]): BigInteger = new BigInteger(1, b)

  def toBytes32(v: BigInteger): Array[Byte] = {
    require(v.signum >= 0 && v.compareTo(Max) <= 0, s"out of u256 range: $v")
    Bytes.leftPad32(v.toByteArray.dropWhile(_ == 0))
  }

  /** (sum, overflowed) — `add_u256` (u256.rs:43-110) */
  def add(a: BigInteger, b: BigInteger): (BigInteger, Boolean) = {
    val s = a.add(b)
    if (s.compareTo(Max) > 0) (s.subtract(Modulus), true) else (s, false)
  }

  /** (diff, borrowed) */
  def sub(a: BigInteger, b: BigInteger): (BigInteger, Boolean) = {
    val d = a.subtract(b)
    if (d.signum < 0) (d.add(Modulus), true) else (d, false)
  }

  /** (product, overflowed) */
  def mul(a: BigInteger, b: BigInteger): (BigInteger, Boolean) = {
    val p = a.multiply(b)
    (p.and(Max), p.compareTo(Max) > 0)
  }

  /** (quotient, divByZero) — quotient 0 on div-by-zero, flag raised
    * (mirrors the circuit's explicit div-zero wire). */
  def div(a: BigInteger, b: BigInteger): (BigInteger, Boolean) =
    if (b.signum == 0) (BigInteger.ZERO, true) else (a.divide(b), false)

  def cmp(a: BigInteger, b: BigInteger): Int = a.compareTo(b)
  def isZero(a: BigInteger): Boolean = a.signum == 0

  // ---------------------------------------- byte-level kernel forwarders
  // (static entry points the codegen Expressions call directly on the
  // unsafe row's byte arrays — no encoder round-trip)

  /** a + b with overflow abort (overflow flag pinned false,
    * u256.rs:43-110). */
  def addBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val (s, ovf) = add(fromBytes32(a), fromBytes32(b))
    if (ovf) throw new ArithmeticException("u256 add overflow")
    toBytes32(s)
  }

  /** fused (a*b)/c at full intermediate precision with div-zero and
    * overflow abort (query_erc20/storage/leaf.rs:57-116). */
  def mulDivBytes(a: Array[Byte], b: Array[Byte], c: Array[Byte]): Array[Byte] = {
    val den = fromBytes32(c)
    if (den.signum == 0) throw new ArithmeticException("u256 division by zero")
    val q = fromBytes32(a).multiply(fromBytes32(b)).divide(den)
    if (q.compareTo(Max) > 0) throw new ArithmeticException("u256 muldiv overflow")
    toBytes32(q)
  }
}
