package graft.core

import java.math.BigInteger

/** EcGFp5 — the additive-digest curve of the reference
  * (`group_hashing/`, via the public plonky2-ecgfp5 crate; curve due
  * to Pornin, "EcGFp5: a Specialized Elliptic Curve", ePrint
  * 2022/274). Everything derives from public knowledge:
  *
  *   - Base field GF(p^5) = GF(p)[z]/(z^5 − 3), p = Goldilocks.
  *   - Curve (double-odd form): y² = x(x² + Ax + B) with A = 2,
  *     B = 263·z; short-Weierstrass twin Y² = X³ + a·X + b via
  *     X = x + A/3, with a, b the constants the reference commits in
  *     `group_hashing/utils.rs` (a_sw/b_sw).
  *   - `map_to_curve_point` (field_to_curve.rs:38-50): Poseidon
  *     hash-to-5-elements, then the simplified-SWU map of
  *     `sswu_value.rs:31-77` with the committed z_sw/neg_z_inv_sw/
  *     neg_b_div_a_sw constants, finishing with Pornin's `decode`
  *     (w = y/x, x = the quadratic-residue root).
  *
  * Bit-parity is certified by the reference's own committed SSWU test
  * vectors (`sswu_value.rs:88-121`), checked in EcGFp5Spec; sqrt is
  * Tonelli–Shanks over GF(p^5) (2-adicity 32, non-residue 7 — the
  * base-field multiplicative generator), inverses/Legendre use the
  * Frobenius-norm reduction to the base field.
  *
  * Points are carried in short-Weierstrass affine form
  * (X, Y, isInf); the group digest sums these ([[Point.add]]) and
  * [[Point.encode]] reproduces the reference's canonical 40-byte
  * w-encoding for display/golden parity.
  */
object EcGFp5 {

  import PoseidonGoldilocks.{P => p, add => badd, mul => bmul, canonical}

  // ---------------------------------------------------- base helpers
  @inline private def bsub(a: Long, b: Long): Long = {
    val ca = canonical(a); val cb = canonical(b)
    val d = ca - cb
    if (java.lang.Long.compareUnsigned(ca, cb) < 0) d + p else d
  }

  private def bpow(base: Long, e: Long): Long = {
    var acc = 1L; var b = canonical(base); var k = e
    while (k != 0) {
      if ((k & 1L) == 1L) acc = bmul(acc, b)
      b = bmul(b, b)
      k >>>= 1
    }
    canonical(acc)
  }

  /** base-field inverse via Fermat (x^(p−2)); 0 → 0. */
  private def binv(a: Long): Long = bpow(a, p - 2)

  // --------------------------- allocation-free GF(p^5) hot-path core
  // The immutable F5 ops allocate a case class + coefficient array per
  // operation; a sqrt chain is ~10³ operations and runs once per
  // map_to_curve — at 10M entries that is 10¹⁰ transient allocations,
  // and the commitment rung was GC-bound, not ALU-bound. These raw
  // kernels do the IDENTICAL mod-p arithmetic on caller-owned 5-long
  // buffers (addition order is free: badd/bmul are exact mod p and
  // the result is canonicalized once). All ten inputs are read into
  // locals before `out` is written, so in-place calls like
  // mul5(s, s, s) are safe. Bit-parity stays certified by the
  // committed SSWU golden vectors + field-law specs.
  private def mul5(a: Array[Long], b: Array[Long], out: Array[Long]): Unit = {
    val a0 = a(0); val a1 = a(1); val a2 = a(2); val a3 = a(3); val a4 = a(4)
    val b0 = b(0); val b1 = b(1); val b2 = b(2); val b3 = b(3); val b4 = b(4)
    val t0 = bmul(a0, b0)
    val t1 = badd(bmul(a0, b1), bmul(a1, b0))
    val t2 = badd(badd(bmul(a0, b2), bmul(a1, b1)), bmul(a2, b0))
    val t3 = badd(badd(badd(bmul(a0, b3), bmul(a1, b2)), bmul(a2, b1)), bmul(a3, b0))
    val t4 = badd(badd(badd(badd(bmul(a0, b4), bmul(a1, b3)), bmul(a2, b2)), bmul(a3, b1)), bmul(a4, b0))
    val t5 = badd(badd(badd(bmul(a1, b4), bmul(a2, b3)), bmul(a3, b2)), bmul(a4, b1))
    val t6 = badd(badd(bmul(a2, b4), bmul(a3, b3)), bmul(a4, b2))
    val t7 = badd(bmul(a3, b4), bmul(a4, b3))
    val t8 = bmul(a4, b4)
    out(0) = canonical(badd(t0, bmul(3L, t5)))
    out(1) = canonical(badd(t1, bmul(3L, t6)))
    out(2) = canonical(badd(t2, bmul(3L, t7)))
    out(3) = canonical(badd(t3, bmul(3L, t8)))
    out(4) = canonical(t4)
  }

  private def isOne5(a: Array[Long]): Boolean =
    a(0) == 1L && a(1) == 0L && a(2) == 0L && a(3) == 0L && a(4) == 0L

  /** raw fixed-4-bit-window pow: same element as [[F5.pow]], zero
    * per-step allocation (one 16-entry table + two scratch buffers). */
  private def powWindow5(base: Array[Long], e: BigInteger): Array[Long] = {
    val table = Array.ofDim[Long](16, 5)
    table(1) = base.clone()
    var i = 2
    while (i < 16) { mul5(table(i - 1), base, table(i)); i += 1 }
    var acc = Array[Long](1L, 0, 0, 0, 0)
    val bytes = e.toByteArray
    var bi = 0
    while (bi < bytes.length) {
      val b = bytes(bi)
      var nib = 0
      while (nib < 2) {
        val w = if (nib == 0) (b >> 4) & 0xf else b & 0xf
        var sq = 0
        while (sq < 4) { mul5(acc, acc, acc); sq += 1 }
        if (w != 0) mul5(acc, table(w), acc)
        nib += 1
      }
      bi += 1
    }
    acc
  }

  // --------------------------------------------------------- GF(p^5)
  /** element = 5 canonical coefficients, little-endian in z. */
  final case class F5(c: Array[Long]) {
    require(c.length == 5)

    def isZero: Boolean = c.forall(_ == 0L)

    def +(o: F5): F5 = F5(Array.tabulate(5)(i => canonical(badd(c(i), o.c(i)))))
    def -(o: F5): F5 = F5(Array.tabulate(5)(i => bsub(c(i), o.c(i))))
    def unary_- : F5 = F5(Array.tabulate(5)(i => bsub(0L, c(i))))

    /** schoolbook multiply, fold z^5 = 3 */
    def *(o: F5): F5 = {
      val t = new Array[Long](9)
      var i = 0
      while (i < 5) {
        var j = 0
        while (j < 5) { t(i + j) = badd(t(i + j), bmul(c(i), o.c(j))); j += 1 }
        i += 1
      }
      val out = new Array[Long](5)
      var k = 0
      while (k < 5) { out(k) = canonical(t(k)); k += 1 }
      while (k < 9) { out(k - 5) = canonical(badd(out(k - 5), bmul(3L, t(k)))); k += 1 }
      F5(out)
    }

    def square: F5 = this * this

    def *(s: Long): F5 = F5(Array.tabulate(5)(i => canonical(bmul(c(i), s))))

    /** fixed 4-bit-window square-and-multiply (left-to-right): same
      * group element as the binary ladder, ~40% fewer multiplies on
      * the ~290-bit sqrt exponents that dominate every curve digest;
      * leading zero nibbles square the identity (free). */
    def pow(e: BigInteger): F5 = {
      if (e.signum() == 0) return F5.One
      val table = new Array[F5](16)
      table(0) = F5.One
      table(1) = this
      var i = 2
      while (i < 16) { table(i) = table(i - 1) * this; i += 1 }
      var acc = F5.One
      val bytes = e.toByteArray // big-endian, possibly with a 0x00 sign byte
      var bi = 0
      while (bi < bytes.length) {
        val b = bytes(bi)
        val hi = (b >> 4) & 0xf
        val lo = b & 0xf
        acc = acc.square.square.square.square
        if (hi != 0) acc = acc * table(hi)
        acc = acc.square.square.square.square
        if (lo != 0) acc = acc * table(lo)
        bi += 1
      }
      acc
    }

    /** Frobenius x → x^(p^k): acts diagonally since p ≡ 1 (mod 5):
      * coefficient i picks up FrobC(k)(i) = 3^(i·k·(p−1)/5). */
    def frob(k: Int): F5 = F5(Array.tabulate(5)(i => bmul(c(i), F5.FrobC(k)(i))))

    /** Norm to GF(p): x^(1+p+p²+p³+p⁴) — lands in the base field. */
    def norm: Long = {
      val t = frob(1) * frob(2) * frob(3) * frob(4) * this
      // imaginary parts cancel by construction
      canonical(t.c(0))
    }

    /** inverse via norm: x⁻¹ = (∏_{k=1..4} φᵏ(x)) / Norm(x); 0 → 0. */
    def inverse: F5 = {
      if (isZero) return F5.Zero
      val prod = frob(1) * frob(2) * frob(3) * frob(4)
      prod * binv(norm)
    }

    def /(o: F5): F5 = this * o.inverse

    /** Legendre symbol via the norm: χ(x) = χ_p(Norm(x)). Returns
      * 1 (QR), −1 encoded as p−1, or 0. */
    def legendre: Long = bpow(norm, (p - 1) >>> 1)

    def isQr: Boolean = legendre == 1L

    /** Tonelli–Shanks over GF(p^5): p^5 − 1 = 2^32 · m with m odd;
      * the 2-Sylow generator comes from non-residue 7. None if not a
      * square. */
    def sqrt: Option[F5] = {
      if (isZero) return Some(F5.Zero)
      if (legendre != 1L) return None
      // ONE ~290-bit exponentiation instead of two: with
      // r = x^((m+1)/2), the cofactor part t = x^m follows as
      // r²·x⁻¹ (r² = x^(m+1)); the Frobenius-norm inverse is ~10
      // multiplications vs ~430 for the second pow — sqrt() is the
      // per-entry hot path of every curve digest, and this is its
      // single largest term. The whole chain runs on the raw
      // allocation-free kernels (mul5/powWindow5): identical mod-p
      // arithmetic, certified by the committed SSWU vectors.
      val r = powWindow5(c, F5.TsMp1Half)
      val t = new Array[Long](5)
      mul5(r, r, t)
      mul5(t, inverse.c, t)
      val cc = F5.TsZ.c.clone()
      val s = new Array[Long](5)
      var e = 32
      while (!isOne5(t)) {
        // least i with t^(2^i) = 1; bounded — exceeding e means the
        // element is not in the 2-Sylow coset (internal invariant
        // breach), fail loudly rather than spin
        var i = 1
        mul5(t, t, s)
        while (!isOne5(s)) {
          mul5(s, s, s); i += 1
          require(i < e, "Tonelli-Shanks invariant breach: order not a power of two")
        }
        // b = c^(2^(e-i-1)), squared in place; then r·b, c' = b², t·c'
        var j = 0
        while (j < e - i - 1) { mul5(cc, cc, cc); j += 1 }
        mul5(r, cc, r)
        mul5(cc, cc, cc)
        mul5(t, cc, t)
        e = i
      }
      Some(F5(r))
    }

    /** RFC 9380 sgn0 for an extension field: the parity of the first
      * non-zero coefficient (0 for zero). */
    def sgn0: Boolean = {
      var i = 0
      while (i < 5) {
        if (c(i) != 0L) return (c(i) & 1L) == 1L
        i += 1
      }
      false
    }

    override def equals(o: Any): Boolean = o match {
      case f: F5 => java.util.Arrays.equals(c, f.c)
      case _     => false
    }
    override def hashCode: Int = java.util.Arrays.hashCode(c)
  }

  object F5 {
    val Zero: F5 = F5(new Array[Long](5))
    val One: F5 = F5(Array(1L, 0, 0, 0, 0))

    def apply(a: Long, b: Long, c: Long, d: Long, e: Long): F5 =
      F5(Array(canonical(a), canonical(b), canonical(c), canonical(d), canonical(e)))

    def fromBase(a: Long): F5 = F5(Array(canonical(a), 0, 0, 0, 0))

    /** Frobenius diagonal constants: FrobC(k)(i) = w^(i·k) with
      * w = 3^((p−1)/5). */
    private[EcGFp5] val FrobC: Array[Array[Long]] = {
      val w = bpow(3L, java.lang.Long.divideUnsigned(p - 1, 5L))
      Array.tabulate(5)(k => Array.tabulate(5)(i => bpow(w, (i.toLong * k))))
    }

    private val BigP = new BigInteger(java.lang.Long.toUnsignedString(p))
    private val Q = BigP.pow(5)
    /** q − 1 = 2^32 · m, m odd */
    private[EcGFp5] val TsM: BigInteger = Q.subtract(BigInteger.ONE).shiftRight(32)
    private[EcGFp5] val TsMp1Half: BigInteger = TsM.add(BigInteger.ONE).shiftRight(1)
    /** 7^m — generator of the 2-Sylow subgroup (7 is the Goldilocks
      * multiplicative generator, hence a non-residue; base-field
      * non-residues stay non-residues in an odd-degree extension). */
    private[EcGFp5] val TsZ: F5 = fromBase(7L).pow(TsM)
  }

  // ------------------------------------------- committed SW constants
  // group_hashing/utils.rs (the reference commits these)
  private val TwoThirds = F5(6148914689804861441L, 0, 0, 0, 0)
  private val Asw = F5(6148914689804861439L, 263L, 0, 0, 0)
  private val Bsw = F5(0xda12f683e38e38e5L, 0x55555554ffffff51L, 0, 0, 0)
  private val Zsw = F5(p - 4, p - 1, 0, 0, 0)
  private val NegZInvSw = F5(4795794222525505369L, 3412737461722269738L,
    8370187669276724726L, 7130825117388110979L, 0xa7428e14c8a980e0L)
  private val NegBDivASw = F5(6585749426319121644L, 0xebc9e3c7f22ff80eL,
    3264760655763595284L, 0xe8ef61001892e747L, 0xba717e05af30b2c2L)

  /** double-odd A = 2, B = 263z ⇒ 4B = 1052z */
  private val FourB = F5(0, 1052L, 0, 0, 0)
  private val A = F5.fromBase(2L)
  private val Half = F5.fromBase(binv(2L)) // 1/2

  // ------------------------------------------------------------ point
  /** short-Weierstrass affine point (or infinity). */
  final case class Point(x: F5, y: F5, isInf: Boolean) {

    def +(o: Point): Point =
      if (isInf) o
      else if (o.isInf) this
      else if (x == o.x) {
        if (y == o.y) {
          if (y.isZero) Point.Infinity
          else { // doubling: λ = (3x² + a) / 2y
            val lam = (x.square * 3L + Asw) / (y * 2L)
            Point.chord(lam, this, o)
          }
        } else Point.Infinity // P + (−P)
      } else {
        val lam = (o.y - y) / (o.x - x)
        Point.chord(lam, this, o)
      }

    def unary_- : Point = if (isInf) this else Point(x, -y, isInf = false)

    /** SW curve membership: Y² = X³ + aX + b */
    def onCurve: Boolean =
      isInf || y.square == (x * x.square + Asw * x + Bsw)

    /** Pornin's canonical w-encoding (curve.rs `encode`): w = y/x in
      * double-odd coordinates (x_do = X − 2/3); infinity → 0. 5
      * little-endian u64s = 40 bytes. */
    def encode: Array[Long] =
      if (isInf) new Array[Long](5)
      else (y / (x - TwoThirds)).c.clone()

    def encodeBytes: Array[Byte] = {
      val out = new Array[Byte](40)
      val w = encode
      var i = 0
      while (i < 5) {
        var v = w(i); var j = 0
        while (j < 8) { out(i * 8 + j) = (v & 0xff).toByte; v >>>= 8; j += 1 }
        i += 1
      }
      out
    }
  }

  object Point {
    val Infinity: Point = Point(F5.Zero, F5.Zero, isInf = true)

    private[EcGFp5] def chord(lam: F5, p1: Point, p2: Point): Point = {
      val x3 = lam.square - p1.x - p2.x
      val y3 = lam * (p1.x - x3) - p1.y
      Point(x3, y3, isInf = false)
    }

    /** Pornin `decode(w)`: x² − (w²−A)x + B = 0; the curve's B is a
      * non-square, so exactly one root is a QR — that root is the
      * canonical x; y = w·x (all in double-odd form, converted to SW
      * on return). None for non-decodable w (w=0 handled as N/∞ →
      * Infinity here, matching `Point::decode` rejecting only
      * non-square discriminants). */
    def decode(w: F5): Option[Point] = {
      if (w.isZero) return Some(Infinity)
      val e = w.square - A
      val delta = e.square - FourB
      delta.sqrt.map { r =>
        val x1 = (e + r) * Half
        val x2 = (e - r) * Half
        val xdo = if (x1.isQr) x1 else x2
        val ydo = w * xdo
        Point(xdo + TwoThirds, ydo, isInf = false)
      }
    }
  }

  // ----------------------------------------------------------- SSWU
  /** `simple_swu` (sswu_value.rs:31-77), bit-for-bit semantics. */
  def simpleSwu(u: F5): Point = {
    val denomPart = Zsw * u.square
    val denom = denomPart.square + denomPart
    val tv1 = denom.inverse // inverse_or_zero
    val x1 = (if (tv1.isZero) NegZInvSw else tv1 + F5.One) * NegBDivASw
    val x2 = denomPart * x1
    val gx1 = x1 * x1.square + Asw * x1 + Bsw
    val gx2 = x2 * x2.square + Asw * x2 + Bsw
    val (xsw, yPos) = gx1.sqrt match {
      case Some(r) => (x1, r)
      case None    => (x2, gx2.sqrt.get)
    }
    val xCand = xsw - TwoThirds
    val yCand = if (u.sgn0 == yPos.sgn0) yPos else -yPos
    Point.decode(yCand / xCand).get
  }

  /** `map_to_curve_point` (field_to_curve.rs:38-50): Poseidon to 5
    * base elements, then SSWU. */
  def mapToCurvePoint(values: Array[Long]): Point =
    simpleSwu(F5(PoseidonGoldilocks.hashNoPadN(values, 5)))

  // -------------------------------------------------- serialization
  /** affine wire form for aggregation buffers: X(40) ‖ Y(40) ‖ inf(1)
    * little-endian — 81 bytes. */
  val SerLen = 81

  def serialize(pt: Point): Array[Byte] = {
    val out = new Array[Byte](SerLen)
    def putF5(f: F5, off: Int): Unit = {
      var i = 0
      while (i < 5) {
        var v = f.c(i); var j = 0
        while (j < 8) { out(off + i * 8 + j) = (v & 0xff).toByte; v >>>= 8; j += 1 }
        i += 1
      }
    }
    putF5(pt.x, 0); putF5(pt.y, 40)
    out(80) = if (pt.isInf) 1 else 0
    out
  }

  def deserialize(b: Array[Byte]): Point = {
    require(b.length == SerLen, s"expected $SerLen bytes, got ${b.length}")
    def getF5(off: Int): F5 = F5(Array.tabulate(5) { i =>
      var v = 0L; var j = 7
      while (j >= 0) { v = (v << 8) | (b(off + i * 8 + j) & 0xffL); j -= 1 }
      v
    })
    val pt = Point(getF5(0), getF5(40), b(80) == 1)
    // fail loudly on corrupt bytes: an off-curve point would silently
    // poison every digest it is combined into (the reference's decode
    // rejects non-curve encodings the same way)
    require(pt.isInf || pt.onCurve, "EcGFp5.deserialize: point not on curve (corrupt digest bytes)")
    pt
  }
}
