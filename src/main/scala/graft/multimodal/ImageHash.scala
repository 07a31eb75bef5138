package graft.multimodal

/** Perceptual image hashing over REAL decoded pixels (pure JVM, no
  * codec libs beyond the JDK's own ImageIO readers feeding it).
  *
  *  - aHash: box-resample to 8×8, threshold each cell against the
  *    mean — the classic average hash.
  *  - pHash: box-resample to 32×32, 2-D DCT-II, keep the 63 top-left
  *    AC coefficients, threshold against their median. Robust to
  *    re-encoding (PNG↔BMP↔GIF round-trips of the same pixels are
  *    bit-identical) and to uniform brightness shifts (only the DC
  *    coefficient moves).
  *
  * Both return a Long consumed by the same pigeonhole 16-bit-block
  * candidate join the md5-fixture pHash path (mm5) uses — hamming ≤ 3
  * pairs always share ≥ 1 of 4 blocks.
  */
object ImageHash {

  private val N = 32 // pHash resample edge

  /** cos((2x+1)·u·π/2N) for x ∈ [0,32), u ∈ [0,8) — the only DCT
    * slices pHash reads. */
  private val cosT: Array[Array[Double]] =
    Array.tabulate(8, N)((u, x) => math.cos((2 * x + 1) * u * math.Pi / (2.0 * N)))

  /** box-resample a w×h grayscale raster to n×n (plain averaging —
    * deterministic, no AWT scaler). */
  private def resample(px: Array[Int], w: Int, h: Int, n: Int): Array[Double] = {
    val out = new Array[Double](n * n)
    var by = 0
    while (by < n) {
      val y0 = by * h / n
      val y1 = math.max(y0 + 1, (by + 1) * h / n)
      var bx = 0
      while (bx < n) {
        val x0 = bx * w / n
        val x1 = math.max(x0 + 1, (bx + 1) * w / n)
        var s = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += px(y * w + x); x += 1 }
          y += 1
        }
        out(by * n + bx) = s / ((y1 - y0) * (x1 - x0))
        bx += 1
      }
      by += 1
    }
    out
  }

  /** 8×8 mean-threshold average hash. */
  def aHash64(px: Array[Int], w: Int, h: Int): Long = {
    val cells = resample(px, w, h, 8)
    val mean = cells.sum / 64.0
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (cells(i) > mean) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** 32×32 DCT, 63 AC coefficients thresholded at their median. */
  def pHash64(px: Array[Int], w: Int, h: Int): Long = {
    val small = resample(px, w, h, N)
    // row-column separable DCT restricted to the 8 slices we keep
    val rows = Array.ofDim[Double](N, 8) // rows(y)(u) = Σ_x small(y,x)·cos_u(x)
    var y = 0
    while (y < N) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < N) { s += small(y * N + x) * cosT(u)(x); x += 1 }
        rows(y)(u) = s
        u += 1
      }
      y += 1
    }
    val dct = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < N) { s += rows(yy)(u) * cosT(v)(yy); yy += 1 }
        dct(v * 8 + u) = s
        u += 1
      }
      v += 1
    }
    val ac = dct.drop(1).sorted // 63 AC coefficients (index 0 is DC)
    val med = ac(31)
    var hash = 0L
    var i = 1
    while (i < 64) {
      if (dct(i) > med) hash |= 1L << (i - 1)
      i += 1
    }
    hash
  }
}
