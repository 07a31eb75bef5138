package graft.core

/** The one generator for the 32-position signature-mismatch sum the
  * DuckDB oracles replay (the same text parses in both engines when a
  * Spark-side consumer wants the positional form). The Spark HOT
  * paths use the equivalent integer formulation instead —
  * `bit_count(conv(sig_a,2,10) ^ conv(sig_b,2,10))`, one xor+popcount
  * per pair versus 32 substring compares; the two agree
  * position-for-position on exactly-32-char '0'/'1' signatures. One
  * definition so a change to the signature width or the mismatch
  * expression lands everywhere or nowhere.
  */
object Hamming {

  /** Σ of per-position mismatch indicators over two 32-char '0'/'1'
    * signatures named `sig_a`/`sig_b` — no join over positions. */
  val sql32: String =
    (1 to 32)
      .map(i => s"(CASE WHEN substring(sig_a,$i,1) <> substring(sig_b,$i,1) THEN 1 ELSE 0 END)")
      .mkString(" + ")
}
