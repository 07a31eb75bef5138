package graft.core

/** The one generator for the 32-position signature-mismatch sum used
  * by every SimHash consumer (batch dedup family, the streaming
  * near-dup gate, and their DuckDB oracles — the same text parses in
  * both engines). One definition so stream and batch near-dup
  * semantics cannot desynchronize: a change to the signature width or
  * the mismatch expression lands everywhere or nowhere.
  */
object Hamming {

  /** Σ of per-position mismatch indicators over two 32-char '0'/'1'
    * signatures named `sig_a`/`sig_b` — no join over positions. */
  val sql32: String =
    (1 to 32)
      .map(i => s"(CASE WHEN substring(sig_a,$i,1) <> substring(sig_b,$i,1) THEN 1 ELSE 0 END)")
      .mkString(" + ")
}
