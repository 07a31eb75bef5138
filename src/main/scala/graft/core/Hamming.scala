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

  /** signature geometry: 32 bits in 4 blocks of 8 — by pigeonhole,
    * any pair within Hamming distance 3 agrees on ≥ 1 block, so the
    * per-block equi-join has perfect recall at threshold 3. */
  val SigBits = 32
  val Blocks = 4
  val BlockWidth: Int = SigBits / Blocks

  /** Σ of per-position mismatch indicators over two 32-char '0'/'1'
    * signatures named `sig_a`/`sig_b` — no join over positions. */
  val sql32: String =
    (1 to SigBits)
      .map(i => s"(CASE WHEN substring(sig_a,$i,1) <> substring(sig_b,$i,1) THEN 1 ELSE 0 END)")
      .mkString(" + ")

  /** block `kCol`'s substring of `sigCol` (1-based SQL positions) —
    * the same text parses in Spark and DuckDB. */
  def blkSql(sigCol: String, kCol: String): String =
    s"substring($sigCol, $kCol*$BlockWidth+1, $BlockWidth)"

  /** integer form of the signature: the hot-path pair filter is then
    * one `bit_count(ia ^ ib)` instead of [[SigBits]] substring
    * compares — equivalent position-for-position to [[sql32]] on
    * exactly-[[SigBits]]-char signatures. */
  def sigIntCol(sig: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.conv(sig, 2, 10).cast("long")
}
