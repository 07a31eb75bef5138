package graft.core
import org.scalatest.funsuite.AnyFunSuite
class KernelBenchProbe extends AnyFunSuite {
  test("per-op cost of the commitment kernels") {
    val key = Array.fill[Byte](32)(3); val v = Array.fill[Byte](32)(7)
    // warm
    (0 until 2000).foreach { i => key(0) = (i & 0xff).toByte; Commitments.mappingLeafDigest(key, v) }
    var t0 = System.nanoTime()
    (0 until 20000).foreach { i => key(1) = (i & 0xff).toByte; Commitments.mappingLeafDigest(key, v) }
    println(f"mappingLeafDigest: ${(System.nanoTime() - t0) / 20000.0}%.0f ns/op")
    t0 = System.nanoTime()
    (0 until 20000).foreach { i => key(2) = (i & 0xff).toByte; Commitments.mappingLeafHash(key, v) }
    println(f"mappingLeafHash:   ${(System.nanoTime() - t0) / 20000.0}%.0f ns/op")
    val fields = PoseidonGoldilocks.bytesToFields(Bytes.concat(key, v))
    t0 = System.nanoTime()
    (0 until 20000).foreach { i => PoseidonGoldilocks.hashNoPadN(fields, 5) }
    println(f"poseidon hash:     ${(System.nanoTime() - t0) / 20000.0}%.0f ns/op")
    val u = EcGFp5.F5(PoseidonGoldilocks.hashNoPadN(fields, 5))
    t0 = System.nanoTime()
    var i = 0
    while (i < 20000) { EcGFp5.simpleSwu(u); i += 1 }
    val sswuNs = (System.nanoTime() - t0) / 20000.0
    println(f"sswu:              $sswuNs%.0f ns/op")
    // regression tripwire for the per-entry commitment cost (the 10M
    // rung is kernel-bound). A RELATIVE bound, not absolute wall-clock
    // (ADVICE r10: an absolute ns assert is a flaky hard failure on a
    // loaded host): sswu is ~400 mul5-class field ops and the poseidon
    // hash ~5k base-field ops, so their RATIO is load-invariant — a
    // return of the double-sqrt / boxed-sqrt cost (3-5x) trips it on
    // any host speed. The absolute print stays for the BASELINE record.
    val t1 = System.nanoTime()
    (0 until 20000).foreach { i => PoseidonGoldilocks.hashNoPadN(fields, 5) }
    val poseidonNs = (System.nanoTime() - t1) / 20000.0
    assert(sswuNs < 15.0 * poseidonNs,
      f"sswu at $sswuNs%.0f ns/op is >15x the same-run poseidon hash ($poseidonNs%.0f ns/op) — kernel regression")
  }
}
