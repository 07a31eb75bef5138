package graft.core
import org.scalatest.funsuite.AnyFunSuite

/** 32-thread twin of [[KernelBenchProbe]]: the commitment rungs run the
  * kernels on every core at once, where memory bandwidth, allocation
  * pressure and clock scaling — invisible to a single-thread probe —
  * set the real per-entry wall. Print-only (no assert: absolute
  * numbers are host-dependent). */
class ParallelKernelProbe extends AnyFunSuite {
  private def par(name: String, perThread: Int)(op: (Int, Int) => Unit): Unit = {
    val nThreads = Runtime.getRuntime.availableProcessors()
    (0 until 2000).foreach(i => op(0, i)) // warm
    val t0 = System.nanoTime()
    val threads = (0 until nThreads).map { t =>
      new Thread(() => { var i = 0; while (i < perThread) { op(t, i); i += 1 } })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val wall = System.nanoTime() - t0
    println(f"$name x$nThreads: ${wall.toDouble / perThread}%.0f ns/op single-thread-equivalent")
  }

  test("32-thread per-op cost of the commitment kernels") {
    val v = Array.fill[Byte](32)(7)
    par("mappingLeafCommit", 20000) { (t, i) =>
      val key = Array.fill[Byte](32)(t.toByte); key(1) = (i & 0xff).toByte
      Commitments.mappingLeafCommit(key, v); ()
    }
    val fields = PoseidonGoldilocks.bytesToFields(Array.fill[Byte](64)(3))
    par("poseidonHash", 40000) { (t, i) =>
      val f = fields.clone(); f(0) = t * 40000L + i
      PoseidonGoldilocks.hashNoPadN(f, 5); ()
    }
    par("sswu", 20000) { (t, i) =>
      val f = fields.clone(); f(0) = t * 40000L + i
      EcGFp5.simpleSwu(EcGFp5.F5(PoseidonGoldilocks.hashNoPadN(f, 5).take(5))); ()
    }
    par("innerNodeHash", 40000) { (t, i) =>
      val l = Array.fill[Byte](32)(t.toByte); l(1) = (i & 0xff).toByte
      Commitments.innerNodeHash(l, l); ()
    }
  }
}
class PureAluProbe extends AnyFunSuite {
  test("zero-alloc bmul chain: single vs 32-thread") {
    def chain(seed: Long, iters: Int): Long = {
      var x = seed | 1L; var i = 0
      while (i < iters) { x = PoseidonGoldilocks.mul(x, x + 1); i += 1 }
      x
    }
    chain(3, 2000000) // warm
    var t0 = System.nanoTime()
    val r1 = chain(5, 20000000)
    val solo = (System.nanoTime() - t0) / 2e7
    val nT = Runtime.getRuntime.availableProcessors()
    t0 = System.nanoTime()
    val ts = (0 until nT).map(t => new Thread(() => { chain(t + 7, 20000000); () }))
    ts.foreach(_.start()); ts.foreach(_.join())
    val par = (System.nanoTime() - t0) / 2e7
    println(f"bmul chain: solo $solo%.2f ns/op, x$nT $par%.2f ns/op (inflation ${par / solo}%.2fx) [$r1]")
  }
}
