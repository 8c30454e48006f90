package graft.dev

import graft.operators.AdcScan

/** A/B of the SQ8 int16×int8 weighted-sum kernel: scalar stride-4 loop
  * vs [[graft.operators.VectorSq8Kernel]] (when the incubator module
  * resolves), at the two weak-row shapes — 64-d (random) and 384-d
  * (msmarco). Asserts bit-identity on every row (integer sums are
  * associative, so the SIMD reduction must match exactly), then
  * medians the throughput, and finally prints the first-30-call warmup
  * trajectory (the frozen bench window is 1-warm + best-of-3, so slow
  * C2 warmup IS a QPS regression — the r10 int16 gating lesson). */
object Sq8SimdMicro {
  def main(args: Array[String]): Unit = {
    val k = AdcScan.sq8SimdKernel.orNull
    println(s"simd kernel: ${if (k == null) "ABSENT" else k.getClass.getSimpleName}")
    if (k == null) return
    val rnd = new java.util.Random(42)
    for (dim <- Seq(64, 384)) {
      val nRows = 96000
      val codes = new Array[Byte](nRows * dim)
      rnd.nextBytes(codes)
      val w = Array.fill(dim)((rnd.nextInt(32767) - 16383).toShort)

      def scalar(off: Int): Int = {
        var a0 = 0; var a1 = 0; var a2 = 0; var a3 = 0
        var i = 0
        val m4 = dim - 3
        while (i < m4) {
          a0 += w(i) * codes(off + i)
          a1 += w(i + 1) * codes(off + i + 1)
          a2 += w(i + 2) * codes(off + i + 2)
          a3 += w(i + 3) * codes(off + i + 3)
          i += 4
        }
        while (i < dim) { a0 += w(i) * codes(off + i); i += 1 }
        (a0 + a1) + (a2 + a3)
      }

      // bit-identity first (also forces both paths through C2 warmup)
      var r = 0
      while (r < nRows) {
        val s = scalar(r * dim); val v = k.iwsum(w, codes, r * dim, dim)
        require(s == v, s"row $r: scalar $s != simd $v")
        r += 1
      }
      val elems = nRows.toLong * dim
      def bench(label: String)(f: Int => Int): Unit = {
        var sink = 0L
        (1 to 3).foreach { _ =>
          var r = 0; while (r < nRows) { sink += f(r * dim); r += 1 } }
        val t = (1 to 9).map { _ =>
          val t0 = System.nanoTime()
          var r = 0
          while (r < nRows) { sink += f(r * dim); r += 1 }
          System.nanoTime() - t0
        }.sorted.apply(4)
        println(f"dim=$dim%-4d $label%-8s ${t / 1e6}%8.2f ms " +
          f"${t.toDouble / elems}%6.3f ns/elem  [$sink]")
      }
      bench("scalar")(scalar)
      bench("simd")(off => k.iwsum(w, codes, off, dim))
    }
    // warmup trajectory at 384-d on a FRESH kernel-shaped call pattern:
    // per-call 256-row chunks (the scoreChunk shape), wall per call
    val dim = 384
    val chunk = new Array[Byte](256 * dim)
    rnd.nextBytes(chunk)
    val w2 = Array.fill(dim)((rnd.nextInt(32767) - 16383).toShort)
    print("warmup ns/call (256-row chunks): ")
    var sink = 0L
    for (call <- 1 to 30) {
      val t0 = System.nanoTime()
      var r = 0
      while (r < 256) { sink += k.iwsum(w2, chunk, r * dim, dim); r += 1 }
      val dt = System.nanoTime() - t0
      if (call <= 10 || call % 5 == 0) print(s"$call:${dt / 1000}us ")
    }
    println(s"[$sink]")
  }
}
