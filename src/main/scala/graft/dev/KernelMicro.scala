package graft.dev

import graft.operators.SimdDist

/** No-Spark microbenchmark of the distance kernels: is the incubator
  * Vector API actually intrinsified on this JVM/CPU, and by how much
  * does it beat the scalar double-chain loop per element? */
object KernelMicro {
  def main(args: Array[String]): Unit = {
    println(s"vectorKernel=${SimdDist.vectorKernel.isDefined} " +
      s"(process default simdActive=${SimdDist.simdActive})")
    val rnd = new java.util.Random(7)
    for (dim <- Seq(64, 384)) {
      val nRows = 4096
      val q = Array.fill(dim)(rnd.nextFloat())
      val flat = Array.fill(nRows * dim)(rnd.nextFloat())
      def run(label: String, f: Int => Double): Unit = {
        var sink = 0.0
        (1 to 3).foreach { _ => var r = 0; while (r < nRows) { sink += f(r); r += 1 } }
        var best = Double.MaxValue
        (1 to 10).foreach { _ =>
          val t0 = System.nanoTime()
          var r = 0
          while (r < nRows) { sink += f(r); r += 1 }
          best = math.min(best, (System.nanoTime() - t0).toDouble)
        }
        println(f"dim=$dim%-4d $label%-14s ${best / nRows}%8.1f ns/row " +
          f"(${best / nRows / dim}%5.2f ns/elem)  [$sink%.1f]")
      }
      val s = SimdDist.ScalarKernel
      val k = SimdDist.vectorKernel.getOrElse(SimdDist.ScalarKernel)
      run("scalar_l2", r => s.l2Flat(q, flat, r * dim))
      run("simd_l2", r => k.l2Flat(q, flat, r * dim))
      run("scalar_dot", r => s.dotFlat(q, flat, r * dim))
      run("simd_dot", r => k.dotFlat(q, flat, r * dim))
    }
  }
}
