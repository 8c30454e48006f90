package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimdDist

/** SIMD kernel vs the scalar reference: same values within float-lane
  * accumulation tolerance, on aligned and tail-bearing lengths. */
class SimdDistSpec extends AnyFunSuite {

  private def vecs(n: Int, seed: Int): (Array[Float], Array[Float]) = {
    val r = new scala.util.Random(seed)
    (Array.fill(n)(r.nextFloat() * 2 - 1), Array.fill(n)(r.nextFloat() * 2 - 1))
  }

  test("SIMD module is active in the forked test JVM") {
    // build.sbt adds --add-modules jdk.incubator.vector; if this fails
    // the bench would silently run scalar kernels
    assert(SimdDist.simdActive)
  }

  test("l2 matches scalar within accumulation tolerance") {
    for (n <- Seq(1, 6, 15, 16, 17, 50, 64, 384, 1000); s <- 1 to 3) {
      val (a, b) = vecs(n, n * 31 + s)
      val d0 = SimdDist.ScalarKernel.l2(a, b)
      val d1 = SimdDist.kernel.l2(a, b)
      assert(math.abs(d0 - d1) <= 1e-4 * math.max(1.0, d0), s"n=$n seed=$s")
    }
  }

  test("cosine matches scalar within accumulation tolerance") {
    for (n <- Seq(1, 6, 15, 16, 17, 50, 64, 384, 1000); s <- 1 to 3) {
      val (a, b) = vecs(n, n * 17 + s)
      val d0 = SimdDist.ScalarKernel.cosineDist(a, b)
      val d1 = SimdDist.kernel.cosineDist(a, b)
      assert(math.abs(d0 - d1) <= 1e-4, s"n=$n seed=$s")
    }
    // zero-norm convention preserved
    val z = new Array[Float](16)
    assert(SimdDist.kernel.cosineDist(z, Array.fill(16)(1f)) == 1.0)
  }
}
