package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AdcScan, SimdDist}

/** The runtime-optional SIMD kernels against their scalar contracts.
  * These tests require `jdk.incubator.vector` (build.sbt adds it to the
  * forked test JVM); if a future environment drops the module the
  * kernels are simply absent and the suites skip via the guards. */
class SimdKernelSpec extends AnyFunSuite {

  test("vector iwsum is BIT-identical to the scalar loop at every dim/offset") {
    AdcScan.sq8SimdKernel match {
      case None => cancel("incubator vector module absent")
      case Some(k) =>
        val rnd = new java.util.Random(7)
        for (dim <- Seq(1, 7, 16, 17, 50, 64, 113, 384, 1024)) {
          val nRows = 64
          val codes = new Array[Byte](nRows * dim)
          rnd.nextBytes(codes)
          val w = Array.fill(dim)((rnd.nextInt(32767) - 16383).toShort)
          for (r <- 0 until nRows) {
            var exp = 0
            var i = 0
            while (i < dim) { exp += w(i) * codes(r * dim + i); i += 1 }
            assert(k.iwsum(w, codes, r * dim, dim) == exp,
              s"dim=$dim row=$r")
          }
        }
    }
  }

  test("vector iwsumChunk is BIT-identical to per-row iwsum at every dim/offset/nRows") {
    AdcScan.sq8SimdKernel match {
      case None => cancel("incubator vector module absent")
      case Some(k) =>
        val rnd = new java.util.Random(13)
        for (dim <- Seq(1, 7, 16, 17, 50, 64, 113, 384);
             nRows <- Seq(1, 2, 3, 37)) { // odd rows: 2-in-flight tail
          val pad = 11 // nonzero off0: chunk starts mid-array
          val codes = new Array[Byte](pad + nRows * dim)
          rnd.nextBytes(codes)
          val w = Array.fill(dim)((rnd.nextInt(32767) - 16383).toShort)
          val out = new Array[Int](nRows)
          k.iwsumChunk(w, codes, pad, dim, nRows, out)
          for (r <- 0 until nRows) {
            var exp = 0
            var i = 0
            while (i < dim) { exp += w(i) * codes(pad + r * dim + i); i += 1 }
            assert(out(r) == exp, s"dim=$dim nRows=$nRows row=$r")
          }
        }
    }
  }

  test("gather adcChunk matches the scalar ADC walk within float reassociation") {
    AdcScan.adcGatherKernel match {
      case None => cancel("gather kernel absent (module or <512-bit CPU)")
      case Some(g) =>
        val rnd = new java.util.Random(11)
        val nC = 256
        for (m <- Seq(8, 16, 50, 64)) {
          val nRows = 37 // odd: exercises the 2-row block's tail row
          val codes = new Array[Byte](nRows * m)
          rnd.nextBytes(codes)
          val lut = Array.fill(m * nC)(rnd.nextFloat())
          val accs = new Array[Float](nRows)
          g.adcChunk(lut, nC, codes, 0, m, nRows, accs)
          for (r <- 0 until nRows) {
            var exp = 0.0
            var j = 0
            while (j < m) { exp += lut(j * nC + (codes(r * m + j) + 128)); j += 1 }
            assert(math.abs(accs(r) - exp) <= 1e-4 * math.max(1.0, math.abs(exp)),
              s"m=$m row=$r: ${accs(r)} vs $exp")
          }
          // += contract: a second pass doubles
          val before = accs.clone()
          g.adcChunk(lut, nC, codes, 0, m, nRows, accs)
          for (r <- 0 until nRows)
            assert(math.abs(accs(r) - 2 * before(r)) <= 1e-3 * math.max(1.0, math.abs(before(r))))
        }
    }
  }

  test("gather adcChunk2 (residual) matches the scalar two-table walk") {
    AdcScan.adcGatherKernel match {
      case None => cancel("gather kernel absent")
      case Some(g) =>
        val rnd = new java.util.Random(13)
        val nC = 256; val m = 64; val nRows = 19
        val codes = new Array[Byte](nRows * m)
        rnd.nextBytes(codes)
        val t = Array.fill(m * nC)(rnd.nextFloat())
        val ql = Array.fill(m * nC)(rnd.nextFloat() - 0.5f)
        val accs = new Array[Float](nRows)
        g.adcChunk2(t, ql, nC, codes, 0, m, nRows, accs)
        for (r <- 0 until nRows) {
          var exp = 0.0
          var j = 0
          while (j < m) {
            val idx = j * nC + (codes(r * m + j) + 128)
            exp += t(idx) + ql(idx)
            j += 1
          }
          assert(math.abs(accs(r) - exp) <= 1e-4 * math.max(1.0, math.abs(exp)),
            s"row=$r: ${accs(r)} vs $exp")
        }
    }
  }

  test("fixed VectorDistKernel still satisfies the scalar-equivalence contract") {
    SimdDist.vectorKernel match {
      case None => cancel("incubator vector module absent")
      case Some(k) =>
        val rnd = new java.util.Random(17)
        for (dim <- Seq(3, 16, 50, 64, 384)) {
          val a = Array.fill(dim)(rnd.nextFloat())
          val b = Array.fill(2 * dim)(rnd.nextFloat())
          val s = SimdDist.ScalarKernel
          def ok(x: Double, y: Double): Boolean =
            math.abs(x - y) <= 1e-4 * math.max(1.0, math.abs(y))
          assert(ok(k.l2(a, b.take(dim)), s.l2(a, b.take(dim))))
          assert(ok(k.dot(a, b.take(dim)), s.dot(a, b.take(dim))))
          assert(ok(k.cosineDist(a, b.take(dim)), s.cosineDist(a, b.take(dim))))
          assert(ok(k.l2Flat(a, b, dim), s.l2Flat(a, b, dim)))
          assert(ok(k.dotFlat(a, b, dim), s.dotFlat(a, b, dim)))
          assert(ok(k.cosineFlat(a, b, dim), s.cosineFlat(a, b, dim)))
        }
    }
  }
}
