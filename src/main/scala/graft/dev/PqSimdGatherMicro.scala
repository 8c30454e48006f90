package graft.dev

import jdk.incubator.vector.{ByteVector, FloatVector, IntVector, VectorOperators}

/** Can a Vector-API gather (vgatherdps on AVX-512) beat the shipped
  * 4-row-blocked scalar ADC walk on the float-LUT shape
  * ([[graft.operators.AdcScan.FloatPqLutScorer]]: m=64, nC=256 →
  * 64 KB L2-resident LUT)? Each variant gets its OWN monomorphic timing
  * loop (PqGatherMicro's megamorphic-call-site lesson). Values are
  * float sums in j order for scalar, lane-reassociated for SIMD — the
  * strided_accum regime both live in tolerates that (gates pin the
  * double scorer). */
object PqSimdGatherMicro {
  final val m = 64
  final val nC = 256

  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(42)
    val nRows = 20000
    val codes = new Array[Byte](nRows * m)
    rnd.nextBytes(codes)
    val lut = Array.fill(m * nC)(rnd.nextFloat())
    val out = new Array[Float](nRows)
    // index ramp: lane l of step j0 gathers lut[(j0+l)*nC + 128 + code]
    val ramp = Array.tabulate(16)(l => l * nC + 128)
    val idxBuf = new Array[Int](16)

    def scalar4(): Unit = {
      var r = 0
      while (r + 3 < nRows) {
        val offA = r * m; val offB = offA + m
        val offC = offB + m; val offD = offC + m
        var a0 = 0.0f; var a1 = 0.0f; var a2 = 0.0f; var a3 = 0.0f
        var j = 0
        while (j < m) {
          val base = j * nC + 128
          a0 += lut(base + codes(offA + j))
          a1 += lut(base + codes(offB + j))
          a2 += lut(base + codes(offC + j))
          a3 += lut(base + codes(offD + j))
          j += 1
        }
        out(r) = a0; out(r + 1) = a1; out(r + 2) = a2; out(r + 3) = a3
        r += 4
      }
    }

    def gather1(): Unit = {
      val si = IntVector.SPECIES_512
      val sb = ByteVector.SPECIES_128
      val sf = FloatVector.SPECIES_512
      val rampV = IntVector.fromArray(si, ramp, 0)
      var r = 0
      while (r < nRows) {
        val off = r * m
        var acc = FloatVector.zero(sf)
        var j = 0
        while (j < m) {
          val cv = ByteVector.fromArray(sb, codes, off + j)
            .convertShape(VectorOperators.B2I, si, 0).asInstanceOf[IntVector]
          cv.add(rampV).intoArray(idxBuf, 0)
          acc = acc.add(FloatVector.fromArray(sf, lut, j * nC, idxBuf, 0))
          j += 16
        }
        out(r) = acc.reduceLanes(VectorOperators.ADD)
        r += 1
      }
    }

    def gather2(): Unit = {
      val si = IntVector.SPECIES_512
      val sb = ByteVector.SPECIES_128
      val sf = FloatVector.SPECIES_512
      val rampV = IntVector.fromArray(si, ramp, 0)
      val idxA = new Array[Int](16); val idxB = new Array[Int](16)
      var r = 0
      while (r + 1 < nRows) {
        val offA = r * m; val offB = offA + m
        var aA = FloatVector.zero(sf); var aB = FloatVector.zero(sf)
        var j = 0
        while (j < m) {
          val cA = ByteVector.fromArray(sb, codes, offA + j)
            .convertShape(VectorOperators.B2I, si, 0).asInstanceOf[IntVector]
          val cB = ByteVector.fromArray(sb, codes, offB + j)
            .convertShape(VectorOperators.B2I, si, 0).asInstanceOf[IntVector]
          cA.add(rampV).intoArray(idxA, 0)
          cB.add(rampV).intoArray(idxB, 0)
          aA = aA.add(FloatVector.fromArray(sf, lut, j * nC, idxA, 0))
          aB = aB.add(FloatVector.fromArray(sf, lut, j * nC, idxB, 0))
          j += 16
        }
        out(r) = aA.reduceLanes(VectorOperators.ADD)
        out(r + 1) = aB.reduceLanes(VectorOperators.ADD)
        r += 2
      }
    }

    val elems = nRows.toLong * m
    def report(label: String, times: Seq[Long]): Unit = {
      val t = times.sorted.apply(times.length / 2)
      println(f"$label%-9s ${t / 1e6}%8.2f ms  ${t.toDouble / elems}%6.3f ns/elem  [${out(7)}]")
    }
    (1 to 3).foreach(_ => { scalar4(); gather1(); gather2() })
    for (round <- 1 to 3) {
      report("scalar4", (1 to 9).map { _ =>
        val t0 = System.nanoTime(); scalar4(); System.nanoTime() - t0 })
      report("gather1", (1 to 9).map { _ =>
        val t0 = System.nanoTime(); gather1(); System.nanoTime() - t0 })
      report("gather2", (1 to 9).map { _ =>
        val t0 = System.nanoTime(); gather2(); System.nanoTime() - t0 })
    }
  }
}
