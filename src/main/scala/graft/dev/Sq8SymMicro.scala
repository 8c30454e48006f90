package graft.dev

/** Kernel-regime micro for verdict r9 #6: can SYMMETRIC int8 scoring
  * (quantize the query once per batch, accumulate integer products —
  * FAISS's SDC escape) beat the shipped SQ8 wsum loop on this box?
  *
  * Pure-JVM, no Spark: three inner loops at the msmarco shape
  * (384-d, 96k rows of codes), median-of-9 after warm-up, interleaved
  * in one JVM (bench-noise discipline):
  *  - wsum: the Sq8FastScorer regime — byte load → L1 u-table lookup →
  *    double FMA per element (the measured load-port bound).
  *  - intDiff2: symmetric L2 — int (cq−cb)² accumulate; candidate for
  *    C2 auto-vectorized 16-lane int ops. NOTE this computes a
  *    DIFFERENT metric unless scales are uniform — the probe measures
  *    the SPEED ceiling first; the metric question only matters if the
  *    ceiling clears.
  *  - intDot: symmetric IP — int cq·cb accumulate.
  */
object Sq8SymMicro {
  def main(args: Array[String]): Unit = {
    val dim = args.headOption.map(_.toInt).getOrElse(384)
    val nRows = 96000
    val rnd = new java.util.Random(42)
    val codes = new Array[Byte](nRows * dim)
    rnd.nextBytes(codes)
    val ws = Array.fill(dim)(rnd.nextDouble())
    val u = Array.tabulate(256)(b => b / 255.0)
    val cq = Array.fill(dim)(rnd.nextInt(256))
    val cqB = cq.map(x => (x - 128).toByte)

    def benchNs(label: String, elems: Long)(f: () => Double): Unit = {
      (1 to 3).foreach(_ => f())
      val t = (1 to 9).map { _ =>
        val t0 = System.nanoTime(); val r = f(); val dt = System.nanoTime() - t0
        assert(!r.isNaN); dt
      }.sorted.apply(4)
      println(f"$label%-12s ${t / 1e6}%8.2f ms  ${t.toDouble / elems}%6.3f ns/elem")
    }

    val elems = nRows.toLong * dim
    (1 to 3).foreach { _ =>
      benchNs("wsum", elems) { () =>
        var acc = 0.0
        var r = 0
        while (r < nRows) {
          val off = r * dim
          var s = 0.0
          var i = 0
          while (i < dim) {
            s += ws(i) * u(codes(off + i) + 128)
            i += 1
          }
          acc += s
          r += 1
        }
        acc
      }
      benchNs("intDiff2", elems) { () =>
        var acc = 0L
        var r = 0
        while (r < nRows) {
          val off = r * dim
          var s = 0
          var i = 0
          while (i < dim) {
            val d = cq(i) - (codes(off + i) + 128)
            s += d * d
            i += 1
          }
          acc += s
          r += 1
        }
        acc.toDouble
      }
      benchNs("intDot", elems) { () =>
        var acc = 0L
        var r = 0
        while (r < nRows) {
          val off = r * dim
          var s = 0
          var i = 0
          while (i < dim) {
            s += cq(i) * (codes(off + i) + 128)
            i += 1
          }
          acc += s
          r += 1
        }
        acc.toDouble
      }
      benchNs("intDotByte", elems) { () =>
        // byte×byte (no +128 bias): the shape C2's vectorizer likes most
        var acc = 0L
        var r = 0
        while (r < nRows) {
          val off = r * dim
          var s = 0
          var i = 0
          while (i < dim) {
            s += cqB(i) * codes(off + i)
            i += 1
          }
          acc += s
          r += 1
        }
        acc.toDouble
      }
      println("---")
    }
  }
}
