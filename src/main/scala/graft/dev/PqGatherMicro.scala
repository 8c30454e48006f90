package graft.dev

/** Pure-JVM micro for the PQ ADC gather loop (128 KB per-query LUT at
  * m=64, nC=256 — L2-resident): 1-, 4-, 8-row blocking, plain and
  * j-tiled. FINDING (r9): results swing 2x run-to-run — the shared
  * `bench(f)` call site is megamorphic, so JIT inlining luck dominates
  * the variants' true differences; meanwhile the full-bench pq row is
  * stable within ±2% across clean runs. Deeper row blocking (8/16) is
  * NOT demonstrably better than the shipped 4-row scoreChunk, so the
  * kernel stays at 4-row. Trust in-context bench rows over this micro. */
object PqGatherMicro {
  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(42)
    val m = 64; val nC = 256; val nRows = 20000
    val codes = new Array[Byte](nRows * m)
    rnd.nextBytes(codes)
    val lut = Array.fill(m * nC)(rnd.nextDouble())
    val out = new Array[Double](nRows)

    def r1(): Unit = {
      var r = 0
      while (r < nRows) {
        val off = r * m
        var acc = 0.0; var j = 0
        while (j < m) { acc += lut(j * nC + (codes(off + j) + 128)); j += 1 }
        out(r) = acc; r += 1
      }
    }
    def rb(block: Int): Unit = {
      var r = 0
      while (r + block - 1 < nRows) {
        var b = 0
        while (b < block) { out(r + b) = 0.0; b += 1 }
        var j = 0
        while (j < m) {
          val base = j * nC + 128
          b = 0
          while (b < block) {
            out(r + b) += lut(base + codes((r + b) * m + j))
            b += 1
          }
          j += 1
        }
        r += block
      }
    }
    // specialized 4/8 (the generic rb has inner-loop overhead)
    def r4(): Unit = {
      var r = 0
      while (r + 3 < nRows) {
        val oA = r * m; val oB = oA + m; val oC = oB + m; val oD = oC + m
        var a0 = 0.0; var a1 = 0.0; var a2 = 0.0; var a3 = 0.0
        var j = 0
        while (j < m) {
          val base = j * nC + 128
          a0 += lut(base + codes(oA + j)); a1 += lut(base + codes(oB + j))
          a2 += lut(base + codes(oC + j)); a3 += lut(base + codes(oD + j))
          j += 1
        }
        out(r) = a0; out(r + 1) = a1; out(r + 2) = a2; out(r + 3) = a3
        r += 4
      }
    }
    def r8(): Unit = {
      var r = 0
      while (r + 7 < nRows) {
        val oA = r * m; val oB = oA + m; val oC = oB + m; val oD = oC + m
        val oE = oD + m; val oF = oE + m; val oG = oF + m; val oH = oG + m
        var a0 = 0.0; var a1 = 0.0; var a2 = 0.0; var a3 = 0.0
        var a4 = 0.0; var a5 = 0.0; var a6 = 0.0; var a7 = 0.0
        var j = 0
        while (j < m) {
          val base = j * nC + 128
          a0 += lut(base + codes(oA + j)); a1 += lut(base + codes(oB + j))
          a2 += lut(base + codes(oC + j)); a3 += lut(base + codes(oD + j))
          a4 += lut(base + codes(oE + j)); a5 += lut(base + codes(oF + j))
          a6 += lut(base + codes(oG + j)); a7 += lut(base + codes(oH + j))
          j += 1
        }
        out(r) = a0; out(r + 1) = a1; out(r + 2) = a2; out(r + 3) = a3
        out(r + 4) = a4; out(r + 5) = a5; out(r + 6) = a6; out(r + 7) = a7
        r += 8
      }
    }
    def bench(name: String, f: () => Unit): Unit = {
      (1 to 5).foreach(_ => f())
      var best = Long.MaxValue
      (1 to 20).foreach { _ =>
        val t0 = System.nanoTime(); f()
        val dt = System.nanoTime() - t0
        if (dt < best) best = dt
      }
      println(f"$name%-4s ${best.toDouble / (nRows.toLong * m)}%6.3f ns/elem (sink=${out(7) != 0})")
    }
    bench("r1", r1 _); bench("r4", r4 _); bench("r8", r8 _)
    bench("rb16", () => rb(16))

    // tiled variants replicating the REAL scoreChunk shape: chunks of
    // 256 rows, j-tiles of jb=32 (64 KB LUT slice), accumulate into out
    val jb = 32; val chunk = 256
    def t1(): Unit = {
      var c0 = 0
      while (c0 < nRows) {
        val c1 = math.min(nRows, c0 + chunk)
        java.util.Arrays.fill(out, c0, c1, 0.0)
        var j0 = 0
        while (j0 < m) {
          val j1 = math.min(m, j0 + jb)
          var r = c0
          while (r < c1) {
            val off = r * m
            var acc = out(r); var j = j0
            while (j < j1) { acc += lut(j * nC + (codes(off + j) + 128)); j += 1 }
            out(r) = acc; r += 1
          }
          j0 = j1
        }
        c0 = c1
      }
    }
    def t4(): Unit = {
      var c0 = 0
      while (c0 < nRows) {
        val c1 = math.min(nRows, c0 + chunk)
        java.util.Arrays.fill(out, c0, c1, 0.0)
        var j0 = 0
        while (j0 < m) {
          val j1 = math.min(m, j0 + jb)
          var r = c0
          while (r + 3 < c1) {
            val oA = r * m; val oB = oA + m; val oC = oB + m; val oD = oC + m
            var a0 = out(r); var a1 = out(r + 1)
            var a2 = out(r + 2); var a3 = out(r + 3)
            var j = j0
            while (j < j1) {
              val base = j * nC + 128
              a0 += lut(base + codes(oA + j)); a1 += lut(base + codes(oB + j))
              a2 += lut(base + codes(oC + j)); a3 += lut(base + codes(oD + j))
              j += 1
            }
            out(r) = a0; out(r + 1) = a1; out(r + 2) = a2; out(r + 3) = a3
            r += 4
          }
          while (r < c1) {
            val off = r * m
            var acc = out(r); var j = j0
            while (j < j1) { acc += lut(j * nC + (codes(off + j) + 128)); j += 1 }
            out(r) = acc; r += 1
          }
          j0 = j1
        }
        c0 = c1
      }
    }
    bench("t1", t1 _); bench("t4", t4 _)
  }
}
