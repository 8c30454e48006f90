package graft.dev

/** Pure-JVM micro for the SQ8 FAISS-regime kernel: S = Σᵢ w(i)·u(cᵢ)
  * over byte codes. Variants: d4 = stride-4 double (today's wsum),
  * f4/f8 = float tables + float chains, d4r2/f4r2 = 2-row blocking.
  * Shapes: 64-d (random row) and 384-d (msmarco row). */
object Sq8WsumMicro {
  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(42)
    for (dim <- Seq(64, 384)) {
      val nRows = 20000
      val codes = new Array[Byte](nRows * dim)
      rnd.nextBytes(codes)
      val w = Array.fill(dim)(rnd.nextDouble())
      val wF = w.map(_.toFloat)
      val u = Array.tabulate(256)(b => b / 255.0)
      val uF = u.map(_.toFloat)

      def d4(off: Int): Double = {
        var a0 = 0.0; var a1 = 0.0; var a2 = 0.0; var a3 = 0.0
        var i = 0; val m4 = dim - 3
        while (i < m4) {
          a0 += w(i) * u(codes(off + i) + 128)
          a1 += w(i + 1) * u(codes(off + i + 1) + 128)
          a2 += w(i + 2) * u(codes(off + i + 2) + 128)
          a3 += w(i + 3) * u(codes(off + i + 3) + 128)
          i += 4
        }
        while (i < dim) { a0 += w(i) * u(codes(off + i) + 128); i += 1 }
        (a0 + a1) + (a2 + a3)
      }
      def f4(off: Int): Double = {
        var a0 = 0.0f; var a1 = 0.0f; var a2 = 0.0f; var a3 = 0.0f
        var i = 0; val m4 = dim - 3
        while (i < m4) {
          a0 += wF(i) * uF(codes(off + i) + 128)
          a1 += wF(i + 1) * uF(codes(off + i + 1) + 128)
          a2 += wF(i + 2) * uF(codes(off + i + 2) + 128)
          a3 += wF(i + 3) * uF(codes(off + i + 3) + 128)
          i += 4
        }
        while (i < dim) { a0 += wF(i) * uF(codes(off + i) + 128); i += 1 }
        ((a0 + a1) + (a2 + a3)).toDouble
      }
      def d4r2(off: Int, out: Array[Double]): Unit = {
        val offB = off + dim
        var a0 = 0.0; var a1 = 0.0; var b0 = 0.0; var b1 = 0.0
        var i = 0; val m2 = dim - 1
        while (i < m2) {
          val w0 = w(i); val w1 = w(i + 1)
          a0 += w0 * u(codes(off + i) + 128)
          a1 += w1 * u(codes(off + i + 1) + 128)
          b0 += w0 * u(codes(offB + i) + 128)
          b1 += w1 * u(codes(offB + i + 1) + 128)
          i += 2
        }
        while (i < dim) {
          a0 += w(i) * u(codes(off + i) + 128)
          b0 += w(i) * u(codes(offB + i) + 128); i += 1
        }
        out(0) = a0 + a1; out(1) = b0 + b1
      }

      def bench(name: String, body: () => Double): Unit = {
        var sink = 0.0
        (1 to 3).foreach(_ => sink += body())
        var best = Long.MaxValue
        (1 to 15).foreach { _ =>
          val t0 = System.nanoTime()
          sink += body()
          val dt = System.nanoTime() - t0
          if (dt < best) best = dt
        }
        println(f"dim=$dim%4d $name%-5s ${best.toDouble / (nRows.toLong * dim)}%6.3f ns/elem (sink=${sink != 0})")
      }
      bench("d4", () => { var s = 0.0; var r = 0; while (r < nRows) { s += d4(r * dim); r += 1 }; s })
      bench("f4", () => { var s = 0.0; var r = 0; while (r < nRows) { s += f4(r * dim); r += 1 }; s })
      bench("d4r2", () => {
        val o = new Array[Double](2); var s = 0.0; var r = 0
        while (r + 1 < nRows) { d4r2(r * dim, o); s += o(0) + o(1); r += 2 }; s
      })
    }
  }
}
