package graft.dev

/** Pure-JVM kernel micro (no Spark): is the float→double convert the
  * bottleneck of the strided dot kernels? Compares, at the baseline scan
  * shapes (dims 50/64/384):
  *   d1  — index-order double accumulation (the oracle-exact kernel)
  *   d4  — stride-4 double chains (strided_accum today)
  *   f4  — stride-4 FLOAT chains (FAISS's own accumulation: no cvt)
  *   f8  — stride-8 float chains
  * Each timed over a flat table scan of 20k rows × 256 queries worth of
  * dots, single-threaded (thread count only scales the same loop).
  */
object FloatAccumMicro {
  def d1(q: Array[Float], f: Array[Float], off: Int, dim: Int): Double = {
    var acc = 0.0; var i = 0
    while (i < dim) { acc += q(i).toDouble * f(off + i).toDouble; i += 1 }
    acc
  }
  def d4(q: Array[Float], f: Array[Float], off: Int, dim: Int): Double = {
    var a0 = 0.0; var a1 = 0.0; var a2 = 0.0; var a3 = 0.0
    var i = 0; val m4 = dim - 3
    while (i < m4) {
      a0 += q(i).toDouble * f(off + i).toDouble
      a1 += q(i + 1).toDouble * f(off + i + 1).toDouble
      a2 += q(i + 2).toDouble * f(off + i + 2).toDouble
      a3 += q(i + 3).toDouble * f(off + i + 3).toDouble
      i += 4
    }
    while (i < dim) { a0 += q(i).toDouble * f(off + i).toDouble; i += 1 }
    (a0 + a1) + (a2 + a3)
  }
  def f4(q: Array[Float], f: Array[Float], off: Int, dim: Int): Double = {
    var a0 = 0.0f; var a1 = 0.0f; var a2 = 0.0f; var a3 = 0.0f
    var i = 0; val m4 = dim - 3
    while (i < m4) {
      a0 += q(i) * f(off + i)
      a1 += q(i + 1) * f(off + i + 1)
      a2 += q(i + 2) * f(off + i + 2)
      a3 += q(i + 3) * f(off + i + 3)
      i += 4
    }
    while (i < dim) { a0 += q(i) * f(off + i); i += 1 }
    ((a0 + a1) + (a2 + a3)).toDouble
  }
  def f8(q: Array[Float], f: Array[Float], off: Int, dim: Int): Double = {
    var a0 = 0.0f; var a1 = 0.0f; var a2 = 0.0f; var a3 = 0.0f
    var a4 = 0.0f; var a5 = 0.0f; var a6 = 0.0f; var a7 = 0.0f
    var i = 0; val m8 = dim - 7
    while (i < m8) {
      a0 += q(i) * f(off + i)
      a1 += q(i + 1) * f(off + i + 1)
      a2 += q(i + 2) * f(off + i + 2)
      a3 += q(i + 3) * f(off + i + 3)
      a4 += q(i + 4) * f(off + i + 4)
      a5 += q(i + 5) * f(off + i + 5)
      a6 += q(i + 6) * f(off + i + 6)
      a7 += q(i + 7) * f(off + i + 7)
      i += 8
    }
    while (i < dim) { a0 += q(i) * f(off + i); i += 1 }
    (((a0 + a1) + (a2 + a3)) + ((a4 + a5) + (a6 + a7))).toDouble
  }

  /** 4-row-blocked double dot: each row's accumulation stays EXACT
    * index order (bit-identical to d1), the four chains pipeline */
  def rb4(q: Array[Float], f: Array[Float], off: Int, dim: Int,
      out: Array[Double]): Unit = {
    var a0 = 0.0; var a1 = 0.0; var a2 = 0.0; var a3 = 0.0
    val o1 = off + dim; val o2 = o1 + dim; val o3 = o2 + dim
    var i = 0
    while (i < dim) {
      val qi = q(i).toDouble
      a0 += qi * f(off + i).toDouble
      a1 += qi * f(o1 + i).toDouble
      a2 += qi * f(o2 + i).toDouble
      a3 += qi * f(o3 + i).toDouble
      i += 1
    }
    out(0) = a0; out(1) = a1; out(2) = a2; out(3) = a3
  }

  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(42)
    for (dim <- Seq(50, 64, 384)) {
      val nRows = 20000
      val flat = Array.fill(nRows * dim)(rnd.nextFloat())
      val q = Array.fill(dim)(rnd.nextFloat())
      def bench(name: String, k: (Array[Float], Array[Float], Int, Int) => Double): Unit = {
        var sink = 0.0
        // warm
        var w = 0
        while (w < 3) {
          var r = 0
          while (r < nRows) { sink += k(q, flat, r * dim, dim); r += 1 }
          w += 1
        }
        val reps = 20
        var best = Long.MaxValue
        var rep = 0
        while (rep < reps) {
          val t0 = System.nanoTime()
          var r = 0
          while (r < nRows) { sink += k(q, flat, r * dim, dim); r += 1 }
          val dt = System.nanoTime() - t0
          if (dt < best) best = dt
          rep += 1
        }
        println(f"dim=$dim%4d $name%-4s ${best.toDouble / (nRows.toLong * dim)}%6.3f ns/elem  (sink=${sink != 0}%s)")
      }
      bench("d1", d1); bench("d4", d4); bench("f4", f4); bench("f8", f8)
      // row-blocked variant has its own harness shape (4 rows per call)
      locally {
        val out = new Array[Double](4)
        var sink = 0.0
        var w = 0
        while (w < 3) {
          var r = 0
          while (r + 3 < nRows) { rb4(q, flat, r * dim, dim, out); sink += out(0); r += 4 }
          w += 1
        }
        var best = Long.MaxValue
        var rep = 0
        while (rep < 20) {
          val t0 = System.nanoTime()
          var r = 0
          while (r + 3 < nRows) { rb4(q, flat, r * dim, dim, out); sink += out(3); r += 4 }
          val dt = System.nanoTime() - t0
          if (dt < best) best = dt
          rep += 1
        }
        println(f"dim=$dim%4d rb4  ${best.toDouble / (nRows.toLong * dim)}%6.3f ns/elem  (sink=${sink != 0}%s)")
      }
    }
  }
}
