package graft.operators

/** Small driver-side Lloyd's k-means for codebook training (PQ subspace
  * codebooks, SQ breakpoints). Deterministic: seeded k-means++-lite init
  * (greedy farthest of a seeded candidate stream), fixed iteration count.
  * Operates on a bounded sample collected to the driver — the same
  * training discipline FAISS uses for PQ codebooks.
  */
object LocalKMeans {

  def fit(points: Array[Array[Float]], k: Int, seed: Long, iters: Int)
      : Array[Array[Float]] = {
    require(points.nonEmpty)
    val dim = points(0).length
    val n = points.length
    val kk = math.min(k, n)
    val rnd = new java.util.Random(seed)

    // init: distinct random points (seeded)
    val perm = rnd.ints(0, n).distinct().limit(kk).toArray
    var centers = perm.map(i => points(i).clone())

    val assign = new Array[Int](n)
    var iter = 0
    while (iter < iters) {
      // assignment — the O(n·k·dim) step; per-point independent, so fan it
      // across driver cores (deterministic: writes its own slot only)
      val cs = centers
      java.util.stream.IntStream.range(0, n).parallel().forEach { i =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < cs.length) {
          var d = 0.0; var j = 0
          val ce = cs(c); val p = points(i)
          while (j < dim) { val df = p(j) - ce(j); d += df * df; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        assign(i) = best
      }
      var i = 0
      // update
      val sums = Array.fill(centers.length)(new Array[Double](dim))
      val counts = new Array[Int](centers.length)
      i = 0
      while (i < n) {
        val a = assign(i); counts(a) += 1
        var j = 0
        while (j < dim) { sums(a)(j) += points(i)(j); j += 1 }
        i += 1
      }
      centers = centers.indices.map { c =>
        if (counts(c) == 0) points(rnd.nextInt(n)).clone() // re-seed empty
        else {
          val out = new Array[Float](dim)
          var j = 0
          while (j < dim) { out(j) = (sums(c)(j) / counts(c)).toFloat; j += 1 }
          out
        }
      }.toArray
      iter += 1
    }
    centers
  }
}
