package graft.operators

/** Small driver-side Lloyd's k-means for codebook training (PQ subspace
  * codebooks, SQ breakpoints). Deterministic: seeded init (plain random
  * distinct points, or k-means++ D²-sampling when `init = "++"`), fixed
  * iteration count. Operates on a bounded sample collected to the
  * driver — the same training discipline FAISS uses for PQ codebooks.
  *
  * Two pure speedups, both bit-identical to the naive loop (same
  * floating-point operation order, same seeded randomness):
  *   - fixed-point early stop: when an iteration's assignment equals the
  *     previous one and no cluster is empty, the update would recompute
  *     exactly the same means, so every remaining iteration is a no-op —
  *     skip them (clustered inputs converge in a fraction of the budget);
  *   - the update step parallelizes over CENTERS, each center summing its
  *     members in ascending point order — the same per-center addition
  *     order as the serial loop, so the means match bit for bit while the
  *     O(n·dim) accumulation fans across driver cores.
  */
object LocalKMeans {

  def fit(points: Array[Array[Float]], k: Int, seed: Long, iters: Int,
      init: String = "random"): Array[Array[Float]] = {
    require(points.nonEmpty)
    val dim = points(0).length
    val n = points.length
    val kk = math.min(k, n)
    val rnd = new java.util.Random(seed)

    var centers =
      if (init == "++") ppInit(points, kk, rnd)
      else {
        // init: distinct random points (seeded)
        val perm = rnd.ints(0, n).distinct().limit(kk).toArray
        perm.map(i => points(i).clone())
      }

    val assign = new Array[Int](n)
    java.util.Arrays.fill(assign, -1)
    var iter = 0
    var converged = false
    while (iter < iters && !converged) {
      // assignment — the O(n·k·dim) step; per-point independent, so fan it
      // across driver cores (deterministic: writes its own slot only)
      val cs = centers
      val anyChanged = new java.util.concurrent.atomic.AtomicBoolean(false)
      java.util.stream.IntStream.range(0, n).parallel().forEach { i =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        val p = points(i)
        while (c < cs.length) {
          var d = 0.0; var j = 0
          val ce = cs(c)
          while (j < dim) { val df = p(j) - ce(j); d += df * df; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        if (assign(i) != best) {
          assign(i) = best
          if (!anyChanged.get()) anyChanged.set(true)
        }
      }
      val counts = new Array[Int](centers.length)
      var i = 0
      while (i < n) { counts(assign(i)) += 1; i += 1 }
      if (!anyChanged.get() && !counts.contains(0)) {
        // fixed point: same assignment + no empty cluster to re-seed →
        // the update reproduces the current centers, forever
        converged = true
      } else {
        val next = new Array[Array[Float]](centers.length)
        // per-center member sums in ascending point order (see scaladoc)
        java.util.stream.IntStream.range(0, centers.length).parallel().forEach { c =>
          if (counts(c) > 0) {
            val sums = new Array[Double](dim)
            var i2 = 0
            while (i2 < n) {
              if (assign(i2) == c) {
                val p = points(i2)
                var j = 0
                while (j < dim) { sums(j) += p(j); j += 1 }
              }
              i2 += 1
            }
            val out = new Array[Float](dim)
            var j = 0
            while (j < dim) { out(j) = (sums(j) / counts(c)).toFloat; j += 1 }
            next(c) = out
          }
        }
        // empty-cluster re-seeds draw from the shared seeded stream, so
        // they stay serial and in center order (exactly the old loop)
        var c = 0
        while (c < next.length) {
          if (counts(c) == 0) next(c) = points(rnd.nextInt(n)).clone()
          c += 1
        }
        centers = next
      }
      iter += 1
    }
    centers
  }

  /** k-means++ (Arthur & Vassilvitskii '07) seeding: first center uniform,
    * each next sampled ∝ D²(x) to the nearest chosen center. Costs one
    * extra O(n·k·dim) pass total (D² updates incrementally per new
    * center); on structured data it cuts quantization error vs random
    * init enough to matter for PQ recall at high dim. Deterministic from
    * `rnd`; the D² update parallelizes per point (own-slot writes only). */
  private def ppInit(points: Array[Array[Float]], kk: Int,
      rnd: java.util.Random): Array[Array[Float]] = {
    val n = points.length
    val dim = points(0).length
    val centers = new Array[Array[Float]](kk)
    centers(0) = points(rnd.nextInt(n)).clone()
    val d2 = new Array[Double](n)
    java.util.Arrays.fill(d2, Double.MaxValue)
    var c = 0
    while (c < kk - 1) {
      val ce = centers(c)
      java.util.stream.IntStream.range(0, n).parallel().forEach { i =>
        val p = points(i)
        var d = 0.0; var j = 0
        while (j < dim) { val df = p(j) - ce(j); d += df * df; j += 1 }
        if (d < d2(i)) d2(i) = d
      }
      var total = 0.0
      var i = 0
      while (i < n) { total += d2(i); i += 1 }
      val next =
        if (total <= 0.0) rnd.nextInt(n) // all points coincide with centers
        else {
          val target = rnd.nextDouble() * total
          var acc = 0.0; var pick = n - 1; var s = 0
          var found = false
          while (s < n && !found) {
            acc += d2(s)
            if (acc >= target) { pick = s; found = true }
            s += 1
          }
          pick
        }
      centers(c + 1) = points(next).clone()
      c += 1
    }
    centers
  }
}
