package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded random vector dataset (reference S4:
  * `dataset.py:473-504` `_generate_random_dataset`): train/test Gaussian
  * vectors + brute-force ground truth.
  *
  * Determinism design (SURVEY §7.4-3): the reference's `np.random.seed`
  * doesn't transfer to a cluster, so every value here derives from a
  * **counter-based RNG** — splitmix64 of (seed, row id, component) fed
  * into Box-Muller. Results are identical for any partitioning and any
  * executor count, which is the property that matters at 1000 executors.
  * Generated distributions differ from NumPy's (different bit stream,
  * same N(0,1) law) — semantic parity, not bit parity, as documented.
  */
object RandomDataset {

  @inline private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** uniform in (0,1] from counter (seed, id, j) — never exactly 0 */
  @inline private def uniform(seed: Long, id: Long, j: Int): Double = {
    val h = splitmix64(splitmix64(seed ^ (id * 0x51_7C_C1_B7_27_22_0A_95L)) ^ j.toLong)
    ((h >>> 11) + 1).toDouble / (1L << 53).toDouble
  }

  /** deterministic N(0,1) via Box-Muller on counters (2j, 2j+1) */
  def gaussian(seed: Long, id: Long, j: Int): Float = {
    val u1 = uniform(seed, id, 2 * j)
    val u2 = uniform(seed, id, 2 * j + 1)
    (math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)).toFloat
  }

  /** Mixture-of-gaussians vectors: each row picks one of `numClusters`
    * centers (center_j ~ N(0,1), derived from `centerSeed` alone so a
    * query set generated with a different `seed` shares the SAME
    * centers) and adds noise: isotropic `sigma * N(0,1)` by default, or
    * — when `0 < intrinsicDim < dim` — rank-`intrinsicDim` noise
    * `sigma · B_c z / √r` confined to a per-cluster random subspace
    * (B_c a seeded dim×r gaussian basis shared by train and queries via
    * `centerSeed`, z ~ N(0,1)^r per row; the √r keeps per-component
    * variance ≈ sigma²).
    *
    * Purpose: real embedding tables (GloVe, passage encoders) are
    * strongly clusterable AND low-intrinsic-dimensional — neighbors
    * within a cluster differ along a few directions, not all `dim`.
    * Full-rank gaussian noise at high dim is the degenerate worst case
    * for product quantization (subspace variance everywhere), which is
    * why the full-rank 384-d stand-in under-reported PQ recall (0.52)
    * far below the reference's real-data 0.78. Coarse-quantization
    * recall (IVF/LSH/graph walks) needs the cluster structure; PQ recall
    * additionally needs the spectrum. Same counter-based determinism as
    * [[vectors]]: values depend only on (seed, centerSeed, id, j).
    *
    * `overlap` (0 = off, the default — every pre-existing fixture and
    * pinned oracle is byte-identical): hardness knob for the COARSE
    * quantizer. A pure mixture-of-gaussians at these sigmas is too
    * separable — each query's true neighbors sit in its own cluster, so
    * IVF recall saturates at tiny nprobe (the r7 verdict's "missing
    * hardness" finding: stand-in ivf_flat hits 1.0 at nprobe=4 where
    * real msmarco needs 32 for 0.95). With `overlap` > 0 each point is
    * pulled along a deterministic inter-cluster EDGE: cluster `a` gets
    * `overlapDegree` fixed partner clusters (derived from `centerSeed`,
    * so train and queries share the edge map), the row picks one edge
    * and a position `α ~ U(0, overlap)`, and its mean becomes
    * `(1−α)·center_a + α·center_b`. Points on an edge form a continuum
    * between clusters; a coarse quantizer must cut these bridges
    * somewhere, so near-boundary queries have neighbors on both sides —
    * recall now climbs with nprobe instead of saturating, like real
    * embedding data. Each directed edge carries ≈ n/(numClusters ×
    * overlapDegree) rows, so 20-NN neighborhoods along the edge stay
    * populated. Noise (isotropic or low-rank) is unchanged and keyed to
    * cluster `a`. */
  def clusteredVectors(spark: SparkSession, n: Long, dim: Int,
      numClusters: Int, sigma: Double, seed: Long, centerSeed: Long,
      intrinsicDim: Int = 0, overlap: Double = 0.0,
      overlapDegree: Int = 4): DataFrame = {
    val r = intrinsicDim
    val gen = udf { (id: Long) =>
      val c = ((splitmix64(seed ^ (id * 0x9E3779B97F4A7C15L)) >>> 1) %
        numClusters.toLong)
      // inter-cluster edge: partner cluster + position, only when the
      // overlap knob is on. Counters on the (seed, id) stream start at
      // 1 << 20 — far above the center/noise draws (≤ 2·(dim+r)).
      val (c2, alpha) =
        if (overlap <= 0.0) (c, 0.0)
        else {
          val e = (splitmix64((seed ^ 0xD6E8FEB86659FD93L) ^
            (id * 0x9E3779B97F4A7C15L)) >>> 1) % overlapDegree.toLong
          // edge map is a pure function of (centerSeed, a, e): shared by
          // every seed (train AND queries see the same graph)
          val partner = ((splitmix64(splitmix64(centerSeed ^ 0x0F0F0F0F0F0F0F0FL) ^
            (c * 0x51_7C_C1_B7_27_22_0A_95L) ^ e) >>> 1) % numClusters.toLong)
          (partner, overlap * uniform(seed, id, 1 << 20))
        }
      val out = new Array[Float](dim)
      @inline def center(j: Int): Double =
        if (alpha == 0.0 || c2 == c) gaussian(centerSeed, c, j).toDouble
        else (1.0 - alpha) * gaussian(centerSeed, c, j) +
          alpha * gaussian(centerSeed, c2, j)
      if (r <= 0 || r >= dim) {
        var j = 0
        while (j < dim) {
          out(j) = (center(j) + sigma * gaussian(seed, id, j)).toFloat
          j += 1
        }
      } else {
        val b = RandomDataset.basisFor(centerSeed, c, dim, r)
        val z = new Array[Double](r)
        var l = 0
        // z counters start at dim so they never collide with the center
        // draws on the same (seed, id) stream
        while (l < r) { z(l) = gaussian(seed, id, dim + l); l += 1 }
        val invSqrtR = 1.0 / math.sqrt(r.toDouble)
        var j = 0
        while (j < dim) {
          var acc = 0.0
          var l2 = 0
          while (l2 < r) { acc += b(j * r + l2) * z(l2); l2 += 1 }
          out(j) = (center(j) + sigma * acc * invSqrtR).toFloat
          j += 1
        }
      }
      out
    }
    spark.range(n).select(col("id"), gen(col("id")).as("vector"))
  }

  /** per-cluster noise basis (dim×r gaussians off the centerSeed stream,
    * flattened row-major) — values are pure functions of the key, so the
    * per-JVM memo is only an evaluation cache (≤ clusters × dim × r × 4 B) */
  private val basisCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Long, Int, Int), Array[Float]]()
  private[sources] def basisFor(centerSeed: Long, c: Long, dim: Int,
      r: Int): Array[Float] =
    basisCache.computeIfAbsent((centerSeed, c, dim, r), { key =>
      val (cs, cc, d, rr) = key
      val bSeed = splitmix64(cs ^ 0xA5A5A5A5DEADBEEFL)
      val out = new Array[Float](d * rr)
      var i = 0
      while (i < d * rr) { out(i) = gaussian(bSeed, cc, i); i += 1 }
      out
    })

  /** (id long, vector array<float>) with n rows of dim-d N(0,1) vectors */
  def vectors(spark: SparkSession, n: Long, dim: Int, seed: Long): DataFrame = {
    val gen = udf { (id: Long) =>
      val out = new Array[Float](dim)
      var j = 0
      while (j < dim) { out(j) = gaussian(seed, id, j); j += 1 }
      out
    }
    spark.range(n).select(col("id"), gen(col("id")).as("vector"))
  }

  /** full reference-S4 dataset: train, test, ground truth (via exact kNN) */
  def dataset(spark: SparkSession, trainSize: Long, testSize: Long, dim: Int,
      k: Int, seed: Long, metric: String = "l2")
      : (DataFrame, DataFrame, DataFrame) = {
    val train = vectors(spark, trainSize, dim, seed)
    val test = vectors(spark, testSize, dim, seed + 1)
      .withColumnRenamed("id", "qid")
    val gt = graft.operators.KnnJoin
      .knnJoinAgg(test, train, k, metric)
      .select(col("qid"), transform(col("nn"), x => x("id")).as("gt_ids"))
    (train, test, gt)
  }
}
