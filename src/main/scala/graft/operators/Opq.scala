package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Optimized Product Quantization (Ge et al., CVPR '13; FAISS `OPQ..,PQ..`
  * pre-transform): learn an orthogonal rotation `R` that minimizes PQ
  * reconstruction error, then product-quantize `R·x` instead of `x`.
  * Plain PQ's independence assumption breaks when variance concentrates
  * in few directions or correlates across subspaces — the rotation
  * redistributes it so each subspace codebook earns its bits.
  *
  * Training (non-parametric OPQ, alternating minimization on the bounded
  * driver sample — the same training discipline as [[PqModel.train]]):
  * repeat: (1) train subspace codebooks on `R·X` (few Lloyd iters),
  * (2) reconstruct `B ≈ R·X` from the codes, (3) update `R` by the
  * orthogonal Procrustes solution `R = U·Vᵀ` from `SVD(B·Xᵀ)`
  * (commons-math3, d×d — driver-trivial). A final full-strength PQ train
  * runs on the converged rotation.
  *
  * Spark shape: identical to PQ everywhere that matters at scale — the
  * index relation is `(id, codes)`, encode is one rotate+assign
  * mapPartitions pass, search rotates the (driver-collected) query batch
  * and reuses the PQ ADC machinery ([[AdcScan.PqLutScorer]], tiled
  * scans) unchanged. The rotation rides in the artifact as an aux
  * relation `(row_idx, row)` plus the local model.
  *
  * Beyond the reference: its engine stops at PQ/IVF-PQ
  * (modular.py:224-289); OPQ is the standard next rung on the same
  * recall/byte tradeoff. Floor-tier gate (seeded model; like J11) —
  * OpqSpec asserts reconstruction error ≤ plain PQ and rotation
  * orthogonality.
  */
final case class OpqPqIndexer(numSubspaces: Int, numCentroids: Int,
    seed: Long, opqIters: Int = 8, trainIters: Int = 15) extends Indexer {
  val kind = "opq_pq"

  val trainSample = 65536
  /** rotation-loop sample cap: the Procrustes update is O(d²·n) — 16k
    * rows locate the rotation as well as 64k at a quarter the cost */
  val rotSample = 16384

  def build(base: DataFrame): IndexArtifact = {
    val spark = base.sparkSession
    import spark.implicits._
    val cached = base.select(col("id").cast("long").as("id"), col("vector")).cache()
    val n = cached.count()
    val fraction = math.min(1.0, trainSample.toDouble / math.max(1L, n))
    val sample = (if (fraction < 1.0)
        cached.sample(withReplacement = false, fraction, seed)
      else cached)
      .select(col("vector")).collect()
      .map(_.getSeq[Float](0).toArray)
    val (rot, model) = OpqModel.train(sample, numSubspaces,
      math.min(numCentroids, n.toInt), seed, opqIters, trainIters, rotSample)
    val data = cached
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (i, v) =>
        (i, model.encode(OpqModel.rotate(rot, v)))
      })
      .toDF("id", "codes")
    cached.unpersist()
    val rotDf = rot.zipWithIndex.map { case (row, i) => (i, row.toSeq) }
      .toSeq.toDF("row_idx", "row")
    IndexArtifact(kind, data,
      meta = PqModel.metaOf(model, numSubspaces, seed) +
        ("opq_iters" -> opqIters.toString),
      aux = Map("codebooks" -> PqModel.codebooksDf(spark, model),
        "rotation" -> rotDf),
      local = Map("pq_model" -> model, "opq_rot" -> rot))
  }
}

final case class OpqPqSearcher(metric: String) extends Searcher
    with QueryBroadcastLifecycle {
  def search(artifact: IndexArtifact, queries: DataFrame, k: Int): DataFrame = {
    beginSearch()
    val model = PqModel.fromArtifact(artifact)
    val rot = OpqModel.rotationOf(artifact)
    val spark = artifact.data.sparkSession
    val (qids, qVecs) = LocalScan.queryVecsAlways(queries)
    // rotate the query batch once on the driver (d×d · batch — trivial),
    // then the search IS plain PQ ADC over the rotated geometry
    val rotated = qVecs.map(OpqModel.rotate(rot, _))
    val lutArr = new Array[Array[Double]](rotated.length)
    java.util.stream.IntStream.range(0, rotated.length).parallel()
      .forEach(i => lutArr(i) = model.lut(rotated(i), metric))
    val l2 = !(metric == "ip" || metric == "dot")
    val localTable = LocalScan.codeTable(artifact.data, ivf = false)
    val scorer = new AdcScan.PqLutScorer(
      trackLut(spark, localTable.isDefined, lutArr), l2)
    localTable match {
      case Some(ct) => LocalScan.scanCodesFull(spark, ct, qids, k, scorer)
      case None => AdcScan.searchTopK(artifact.data, qids, k, scorer)
    }
  }
}

object OpqModel {

  /** R·v for a row-major d×d rotation */
  def rotate(rot: Array[Array[Float]], v: Array[Float]): Array[Float] = {
    val d = rot.length
    val out = new Array[Float](d)
    var i = 0
    while (i < d) {
      val row = rot(i)
      var acc = 0.0
      var j = 0
      while (j < d) { acc += row(j).toDouble * v(j); j += 1 }
      out(i) = acc.toFloat
      i += 1
    }
    out
  }

  def rotationOf(artifact: IndexArtifact): Array[Array[Float]] =
    artifact.local.get("opq_rot") match {
      case Some(r: Array[Array[Float]]) => r
      case _ =>
        val rows = artifact.aux("rotation")
          .select(col("row_idx").cast("int"), col("row")).collect()
        val rot = new Array[Array[Float]](rows.length)
        rows.foreach(r => rot(r.getInt(0)) = r.getSeq[Float](1).toArray)
        rot
    }

  /** alternating rotation + codebook training; returns (R, final model) */
  def train(sample: Array[Array[Float]], m: Int, nCent: Int, seed: Long,
      opqIters: Int, finalKmIters: Int, rotSampleCap: Int)
      : (Array[Array[Float]], PqModel) = {
    require(sample.nonEmpty, "empty training sample")
    val d = sample(0).length
    require(d % m == 0, s"dim $d not divisible by num_subspaces $m")
    val dsub = d / m
    // deterministic prefix subsample for the rotation loop
    val x = if (sample.length <= rotSampleCap) sample else sample.take(rotSampleCap)
    // rotate/reconstruct are per-VECTOR independent (no cross-vector
    // accumulation), so a parallel map is bit-identical to the
    // sequential one — the oracle-pinned arithmetic lives in procrustes'
    // Σ x·bᵀ (deliberately kept sequential) and in LocalKMeans (already
    // parallel ACROSS independent subspaces only). r14: these two maps
    // were the serial bulk of the ~0.8 s driver gap in the OPQ gates.
    def mapPar(xs: Array[Array[Float]], f: Array[Float] => Array[Float])
        : Array[Array[Float]] = {
      val out = new Array[Array[Float]](xs.length)
      java.util.stream.IntStream.range(0, xs.length).parallel()
        .forEach(i => out(i) = f(xs(i)))
      out
    }
    var rot = identity(d)
    var it = 0
    while (it < opqIters) {
      val y = mapPar(x, rotate(rot, _))
      val pq = fitCodebooks(y, m, nCent, dsub, seed, iters = 4)
      val b = mapPar(y, reconstruct(pq, _))
      rot = procrustes(x, b)
      it += 1
    }
    // final full-strength codebooks on the converged rotation, over the
    // FULL sample (the loop's subsample only shaped R)
    val yFull = mapPar(sample, rotate(rot, _))
    val model = PqModel(fitCodebooksArr(yFull, m, nCent, dsub, seed, finalKmIters), dsub)
    (rot, model)
  }

  private def identity(d: Int): Array[Array[Float]] = {
    val r = Array.fill(d)(new Array[Float](d))
    var i = 0
    while (i < d) { r(i)(i) = 1f; i += 1 }
    r
  }

  private def fitCodebooksArr(y: Array[Array[Float]], m: Int, nCent: Int,
      dsub: Int, seed: Long, iters: Int): Array[Array[Array[Float]]] = {
    val cbs = new Array[Array[Array[Float]]](m)
    java.util.stream.IntStream.range(0, m).parallel().forEach { j =>
      val sub = y.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      cbs(j) = LocalKMeans.fit(sub, nCent, seed + j, iters)
    }
    cbs
  }

  private def fitCodebooks(y: Array[Array[Float]], m: Int, nCent: Int,
      dsub: Int, seed: Long, iters: Int): PqModel =
    PqModel(fitCodebooksArr(y, m, nCent, dsub, seed, iters), dsub)

  /** decode(encode(v)) — the PQ reconstruction of a (rotated) vector */
  private[graft] def reconstruct(pq: PqModel, v: Array[Float]): Array[Float] = {
    val codes = pq.encode(v)
    val d = pq.dsub * pq.codebooks.length
    val out = new Array[Float](d)
    var j = 0
    while (j < pq.codebooks.length) {
      val c = pq.codebooks(j)(codes(j) + 128)
      System.arraycopy(c, 0, out, j * pq.dsub, pq.dsub)
      j += 1
    }
    out
  }

  /** orthogonal Procrustes: argmin_R ‖R·X − B‖_F over orthogonal R is
    * U·Vᵀ from SVD(B·Xᵀ) (columns = samples). M = B·Xᵀ accumulates
    * sample-parallel; the d×d SVD is commons-math3 (on Spark's own
    * classpath). */
  private[operators] def procrustes(x: Array[Array[Float]],
      b: Array[Array[Float]]): Array[Array[Float]] = {
    val d = x(0).length
    val n = x.length
    val m = Array.ofDim[Double](d, d)
    // M[i][j] = Σ_s b_s[i] · x_s[j]; parallel over output rows so each
    // thread owns its slice (deterministic: plain sum per cell in s order)
    java.util.stream.IntStream.range(0, d).parallel().forEach { i =>
      val row = m(i)
      var s = 0
      while (s < n) {
        val bi = b(s)(i).toDouble
        if (bi != 0.0) {
          val xs = x(s)
          var j = 0
          while (j < d) { row(j) += bi * xs(j); j += 1 }
        }
        s += 1
      }
    }
    val svd = new org.apache.commons.math3.linear.SingularValueDecomposition(
      new org.apache.commons.math3.linear.Array2DRowRealMatrix(m, false))
    val r = svd.getU.multiply(svd.getVT).getData
    r.map(_.map(_.toFloat))
  }
}
