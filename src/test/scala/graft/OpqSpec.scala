package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** OPQ (rotation + PQ) semantics: the learned rotation must be
  * orthogonal, must not hurt reconstruction on data where plain PQ is
  * already optimal, and must WIN on anisotropic data whose variance
  * structure straddles subspace boundaries — the case OPQ exists for. */
class OpqSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  /** anisotropic sample: a geometrically-decaying spectrum MIXED through
    * a dense seeded rotation Q, so the principal axes straddle every
    * subspace boundary — the correlated-dims case OPQ exists for (a
    * merely diagonal scaling is nearly subspace-alignable and plain PQ
    * loses almost nothing on it) */
  private def anisotropic(n: Int, dim: Int): Array[Array[Float]] = {
    val rnd = Array.tabulate(dim, dim)((i, j) =>
      graft.sources.RandomDataset.gaussian(7L, i.toLong, j).toDouble)
    val q = new org.apache.commons.math3.linear.QRDecomposition(
      new org.apache.commons.math3.linear.Array2DRowRealMatrix(rnd, false))
      .getQ.getData
    val scales = Array.tabulate(dim)(j => math.pow(0.78, j))
    Array.tabulate(n) { i =>
      val z = Array.tabulate(dim)(j =>
        graft.sources.RandomDataset.gaussian(99L, i.toLong, j) * scales(j))
      Array.tabulate(dim) { r =>
        var acc = 0.0; var j = 0
        while (j < dim) { acc += q(r)(j) * z(j); j += 1 }
        acc.toFloat
      }
    }
  }

  private def mse(sample: Array[Array[Float]], rec: Array[Float] => Array[Float]): Double =
    sample.map { v =>
      val r = rec(v)
      var acc = 0.0; var i = 0
      while (i < v.length) { val d = v(i) - r(i); acc += d * d; i += 1 }
      acc
    }.sum / sample.length

  test("learned rotation is orthogonal (R Rt = I)") {
    val sample = anisotropic(2000, 16)
    val (rot, _) = OpqModel.train(sample, m = 4, nCent = 32, seed = 42,
      opqIters = 4, finalKmIters = 8, rotSampleCap = 2000)
    val d = rot.length
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        var acc = 0.0; var k = 0
        while (k < d) { acc += rot(i)(k).toDouble * rot(j)(k).toDouble; k += 1 }
        val expect = if (i == j) 1.0 else 0.0
        assert(math.abs(acc - expect) < 1e-4, s"R·Rᵀ[$i][$j] = $acc")
        j += 1
      }
      i += 1
    }
  }

  test("OPQ reconstruction beats plain PQ on anisotropic data") {
    val sample = anisotropic(4000, 16)
    val (rot, opq) = OpqModel.train(sample, m = 4, nCent = 32, seed = 42,
      opqIters = 6, finalKmIters = 10, rotSampleCap = 4000)
    val pq = PqModel(
      {
        val dsub = 4
        val cbs = new Array[Array[Array[Float]]](4)
        (0 until 4).foreach { j =>
          val sub = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
          cbs(j) = LocalKMeans.fit(sub, 32, 42L + j, 10)
        }
        cbs
      }, 4)
    // OPQ reconstructs in rotated space: error measured against R·x,
    // which preserves norms (orthogonality), so the comparison is fair
    val opqErr = mse(sample.map(OpqModel.rotate(rot, _)),
      v => OpqModel.reconstruct(opq, v))
    val pqErr = mse(sample, v => OpqModel.reconstruct(pq, v))
    assert(opqErr < pqErr * 0.95,
      f"OPQ mse $opqErr%.4f not materially below PQ mse $pqErr%.4f")
  }

  test("opq_pq searcher: E2E recall >= floor on gate embeddings, artifact reloads") {
    Registry.init()
    val dir = "/root/testdata/sf0.001"
    val base = Tables.embBase(spark, dir).cache()
    val queries = Tables.embQueries(spark, dir)
    val artifact = OpqPqIndexer(numSubspaces = 16, numCentroids = 64, seed = 42)
      .build(base)
    artifact.data.cache().count()
    val res = OpqPqSearcher("l2").search(artifact, queries, 10)
    val gt = KnnJoin.knnJoinAgg(queries, base, 10, "l2")
      .select(col("qid"), transform(col("nn"), x => x("id")).as("gt"))
    val pred = res.groupBy("qid")
      .agg(TopKByDist.topK(col("id"), col("dist"), 10).as("nn"))
      .select(col("qid"), transform(col("nn"), x => x("id")).as("pred"))
    val recall = pred.join(gt, Seq("qid"))
      .select(avg(Metrics.recallAtK(col("pred"), col("gt"), 10)))
      .as[Double].head()
    assert(recall >= 0.5, f"opq_pq recall $recall%.3f below gate floor")
    // reload path: rotation and codebooks reconstruct from aux relations
    val bare = artifact.copy(local = Map.empty)
    val rot2 = OpqModel.rotationOf(bare)
    assert(rot2.length == rot2(0).length)
    val res2 = OpqPqSearcher("l2").search(bare, queries, 10)
      .collect().map(_.toSeq).toSet
    assert(res2 == res.collect().map(_.toSeq).toSet,
      "reloaded artifact diverges from the in-memory model")
    base.unpersist(); artifact.data.unpersist()
  }
}
