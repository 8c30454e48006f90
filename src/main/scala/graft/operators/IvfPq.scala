package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF + PQ composition (reference: FAISS `IVF256,PQ64` — the `ivf_pq`
  * rows of configs/benchmark_config.yaml:61-72 and every
  * benchmark_summary.md dataset table): coarse-quantizer partition pruning
  * over product-quantized codes. The index relation is
  * `(id, centroid_id, codes)` — pruning key + compressed payload in one
  * table, partitionable/bucketable by `centroid_id` at cluster scale, so a
  * probe reads `nprobe/nlist` of the data and scores m-byte codes instead
  * of full vectors.
  *
  * Two encodings:
  *  - `residual = false` (default): PQ codes quantize the raw vectors —
  *    one shared codebook set, simpler relational shape, and the encoding
  *    the gate oracle's SQL replica is pinned to;
  *  - `residual = true`: the FAISS-faithful IVFPQ — codes quantize
  *    `v − centroid(v)`, so each inverted list spends its 256 codewords
  *    per subspace on the local residual geometry instead of the global
  *    spread. Search builds the per-(query, probed-list) lookup table
  *    `lut(q − c)` lazily on the executor (memoized per task), exactly
  *    FAISS's precompute-per-list discipline.
  */
final case class IvfPqIndexer(
    nlist: Int, numSubspaces: Int, numCentroids: Int, seed: Long,
    residual: Boolean = false)
  extends Indexer {
  val kind = "ivf_pq"

  def build(base: DataFrame): IndexArtifact = {
    val ivf = IvfIndexer(nlist, seed).build(base)
    val pqInput =
      if (!residual) base
      else {
        // residuals vs the assigned coarse centroid: the centroid table is
        // tiny (nlist rows) → broadcast map, zero-shuffle subtraction
        val spark = base.sparkSession
        val cents = ivf.aux("centroids").select("centroid_id", "vector")
          .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toMap
        val bc = spark.sparkContext.broadcast(cents)
        val resUdf = udf { (cid: Int, v: Seq[Float]) =>
          val c = bc.value(cid)
          val out = new Array[Float](c.length)
          var i = 0
          while (i < c.length) { out(i) = v(i) - c(i); i += 1 }
          out
        }
        ivf.data.select(col("id"),
          resUdf(col("centroid_id"), col("vector")).as("vector"))
      }
    val pq = PqIndexer(numSubspaces, numCentroids, seed).build(pqInput)
    val data = ivf.data.select("id", "centroid_id")
      .join(pq.data, Seq("id"))
    IndexArtifact(kind, data,
      meta = pq.meta ++ ivf.meta + ("residual" -> residual.toString),
      aux = Map("centroids" -> ivf.aux("centroids"),
        "codebooks" -> pq.aux("codebooks")))
  }
}

final case class IvfPqSearcher(nprobe: Int, metric: String) extends Searcher
    with QueryBroadcastLifecycle {
  def search(artifact: IndexArtifact, queries: DataFrame, k: Int): DataFrame = {
    val model = PqModel.fromArtifact(artifact)
    val q = queries.select(col("qid").cast("long").as("qid"), col("vector"))
    val centroids = artifact.aux("centroids")
      .select(col("centroid_id").cast("long").as("id"), col("vector"))
    val probes = KnnJoin.knnJoin(q, centroids, nprobe, "l2")
      .select(col("qid"), col("id").cast("int").as("centroid_id"))
    val l2 = !(metric == "ip" || metric == "dot")
    val spark = artifact.data.sparkSession

    val score =
      if (artifact.meta.getOrElse("residual", "false") != "true") {
        val luts = model.luts(q, metric)
        model.adcScoreUdf(trackBroadcast(spark, luts))
      } else {
        // Residual ADC via FAISS's precomputed-table decomposition
        // (IndexIVFPQ use_precomputed_table):
        //   ‖q−c−y‖² = ‖q−c‖² + (‖y‖²+2c·y) + (−2q·y)
        // term2 is query-INdependent (one nlist × m×nC float table),
        // term3 depends only on the raw query (one m×nC table per query,
        // same size as the raw-PQ LUT), term1 is a scalar per
        // (query, probed list). A naive per-(query, list) LUT would be
        // nlist× bigger and OOMed at reference configs.
        require(l2, "residual IVF-PQ scoring is defined for L2")
        val qVecs = model.collectByQid(q)
        val cents = artifact.aux("centroids").select("centroid_id", "vector")
          .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toMap
        // term3 per query: −2·q_j·cb_j[c] (the ip LUT is −q·y; double it)
        val qLut: Map[Long, Array[Double]] =
          qVecs.map { case (qid, v) =>
            qid -> model.lut(v, "ip").map(_ * 2.0)
          }
        // term2 per list: ‖y‖² + 2·c_j·y over every (subspace, code)
        val mm = model.codebooks.length
        val nC = model.codebooks(0).length
        val dsub = model.dsub
        val nlist = cents.keys.max + 1
        val t2 = Array.ofDim[Float](nlist, mm * nC)
        cents.foreach { case (cid, cv) =>
          val row = t2(cid)
          var j = 0
          while (j < mm) {
            val cb = model.codebooks(j)
            var cc = 0
            while (cc < nC) {
              val y = cb(cc)
              var acc = 0.0
              var i = 0
              while (i < dsub) {
                val yy = y(i).toDouble
                acc += yy * yy + 2.0 * cv(j * dsub + i) * yy
                i += 1
              }
              row(j * nC + cc) = acc.toFloat
              cc += 1
            }
            j += 1
          }
        }
        // term1 per (query, list): ‖q−c‖²
        val qcNorm = new java.util.HashMap[Long, java.lang.Double]()
        qVecs.foreach { case (qid, qv) =>
          cents.foreach { case (cid, cv) =>
            var acc = 0.0
            var i = 0
            while (i < qv.length) {
              val d = qv(i).toDouble - cv(i); acc += d * d; i += 1
            }
            qcNorm.put((qid << 32) | (cid.toLong & 0xffffffffL), acc)
          }
        }
        val scorer = new ResidualAdcScorer(
          trackBroadcast(spark, (qLut, t2, qcNorm)))
        udf { (qid: Long, cid: Int, codes: Array[Byte]) =>
          scorer.score(qid, cid, codes)
        }
      }
    val distArgs =
      if (artifact.meta.getOrElse("residual", "false") != "true")
        score(col("qid"), col("codes"))
      else score(col("qid"), col("centroid_id"), col("codes"))
    val distCol = if (l2) sqrt(distArgs) else distArgs
    val scored = artifact.data
      .join(broadcast(probes), Seq("centroid_id"))
      .select(col("qid"), col("id"), distCol.as("__dist"))
    KnnJoin.topKExploded(scored, col("id"), col("__dist"), k)
  }
}

/** Residual ADC scoring kernel over the precomputed decomposition:
  * `score = ‖q−c‖² + Σ_j (t2[cid][j,code] + qLut[qid][j,code])`.
  * Everything rides in ONE broadcast; the per-row work is two table adds
  * per subspace — the same order as raw ADC. */
final class ResidualAdcScorer(
    bc: org.apache.spark.broadcast.Broadcast[
      (Map[Long, Array[Double]], Array[Array[Float]],
        java.util.HashMap[Long, java.lang.Double])]) extends Serializable {

  def score(qid: Long, cid: Int, codes: Array[Byte]): Double = {
    val (qLut, t2, qcNorm) = bc.value
    val ql = qLut(qid)
    val t = t2(cid)
    val mm = codes.length
    val nC = ql.length / mm
    var acc: Double = qcNorm.get((qid << 32) | (cid.toLong & 0xffffffffL))
    var j = 0
    while (j < mm) {
      val idx = j * nC + (codes(j) + 128)
      acc += t(idx) + ql(idx)
      j += 1
    }
    // the three-term cancellation can round to ~-1e-16 when the true
    // distance is ~0; sqrt would then yield NaN (ordered LAST by Spark,
    // dropping the best candidate from top-k)
    math.max(0.0, acc)
  }
}
