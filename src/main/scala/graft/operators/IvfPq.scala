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
  * Deviation from FAISS (documented, same as IvfSq8): PQ codes quantize
  * the raw vectors, not the residuals vs the coarse centroid — one shared
  * codebook set instead of per-list residual geometry; same recall regime,
  * simpler relational shape.
  */
final case class IvfPqIndexer(
    nlist: Int, numSubspaces: Int, numCentroids: Int, seed: Long)
  extends Indexer {
  val kind = "ivf_pq"

  def build(base: DataFrame): IndexArtifact = {
    val ivf = IvfIndexer(nlist, seed).build(base)
    val pq = PqIndexer(numSubspaces, numCentroids, seed).build(base)
    val data = ivf.data.select("id", "centroid_id")
      .join(pq.data, Seq("id"))
    IndexArtifact(kind, data,
      meta = pq.meta ++ ivf.meta,
      aux = Map("centroids" -> ivf.aux("centroids"),
        "codebooks" -> pq.aux("codebooks")))
  }
}

final case class IvfPqSearcher(nprobe: Int, metric: String) extends Searcher
    with QueryBroadcastLifecycle {
  def search(artifact: IndexArtifact, queries: DataFrame, k: Int): DataFrame = {
    val model = PqModel.fromArtifact(artifact)
    val q = queries.select(col("qid").cast("long").as("qid"), col("vector"))
    val luts = model.luts(q, metric)
    val score = model.adcScoreUdf(
      trackBroadcast(artifact.data.sparkSession, luts))
    val centroids = artifact.aux("centroids")
      .select(col("centroid_id").cast("long").as("id"), col("vector"))
    val probes = KnnJoin.knnJoin(q, centroids, nprobe, "l2")
      .select(col("qid"), col("id").cast("int").as("centroid_id"))
    val l2 = !(metric == "ip" || metric == "dot")
    val distCol =
      if (l2) sqrt(score(col("qid"), col("codes")))
      else score(col("qid"), col("codes"))
    val scored = artifact.data
      .join(broadcast(probes), Seq("centroid_id"))
      .select(col("qid"), col("id"), distCol.as("__dist"))
    KnnJoin.topKExploded(scored, col("id"), col("__dist"), k)
  }
}
