package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF + SQ8 composition (reference: FAISS `IVF256,SQ8`,
  * configs/benchmark_config.yaml:36-60 — J10): coarse-quantizer partition
  * pruning over 8-bit-quantized codes. The index relation is
  * `(id, centroid_id, codes)` — both the pruning key and the compressed
  * payload in one table, partitionable by `centroid_id` at scale.
  *
  * Deviation from FAISS (documented): codes quantize the raw vectors, not
  * the residuals vs the coarse centroid — same recall regime, simpler
  * relational shape.
  */
final case class IvfSq8Indexer(nlist: Int, seed: Long) extends Indexer {
  val kind = "ivf_sq8"

  def build(base: DataFrame): IndexArtifact = {
    val ivf = IvfIndexer(nlist, seed).build(base)
    val sq8 = Sq8Indexer().build(base)
    val data = ivf.data.select("id", "centroid_id")
      .join(sq8.data, Seq("id"))
    IndexArtifact(kind, data,
      meta = sq8.meta ++ ivf.meta,
      aux = Map("centroids" -> ivf.aux("centroids")))
  }
}

final case class IvfSq8Searcher(nprobe: Int, metric: String) extends Searcher
    with QueryBroadcastLifecycle {
  def search(artifact: IndexArtifact, queries: DataFrame, k: Int): DataFrame = {
    val lo = artifact.meta("lo").split(",").map(_.toFloat)
    val hi = artifact.meta("hi").split(",").map(_.toFloat)
    val q = queries.select(col("qid").cast("long").as("qid"), col("vector"))
    val model = Sq8Model(lo, hi)
    val dist = model.distByQidUdf(
      trackBroadcast(artifact.data.sparkSession, model.collectQueries(q)), metric)
    val centroids = artifact.aux("centroids")
      .select(col("centroid_id").cast("long").as("id"), col("vector"))
    val probes = KnnJoin.knnJoin(q, centroids, nprobe, "l2")
      .select(col("qid"), col("id").cast("int").as("centroid_id"))
    val scored = artifact.data
      .join(broadcast(probes), Seq("centroid_id"))
      .select(col("qid"), col("id"), dist(col("qid"), col("codes")).as("__dist"))
    KnnJoin.topKExploded(scored, col("id"), col("__dist"), k)
  }
}
