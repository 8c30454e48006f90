package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) coarse quantizer — the reference's FAISS
  * `IVF{nlist},Flat` path (approximate_search.py:39-51,
  * modular.py:292-309) re-expressed as a **partition-pruned equi-join**:
  *
  *  - build: `ml.clustering.KMeans(k=nlist)` on the base vectors; the
  *    index relation is the base table + `centroid_id`. At cluster scale
  *    this relation is written partitioned/bucketed by `centroid_id`, so
  *    a probe touches only `nprobe/nlist` of the data (storage-level
  *    partition pruning — SURVEY §4 "partition pruning by index
  *    structure");
  *  - probe: nearest `nprobe` centroids per query via a tiny broadcast
  *    kNN join (centroid table has `nlist` rows), then an equi-join on
  *    `centroid_id`, then exact rerank of the surviving candidates.
  */
final case class IvfIndexer(nlist: Int, seed: Long) extends Indexer {
  val kind = "ivf"

  def build(base: DataFrame): IndexArtifact = {
    val feat = base.withColumn("__features", array_to_vector(col("vector")))
    val km = new KMeans().setK(nlist).setSeed(seed)
      .setFeaturesCol("__features").setPredictionCol("centroid_id")
    val model = km.fit(feat)
    val assigned = model.transform(feat)
      .select(col("id").cast("long").as("id"), col("vector"),
        col("centroid_id").cast("int").as("centroid_id"))
    val spark = base.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toDF("centroid_id", "vector")
    IndexArtifact(kind, assigned,
      meta = Map("nlist" -> nlist.toString, "seed" -> seed.toString),
      aux = Map("centroids" -> centroids))
  }
}

final case class IvfSearcher(nprobe: Int, metric: String) extends Searcher {
  def search(artifact: IndexArtifact, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("qid").cast("long").as("qid"), col("vector"))
    val centroids = artifact.aux("centroids")
      .select(col("centroid_id").cast("long").as("id"), col("vector"))
    // coarse probe: nprobe nearest centroids per query (always L2, as FAISS
    // IVF coarse assignment is L2 even under other metrics)
    val probes = KnnJoin.knnJoin(q, centroids, nprobe, "l2")
      .select(col("qid"), col("id").cast("int").as("centroid_id"))
    // inverted-list pruned candidates: equi-join on centroid_id
    val candidates = artifact.data
      .join(broadcast(probes), Seq("centroid_id"))
      .select(col("qid"), col("id"))
    KnnJoin.rerank(candidates,
      q, artifact.data.select(col("id"), col("vector")), k, metric)
  }
}
