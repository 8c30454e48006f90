package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental index ingestion — one entry point for the FAISS
  * `Index.add` contract across the artifact family: arriving rows are
  * encoded against the artifact's FROZEN models (coarse centroids, SQ8
  * bounds, LSH hyperplanes — whatever the kind persists in meta/aux) and
  * unioned into the index relation. No model retrains, no existing row
  * is rewritten, and every searcher serves the appended artifact
  * unchanged — the operational requirement at 100 TB, where a daily
  * arrival batch must never trigger a corpus-sized rebuild.
  *
  * Each path is the build's own zero-shuffle encode projection applied
  * to the new rows only; the union is a plan node, not a rewrite, and a
  * store round-trip re-partitions by the probe keys as usual
  * ([[graft.sources.ArtifactStore.partitionKeys]]).
  */
object IndexAppend {

  /** `newRows`: (id long, vector array<float>) — ids must be fresh. */
  def append(artifact: IndexArtifact, newRows: DataFrame): IndexArtifact =
    artifact.kind match {
      case "ivf"     => IvfModel.append(artifact, newRows)
      case "ivf_sq8" => ivfSq8(artifact, newRows)
      case "ivf_pq"  => ivfPq(artifact, newRows)
      case "lsh"     => lsh(artifact, newRows)
      case k => throw new IllegalArgumentException(
        s"append is not supported for index kind '$k' — rebuild, or use " +
          "a kind with frozen encode models (ivf, ivf_sq8, ivf_pq, lsh)")
    }

  /** Remove rows by id — FAISS `remove_ids` semantics: an anti-join on
    * the index relation (and on the LSH rerank relation), models
    * untouched. The operational complement of [[append]]: contamination
    * takedowns and right-to-be-forgotten deletes must not rebuild a
    * corpus-sized index either. Like the filtered-search gate shows,
    * restricting the index RELATION is all a searcher needs — deletion
    * is that restriction made permanent. */
  def delete(artifact: IndexArtifact, ids: DataFrame): IndexArtifact = {
    val del = ids.select(col("id").cast("long").as("id"))
    artifact.kind match {
      case "ivf" | "ivf_sq8" | "ivf_pq" =>
        artifact.copy(data = artifact.data.join(del, Seq("id"), "left_anti"))
      case "lsh" =>
        artifact.copy(
          data = artifact.data.join(del, Seq("id"), "left_anti"),
          aux = artifact.aux + ("vectors" ->
            artifact.aux("vectors").join(del, Seq("id"), "left_anti")))
      case k => throw new IllegalArgumentException(
        s"delete is not supported for index kind '$k' — rebuild, or use " +
          "a kind with a row-keyed index relation (ivf, ivf_sq8, ivf_pq, lsh)")
    }
  }

  /** frozen coarse centroids + frozen per-dim SQ8 bounds from meta;
    * encoding IS the build's projection ([[IvfSq8.encodeRelation]]) */
  private def ivfSq8(artifact: IndexArtifact, newRows: DataFrame): IndexArtifact = {
    val centers = IvfModel.centroidsOf(artifact).sortBy(_._1).map(_._2)
    val model = Sq8Model(
      artifact.meta("lo").split(",").map(_.toFloat),
      artifact.meta("hi").split(",").map(_.toFloat))
    artifact.copy(data = artifact.data
      .select("id", "centroid_id", "codes")
      .unionByName(IvfSq8.encodeRelation(newRows, centers, model)))
  }

  /** frozen coarse centroids + frozen PQ codebooks (both reconstructable
    * from aux on the load-from-store path); the row encoder IS the
    * build's ([[IvfPq.encodeRow]]), honoring raw vs residual */
  private def ivfPq(artifact: IndexArtifact, newRows: DataFrame): IndexArtifact = {
    val centers = IvfModel.centroidsOf(artifact).sortBy(_._1).map(_._2)
    val model = PqModel.fromArtifact(artifact)
    val residual = artifact.meta.getOrElse("residual", "false") == "true"
    val spark = newRows.sparkSession
    import spark.implicits._
    val encoded = newRows
      .select(col("id").cast("long").as("id"), col("vector"))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (i, v) =>
        IvfPq.encodeRow(centers, model, residual)(
          i, IvfModel.assign(centers, v), v)
      })
      .toDF("id", "centroid_id", "codes")
    artifact.copy(data = artifact.data
      .select("id", "centroid_id", "codes").unionByName(encoded))
  }

  /** frozen seeded hyperplanes (reconstructed from meta — they are pure
    * functions of (seed, dims)); the rerank relation grows too */
  private def lsh(artifact: IndexArtifact, newRows: DataFrame): IndexArtifact = {
    val m = artifact.meta
    val model = LshModel(m("num_tables").toInt, m("hash_size").toInt,
      m("dim").toInt, m("bucket_width").toDouble, m("metric"), m("seed").toLong)
    val spark = newRows.sparkSession
    val rows = newRows.select(col("id").cast("long").as("id"), col("vector"))
    val buckets = rows
      .withColumn("__keys", model.hashUdf(spark)(col("vector")))
      .select(col("id"), posexplode(col("__keys")).as(Seq("table", "key")))
    artifact.copy(
      data = artifact.data.select("id", "table", "key").unionByName(buckets),
      aux = artifact.aux + ("vectors" ->
        artifact.aux("vectors").select(col("id"), col("vector"))
          .unionByName(rows)))
  }
}
