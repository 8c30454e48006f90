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
      aux = Map("centroids" -> ivf.aux("centroids")),
      local = ivf.local)
  }
}

final case class IvfSq8Searcher(nprobe: Int, metric: String) extends Searcher
    with QueryBroadcastLifecycle {
  def search(artifact: IndexArtifact, queries: DataFrame, k: Int): DataFrame = {
    beginSearch()
    val lo = artifact.meta("lo").split(",").map(_.toFloat)
    val hi = artifact.meta("hi").split(",").map(_.toFloat)
    val q = queries.select(col("qid").cast("long").as("qid"), col("vector"))
    val spark = artifact.data.sparkSession
    val (qids, qVecs) = LocalScan.queryVecsAlways(queries)
    // coarse probe on the driver (nlist × dim flops per query — trivial;
    // replaces a full Spark job per search), then the query-major scan
    // over only the probed inverted lists — driver-local below the
    // LocalScan cap, partition-buffered above it
    val cents = IvfModel.centroidsOf(artifact)
    val nlist = cents.map(_._1).max + 1
    val probeArr = AdcScan.probesAuto(
      q, qids, qVecs, cents, nlist, nprobe, artifact.aux("centroids"))
    val localTable = LocalScan.codeTable(artifact.data, ivf = true)
    val scorer = new AdcScan.Sq8Scorer(
      trackLut(spark, localTable.isDefined, qVecs), lo, hi, Sq8Model.mode(metric))
    localTable match {
      case Some(ct) =>
        LocalScan.scanCodesIvf(spark, ct, qids, k, scorer, probeArr)
      case None =>
        AdcScan.searchTopKIvf(artifact.data, qids, k, scorer,
          trackLut(spark, local = false, probeArr))
    }
  }
}
