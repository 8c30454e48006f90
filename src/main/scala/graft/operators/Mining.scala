package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Training-pair mining over an embedded corpus.
  *
  * Hard-negative mining is the workhorse of metric-learning / dense-
  * retriever training (triplet loss, DPR/ANCE-style contrastive training):
  * for each anchor, the k nearest items under the metric whose label
  * differs from the anchor's — "semantically close but not a positive".
  *
  * Same 100 TB shape as [[KnnJoin]]: anchors broadcast (they are the small
  * side), the corpus scanned ONCE partition-parallel with a codegen'd
  * distance, the label predicate applied inside the same codegen span
  * before any aggregation, and per-anchor top-k via the [[TopKByDist]]
  * bounded heap — shuffle volume O(n_anchors · k · partitions),
  * independent of corpus row count.
  */
object Mining {

  /** For each anchor `(qid, vector, label)`, the k nearest base rows
    * `(id, vector, label)` with `base.label != anchor.label`, exploded to
    * `(qid, rank, id, dist)` ordered by (dist asc, id asc). The anchor
    * itself can never appear (it shares its own label). */
  def hardNegatives(
      anchors: DataFrame,
      base: DataFrame,
      k: Int,
      metric: String = "cosine"): DataFrame = {
    val q = broadcast(anchors.select(
      col("qid").cast("long").as("qid"),
      col("vector").as("__qvec"),
      col("label").cast("int").as("__qlabel")))
    val b = base.select(
      col("id").cast("long").as("__bid"),
      col("vector").as("__bvec"),
      col("label").cast("int").as("__blabel"))
    val dist = VectorFunctions.distance(metric)(col("__qvec"), col("__bvec"))
    val pairs = b.crossJoin(q)
      .filter(col("__blabel") =!= col("__qlabel"))
      .select(col("qid"), col("__bid"), dist.as("__dist"))
    KnnJoin.topKExploded(pairs, col("__bid"), col("__dist"), k)
  }
}
