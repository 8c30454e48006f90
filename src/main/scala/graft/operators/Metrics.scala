package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IR evaluation metrics (reference: `src/benchmark/metrics.py`) as pure
  * column expressions over per-query id arrays — no UDFs, no extra
  * shuffles: each metric is a scalar expression evaluated inside whatever
  * aggregation already holds the (pred, gt) arrays. At 100 TB these run
  * embarrassingly parallel over query rows.
  *
  * Inputs: `pred` / `gt` are `array<long>` ranked ascending by distance.
  * Semantics match metrics.py exactly:
  *  - recall@k:   |gt[:k] ∩ pred[:k]| / |gt[:k]|       (metrics.py:4-34)
  *  - precision@k:|gt ∩ pred[:k]| / k                  (metrics.py:36-63)
  *  - MAP@k:      Σ_hits (cum_hits / pos) / |gt|       (metrics.py:65-103)
  *  - NDCG@k:     DCG/IDCG, binary relevance           (metrics.py:106-145)
  *  - hit_rate@k: 1 if any overlap in top-k            (metrics.py:148-176)
  *  - MRR@k:      1 / rank of first hit                (metrics.py:179-209)
  * `-1` padding slots (modular.py:357-360) never match real gt ids, so they
  * naturally count as misses.
  */
object Metrics {

  private def predK(pred: Column, k: Int): Column = slice(pred, 1, k)

  /** recall@k — note denominator is |gt[:k]|, not |gt| */
  def recallAtK(pred: Column, gt: Column, k: Int): Column = {
    val gtK = slice(gt, 1, k)
    when(size(gtK) > 0,
      size(array_intersect(gtK, predK(pred, k))).cast("double") / size(gtK))
      .otherwise(0.0)
  }

  /** precision@k — full gt set in the numerator, k in the denominator */
  def precisionAtK(pred: Column, gt: Column, k: Int): Column =
    size(array_intersect(gt, predK(pred, k))).cast("double") / k

  /** average precision @k per query (mean over queries = MAP) */
  def apAtK(pred: Column, gt: Column, k: Int): Column = {
    // single-pass aggregate: acc = (hits so far, Σ precision-at-hit, pos)
    val summed = aggregate(
      predK(pred, k),
      struct(lit(0L).as("cnt"), lit(0.0).as("s"), lit(0L).as("pos")),
      (acc, x) => {
        val hit = array_contains(gt, x)
        struct(
          (acc("cnt") + when(hit, 1L).otherwise(0L)).as("cnt"),
          (acc("s") + when(hit,
            (acc("cnt") + 1).cast("double") / (acc("pos") + 1)).otherwise(0.0)).as("s"),
          (acc("pos") + 1).as("pos"))
      },
      acc => acc("s"))
    when(size(gt) > 0, summed / size(gt)).otherwise(0.0)
  }

  /** NDCG@k with binary relevance */
  def ndcgAtK(pred: Column, gt: Column, k: Int): Column = {
    val dcg = aggregate(
      predK(pred, k),
      struct(lit(0.0).as("s"), lit(0L).as("pos")),
      (acc, x) => struct(
        (acc("s") + when(array_contains(gt, x),
          lit(1.0) / log2(acc("pos").cast("double") + 2)).otherwise(0.0)).as("s"),
        (acc("pos") + 1).as("pos")),
      acc => acc("s"))
    val nIdeal = least(size(gt), lit(k))
    val idcg = when(nIdeal > 0,
      aggregate(transform(sequence(lit(1), nIdeal),
          j => lit(1.0) / log2(j.cast("double") + 1)),
        lit(0.0), (a, x) => a + x))
      .otherwise(0.0)
    when(idcg > 0, dcg / idcg).otherwise(0.0)
  }

  /** 1 if any of the top-k predictions is relevant */
  def hitAtK(pred: Column, gt: Column, k: Int): Column =
    when(arrays_overlap(gt, predK(pred, k)), 1.0).otherwise(0.0)

  /** reciprocal rank of the first hit within top-k (0 if none) */
  def rrAtK(pred: Column, gt: Column, k: Int): Column = {
    val p = predK(pred, k)
    val ranksOfHits = filter(
      zip_with(p, sequence(lit(1), greatest(size(p), lit(1))),
        (x, j) => struct(j.as("j"), array_contains(gt, x).as("hit"))),
      s => s("hit"))
    when(size(p) > 0 && size(ranksOfHits) > 0,
      lit(1.0) / array_min(transform(ranksOfHits, s => s("j"))))
      .otherwise(0.0)
  }

  /** all six per-query metric columns, aliased metric_k (A9's sweep unit) */
  def perQuery(pred: Column, gt: Column, k: Int): Seq[Column] = Seq(
    recallAtK(pred, gt, k).as(s"recall_$k"),
    precisionAtK(pred, gt, k).as(s"precision_$k"),
    apAtK(pred, gt, k).as(s"ap_$k"),
    ndcgAtK(pred, gt, k).as(s"ndcg_$k"),
    hitAtK(pred, gt, k).as(s"hit_$k"),
    rrAtK(pred, gt, k).as(s"rr_$k"))

  /** A7 latency stats: mean/median/p95/p99/min/max over a numeric column
    * (exact percentiles with linear interpolation — numpy.percentile
    * semantics, metrics.py:212-237) */
  def latencyStats(df: DataFrame, c: String): DataFrame =
    df.agg(
      avg(col(c)).as("mean"),
      expr(s"percentile($c, 0.5)").as("median"),
      expr(s"percentile($c, 0.95)").as("p95"),
      expr(s"percentile($c, 0.99)").as("p99"),
      min(col(c)).as("min"),
      max(col(c)).as("max"))

  /** A9: evaluate at k ∈ sorted({1,10,100} ∪ ks), skipping k > pred width —
    * evaluation.py:13-29; MAP/MRR evaluated once at max k. */
  def kSweep(userKs: Seq[Int], predWidth: Int): Seq[Int] =
    (Seq(1, 10, 100) ++ userKs).distinct.sorted.filter(_ <= predWidth)
}
