package graft.dev

import org.apache.spark.sql.SparkSession

import graft.harness.BaselineCompare

/** dev aid: run the reference BASELINE workload shape (random 20k × 64-d,
  * 256 queries, k=20, L2 — BASELINE.md primary run) through every
  * algorithm family and print recall/QPS next to the reference's
  * published numbers. The same comparison feeds the bench artifact via
  * [[graft.harness.BaselineCompare]]. `SPARK_GRAFT_BASELINE_DATASETS` /
  * `SPARK_GRAFT_BASELINE_ONLY` narrow the run; with `GRAFT_CLASSES`
  * pinning a classes snapshot this is the per-row A/B harness
  * (dev/baseline_ab.sh drives the interleaved tree-vs-tree loop).
  *
  * r12-tree vs r13-tree adjudication of the weak/borderline baseline
  * rows (r13 verdict Next-round #1; 2026-08-16, 5 interleaved
  * alternating runs per tree per row, QPS best-of-5, ratios vs the
  * BASELINE.md reference QPS):
  *
  *   row               r12-tree best      r13-tree best    verdict
  *   glove50 hnsw      93,417 (0.44×)     93,859 (0.44×)   NO code change — identical
  *   glove50 ivf_flat  120,318 (0.46×)    126,466 (0.49×)  r13 ≥ r12
  *   glove50 ivf_pq    42,571 (0.44×)     48,067 (0.50×)   r13 ≥ r12
  *   msmarco ivf_sq8   4,550 (0.28×)      6,590 (0.40×)    r13 FASTER (samples disjoint)
  *
  * The glove50 hnsw 0.53×→0.43× r12→r13 artifact slide is measurement
  * environment, not code: both trees measure within 0.5% of each other
  * in the same session, and BOTH sit below their own artifacts' values
  * (the r12 artifact's 113k caught a favorable window — today's box
  * gives ~93k to either tree; glove50 ivf_flat/ivf_pq same pattern at
  * smaller amplitude). The r13 prime-order change
  * (VectorSq8Kernel.make) is exonerated: it helps msmarco (+45%,
  * all five r13 samples above all five r12 samples) and moves nothing
  * else. weak_count bookkeeping: the three sub-0.5× rows are genuinely
  * weak on this box at these shapes, but none is a regression. */
object BaselineShape {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(BaselineCompare.table(BaselineCompare.run(spark)))
    spark.stop()
  }
}
