package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Coreset / diversity selection: greedy k-center (Gonzalez 1985,
  * farthest-point traversal) — the standard selection rule for
  * active-learning coresets (Sener & Savarese 2018) and
  * diversity-driven training-data pruning over an embedded corpus.
  *
  * Picks the point farthest (max-min distance) from the already-selected
  * set, k times, starting from the smallest id (deterministic, so the
  * whole trajectory is replayable — the gate oracle replays it as a
  * recursive CTE). 2-approximation of the optimal k-center cover.
  *
  * Scale shape: the classic distributed formulation — the corpus is
  * scanned once per round with NO shuffle (the per-row state is a single
  * running `min` distance, updated incrementally against the one new
  * broadcast center, never recomputed against the whole set), and the
  * argmax is a TakeOrdered reduce that moves one row per partition to the
  * driver. Total: k shuffle-free passes over a cached columnar relation +
  * k tiny reduces; driver memory O(k · dim). At 100 TB with k ≤ a few
  * hundred this is k scan-stages — there is no lower-communication exact
  * formulation.
  *
  * Determinism: `min` accumulation is order-exact (double compares), the
  * argmax tie-breaks by id, and each round's radius is the max-min
  * distance BEFORE adding that round's center (radius of step 1 is 0.0 by
  * convention). Radii are non-increasing from step 2 on. Selection stops
  * early (fewer than k rows) once the max-min distance reaches 0 — the
  * corpus is fully covered and continuing would re-select picked ids;
  * the gate oracle's recursion carries the same `mind > 0` condition.
  */
object Coreset {

  /** Greedy k-center over `(id, vector)` → `(step, id, radius)` with
    * `step` 1-based selection order. */
  def kCenterGreedy(items: DataFrame, k: Int, metric: String = "l2"): DataFrame = {
    require(k >= 1, "k-center needs k >= 1")
    val spark = items.sparkSession
    val base = items.select(col("id").cast("long").as("id"), col("vector"))

    val seedRows = base.orderBy(col("id")).limit(1).collect()
    require(seedRows.nonEmpty, "k-center selection needs a non-empty input")
    val seed = seedRows(0)
    var picked = Vector((1, seed.getLong(0), 0.0))
    var centerVec: Seq[Float] = seed.getSeq[Float](1)

    def withMin(df: DataFrame, first: Boolean): DataFrame = {
      val d = VectorFunctions.distance(metric)(col("vector"),
        typedLit(centerVec))
      val mind = if (first) d else least(col("mind"), d)
      df.select(col("id"), col("vector"), mind.as("mind")).persist()
    }

    var cur = withMin(base, first = true)
    var prev: DataFrame = null
    var step = 2
    while (step <= k) {
      // argmax (mind desc, id asc): TakeOrderedAndProject — one row per
      // partition to the driver, materializes `cur`'s cache
      val top = cur.orderBy(col("mind").desc, col("id").asc).limit(1).collect()(0)
      if (prev != null) prev.unpersist(false)
      if (top.getDouble(2) == 0.0) {
        // max-min distance 0: every point coincides with a selected
        // center — the corpus is fully covered, and continuing would
        // re-select already-picked ids. Emit fewer than k rows instead.
        step = k + 1
      } else {
        picked :+= ((step, top.getLong(0), top.getDouble(2)))
        centerVec = top.getSeq[Float](1)
        if (step < k) { // the last round's min-update frame is never read
          prev = cur
          cur = withMin(cur, first = false)
        }
        step += 1
      }
    }
    cur.unpersist(false)
    if (prev != null) prev.unpersist(false)

    import spark.implicits._
    picked.toDF("step", "id", "radius")
  }
}
