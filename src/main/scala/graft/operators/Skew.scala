package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins on heavy-hitter keys.
  *
  * A shuffled equi-join sends every row of a key to ONE reducer; at
  * corpus scale a handful of hot keys (empty-string fingerprints, the
  * dominant language, a boilerplate shingle) can pin the whole stage on
  * one straggler task. AQE's skew-join split handles sort-merge cases
  * adaptively; this explicit salted form is the plan-stable variant that
  * also works where AQE can't see the skew (e.g. under a custom
  * aggregate, or when the skewed side is the OUTPUT of an operator AQE
  * has no stats for).
  *
  * Shape: the skewed (big) side gets a random-but-deterministic salt in
  * [0, R); the small side is exploded R× with every salt value; the join
  * key becomes (key, salt), splitting each hot key across R reducers.
  * Correctness is exact — every (bigRow, smallRow) pair still meets on
  * exactly one salt. Cost: small side shuffles R× its size — choose R ≈
  * (hot-key rows / target rows-per-task), not "big".
  *
  * The salt is a hash of the big side's whole row id column, NOT a
  * `rand()`: deterministic retries (a re-run task salts identically, so
  * no correctness hazard under speculative execution) — the same
  * discipline as [[Sampling]].
  */
object Skew {

  /** inner equi-join of `big ⋈ small` on `key`, with the big side salted
    * R ways by a deterministic hash of `saltBy` (a stable id column). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltBy: String, replication: Int): DataFrame = {
    require(replication >= 1, "replication must be >= 1")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(col(saltBy)), lit(replication)).cast("int"))
    val smallS = small.select(col("*"),
      explode(sequence(lit(0), lit(replication - 1))).as("__salt"))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
