package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling for corpus construction.
  *
  * `DataFrame.sample` draws per-partition from a seeded RNG, so its
  * output changes whenever the partition layout does — a repartition, a
  * task retry with a different split, or AQE coalescing all reshuffle
  * the sample. For a 100 TB training-data pipeline that must be
  * re-runnable and auditable, the sampling decision has to be a pure
  * function of the ROW, not of the execution: hash the stable row id
  * with a salt and keep the row iff the hash lands under the rate
  * threshold. Same inputs → same sample, on any cluster, any partition
  * count, any retry; unions/increments stay consistent (a row's fate
  * never flips when data around it moves); and it's a codegen'd filter
  * that pushes work to the scan — no shuffle, no RNG state.
  *
  * The keep decision uses the first 4 hex chars of md5(id ":" salt) —
  * 16 bits of hash compared against floor(rate·65536), so the realized
  * rate is exact to ±2⁻¹⁶ and the expression is portable to any engine
  * with md5 (the DuckDB oracle replicates it verbatim as a string
  * comparison on the same hex prefix).
  */
object Sampling {

  /** 16-bit bucket in [0, 65536) — a pure function of (id, salt) */
  def hashBucket(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 4), 16, 10)
      .cast("long")

  /** keep predicate: hash bucket under the rate threshold */
  def deterministicKeep(id: Column, rate: Double, salt: String): Column = {
    require(rate >= 0.0 && rate <= 1.0, "rate must be in [0,1]")
    hashBucket(id, salt) < math.floor(rate * 65536).toLong
  }

  /** rate-sampled subset of `df`, stable under any repartitioning */
  def sampleByHash(df: DataFrame, idCol: String, rate: Double,
      salt: String = "graft"): DataFrame =
    df.filter(deterministicKeep(col(idCol), rate, salt))

  /** Per-stratum audit of a deterministic sample: how many rows each
    * stratum holds and how many the rate keeps. One scan, one map-side
    * combinable aggregate. */
  def stratifiedSampleCounts(df: DataFrame, idCol: String, stratumCol: String,
      rate: Double, salt: String = "graft"): DataFrame =
    df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_rows"),
        count(when(deterministicKeep(col(idCol), rate, salt), 1))
          .as("n_sampled"))
}
