package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive parallelism floor for CPU-dense stages (r14
  * optimization round; guide §2.5 input skew / §6 split sizing).
  *
  * Spark sizes scan splits and AQE post-shuffle partitions by BYTES
  * (`maxPartitionBytes`, `advisoryPartitionSizeInBytes`) — correct when
  * task cost tracks bytes, wrong for operators whose per-row CPU dwarfs
  * their bytes: codec encode/decode ([[Multimodal]]), tokenize/shingle
  * UDFs ([[Dedup]], [[Bm25]]), verify/DAAT kernels. A kilobytes-sized
  * relation then lands in 1-2 scan tasks and the stage serializes on one
  * core while the rest of the machine idles (measured r14: the mm_video
  * decode ran 4.4 s in ONE task on local[32]).
  *
  * [[fan]] raises such a relation's partition count to the session's
  * default parallelism — but ONLY when its Catalyst size estimate says
  * the scan would split into fewer tasks than cores, so at real scale
  * (estimate ≥ cores × maxPartitionBytes) no exchange is ever inserted
  * and the call is a no-op. The floor derives from the runtime
  * (`defaultParallelism` = total cores on any master) and the session's
  * own split size, never from a constant tuned for this box. The
  * estimate is read off the optimized logical plan — deliberately NOT
  * `df.rdd.getNumPartitions`, which compiles the physical plan (janino
  * codegen) just to ask a question the stats already answer.
  *
  * Hash-partitioning on the caller's id key keeps row placement
  * deterministic under retries; a keyless round-robin `repartition(n)`
  * would pay a full local sort of the payload per SPARK-23207 and is the
  * shape the guide warns about.
  */
object Par {
  /** `df` hash-repartitioned on `key` to the default parallelism iff its
    * estimated size would scan-split below it; identical rows either way. */
  def fan(df: DataFrame, key: Column): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val split = spark.sessionState.conf.filesMaxPartitionBytes
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est < BigInt(split) * target) df.repartition(target, key) else df
  }
}
