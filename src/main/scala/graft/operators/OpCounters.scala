package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** A10: operation counters (reference `record_operation`,
  * base_algorithm.py:91-96 — float counts keyed by name, e.g. `ndis`
  * distance computations in CoverTree, covertree_v2_2.py:298/307/510-517).
  *
  * Spark form: named `LongAccumulator`s — executors add, the driver reads
  * after an action; surfaced into result records for the
  * operations-vs-recall analysis (evaluation.py:78-120). */
final class OpCounters(spark: SparkSession) extends Serializable {
  private val counters =
    scala.collection.concurrent.TrieMap[String, LongAccumulator]()

  def counter(key: String): LongAccumulator =
    counters.getOrElseUpdate(key, spark.sparkContext.longAccumulator(key))

  def record(key: String, value: Long): Unit = counter(key).add(value)

  /** snapshot for result records */
  def snapshot: Map[String, Long] =
    counters.map { case (k, a) => k -> a.value.longValue }.toMap

  def reset(): Unit = counters.values.foreach(_.reset())
}
