package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed storage layout: pay a table's join shuffle ONCE at write
  * time, never again at read time.
  *
  * At 100 TB the dominant cost of a repeated equi-join (documents ⋈
  * annotations on doc_id, orders ⋈ lineitem on orderkey, …) is the
  * exchange of BOTH sides on every query. Writing each side
  * `bucketBy(n, key).sortBy(key)` hash-partitions it into n bucket
  * files keyed by `pmod(murmur3(key), n)`; a later sort-merge join of
  * two tables bucketed on the join key with the SAME n reads co-located
  * buckets directly — the physical plan has no Exchange, and the SMJ's
  * remaining Sort is partition-local (Spark 4 re-sorts inside buckets
  * unless `spark.sql.legacy.bucketedTableScan.outputOrdering` is on;
  * either way nothing crosses the network). The same layout makes
  * `groupBy(key)` aggregation exchange-free.
  *
  * This is the Spark-native equivalent of the reference engine keeping
  * its postings/segment files pre-partitioned by document id on disk.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed AND sorted by `key`.
    *
    * The `repartition(buckets, key)` before the write matters twice:
    * (a) each write task then holds exactly one bucket (task hash =
    * bucket hash = `pmod(murmur3, n)`), so every bucket is a single
    * file and Spark's scan exposes the sortBy order to the optimizer —
    * SMJ elides its Sort nodes; (b) it bounds small-file count at
    * `buckets`, not `tasks × buckets`. */
  /** Drop `table` AND its managed warehouse location. `mode("overwrite")`
    * only overwrites tables the CATALOG knows; a fresh session (new
    * in-memory catalog) with a managed location surviving from an
    * earlier JVM hits LOCATION_ALREADY_EXISTS on the create path
    * instead. Call before any managed saveAsTable. */
  def dropWithLocation(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) { fs.delete(loc, true); () }
  }

  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    dropWithLocation(spark, table)
    df.repartition(buckets, col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table) // managed: lives under spark.sql.warehouse.dir
  }

  /** Equi-join two same-`buckets` tables on `key` — plans with zero
    * Exchange when both were written by [[writeBucketed]]. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
