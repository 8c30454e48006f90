package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** dev aid: dump the Spark-side minhash dup pairs at a given sf dir, for
  * diffing against the DuckDB oracle's pair list (the r9 sf0.1 off-by-one
  * investigation). */
object MinhashPairsDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/spark_pairs.txt")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, dir, "documents")
    val pairs = graft.operators.Dedup.minhashDupPairs(docs, "doc_id", "text",
      shingleLen = 3, numHashes = 16, bands = 4, threshold = 0.7)
      .select(col("a"), col("b"), col("jaccard"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      pairs.map { case (a, b, j) => f"$a $b $j%.6f" }.mkString("\n"))
    println(s"wrote ${pairs.length} pairs to $out")
    spark.stop()
  }
}
