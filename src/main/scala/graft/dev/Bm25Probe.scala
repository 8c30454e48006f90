package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Bm25

/** One-number BM25 timing at a given sf dir (default the bench's sf0.1):
  * the degenerate 40-word gate vocabulary makes every query term match
  * every document, so this is the operator's worst-case score-row volume.
  * Run: sbt "runMain graft.dev.Bm25Probe /root/testdata/sf0.1"
  */
object Bm25Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, dir, "documents")
    def timed(tag: String, qs: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = Bm25.searchTopK(docs, qs, "doc_id", "text", "qid", "qtext", 5).count()
      println(f"[probe] bm25/$tag $dir rows=$n took ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // worst case: full documents as queries — every term of the corpus
    // vocabulary fans out
    timed("fulltext_q23", docs.filter(col("doc_id") % 23 === 0)
      .select(col("doc_id").as("qid"), col("text").as("qtext")))
    // the gate shape: short (200-char) queries, sparser query set
    timed("short_q53", docs.filter(col("doc_id") % 53 === 0)
      .select(col("doc_id").as("qid"), substring(col("text"), 1, 200).as("qtext")))
    spark.stop()
  }
}
