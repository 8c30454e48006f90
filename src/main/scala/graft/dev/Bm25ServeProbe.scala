package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Bm25

/** Warm-vs-cold serve-from-index timing: build the index once (untimed
  * fixture), then serve the gate's query batch three times in one JVM.
  * Rep 1 = cold JIT/codegen, reps 2-3 = the steady-state serve cost the
  * in-context bench number tracks.
  * Run: sbt "runMain graft.dev.Bm25ServeProbe /root/testdata/sf0.1"
  */
object Bm25ServeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, dir, "documents")
    val t0 = System.nanoTime()
    Bm25.ensureIndex(docs, "doc_id", "text", "probe_bm25ix", buckets = 8)
    println(f"[probe] build ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val queries = docs.filter(col("doc_id") % 53 === 0)
      .select(col("doc_id").as("qid"), substring(col("text"), 1, 200).as("qtext"))
    (1 to 3).foreach { rep =>
      val t = System.nanoTime()
      val n = Bm25.searchFromIndex(spark, "probe_bm25ix", queries,
        "qid", "qtext", k = 5).count()
      println(f"[probe] serve rep$rep rows=$n ${(System.nanoTime() - t) / 1e9}%.2f s")
    }
    Seq("probe_bm25ix_postings", "probe_bm25ix_df", "probe_bm25ix_stats")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.stop()
  }
}
