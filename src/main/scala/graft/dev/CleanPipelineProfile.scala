package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._

/** Stage-level timing for pipeline_corpus_clean (the r5 3.9→5.4 s
  * regression): exact-dedup, minhash pairs, and the conditional tail
  * aggregate timed separately, twice in one JVM (round 2 = warm). */
object CleanPipelineProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 2).foreach { round =>
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"round $round $label%-16s ${(System.nanoTime() - t0) / 1e9}%.2fs")
        r
      }
      val docs = graft.Tables.load(spark, dir, "documents")
      t("count")(docs.count())
      val exact = Dedup.exactDedup(
        docs.withColumn("__fp", TextAnalysis.fingerprint(col("text"))),
        Seq("__fp"), "doc_id").drop("__fp").cache()
      t("exact")(exact.count())
      val pairs = t("minhash_build")(Dedup.minhashDupPairs(exact, "doc_id", "text",
        shingleLen = 3, numHashes = 16, bands = 4, threshold = 0.7))
      val qOk = TextAnalysis.qualityScore(col("text")) >= 0.5
      val repOk = qOk && TextAnalysis.repetitionStats(col("text"))
        .getField("top_word_frac") < 0.12
      val sampOk = repOk && Sampling.deterministicKeep(col("doc_id"), 0.1, "graft")
      t("tail_agg")(Dedup.dropNearDups(exact, "doc_id", pairs)
        .agg(count(lit(1)).as("n_near"), count(when(qOk, 1)).as("n_clean"),
          count(when(repOk, 1)).as("n_rep"), count(when(sampOk, 1)).as("n_samp"))
        .head())
      exact.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
