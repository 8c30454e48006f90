package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._

/** Measures the incremental-ingestion claim: folding a 5% arrival batch
  * into a built index via IndexAppend vs rebuilding from scratch, at
  * 200k×64 (ivf and ivf_sq8). Materialization = data.count(). */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = 200000L; val addN = 10000L; val dim = 64
    val base = graft.sources.RandomDataset.vectors(spark, n, dim, seed = 7).cache()
    val fresh = graft.sources.RandomDataset.vectors(spark, n + addN, dim, seed = 7)
      .filter(col("id") >= n).cache()
    val union = base.unionByName(fresh).cache()
    base.count(); fresh.count(); union.count()

    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ingest] $what%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    for (kind <- Seq("ivf", "ivf_sq8")) {
      Registry.init()
      val ix = Registry.indexer(kind,
        Map("nlist" -> "256", "nprobe" -> "8", "seed" -> "42"), "l2")
      val art = time(s"$kind build 200k")(
        { val a = ix.build(base); a.data.cache().count(); a })
      time(s"$kind append 10k (5%)")(
        IndexAppend.append(art, fresh).data.count())
      time(s"$kind rebuild 210k")(
        ix.build(union).data.count())
    }
    spark.stop()
  }
}
