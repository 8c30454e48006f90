package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.RandomDataset

/** Where does the per-batch wall go in LocalScan mode? Times the search
  * call itself vs the harness materialization (cache+count) separately,
  * per algorithm, at the BASELINE.md random shape. */
object LocalScanProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.init()

    val train = RandomDataset.vectors(spark, 20000, 64, 42).cache()
    val test = RandomDataset.vectors(spark, 256, 64, 43)
      .withColumnRenamed("id", "qid").cache()
    train.count(); test.count()

    val algos = Seq(
      ("exact", "brute_force", "linear", Map.empty[String, String]),
      ("ivf_flat", "ivf", "ivf", Map("nlist" -> "100", "nprobe" -> "10")),
      ("ivf_sq8", "ivf_sq8", "ivf_sq8", Map("nlist" -> "256", "nprobe" -> "32")),
      ("pq", "pq", "pq", Map("num_subspaces" -> "64", "num_centroids" -> "256")),
      ("ivf_pq", "ivf_pq", "ivf_pq", Map("nlist" -> "256", "nprobe" -> "32",
        "num_subspaces" -> "64", "num_centroids" -> "256", "residual" -> "true")),
      ("hnsw", "hnsw_global", "hnsw_global",
        Map("m" -> "16", "ef_construction" -> "200", "ef_search" -> "256")))

    algos.foreach { case (name, in, se, params) =>
      val artifact = Registry.indexer(in, params + ("seed" -> "42"), "l2").build(train)
      artifact.data.cache().count()
      val searcher = Registry.searcher(se, params, "l2")
      // warm (twice: C2 JIT on the kernels)
      searcher.search(artifact, test, 20).collect()
      searcher.search(artifact, test, 20).collect()
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        val res = searcher.search(artifact, test, 20)
        val t1 = System.nanoTime()
        val rows = res.collect()
        val t2 = System.nanoTime()
        assert(rows.nonEmpty)
        println(f"$name%-10s search=${(t1 - t0) / 1e3}%8.0fus  collect=${(t2 - t1) / 1e3}%8.0fus  qps=${256e9 / (t2 - t0)}%8.0f")
      }
      artifact.data.unpersist()
    }
    spark.stop()
  }
}
