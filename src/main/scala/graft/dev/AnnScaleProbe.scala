package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.RandomDataset

/** ANN scale probe: the adaptive local/distributed switch exercised at a
  * size where the LOCAL fast path is (artificially) disallowed, proving
  * the distributed plans carry the same workload — the regime a
  * 1000-executor cluster lives in, where no index fits one machine.
  *
  * Two passes over the same 2M × 64-d corpus (1.9 GB of raw vectors,
  * 128 MB of SQ8/PQ codes):
  *   1. default caps → code tables collect, searches run driver-local;
  *   2. caps forced to zero → every search runs the partition-buffered
  *      distributed scan + driver-merge finish.
  * Identical results are asserted (same invariant LocalScanSpec pins at
  * small scale), and both timings print — the gap is pure job dispatch,
  * which amortizes with cluster size, not kernel cost.
  *
  * Run: sbt "runMain graft.dev.AnnScaleProbe [nBase] [nQueries]"
  */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toLong).getOrElse(2_000_000L)
    val nQ = args.lift(1).map(_.toLong).getOrElse(256L)
    val localDir = s"target/spark-local-probe-${ProcessHandle.current().pid()}"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.init()

    val train = RandomDataset.vectors(spark, nBase, 64, 42).cache()
    val test = RandomDataset.vectors(spark, nQ, 64, 43)
      .withColumnRenamed("id", "qid").cache()
    train.count(); test.count()

    val algos = Seq(
      ("ivf_sq8", "ivf_sq8", "ivf_sq8", Map("nlist" -> "256", "nprobe" -> "16")),
      ("ivf_pq", "ivf_pq", "ivf_pq", Map("nlist" -> "256", "nprobe" -> "16",
        "num_subspaces" -> "64", "num_centroids" -> "256", "residual" -> "true")))

    algos.foreach { case (name, in, se, params) =>
      val t0 = System.nanoTime()
      val artifact = Registry.indexer(in, params + ("seed" -> "42"), "l2").build(train)
      artifact.data.cache().count()
      println(f"[probe] $name%-8s build+encode ${(System.nanoTime() - t0) / 1e9}%7.1fs  (${nBase} rows)")
      val searcher = Registry.searcher(se, params, "l2")

      def timedSearch(tag: String): Seq[(Long, Int, Long, Double)] = {
        searcher.search(artifact, test, 20).collect() // warm
        val t1 = System.nanoTime()
        val rows = searcher.search(artifact, test, 20).collect()
        println(f"[probe] $name%-8s $tag%-12s ${(System.nanoTime() - t1) / 1e9}%7.2fs  qps=${nQ * 1e9 / (System.nanoTime() - t1)}%6.0f")
        rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
          .sortBy(t => (t._1, t._2)).toSeq
      }

      val local = timedSearch("local")
      sys.props("graft.local.enabled") = "false"
      val dist =
        try timedSearch("distributed")
        finally sys.props.remove("graft.local.enabled")
      require(local == dist, s"$name: local != distributed at $nBase rows")
      println(s"[probe] $name identical local/distributed results (${local.size} rows)")
      artifact.data.unpersist()
    }
    spark.stop()
    // scratch cleanup
    try {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      val root = Path.of(localDir)
      if (Files.exists(root))
        Files.walk(root).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => { try Files.deleteIfExists(p) catch { case _: Throwable => () }; () })
    } catch { case _: Throwable => () }
  }
}
