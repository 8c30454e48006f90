package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators._
import graft.sources.RandomDataset

/** Per-stage wall breakdown of the driver-local ivf_flat serve path at
  * the random baseline shape, plus batch-size scaling: if per-query cost
  * falls with batch size the row is fixed-overhead-bound; if flat, it is
  * kernel/parallelism-bound. */
object IvfStageProfile {
  def main(args: Array[String]): Unit = {
    // args: [dim] [nprobe] [strided]
    val dim = args.headOption.map(_.toInt).getOrElse(64)
    val nprobe = args.drop(1).headOption.map(_.toInt).getOrElse(12)
    val strided = args.drop(2).headOption.exists(_ == "strided")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.init()

    val train = RandomDataset.vectors(spark, 20000, dim, 42).cache()
    train.count()
    val artifact = IvfIndexer(100, 42).build(train)
    artifact.data.cache().count()
    val cents = IvfModel.centroidsOf(artifact)
    val nlist = cents.map(_._1).max + 1
    println(s"dim=$dim nprobe=$nprobe strided=$strided")

    for (nq <- Seq(256, 1024, 4096)) {
      val test = RandomDataset.vectors(spark, nq, dim, 43)
        .withColumnRenamed("id", "qid").cache()
      test.count()
      val q = test.select(col("qid").cast("long").as("qid"), col("vector"))
      // warm
      (1 to 3).foreach { _ =>
        val (qids, qv) = LocalScan.queryVecsAlways(test)
        val probes = AdcScan.probesAuto(q, qids, qv, cents, nlist, nprobe,
          artifact.aux("centroids"))
        val vt = LocalScan.vecTable(artifact.data, ivf = true).get
        LocalScan.scanVecsIvf(spark, vt, qids, qv, 20, 0, probes,
          strided = strided).collect()
      }
      val reps = 5
      val best = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val (qids, qv) = LocalScan.queryVecsAlways(test)
        val t1 = System.nanoTime()
        val probes = AdcScan.probesAuto(q, qids, qv, cents, nlist, nprobe,
          artifact.aux("centroids"))
        val t2 = System.nanoTime()
        val vt = LocalScan.vecTable(artifact.data, ivf = true).get
        val df = LocalScan.scanVecsIvf(spark, vt, qids, qv, 20, 0, probes,
          strided = strided)
        val t3 = System.nanoTime()
        val rows = df.collect()
        val t4 = System.nanoTime()
        assert(rows.nonEmpty)
        (t1 - t0, t2 - t1, t3 - t2, t4 - t3, t4 - t0)
      }.minBy(_._5)
      println(f"nq=$nq%5d qvecs=${best._1 / 1e3}%7.0fus probes=${best._2 / 1e3}%7.0fus " +
        f"scan+pack=${best._3 / 1e3}%7.0fus collect=${best._4 / 1e3}%7.0fus " +
        f"total=${best._5 / 1e6}%6.1fms qps=${nq * 1e9 / best._5}%8.0f")
      test.unpersist()
    }
    spark.stop()
  }
}
