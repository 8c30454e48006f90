package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.RandomDataset

/** Where does the HnswGlobal build spend its time at the baseline shapes?
  * args: n dims clusters(0=isotropic) threads [m efC]
  * Times collect vs graph build vs aux-relation creation separately —
  * the 84.7 s glove50 build (vs ref 0.16 s) has to be ONE of these.
  */
object HnswBuildProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 20000
    val dims = if (args.length > 1) args(1).toInt else 50
    val clusters = if (args.length > 2) args(2).toInt else 200
    val threads = if (args.length > 3) args(3).toInt else Runtime.getRuntime.availableProcessors()
    val m = if (args.length > 4) args(4).toInt else 16
    val efC = if (args.length > 5) args(5).toInt else 200
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.init()
    val raw =
      if (clusters > 0)
        RandomDataset.clusteredVectors(spark, n, dims, clusters, 1.1, 42, centerSeed = 7)
      else RandomDataset.vectors(spark, n, dims, 42)
    val train = raw.cache()
    train.count()

    val tC0 = System.nanoTime()
    val rows = train.select(col("id").cast("long"), col("vector"))
      .orderBy("id").collect()
    val ids = rows.map(_.getLong(0))
    val vecs = rows.map(_.getSeq[Float](1).toArray)
    println(f"collect: ${(System.nanoTime() - tC0) / 1e9}%.2fs (${ids.length} rows)")

    (1 to 2).foreach { round =>
      val tB0 = System.nanoTime()
      val model = HnswGlobalModel.build(ids, vecs, "l2", m, efC, 42, threads)
      println(f"round $round: graph build ($threads threads): ${(System.nanoTime() - tB0) / 1e9}%.2fs " +
        f"maxLevel=${model.maxLevel}")
      if (round == 2) {
        val tA0 = System.nanoTime()
        import spark.implicits._
        val graph = model.adjacencyRows.toSeq.toDF("idx", "layer", "nbrs")
        graph.cache().count()
        println(f"aux relation: ${(System.nanoTime() - tA0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
