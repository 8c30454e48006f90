package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.RandomDataset

/** Global-vs-distributed HNSW at the msmarco baseline shape (100k ×
  * 384-d, 70 q, hardened stand-in — same generator parameters as
  * BaselineCompare's msmarco workload). The driver-bound HnswGlobal
  * build is the one remaining scale watch item (VERDICT r8 #2): this
  * probe measures whether the per-centroid distributed build
  * (HnswIndexer) reaches the reference recall operating point
  * (ref 0.9857 / 7,872 QPS) and at what build cost, sweeping
  * (n_partitions, m, ef_construction, nprobe, ef_search).
  *
  * Usage: runMain graft.dev.HnswDistProbe [nTrain] [sweep]
  *   sweep = comma-list of nPart:m:efC:nprobe:efS tuples, default a
  *   small grid around the expected operating point.
  */
object HnswDistProbe {
  def main(args: Array[String]): Unit = {
    val nTrain = args.headOption.map(_.toLong).getOrElse(100000L)
    // tuple = nPart:m:efC:nprobe:efS[:spill[:eps]]
    val sweep = args.drop(1).headOption
      .map(_.split(",").toSeq)
      .getOrElse(Seq("16:16:200:4:64", "16:16:200:6:64", "32:16:200:8:64",
        "32:16:200:12:64", "32:16:200:12:96"))
      .map { s =>
        val p = s.split(":"); (p(0).toInt, p(1).toInt, p(2).toInt,
          p(3).toInt, p(4).toInt,
          if (p.length > 5) p(5).toInt else 1,
          if (p.length > 6) p(6).toDouble else 0.15)
      }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.init()
    import spark.implicits._

    // msmarco hardened stand-in, exactly BaselineCompare's generator call
    def vecs(n: Long, seed: Long) =
      RandomDataset.clusteredVectors(spark, n, 384, 512, 1.2, seed,
        centerSeed = 7, intrinsicDim = 64, overlap = 0.7)
        .withColumn("vector",
          graft.functions.VectorFunctions.vec_normalize(col("vector")))
    val train = vecs(nTrain, 42).cache()
    val test = vecs(70, 43).withColumnRenamed("id", "qid").cache()
    train.count(); test.count()
    val gt = KnnJoin.knnJoinAgg(test, train, 20, "l2")
      .select(col("qid"), transform(col("nn"), x => x("id")).as("gt_ids"))
      .cache()
    gt.count()

    def measure(tag: String, indexer: String, searcher: String,
        bParams: Map[String, String], sParams: Map[String, String]): Unit = {
      // small-prefix warm build (JIT), same as BaselineCompare.prepOne
      try {
        val warm = Registry.indexer(indexer, bParams + ("seed" -> "42"), "l2")
          .build(train.limit(2000))
        warm.data.unpersist()
      } catch { case _: Throwable => () }
      val t0 = System.nanoTime()
      val artifact = Registry.indexer(indexer, bParams + ("seed" -> "42"), "l2")
        .build(train)
      artifact.data.cache().count()
      val buildS = (System.nanoTime() - t0) / 1e9
      val s = Registry.searcher(searcher, sParams, "l2")
      s.search(artifact, test, 20).collect() // warm
      val secs = (1 to 3).map { _ =>
        val t1 = System.nanoTime()
        s.search(artifact, test, 20).collect()
        (System.nanoTime() - t1) / 1e9
      }.min
      val res = graft.operators.LocalScan.rowsDf(spark,
        s.search(artifact, test, 20).collect().toSeq)
      val pred = res.groupBy("qid")
        .agg(TopKByDist.topK(col("id"), col("dist"), 20).as("nn"))
        .select(col("qid"), transform(col("nn"), x => x("id")).as("pred"))
      val recall = pred.join(gt, Seq("qid"))
        .select(avg(Metrics.recallAtK(col("pred"), col("gt_ids"), 20)))
        .as[Double].head()
      println(f"$tag%-40s recall=$recall%.4f qps=${70.0 / secs}%8.0f " +
        f"build=$buildS%6.1fs")
      artifact.data.unpersist()
    }

    // optional: big-batch distributed-serve amortization — time the
    // mapPartitions serve path (the over-cap regime) at `bigBatch`
    // queries, untimed build, no GT (recall is pinned by the small-batch
    // measurements; this measures job-dispatch amortization only)
    val bigBatch = args.lift(2).map(_.toInt).getOrElse(0)

    println(s"n_train=$nTrain  (ref msmarco hnsw: recall 0.9857, qps 7872, " +
      "build 248s on ref hw)")
    if (bigBatch > 0) {
      val (np, m, efC, nprobe, efS, spill, eps) = sweep.head
      val artifact = Registry.indexer("hnsw",
        Map("n_partitions" -> np.toString, "m" -> m.toString,
          "ef_construction" -> efC.toString, "spill" -> spill.toString,
          "spill_eps" -> eps.toString, "seed" -> "42"), "l2").build(train)
      artifact.data.cache().count()
      val s = Registry.searcher("hnsw",
        Map("nprobe" -> nprobe.toString, "ef_search" -> efS.toString), "l2")
      val bigQ = vecs(bigBatch, 44).withColumnRenamed("id", "qid").cache()
      bigQ.count()
      // force the DISTRIBUTED path regardless of caps
      sys.props("graft.local.enabled") = "false"
      try {
        s.search(artifact, bigQ, 20).count() // warm
        val secs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          s.search(artifact, bigQ, 20).count()
          (System.nanoTime() - t0) / 1e9
        }.min
        println(f"distributed-serve bigBatch=$bigBatch%d: ${secs}%.2fs " +
          f"qps=${bigBatch / secs}%8.0f (mapPartitions path, caps forced off)")
      } finally sys.props.remove("graft.local.enabled")
      artifact.data.unpersist(); bigQ.unpersist()
    }
    measure("global m=16 efC=200 ef=64", "hnsw_global", "hnsw_global",
      Map("m" -> "16", "ef_construction" -> "200"),
      Map("ef_search" -> "64"))
    sweep.foreach { case (np, m, efC, nprobe, efS, spill, eps) =>
      measure(
        f"dist nPart=$np m=$m efC=$efC nprobe=$nprobe ef=$efS sp=$spill/$eps%.2f",
        "hnsw", "hnsw",
        Map("n_partitions" -> np.toString, "m" -> m.toString,
          "ef_construction" -> efC.toString, "spill" -> spill.toString,
          "spill_eps" -> eps.toString),
        Map("nprobe" -> nprobe.toString, "ef_search" -> efS.toString))
    }
    spark.stop()
  }
}
