package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.RandomDataset

/** Phase-level timing of the msmarco-shape (100k × 384-d) quantized index
  * builds — the rows where BENCH's baseline block trails the reference
  * hardest (pq build 46 s vs ref 16 s; ivf_pq 94 s vs 18 s; ivf_sq8 29 s
  * vs 2 s). Run: sbt "runMain graft.dev.PqBuildProfile" */
object PqBuildProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    Registry.init()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[pqprofile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }

    val raw = RandomDataset.clusteredVectors(spark, 100000, 384, 512, 0.9, 42, 7)
    val train = raw.withColumn("vector",
        graft.functions.VectorFunctions.vec_normalize(col("vector"))).cache()
    t("materialize train")(train.count())

    // PQ64 phases
    val cached = train.select(col("id").cast("long").as("id"), col("vector")).cache()
    t("cache projection")(cached.count())
    val sample = t("sample collect") {
      cached.sample(withReplacement = false, 65536.0 / 100000, 42)
        .select(col("vector")).collect()
        .map(_.getSeq[Float](0).toArray)
    }
    System.err.println(s"[pqprofile] sample n=${sample.length}")
    val codebooks = t("kmeans 64 subspaces x 15 it") {
      val dsub = 384 / 64
      val out = new Array[Array[Array[Float]]](64)
      java.util.stream.IntStream.range(0, 64).parallel().forEach { j =>
        val sub = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
        out(j) = LocalKMeans.fit(sub, 256, 42 + j, iters = 15)
      }
      out
    }
    val model = PqModel(codebooks, 384 / 64)
    t("encode 100k") {
      cached.as[(Long, Array[Float])]
        .mapPartitions(_.map { case (i, v) => (i, model.encode(v)) })
        .toDF("id", "codes")
        .write.mode("overwrite").format("noop").save()
    }

    // coarse quantizer (IVF256) phases
    val coarse = t("ivf coarse train (256x384)") {
      IvfModel.train(cached.toDF(), 256, 42)
    }
    t("ivf assign 100k") {
      cached.as[(Long, Array[Float])]
        .mapPartitions(_.map { case (i, v) => (i, IvfModel.assign(coarse, v)) })
        .toDF("id", "centroid_id")
        .write.mode("overwrite").format("noop").save()
    }

    // full builds end to end
    t("pq full build")(PqIndexer(64, 256, 42).build(cached.toDF()))
    t("ivf_sq8 full build")(IvfSq8Indexer(256, 42).build(cached.toDF()))
    t("ivf_pq residual full build")(
      IvfPqIndexer(256, 64, 256, 42, residual = true).build(cached.toDF()))
    spark.stop()
  }
}
