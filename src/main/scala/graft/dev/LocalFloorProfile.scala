package graft.dev

import org.apache.spark.sql.SparkSession

import graft.operators._
import graft.sources.RandomDataset

/** Decomposes the per-batch fixed floor of a LocalScan search: kernel vs
  * result-relation creation vs harness collect. */
object LocalFloorProfile {
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

    val params = Map("num_subspaces" -> "64", "num_centroids" -> "256")
    val artifact = Registry.indexer("pq", params + ("seed" -> "42"), "l2").build(train)
    artifact.data.cache().count()
    val searcher = Registry.searcher("pq", params, "l2")
    // warm everything
    (1 to 3).foreach(_ => searcher.search(artifact, test, 20).collect())

    val model = PqModel.fromArtifact(artifact)
    val (qids, qVecs) = LocalScan.queryVecsAlways(test)
    val ct = LocalScan.codeTable(artifact.data, ivf = false).get

    def time(label: String)(body: => Unit): Unit = {
      (1 to 2).foreach(_ => body) // warm
      val t0 = System.nanoTime()
      val n = 5
      (1 to n).foreach(_ => body)
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e3 / n}%10.0f us")
    }

    time("lut build (256q)") {
      val lutArr = new Array[Array[Double]](qVecs.length)
      java.util.stream.IntStream.range(0, qVecs.length).parallel()
        .forEach(i => lutArr(i) = model.lut(qVecs(i), "l2"))
    }
    val lutArr = new Array[Array[Double]](qVecs.length)
    java.util.stream.IntStream.range(0, qVecs.length).parallel()
      .forEach(i => lutArr(i) = model.lut(qVecs(i), "l2"))
    val scorer = new AdcScan.PqLutScorer(AdcScan.LocalLut(lutArr), true)

    var kept: org.apache.spark.sql.DataFrame = null
    time("kernel+resultDf") {
      kept = LocalScan.scanCodesFull(spark, ct, qids, 20, scorer)
    }
    time("collect()") { kept.collect() }
    time("fresh search()") { searcher.search(artifact, test, 20) }
    time("fresh search+collect") { searcher.search(artifact, test, 20).collect() }

    // kernel alone (no DataFrame)
    time("kernel only") {
      val heaps = new Array[BoundedTopK](qids.length)
      java.util.stream.IntStream.range(0, qids.length).parallel().forEach { qi =>
        val h = new BoundedTopK(20)
        var r = 0
        while (r < ct.n) {
          h.insert(ct.ids(r), scorer.score(qi, -1, ct.codes, r * ct.m, ct.m))
          r += 1
        }
        heaps(qi) = h
      }
    }
    spark.stop()
  }
}
