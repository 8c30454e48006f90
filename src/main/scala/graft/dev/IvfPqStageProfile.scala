package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators._
import graft.sources.RandomDataset

/** Stage decomposition of the residual IVF-PQ driver serve at the
  * glove50 baseline shape (20k × 50-d, nlist=256, m=50, nprobe=5,
  * 256 q): replicates IvfPqSearcher.search stage by stage in one JVM so
  * the per-batch floor attributes to prep (LUTs / term1) vs probe vs
  * code scan vs pack. */
object IvfPqStageProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.init()
    val train = RandomDataset.clusteredVectors(spark, 20000, 50, 200, 1.1, 42,
      centerSeed = 7).cache()
    train.count()
    val test = RandomDataset.clusteredVectors(spark, 256, 50, 200, 1.1, 43,
      centerSeed = 7).withColumnRenamed("id", "qid").cache()
    test.count()
    val indexer = IvfPqIndexer(nlist = 256, numSubspaces = 50,
      numCentroids = 256, seed = 42, residual = true, trainIters = 25)
    val artifact = indexer.build(train)
    artifact.data.cache().count()
    val searcher = IvfPqSearcher(nprobe = 5, metric = "l2")

    def bench(label: String)(f: () => Unit): Unit = {
      (1 to 5).foreach(_ => f())
      val t = (1 to 9).map { _ =>
        val t0 = System.nanoTime(); f(); System.nanoTime() - t0
      }.sorted.apply(4)
      println(f"$label%-26s ${t / 1e3}%8.0f us")
    }

    // end-to-end (the BaselineCompare timed window)
    (1 to 3).foreach { _ =>
      bench("search+collect e2e") { () =>
        val r = searcher.search(artifact, test, 20).collect()
        assert(r.length > 0)
      }
      // stages
      val model = PqModel.fromArtifact(artifact)
      val (qids, qVecArr) = LocalScan.queryVecsAlways(test)
      val centArr = IvfModel.centroidsOf(artifact)
      val nlist = centArr.map(_._1).max + 1
      bench("fromArtifact") { () =>
        assert(PqModel.fromArtifact(artifact) != null)
      }
      bench("qLut old (3-level+map)") { () =>
        val qLut = new Array[Array[Double]](qVecArr.length)
        java.util.stream.IntStream.range(0, qVecArr.length).parallel()
          .forEach { i =>
            // the pre-r10 shape: per-element metric branch, 3-level
            // codebook walk, then a full-array copy for the ×2
            val cbs = model.codebooks; val ds = model.dsub
            val nC = cbs(0).length
            val out = new Array[Double](cbs.length * nC)
            var j = 0
            while (j < cbs.length) {
              val cb = cbs(j)
              var c = 0
              while (c < cb.length) {
                var acc = 0.0; var ii = 0
                while (ii < ds) {
                  acc -= qVecArr(i)(j * ds + ii).toDouble * cb(c)(ii); ii += 1
                }
                out(j * nC + c) = acc
                c += 1
              }
              j += 1
            }
            qLut(i) = out.map(_ * 2.0)
          }
        assert(qLut(0) != null)
      }
      bench("qLut new (lutScaled)") { () =>
        val qLut = new Array[Array[Double]](qVecArr.length)
        java.util.stream.IntStream.range(0, qVecArr.length).parallel()
          .forEach(i => qLut(i) = model.lutScaled(qVecArr(i), "ip", 2.0))
        assert(qLut(0) != null)
      }
      val cents = centArr.toMap
      bench("qcNorm (term1)") { () =>
        val centSeq = cents.toArray
        val qcNorm = new Array[Array[Double]](qVecArr.length)
        java.util.stream.IntStream.range(0, qVecArr.length).parallel().forEach { qi =>
          val qv = qVecArr(qi)
          val row = new Array[Double](nlist)
          centSeq.foreach { case (cid, cv) =>
            var acc = 0.0; var i = 0
            while (i < qv.length) {
              val d = qv(i).toDouble - cv(i); acc += d * d; i += 1
            }
            row(cid) = acc
          }
          qcNorm(qi) = row
        }
        assert(qcNorm(0) != null)
      }
      val centSeq = cents.toArray
      val qcNorm = new Array[Array[Double]](qVecArr.length)
      java.util.stream.IntStream.range(0, qVecArr.length).parallel().forEach { qi =>
        val qv = qVecArr(qi)
        val row = new Array[Double](nlist)
        centSeq.foreach { case (cid, cv) =>
          var acc = 0.0; var i = 0
          while (i < qv.length) {
            val d = qv(i).toDouble - cv(i); acc += d * d; i += 1
          }
          row(cid) = acc
        }
        qcNorm(qi) = row
      }
      bench("probesAuto (old)") { () =>
        val p = AdcScan.probesAuto(
          test.select(col("qid").cast("long").as("qid"), col("vector")),
          qids, qVecArr, centArr, nlist, 5, artifact.aux("centroids"))
        assert(p.length == nlist)
      }
      bench("probesFromDists (new)") { () =>
        val p = AdcScan.probesFromDists(qcNorm, nlist, 5)
        assert(p.length == nlist)
      }
      println("---")
    }
    spark.stop()
  }
}
