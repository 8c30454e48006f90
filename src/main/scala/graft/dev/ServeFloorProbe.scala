package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators._
import graft.sources.RandomDataset

/** Decompose the driver-local ivf_flat serve floor at the tiny-batch
  * glove50 shape (256 q): same-JVM interleaved timing of (a) the full
  * scanVecsIvf path, (b) a scan-only replica (no result relation), (c)
  * the scan replica on a dedicated fixed pool instead of the common
  * fork-join pool, (d) probesAuto. Identifies whether the ~2-3 ms fixed
  * tax is dispatch, kernel, or packing. */
object ServeFloorProbe {
  def main(args: Array[String]): Unit = {
    val dim = args.headOption.map(_.toInt).getOrElse(50)
    val nprobe = args.drop(1).headOption.map(_.toInt).getOrElse(5)
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
    val test = RandomDataset.vectors(spark, 256, dim, 43)
      .withColumnRenamed("id", "qid").cache()
    test.count()
    val q = test.select(col("qid").cast("long").as("qid"), col("vector"))
    val (qids, qv) = LocalScan.queryVecsAlways(test)
    val probes = AdcScan.probesAuto(q, qids, qv, cents, nlist, nprobe,
      artifact.aux("centroids"))
    val vt = LocalScan.vecTable(artifact.data, ivf = true).get
    val byQuery = LocalScan.invertProbes(probes, qids.length)

    // local L2 kernel (index-order double chain, same as LocalScan.vecDist
    // mode 0)
    def distAt(qv: Array[Float], off: Int): Double = {
      var acc = 0.0; var i = 0
      while (i < qv.length) {
        val d = qv(i).toDouble - vt.flat(off + i).toDouble
        acc += d * d; i += 1
      }
      acc
    }
    def scanOne(qi: Int, k: Int): BoundedTopK = {
      var h: BoundedTopK = null
      val qvec = qv(qi)
      val cids = byQuery(qi)
      var ci = 0
      while (ci < cids.length) {
        val cid = cids(ci)
        if (cid + 1 < vt.listOffsets.length) {
          var r = vt.listOffsets(cid)
          val end = vt.listOffsets(cid + 1)
          if (r < end && h == null) h = new BoundedTopK(k)
          while (r < end) {
            h.insert(vt.ids(r), math.sqrt(distAt(qvec, r * vt.dim)))
            r += 1
          }
        }
        ci += 1
      }
      h
    }

    val pool = new java.util.concurrent.ForkJoinPool(31)
    def bench(label: String)(f: () => Unit): Unit = {
      (1 to 5).foreach(_ => f())
      val t = (1 to 9).map { _ =>
        val t0 = System.nanoTime(); f(); System.nanoTime() - t0
      }.sorted.apply(4)
      println(f"$label%-28s ${t / 1e3}%8.0f us")
    }

    (1 to 3).foreach { _ =>
      bench("full scanVecsIvf+collect") { () =>
        LocalScan.scanVecsIvf(spark, vt, qids, qv, 20, 0, probes).collect()
      }
      bench("probe+scan+collect (old)") { () =>
        val p = AdcScan.probesAuto(q, qids, qv, cents, nlist, nprobe,
          artifact.aux("centroids"))
        LocalScan.scanVecsIvf(spark, vt, qids, qv, 20, 0, p).collect()
      }
      bench("fused scanVecsIvfFused") { () =>
        LocalScan.scanVecsIvfFused(spark, vt, qids, qv, 20, 0, cents,
          nprobe).collect()
      }
      bench("scan-only commonPool") { () =>
        val heaps = new Array[BoundedTopK](qids.length)
        java.util.stream.IntStream.range(0, qids.length).parallel()
          .forEach { qi => heaps(qi) = scanOne(qi, 20) }
        assert(heaps(0) != null)
      }
      bench("scan-only dedicated pool") { () =>
        val heaps = new Array[BoundedTopK](qids.length)
        pool.submit(new Runnable {
          def run(): Unit =
            java.util.stream.IntStream.range(0, qids.length).parallel()
              .forEach { qi => heaps(qi) = scanOne(qi, 20) }
        }).join()
        assert(heaps(0) != null)
      }
      bench("scan-only single thread") { () =>
        val heaps = new Array[BoundedTopK](qids.length)
        var qi = 0
        while (qi < qids.length) { heaps(qi) = scanOne(qi, 20); qi += 1 }
        assert(heaps(0) != null)
      }
      bench("probesAuto") { () =>
        val p = AdcScan.probesAuto(q, qids, qv, cents, nlist, nprobe,
          artifact.aux("centroids"))
        assert(p.length == nlist)
      }
      bench("resultDf+collect") { () =>
        val heaps = new Array[BoundedTopK](qids.length)
        var qi = 0
        while (qi < qids.length) { heaps(qi) = scanOne(qi, 20); qi += 1 }
        // time only the pack below? no — this lap includes the scan; the
        // delta vs scan-only single thread is the pack cost
        LocalScan.resultDf(spark, qids, heaps).collect()
      }
      // pack+DF+collect in ISOLATION (pairsResultDf is non-destructive,
      // so fixed input can be timed alone): the pure framework tax
      locally {
        val per = Array.tabulate(qids.length) { qi =>
          val h = scanOne(qi, 20); val s = h.sorted; s
        }
        bench("pairsResultDf+collect only") { () =>
          val r = LocalScan.pairsResultDf(spark, qids, per).collect()
          assert(r.length > 0)
        }
        bench("pairsResultDf no collect") { () =>
          val df = LocalScan.pairsResultDf(spark, qids, per)
          assert(df != null)
        }
        // split the pack cost: raw UnsafeRow fill vs the DataFrame wrap
        locally {
          val n = per.map(p => if (p == null) 0 else p.length).sum
          val rowBytes = 8 + 4 * 8
          bench("raw pack loop 5120 rows") { () =>
            val bytes = new Array[Byte](n * rowBytes)
            val rows = new Array[org.apache.spark.sql.catalyst.InternalRow](n)
            var slot = 0
            var qi = 0
            while (qi < qids.length) {
              val p = per(qi)
              if (p != null) {
                var pos = 0
                while (pos < p.length) {
                  val r = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(4)
                  r.pointTo(bytes,
                    org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET +
                      slot.toLong * rowBytes, rowBytes)
                  r.setLong(0, qids(qi))
                  r.setInt(1, pos + 1)
                  r.setLong(2, p(pos)._1)
                  r.setDouble(3, p(pos)._2)
                  rows(slot) = r
                  slot += 1; pos += 1
                }
              }
              qi += 1
            }
            assert(rows(n - 1) != null)
          }
          val rows5k = {
            val bytes = new Array[Byte](n * rowBytes)
            Array.tabulate[org.apache.spark.sql.catalyst.InternalRow](n) { i =>
              val r = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(4)
              r.pointTo(bytes,
                org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET +
                  i.toLong * rowBytes, rowBytes)
              r
            }
          }
          bench("Shim wrap 5120 rows") { () =>
            val df = org.apache.spark.sql.graftshim.Shim.localRelationDf(
              spark, LocalScan.resultSchema,
              scala.collection.immutable.ArraySeq.unsafeWrapArray(rows5k))
            assert(df != null)
          }
          val attrs5k = org.apache.spark.sql.catalyst.types.DataTypeUtils
            .toAttributes(LocalScan.resultSchema)
          val seq5k = scala.collection.immutable.ArraySeq.unsafeWrapArray(rows5k)
          bench("LocalRelation ctor 5120") { () =>
            val rel = org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
              attrs5k, seq5k)
            assert(rel != null)
          }
          val seq64 = scala.collection.immutable.ArraySeq.unsafeWrapArray(
            rows5k.take(64))
          // (r10 finding, measured with a since-removed timed Shim variant:
          // of the ~300 us wrap at 5120 rows, ~250 us is a row-proportional
          // lazy forced by the FIRST Dataset init on a relation — a second
          // Dataset on the same rel costs ~1 us — and LocalRelation.hashCode
          // adds ~28 ns/row when something asks for it. Both are inside
          // Spark's Dataset/TreeNode machinery, not our pack loop.)
          bench("Shim wrap 64 rows 4col") { () =>
            val df = org.apache.spark.sql.graftshim.Shim.localRelationDf(
              spark, LocalScan.resultSchema, seq64)
            assert(df != null)
          }
        }
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("qid",
            org.apache.spark.sql.types.LongType, nullable = false)))
        val internal = Array.tabulate(64) { i =>
          val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
          r.setLong(0, i.toLong)
          r: org.apache.spark.sql.catalyst.InternalRow
        }
        bench("localRelationDf 64 rows") { () =>
          val df = org.apache.spark.sql.graftshim.Shim.localRelationDf(
            spark, schema, scala.collection.immutable.ArraySeq
              .unsafeWrapArray(internal))
          assert(df != null)
        }
      }
      println("---")
    }
    spark.stop()
  }
}
