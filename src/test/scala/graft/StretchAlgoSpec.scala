package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._
import graft.sources.RandomDataset

/** CoverTree (exact — equality against brute force, mirroring
  * tests/algorithms/test_covertree_v2_2.py:12-27) and per-partition NSW
  * (approximate — recall threshold, SURVEY §7.4-4). */
class StretchAlgoSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private lazy val (train, testQ, gt) =
    RandomDataset.dataset(spark, 256, 12, 12, 10, seed = 321)

  private def recallOf(result: org.apache.spark.sql.DataFrame): Double = {
    val pred = result.groupBy("qid")
      .agg(TopKByDist.topK(col("id"), col("dist"), 10).as("nn"))
      .select(col("qid"), transform(col("nn"), x => x("id")).as("pred"))
    pred.join(gt, "qid")
      .select(avg(Metrics.recallAtK(col("pred"), col("gt_ids"), 10)))
      .as[Double].head()
  }

  test("CoverTree is exact: results equal brute force including order") {
    val idx = CoverTreeIndexer("l2").build(train)
    val res = CoverTreeSearcher("l2").search(idx, testQ, 10)
    assert(recallOf(res) == 1.0)
    // order equality vs the exact kNN join (total order (dist,id))
    val ct = res.orderBy("qid", "rank").select("qid", "id").as[(Long, Long)].collect()
    val bf = KnnJoin.knnJoin(testQ, train, 10, "l2")
      .orderBy("qid", "rank").select("qid", "id").as[(Long, Long)].collect()
    assert(ct.toSeq == bf.toSeq)
  }

  test("CoverTree reload path re-aligns vectors by serialized ids") {
    val idx = CoverTreeIndexer("l2").build(train)
    assert(idx.local.contains("model"), "build() must stash the model")
    val direct = CoverTreeSearcher("l2").search(idx, testQ, 10)
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    // store-load shape: only data+meta survive; the searcher must rebuild
    // from ct.ids order, NOT collect order (which shuffles can permute)
    val reloaded = idx.copy(
      local = Map.empty,
      data = idx.data.repartition(7)) // deliberately scramble row order
    val viaMeta = CoverTreeSearcher("l2").search(reloaded, testQ, 10)
      .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
    assert(direct == viaMeta, "reload must reproduce the exact search")
  }

  test("CoverTree counts distance operations (A10 accumulator)") {
    val acc = spark.sparkContext.longAccumulator("ndis")
    val idx = CoverTreeIndexer("l2").build(train)
    CoverTreeSearcher("l2", Some(acc)).search(idx, testQ, 5).count()
    assert(acc.value > 0)
    // pruning must beat brute force on at least the total count
    assert(acc.value < 256L * 12 * 2, s"ndis=${acc.value} suggests no pruning")
  }

  test("NSW per-partition graph search: recall above threshold") {
    val idx = HnswIndexer(nPartitions = 4, m = 8, efConstruction = 32,
      metric = "l2", seed = 9).build(train)
    val res = HnswSearcher(nprobe = 4, efSearch = 64, metric = "l2")
      .search(idx, testQ, 10)
    val r = recallOf(res)
    assert(r > 0.7, s"nsw recall $r")
  }

  test("fvecs/ivecs round trip with positional ids") {
    val dir = java.nio.file.Files.createTempDirectory("fvecs").toString
    val vs = (0 until 20).map(i => Array(i.toFloat, (i * 2).toFloat, 0.5f))
    graft.sources.VectorSources.writeFvecs(s"$dir/a.fvecs", vs)
    val df = graft.sources.VectorSources.readFvecs(spark, s"$dir/a.fvecs")
    assert(df.count() == 20)
    val row5 = df.filter(col("id") === 5).select("vector").as[Seq[Float]].head()
    assert(row5 == Seq(5f, 10f, 0.5f))
  }

  test("column auto-detection: candidate names, fallback, struct children") {
    val byName = Seq((1L, Seq(1f, 2f))).toDF("doc_id", "embedding")
    assert(graft.sources.VectorSources.resolveColumns(byName) == ("embedding", "doc_id"))
    val byFallback = Seq((7, Seq(1f))).toDF("row", "weights")
    assert(graft.sources.VectorSources.resolveColumns(byFallback) == ("weights", "row"))
    val nested = Seq((1L, (Seq(1f, 2f), "x"))).toDF("id", "payload")
      .select(col("id"), col("payload").cast("struct<values:array<float>,tag:string>"))
    assert(graft.sources.VectorSources.resolveColumns(nested)._1 == "payload.values")
  }

  test("exact-k seeded subsample is deterministic and partitioning-invariant") {
    val df = spark.range(1000).toDF("id")
    val a = graft.sources.VectorSources.subsampleExact(df, "id", 100, 7)
      .select("id").as[Long].collect().sorted.toSeq
    val b = graft.sources.VectorSources.subsampleExact(df.repartition(13), "id", 100, 7)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b && a.size == 100)
  }
}
