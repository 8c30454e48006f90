package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KnnJoin

/** Mirrors the reference's brute-force-oracle pattern
  * (tests/test_composite_algorithm.py:29-58): unit-square corners, known
  * nearest-neighbor order. */
class KnnJoinSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def corners = Seq(
    (0L, Array(0f, 0f)), (1L, Array(1f, 0f)),
    (2L, Array(0f, 1f)), (3L, Array(1f, 1f))).toDF("id", "vector")

  test("exact kNN matches hand-computed order (L2)") {
    val queries = Seq(
      (0L, Array(0.1f, 0.1f)), (1L, Array(0.9f, 0.9f))).toDF("qid", "vector")
    val res = KnnJoin.knnJoin(queries, corners, k = 4, metric = "l2")
      .orderBy("qid", "rank").select("qid", "id").as[(Long, Long)].collect()
    // q0 near origin: 0, then 1/2 tie broken by id, then 3
    assert(res.take(4).map(_._2).toSeq == Seq(0L, 1L, 2L, 3L))
    // q1 near (1,1): 3, then 1/2 tie by id, then 0
    assert(res.drop(4).map(_._2).toSeq == Seq(3L, 1L, 2L, 0L))
  }

  test("pad-to-k fills with (-1, inf) — modular.py:357-360 semantics") {
    val queries = Seq((7L, Array(0f, 0f))).toDF("qid", "vector")
    val nn = KnnJoin.knnJoinAgg(queries, corners, k = 6, padToK = true)
      .select("nn").as[Seq[(Long, Double)]].head()
    assert(nn.size == 6)
    assert(nn(4) == (-1L, Double.PositiveInfinity))
    assert(nn(5) == (-1L, Double.PositiveInfinity))
  }

  test("cosine distance ranks by angle not magnitude") {
    val base = Seq(
      (0L, Array(10f, 0f)), (1L, Array(0f, 10f)), (2L, Array(5f, 5f)))
      .toDF("id", "vector")
    val queries = Seq((0L, Array(1f, 0.1f))).toDF("qid", "vector")
    val top = KnnJoin.knnJoin(queries, base, 1, "cosine")
      .select("id").as[Long].head()
    assert(top == 0L)
  }

  test("self-retrieval: every base vector is its own nearest neighbor") {
    val (train, _, _) = graft.sources.RandomDataset.dataset(
      spark, 64, 0, 8, 1, seed = 7)
    val q = train.select(col("id").as("qid"), col("vector"))
    val top1 = KnnJoin.knnJoin(q, train, 1, "l2")
    assert(top1.filter(col("qid") === col("id")).count() == 64)
    assert(top1.agg(max("dist")).as[Double].head() == 0.0)
  }
}
