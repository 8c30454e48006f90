package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Metrics

class MetricsSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def row(pred: Seq[Long], gt: Seq[Long]) =
    Seq((pred, gt)).toDF("pred", "gt")

  private def value(c: org.apache.spark.sql.Column,
      pred: Seq[Long], gt: Seq[Long]): Double =
    row(pred, gt).select(c.as("v")).as[Double].head()

  val log2 = (x: Double) => math.log(x) / math.log(2.0)

  test("recall@k = |gt[:k] ∩ pred[:k]| / |gt[:k]|") {
    assert(value(Metrics.recallAtK($"pred", $"gt", 3),
      Seq(1L, 9L, 3L), Seq(1L, 2L, 3L)) == 2.0 / 3)
    // k larger than arrays: clamps naturally
    assert(value(Metrics.recallAtK($"pred", $"gt", 10),
      Seq(1L, 2L), Seq(1L, 2L)) == 1.0)
  }

  test("precision@k uses the FULL gt set and divides by k") {
    // gt has 5 items, pred top-3 contains 2 of them → 2/3
    assert(value(Metrics.precisionAtK($"pred", $"gt", 3),
      Seq(1L, 9L, 5L), Seq(1L, 2L, 3L, 4L, 5L)) == 2.0 / 3)
  }

  test("AP matches metrics.py:65-103 (cumulative hits at hit positions / |gt|)") {
    // hits at pos 1 (cnt 1) and pos 3 (cnt 2): (1/1 + 2/3) / 3
    val got = value(Metrics.apAtK($"pred", $"gt", 3),
      Seq(1L, 9L, 3L), Seq(1L, 2L, 3L))
    assert(math.abs(got - (1.0 + 2.0 / 3) / 3) < 1e-12)
  }

  test("NDCG binary relevance matches closed form") {
    val dcg = 1.0 / log2(2) + 1.0 / log2(4) // hits at pos 1,3 (0-based 0,2)
    val idcg = 1.0 / log2(2) + 1.0 / log2(3) + 1.0 / log2(4)
    val got = value(Metrics.ndcgAtK($"pred", $"gt", 3),
      Seq(1L, 9L, 3L), Seq(1L, 2L, 3L))
    assert(math.abs(got - dcg / idcg) < 1e-12)
  }

  test("hit rate and MRR") {
    assert(value(Metrics.hitAtK($"pred", $"gt", 2), Seq(9L, 8L, 1L), Seq(1L)) == 0.0)
    assert(value(Metrics.hitAtK($"pred", $"gt", 3), Seq(9L, 8L, 1L), Seq(1L)) == 1.0)
    assert(value(Metrics.rrAtK($"pred", $"gt", 3), Seq(9L, 8L, 1L), Seq(1L)) == 1.0 / 3)
    assert(value(Metrics.rrAtK($"pred", $"gt", 3), Seq(9L, 8L, 7L), Seq(1L)) == 0.0)
  }

  test("-1 padding never matches (recall penalized, not crash)") {
    assert(value(Metrics.recallAtK($"pred", $"gt", 4),
      Seq(1L, 2L, -1L, -1L), Seq(1L, 2L, 3L, 4L)) == 0.5)
  }

  test("exact search recall ≡ 1.0 on random data (property)") {
    val (train, test, gt) = graft.sources.RandomDataset.dataset(
      spark, 128, 8, 16, 10, seed = 42)
    val pred = graft.operators.KnnJoin.knnJoinAgg(test, train, 10)
      .select(col("qid"), transform(col("nn"), x => x("id")).as("pred"))
    val r = pred.join(gt, "qid")
      .select(avg(Metrics.recallAtK($"pred", $"gt_ids", 10)))
      .as[Double].head()
    assert(r == 1.0)
  }
}
