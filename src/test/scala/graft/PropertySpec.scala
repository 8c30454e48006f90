package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.{BoundedTopK, Metrics}

/** Property-based tests (the improvement over the reference's example
  * tests that FIXTURES.md §Spark-translation calls for): invariants that
  * must hold for arbitrary seeded inputs. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  /** run a scalacheck property deterministically, fail the suite on falsification */
  private def check(prop: Prop, n: Int = 30): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(n)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("BoundedTopK ≡ sort.take(k) under the (dist, id) total order") {
    val pairGen = Gen.listOf(Gen.zip(Gen.choose(0L, 50L), Gen.choose(0.0, 10.0)))
    check(Prop.forAll(pairGen, Gen.choose(1, 12)) { (pairs: List[(Long, Double)], k: Int) =>
      val heap = new BoundedTopK(k)
      pairs.foreach { case (id, d) => heap.insert(id, d) }
      val expected = pairs.map { case (id, d) => (id, d) }
        .sortBy { case (id, d) => (d, id) }.take(k)
      heap.sorted.toSeq == expected
    })
  }

  test("metric values are bounded in [0,1] for arbitrary id lists") {
    val ids = Gen.listOfN(8, Gen.choose(-1L, 20L))
    check(Prop.forAll(ids, ids, Gen.choose(1, 10)) {
      (pred: List[Long], gt: List[Long], k: Int) =>
      gt.isEmpty || {
        val row = Seq((pred, gt)).toDF("pred", "gt")
        val vals = row.select(
          Metrics.recallAtK(col("pred"), col("gt"), k),
          Metrics.precisionAtK(col("pred"), col("gt"), k),
          Metrics.apAtK(col("pred"), col("gt"), k),
          Metrics.ndcgAtK(col("pred"), col("gt"), k),
          Metrics.hitAtK(col("pred"), col("gt"), k),
          Metrics.rrAtK(col("pred"), col("gt"), k)).head()
        (0 until 6).forall { i =>
          val v = vals.getDouble(i)
          v >= 0.0 && v <= 1.0
        }
      }
    }, n = 15)
  }

  test("perfect prediction maximizes every metric; disjoint minimizes") {
    check(Prop.forAll(Gen.choose(1, 8)) { (n: Int) =>
      val gt = (1L to n).toList
      val perfect = Seq((gt, gt)).toDF("pred", "gt")
      val vals = perfect.select(
        Metrics.recallAtK(col("pred"), col("gt"), n),
        Metrics.apAtK(col("pred"), col("gt"), n),
        Metrics.ndcgAtK(col("pred"), col("gt"), n),
        Metrics.rrAtK(col("pred"), col("gt"), n)).head()
      (0 until 4).foreach(i => assert(vals.getDouble(i) == 1.0))
      val disjoint = Seq((gt.map(_ + 100), gt)).toDF("pred", "gt")
      val zeros = disjoint.select(
        Metrics.recallAtK(col("pred"), col("gt"), n),
        Metrics.apAtK(col("pred"), col("gt"), n),
        Metrics.hitAtK(col("pred"), col("gt"), n)).head()
      (0 until 3).foreach(i => assert(zeros.getDouble(i) == 0.0))
      true
    }, n = 8)
  }

  test("counter-based RNG is partition-count invariant") {
    check(Prop.forAll(Gen.choose(1L, 1000L), Gen.choose(0, 31)) { (id: Long, j: Int) =>
      // pure function of (seed, id, j): same value regardless of where
      // or how often evaluated — the property that makes seeded datasets
      // partitioning-invariant (SURVEY §7.4-3)
      val a = graft.sources.RandomDataset.gaussian(42L, id, j)
      val b = graft.sources.RandomDataset.gaussian(42L, id, j)
      a == b && !a.isNaN
    })
  }
}
