package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.harness.{Compare, Experiment, Sweep}
import graft.sources.RandomDataset

class CompareSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  test("repeat runs collect per-run times, qps over all repeats") {
    val (train, testQ, gt) = RandomDataset.dataset(spark, 64, 8, 4, 5, seed = 3)
    val res = Experiment.runAlgorithm(spark,
      Experiment.AlgorithmSpec("exact", "brute_force", "linear", Map(), "l2"),
      train, testQ, Some(gt), 5, repeat = 3)
    assert(res.runTimesS.length == 3)
    assert(math.abs(res.totalQueryTimeS - res.runTimesS.sum) < 1e-9)
    assert(res.metrics("recall") == 1.0)
  }

  test("statistical comparison: clearly different samples are significant") {
    val a = Compare.Sample("fast", Array(100.0, 101, 99, 100.5, 100.2))
    val b = Compare.Sample("slow", Array(10.0, 10.5, 9.8, 10.1, 10.3))
    val c = Compare.compare(a, b)
    assert(c.significant && c.tPValue < 0.01)
    val same = Compare.compare(a, Compare.Sample("fast2", Array(100.1, 100.9, 99.2, 100.4, 100.0)))
    assert(!same.significant)
    val md = Compare.report(Seq(a, b), "qps")
    assert(md.contains("| fast |") && md.contains("significant"))
  }

  test("parameter sweep runs the full grid") {
    val (train, testQ, gt) = RandomDataset.dataset(spark, 64, 4, 4, 5, seed = 5)
    val results = Sweep.run(spark,
      Experiment.AlgorithmSpec("lsh", "lsh", "lsh", Map(), "l2"),
      Map("num_tables" -> Seq("4", "8"), "hash_size" -> Seq("3", "5")),
      train, testQ, Some(gt), 5)
    assert(results.length == 4)
    assert(results.map(_._1).distinct.length == 4)
    assert(results.forall(_._2.metrics.contains("recall")))
  }
}
