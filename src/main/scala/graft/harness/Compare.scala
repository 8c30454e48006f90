package graft.harness

import org.apache.commons.math3.stat.inference.{MannWhitneyUTest, TTest}

/** Statistical comparison across repeated runs (reference:
  * `scripts/compare_algorithms.py:36-468` — multi-run mean±std with
  * Welch t-test / Mann-Whitney U; scipy there, Apache Commons Math here
  * exactly as SURVEY §7.5 prescribed).
  */
object Compare {

  final case class Sample(algorithm: String, values: Array[Double]) {
    def mean: Double = values.sum / values.length
    def std: Double = {
      val m = mean
      math.sqrt(values.map(v => (v - m) * (v - m)).sum /
        math.max(1, values.length - 1))
    }
  }

  final case class Comparison(
      a: String, b: String, meanA: Double, meanB: Double,
      stdA: Double, stdB: Double, tPValue: Double, uPValue: Double,
      significant: Boolean)

  /** Welch t-test + Mann-Whitney U on a per-run metric (e.g. QPS) */
  def compare(a: Sample, b: Sample, alpha: Double = 0.05): Comparison = {
    val t = if (a.values.length >= 2 && b.values.length >= 2)
      new TTest().tTest(a.values, b.values) else 1.0
    val u = if (a.values.length >= 2 && b.values.length >= 2)
      new MannWhitneyUTest().mannWhitneyUTest(a.values, b.values) else 1.0
    Comparison(a.algorithm, b.algorithm, a.mean, b.mean, a.std, b.std,
      t, u, t < alpha)
  }

  /** markdown report over all pairs */
  def report(samples: Seq[Sample], metricName: String): String = {
    val sb = new StringBuilder(s"# Algorithm comparison — $metricName\n\n")
    sb.append("| Algorithm | mean | std | n |\n|---|---|---|---|\n")
    samples.foreach { s =>
      sb.append(f"| ${s.algorithm} | ${s.mean}%.3f | ${s.std}%.3f | ${s.values.length} |\n")
    }
    sb.append("\n| A | B | Δmean | t p-value | U p-value | significant |\n")
    sb.append("|---|---|---|---|---|---|\n")
    for {
      i <- samples.indices; j <- (i + 1) until samples.length
    } {
      val c = compare(samples(i), samples(j))
      sb.append(f"| ${c.a} | ${c.b} | ${c.meanA - c.meanB}%.3f | ${c.tPValue}%.4f " +
        f"| ${c.uPValue}%.4f | ${if (c.significant) "yes" else "no"} |\n")
    }
    sb.toString
  }
}

/** Parameter sweep driver (reference `scripts/parameter_sweep.py:29-168`:
  * itertools grid over algorithm params). */
object Sweep {
  /** cartesian grid: Map(param → values) → sequence of param maps */
  def grid(space: Map[String, Seq[String]]): Seq[Map[String, String]] = {
    space.foldLeft(Seq(Map.empty[String, String])) {
      case (acc, (key, values)) =>
        for { m <- acc; v <- values } yield m + (key -> v)
    }
  }

  /** run a spec over the grid, one Result per combination */
  def run(spark: org.apache.spark.sql.SparkSession,
      baseSpec: Experiment.AlgorithmSpec,
      space: Map[String, Seq[String]],
      train: org.apache.spark.sql.DataFrame,
      test: org.apache.spark.sql.DataFrame,
      gt: Option[org.apache.spark.sql.DataFrame],
      topk: Int): Seq[(Map[String, String], Experiment.Result)] =
    grid(space).map { params =>
      val spec = baseSpec.copy(
        name = s"${baseSpec.name}[${params.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(",")}]",
        params = baseSpec.params ++ params)
      params -> Experiment.runAlgorithm(spark, spec, train, test, gt, topk)
    }
}
