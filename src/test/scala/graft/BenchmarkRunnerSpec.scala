package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.harness.{BenchmarkRunner, Config}

/** E2E mini benchmark through the config-driven runner, mirroring
  * tests/test_benchmark_runner_modular.py:9-65: tiny random dataset,
  * metric keys present, report artifacts exist. */
class BenchmarkRunnerSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  test("config-driven run produces results + reports for two algorithms") {
    val outDir = java.nio.file.Files.createTempDirectory("bench").toString
    val yaml =
      """topk: 5
        |n_queries: 5
        |seed: 123
        |datasets:
        |  - name: random
        |    options:
        |      train_size: 64
        |      test_size: 6
        |      dims: 3
        |      seed: 123
        |indexers:
        |  bf:
        |    type: brute_force
        |searchers:
        |  lin:
        |    type: linear
        |algorithms:
        |  exact:
        |    indexer_ref: bf
        |    searcher_ref: lin
        |  lsh:
        |    indexer:
        |      type: lsh
        |    searcher:
        |      type: lsh
        |    params:
        |      num_tables: 6
        |      hash_size: 3
        |""".stripMargin
    val cfg = Config.parseYaml(yaml).asInstanceOf[Map[String, Any]]
    BenchmarkRunner.run(spark, cfg, outDir)

    import java.nio.file.{Files, Paths}
    assert(Files.exists(Paths.get(outDir, "benchmark_summary.md")))
    assert(Files.exists(Paths.get(outDir, "all_results.json")))
    assert(Files.exists(Paths.get(outDir, "random", "one-page-summary.md")))
    assert(Files.exists(Paths.get(outDir, "random", "qps_recall.svg")))
    val json = Files.readString(Paths.get(outDir, "random", "results.json"))
    assert(json.contains("\"algorithm\": \"exact\""))
    assert(json.contains("\"recall@1\""))
    assert(json.contains("\"n_train\": 64"))
    val md = Files.readString(Paths.get(outDir, "benchmark_summary.md"))
    // exact search must rank first with recall 1.0
    assert(md.contains("| exact | 1.0000"))
  }

  test("dataset errors are isolated, suite continues") {
    val outDir = java.nio.file.Files.createTempDirectory("bench2").toString
    val cfg: Map[String, Any] = Map(
      "topk" -> 5.0,
      "datasets" -> List(
        "/nonexistent/path.parquet",
        Map("name" -> "random",
          "options" -> Map("train_size" -> 32.0, "test_size" -> 4.0, "dims" -> 2.0))),
      "algorithms" -> Map(
        "exact" -> Map(
          "indexer" -> Map("type" -> "brute_force"),
          "searcher" -> Map("type" -> "linear"))))
    BenchmarkRunner.run(spark, cfg, outDir)
    val md = java.nio.file.Files.readString(
      java.nio.file.Paths.get(outDir, "benchmark_summary.md"))
    assert(md.contains("FAILED"))
    assert(md.contains("| exact |")) // second dataset still ran
  }
}
