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

  test("dataset catalog: glove50 + sift1m named datasets run end-to-end") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("dscat").toString
    val outDir = Files.createTempDirectory("dscat_out").toString
    val rnd = new java.util.Random(7)
    // GloVe text fixture (word + 4-d vectors)
    val glove = (0 until 80).map { i =>
      s"w$i " + (0 until 4).map(_ => f"${rnd.nextGaussian()}%.4f").mkString(" ")
    }.mkString("\n")
    Files.writeString(Paths.get(root, "glove.6B.50d.txt"), glove)
    // SIFT fvecs/ivecs fixture: base, queries, and an ivecs GT computed
    // brute-force from the same arrays
    val base = Array.fill(60)(Array.fill(4)(rnd.nextGaussian().toFloat))
    val queries = Array.fill(5)(Array.fill(4)(rnd.nextGaussian().toFloat))
    graft.sources.VectorSources.writeFvecs(s"$root/sift_base.fvecs", base.toSeq)
    graft.sources.VectorSources.writeFvecs(s"$root/sift_query.fvecs", queries.toSeq)
    def l2(a: Array[Float], b: Array[Float]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val gtIds = queries.map { q =>
      base.zipWithIndex.sortBy { case (v, i) => (l2(q, v), i) }.take(3).map(_._2)
    }
    val bb = java.nio.ByteBuffer.allocate(gtIds.map(4 + 4 * _.length).sum)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    gtIds.foreach { ids => bb.putInt(ids.length); ids.foreach(bb.putInt) }
    Files.write(Paths.get(root, "sift_groundtruth.ivecs"), bb.array())

    val yaml =
      s"""topk: 3
         |seed: 7
         |datasets:
         |  - name: glove50
         |    options:
         |      root: $root
         |      test_size: 5
         |      gt_k: 3
         |  - name: sift1m
         |    options:
         |      root: $root
         |algorithms:
         |  exact:
         |    indexer:
         |      type: brute_force
         |    searcher:
         |      type: linear
         |""".stripMargin
    val cfg = Config.parseYaml(yaml).asInstanceOf[Map[String, Any]]
    BenchmarkRunner.run(spark, cfg, outDir)
    for (ds <- Seq("glove50", "sift1m")) {
      assert(Files.exists(Paths.get(outDir, ds, "one-page-summary.md")), ds)
      assert(Files.exists(Paths.get(outDir, ds, "qps_recall.svg")), ds)
      val md = Files.readString(Paths.get(outDir, ds, "one-page-summary.md"))
      assert(md.contains("| exact | 1.0000"),
        s"$ds exact search must score recall 1.0 against its GT:\n$md")
    }
    // digest cache: processed canonical parquet exists and reloads
    assert(Files.list(Paths.get(root, "cache")).count() >= 2)
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
