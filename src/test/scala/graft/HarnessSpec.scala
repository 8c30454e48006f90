package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.harness._
import graft.operators._
import graft.sources.{ArtifactStore, RandomDataset}

/** Harness behaviors mirroring the reference's E2E patterns:
  * mini-benchmark through the runner (test_benchmark_runner_modular.py:
  * 9-65), persistence modes round-trip + rejection
  * (test_experiment_runner_persistence.py:40-114, test_covertree_v2_2.py:
  * 60-120), config deep-merge + ref resolution (runner.py:217-299). */
class HarnessSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  test("E2E mini experiment: exact search on random data → recall 1.0") {
    val (train, testQ, gt) = RandomDataset.dataset(spark, 32, 6, 3, 5, seed = 123)
    val res = Experiment.runAlgorithm(spark,
      Experiment.AlgorithmSpec("exact", "brute_force", "linear", Map(), "l2"),
      train, testQ, Some(gt), topk = 5)
    assert(res.nTrain == 32 && res.nTest == 6 && res.dimensions == 3)
    assert(res.metrics("recall@1") == 1.0)
    assert(res.metrics("recall") == 1.0)
    assert(res.metrics.contains("map@10") && res.qps > 0)
  }

  test("persistence: build_only then retrieve_only round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("artifact").toString + "/idx"
    val (train, testQ, gt) = RandomDataset.dataset(spark, 64, 4, 4, 5, seed = 2026)
    val fp = ArtifactStore.datasetFingerprint(Map("name" -> "rand2026", "n" -> "64"))
    val spec = Experiment.AlgorithmSpec("lsh", "lsh", "lsh",
      Map("num_tables" -> "6", "hash_size" -> "4"), "l2")
    val built = Experiment.runAlgorithm(spark, spec, train, testQ, Some(gt), 5,
      persistence = Experiment.PersistenceSpec(enabled = true, mode = "build_only",
        artifactDir = dir), datasetFingerprint = fp)
    assert(built.status == "build_only")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "WRITE_COMPLETE")))
    val retrieved = Experiment.runAlgorithm(spark, spec, train, testQ, Some(gt), 5,
      persistence = Experiment.PersistenceSpec(enabled = true, mode = "retrieve_only",
        artifactDir = dir, failIfMissing = true), datasetFingerprint = fp)
    assert(retrieved.indexSource == "loaded")
    assert(retrieved.metrics("recall") > 0.0)
  }

  test("driver-built models (covertree, hnsw_global) survive the store round-trip") {
    import graft.operators.{CoverTreeIndexer, CoverTreeSearcher,
      HnswGlobalIndexer, HnswGlobalSearcher, Registry}
    Registry.init()
    val (train, testQ, _) = RandomDataset.dataset(spark, 96, 8, 6, 5, seed = 77)
    for ((name, build, searchFn) <- Seq[(String,
        org.apache.spark.sql.DataFrame => graft.operators.IndexArtifact,
        (graft.operators.IndexArtifact, org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame)](
      ("covertree", CoverTreeIndexer("l2").build,
        (a, q) => CoverTreeSearcher("l2").search(a, q, 5)),
      ("hnsw_global", HnswGlobalIndexer(m = 6, efConstruction = 32).build,
        (a, q) => HnswGlobalSearcher(efSearch = 32).search(a, q, 5)))) {
      val dir = java.nio.file.Files.createTempDirectory(s"rt_$name").toString + "/idx"
      val artifact = build(train)
      val before = searchFn(artifact, testQ)
        .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
      ArtifactStore.save(artifact, dir, "l2", 6, 96, "fp", "cfg")
      val (loaded, _) = ArtifactStore.load(spark, dir)
      assert(loaded.local.isEmpty, s"$name: loaded artifacts carry no model")
      val after = searchFn(loaded, testQ)
        .orderBy("qid", "rank").collect().map(_.toSeq).toSeq
      assert(before == after, s"$name: store round-trip changed results")
    }
  }

  test("persistence rejects wrong metric / fingerprint / missing sentinel") {
    val dir = java.nio.file.Files.createTempDirectory("artifact2").toString + "/idx"
    val (train, _, _) = RandomDataset.dataset(spark, 48, 0, 6, 1, seed = 2027)
    Registry.init()
    val artifact = Registry.indexer("brute_force", Map(), "l2").build(train)
    ArtifactStore.save(artifact, dir, "l2", 6, 48, "fp-abc", "cfg-1")
    // wrong metric
    intercept[ArtifactStore.ArtifactValidationException] {
      ArtifactStore.load(spark, dir, expectMetric = Some("cosine"))
    }
    // wrong fingerprint
    intercept[ArtifactStore.ArtifactValidationException] {
      ArtifactStore.load(spark, dir, expectFingerprint = Some("fp-other"))
    }
    // incomplete artifact (sentinel removed)
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "WRITE_COMPLETE"))
    intercept[ArtifactStore.ArtifactValidationException] {
      ArtifactStore.load(spark, dir)
    }
  }

  test("config: yaml subset parse + deep-merge override semantics") {
    import Config._
    val yaml =
      """# benchmark config
        |datasets:
        |  - name: random
        |    options:
        |      dims: 64
        |      train_size: 20000
        |topk: 20
        |algorithms:
        |  exact:
        |    type: Composite
        |    indexer: brute_force
        |  lsh:
        |    type: Composite
        |    params:
        |      num_tables: 12
        |""".stripMargin
    val cfg = parseYaml(yaml).asMap
    assert(int(cfg, "topk", 0) == 20)
    val ds = cfg("datasets").asList.head.asMap
    assert(str(ds, "name", "") == "random")
    assert(int(ds("options").asMap, "dims", 0) == 64)
    // deep-merge: dataset-level override merges into base algorithms
    val merged = deepMerge(cfg("algorithms"),
      Map("lsh" -> Map("params" -> Map("hash_size" -> 4.0)))).asMap
    val lsh = merged("lsh").asMap
    assert(int(lsh("params").asMap, "num_tables", 0) == 12) // kept
    assert(int(lsh("params").asMap, "hash_size", 0) == 4) // added
  }

  test("reports: markdown + svg are produced with ranked rows") {
    val results = Seq(
      Experiment.Result("exact", 100, 10, 8, 10, 0.1, 0.2, 50.0, 20.0,
        Map("recall" -> 1.0)),
      Experiment.Result("lsh", 100, 10, 8, 10, 0.1, 0.05, 200.0, 5.0,
        Map("recall" -> 0.5)))
    val md = Reports.markdownSummary("rand", results)
    assert(md.contains("| exact |") && md.indexOf("exact") < md.indexOf("lsh"))
    val svg = Reports.qpsRecallSvg(results)
    assert(svg.contains("<svg") && svg.contains("exact"))
    val onePage = Reports.onePageSummary("rand", results)
    assert(onePage.contains("Best recall: **exact**"))
    assert(onePage.contains("Best QPS: **lsh**"))
  }

  test("S18: operations-vs-recall svg, resolution order, glove-only trigger") {
    val counted = Experiment.Result("covertree", 100, 10, 8, 10, 0.1, 0.2, 50.0, 20.0,
      Map("recall" -> 1.0, "operations_per_query" -> 420.0,
        "distance_computations" -> 4200.0))
    val derived = Experiment.Result("lsh", 100, 10, 8, 10, 0.1, 0.05, 200.0, 5.0,
      Map("recall" -> 0.5))
    // resolution: explicit per-query count wins; else time-derived proxy
    assert(Reports.operationsPerQuery(counted) == ((420.0, false)))
    assert(Reports.operationsPerQuery(derived) == ((5.0, true)))
    val svg = Reports.operationsRecallSvg(Seq(counted, derived))
    assert(svg.contains("<svg") && svg.contains("covertree") && svg.contains("lsh"))
    assert(svg.contains("fill=\"none\""), "derived points must render hollow")
    // glove-only trigger (experiment_runner.py:774-780)
    assert(Reports.emitOperationsPlot("glove50"))
    assert(!Reports.emitOperationsPlot("random"))
  }

  test("S18 PNG rasters: decode headlessly, correct dims, drawn content") {
    val results = Seq(
      Experiment.Result("exact", 100, 10, 8, 10, 0.1, 0.2, 50.0, 20.0,
        Map("recall" -> 1.0)),
      Experiment.Result("lsh", 100, 10, 8, 10, 0.1, 0.05, 200.0, 5.0,
        Map("recall" -> 0.5)))
    for (bytes <- Seq(Reports.qpsRecallPng(results),
        Reports.operationsRecallPng(results, w = 320, h = 240))) {
      // PNG magic
      assert((bytes.take(4).map(_ & 0xff) sameElements Array(0x89, 0x50, 0x4e, 0x47)))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null)
      // white background + some non-white drawn pixels (axes/points/text)
      assert((img.getRGB(2, 2) & 0xffffff) == 0xffffff)
      val px = for (x <- 0 until img.getWidth; y <- 0 until img.getHeight)
        yield img.getRGB(x, y) & 0xffffff
      assert(px.exists(_ != 0xffffff), "PNG must contain drawn content")
    }
    assert(Reports.qpsRecallPng(results).length !=
      Reports.qpsRecallPng(results, w = 320, h = 240).length)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Reports.qpsRecallPng(results, w = 320, h = 240)))
    assert(img.getWidth == 320 && img.getHeight == 240)
  }

  test("A10 wiring: covertree ndis lands in Result.metrics as ops/query") {
    import spark.implicits._
    val (train, test, gt) = graft.sources.RandomDataset.dataset(
      spark, 200, 10, 8, 5, 42, "l2")
    val res = Experiment.runAlgorithm(spark,
      Experiment.AlgorithmSpec("covertree", "covertree", "covertree",
        Map("seed" -> "42"), "l2"),
      train, test, Some(gt), 5)
    val ops = res.metrics.get("operations_per_query")
    assert(ops.exists(_ > 0), s"expected positive ops/query, got $ops")
    // exact search must beat brute force's 200 distance evals per query
    assert(ops.exists(_ <= 200.0), s"covertree pruning should cap ops: $ops")
  }
}
