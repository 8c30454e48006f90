package graft.harness

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.harness.Config._
import graft.operators.KnnJoin
import graft.sources.{ArtifactStore, RandomDataset, VectorSources}

/** Config-driven benchmark runner (reference: src/benchmark/runner.py —
  * the primary entry point, §3.1): per dataset entry, merge base
  * algorithms with dataset-level overrides (dataset metric forced),
  * resolve indexer/searcher refs, run every algorithm through
  * [[Experiment]], emit JSON + markdown + SVG reports. Per-dataset errors
  * are caught and logged without aborting the suite (runner.py:197-198).
  */
object BenchmarkRunner {

  final case class DatasetBundle(
      name: String, metric: String,
      train: DataFrame, test: DataFrame, gt: Option[DataFrame])

  def run(spark: SparkSession, configPath: String, outputDir: String): Unit = {
    val cfg = Config.load(configPath)
    run(spark, cfg, outputDir)
  }

  def run(spark: SparkSession, cfg: Map[String, Any], outputDir: String): Unit = {
    val topk = int(cfg, "topk", 10)
    val nQueries = int(cfg, "n_queries", 0)
    val seed = int(cfg, "seed", 42).toLong
    val repeat = int(cfg, "repeat", 1)
    val queryBatchSize = int(cfg, "query_batch_size", 0)
    val baseAlgs = cfg.getOrElse("algorithms", Map.empty[String, Any]).asMap
    val indexerDefs = cfg.getOrElse("indexers", Map.empty[String, Any]).asMap
    val searcherDefs = cfg.getOrElse("searchers", Map.empty[String, Any]).asMap

    val allResults = scala.collection.mutable.Map[String, Seq[Experiment.Result]]()
    val summary = new StringBuilder("# Benchmark summary\n\n")

    cfg.getOrElse("datasets", List.empty[Any]).asList.foreach { entry =>
      // dataset entries are either a bare name or {name, options…}
      // (runner.py:301-311)
      val (dsName, dsCfg) = entry match {
        case s: String => (s, Map.empty[String, Any])
        case m: Map[String @unchecked, Any @unchecked] => (str(m, "name", "?"), m)
        case other => (other.toString, Map.empty[String, Any])
      }
      try {
        val bundle = loadDataset(spark, dsName, dsCfg, topk, seed)
        // merged algorithms: base + dataset-level overrides; dataset
        // metric forced (runner.py:108-131)
        val dsAlgs = dsCfg.getOrElse("algorithms", Map.empty[String, Any]).asMap
        val merged = deepMerge(baseAlgs, dsAlgs).asMap
        val (testSel, gtSel) =
          if (nQueries > 0)
            Experiment.selectQueries(bundle.test, bundle.gt, nQueries, seed)
          else (bundle.test, bundle.gt)

        val results = merged.toSeq.sortBy(_._1).map { case (algName, algAny) =>
          val algCfg = algAny.asMap
          val indexerCfg = resolveRef(algCfg, "indexer_ref", "indexer", indexerDefs)
            .getOrElse(Map("type" -> algName))
          val searcherCfg = resolveRef(algCfg, "searcher_ref", "searcher", searcherDefs)
            .getOrElse(Map("type" -> algName))
          val mergedParams =
            params(algCfg.getOrElse("params", Map.empty[String, Any]).asMap) ++
            params(indexerCfg - "type") ++ params(searcherCfg - "type")
          val spec = Experiment.AlgorithmSpec(algName,
            str(indexerCfg, "type", algName), str(searcherCfg, "type", algName),
            mergedParams, bundle.metric)
          Experiment.runAlgorithm(spark, spec, bundle.train, testSel, gtSel, topk,
            queryBatchSize = queryBatchSize, repeat = repeat)
        }
        allResults(dsName) = results
        Reports.writeJson(s"$outputDir/$dsName/results.json", results)
        Reports.write(s"$outputDir/$dsName/one-page-summary.md",
          Reports.onePageSummary(dsName, results))
        Reports.write(s"$outputDir/$dsName/qps_recall.svg",
          Reports.qpsRecallSvg(results))
        Reports.writeBytes(s"$outputDir/$dsName/qps_recall.png",
          Reports.qpsRecallPng(results))
        if (Reports.emitOperationsPlot(dsName)) {
          Reports.write(s"$outputDir/$dsName/operations_recall.svg",
            Reports.operationsRecallSvg(results))
          Reports.writeBytes(s"$outputDir/$dsName/operations_recall.png",
            Reports.operationsRecallPng(results))
        }
        summary.append(Reports.markdownSummary(dsName, results)).append("\n")
      } catch {
        case e: Exception =>
          // per-dataset isolation (runner.py:197-198)
          summary.append(s"## Dataset: $dsName\n\nFAILED: ${e.getMessage}\n\n")
      }
    }
    Reports.writeJson(s"$outputDir/all_results.json",
      allResults.values.flatten.toSeq)
    Reports.write(s"$outputDir/benchmark_summary.md", summary.toString)
  }

  /** dataset loaders: `random` (S4), `embeddings` (testdata), any
    * [[graft.sources.DatasetCatalog]] name (glove50/sift1m/…), or a
    * parquet path with auto-resolved columns (S6) */
  def loadDataset(spark: SparkSession, name: String, dsCfg: Map[String, Any],
      gtK: Int, seed: Long): DatasetBundle = {
    val opts = dsCfg.getOrElse("options", Map.empty[String, Any]).asMap
    val metric = str(dsCfg, "metric", "l2")
    name match {
      case n if n != "random" && graft.sources.DatasetCatalog.available.contains(n) =>
        val root = str(opts, "root", ".")
        val cache = str(opts, "cache_root", s"$root/cache")
        val b = graft.sources.DatasetCatalog.resolve(spark, n, root, cache,
          params(opts - "root" - "cache_root"))
        DatasetBundle(b.name, str(dsCfg, "metric", b.metric), b.train, b.test, b.gt)
      case "random" =>
        val (train, test, gt) = RandomDataset.dataset(spark,
          int(opts, "train_size", 1000).toLong,
          int(opts, "test_size", 100).toLong,
          int(opts, "dims", 32), gtK,
          int(opts, "seed", seed.toInt).toLong, metric)
        DatasetBundle(name, metric, train, test, Some(gt))
      case "embeddings" =>
        val dir = str(opts, "dir", "/root/testdata/sf0.001")
        val base = graft.Tables.embBase(spark, dir)
        val queries = graft.Tables.embQueries(spark, dir)
        val gt = KnnJoin.knnJoinAgg(queries, base, gtK, metric)
          .select(col("qid"), transform(col("nn"), x => x("id")).as("gt_ids"))
        DatasetBundle(name, metric, base, queries, Some(gt))
      case path =>
        val base = VectorSources.canonicalize(spark.read.parquet(path))
        val nTest = int(opts, "test_size", 100)
        val test = VectorSources.subsampleExact(base, "id", nTest, seed)
          .withColumnRenamed("id", "qid")
        val train = base.join(test.select(col("qid").as("id")), Seq("id"), "left_anti")
        val gt = KnnJoin.knnJoinAgg(test, train, gtK, metric)
          .select(col("qid"), transform(col("nn"), x => x("id")).as("gt_ids"))
        DatasetBundle(name, metric, train, test, Some(gt))
    }
  }
}
