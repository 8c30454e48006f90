package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators._
import graft.sources.{ArtifactStore, RandomDataset}

class OpCountersSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  test("A10: named accumulators aggregate executor-side counts") {
    val oc = new OpCounters(spark)
    val acc = oc.counter("ndis")
    spark.range(100).rdd.foreach(_ => acc.add(2))
    assert(oc.snapshot("ndis") == 200)
    oc.reset()
    assert(oc.snapshot("ndis") == 0)
  }

  test("IVF artifact persists partitioned by centroid_id (storage pruning)") {
    val (train, _, _) = RandomDataset.dataset(spark, 128, 0, 8, 1, seed = 77)
    val artifact = IvfIndexer(nlist = 4, seed = 1).build(train)
    val dir = java.nio.file.Files.createTempDirectory("ivfart").toString + "/idx"
    ArtifactStore.save(artifact, dir, "l2", 8, 128, "fp", "cfg")
    val dataDir = java.nio.file.Paths.get(dir, "data")
    val parts = java.nio.file.Files.list(dataDir).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]()
    while (parts.hasNext) names += parts.next().getFileName.toString
    assert(names.exists(_.startsWith("centroid_id=")),
      s"expected hive-partitioned layout, got $names")
    // and it loads back with the partition column intact
    val (loaded, _) = ArtifactStore.load(spark, dir, expectKind = Some("ivf"))
    assert(loaded.data.columns.contains("centroid_id"))
    assert(loaded.data.count() == 128)
    // the plan-level payoff: an nprobe-style centroid predicate must
    // reach the scan as a PARTITION filter (directory pruning — the scan
    // reads nprobe/nlist of the index bytes at any scale), not a row filter
    val plan = loaded.data
      .filter(org.apache.spark.sql.functions.col("centroid_id").isin(1, 2))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [centroid_id") ||
      "PartitionFilters: \\[[^\\]]*centroid_id".r.findFirstIn(plan).isDefined,
      s"centroid probe must prune partitions at the scan:\n$plan")
  }
}
