package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** HNSW-family graph search, Spark-shaped (reference J11: FAISS
  * `IndexHNSWFlat` glue, hnsw.py:76-81 / modular.py:136-179).
  *
  * A single global navigable graph is inherently sequential and
  * pointer-chasing — the wrong shape for a cluster. SURVEY §2.3-J11
  * option (a): **IVF-of-NSW** — partition the base by coarse centroid,
  * build an independent small navigable-small-world graph per partition
  * inside `mapPartitions`, search = probe the `nprobe` nearest partitions
  * per query and merge. Approximate-by-construction (recall validated by
  * threshold, SURVEY §7.4-4); each partition's graph build is local and
  * parallel, so build time scales with the largest partition, not n.
  */
final case class HnswIndexer(
    nPartitions: Int = 8, m: Int = 8, efConstruction: Int = 32,
    metric: String = "l2", seed: Long = 42) extends Indexer {
  val kind = "hnsw"

  def build(base: DataFrame): IndexArtifact = {
    // coarse partitioner (same discipline as IVF build)
    val cached = base.select(col("id").cast("long").as("id"), col("vector"))
    val n = cached.count()
    val fraction = math.min(1.0, 262144.0 / math.max(1L, n))
    val sample = (if (fraction < 1.0)
        cached.sample(withReplacement = false, fraction, seed) else cached)
      .select("vector").collect().map(_.getSeq[Float](0).toArray)
    val centers = LocalKMeans.fit(sample, math.min(nPartitions, sample.length),
      seed, iters = 10)
    val assign = udf { (v: Seq[Float]) =>
      val arr = v.toArray
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < centers.length) {
        var d = 0.0; var i = 0
        val ce = centers(c)
        while (i < ce.length) { val df = arr(i) - ce(i); d += df * df; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    val assigned = cached.withColumn("centroid_id", assign(col("vector")))
      .repartition(centers.length, col("centroid_id"))
    val spark = base.sparkSession
    import spark.implicits._
    val centroids = centers.zipWithIndex.toSeq.map { case (c, i) => (i, c) }
      .toDF("centroid_id", "vector")
    IndexArtifact(kind, assigned,
      meta = Map("m" -> m.toString, "ef_construction" -> efConstruction.toString,
        "metric" -> metric, "n_partitions" -> centers.length.toString),
      aux = Map("centroids" -> centroids))
  }
}

final case class HnswSearcher(nprobe: Int = 2, efSearch: Int = 48,
    metric: String = "l2") extends Searcher {

  def search(artifact: IndexArtifact, queries: DataFrame, k: Int): DataFrame = {
    val spark = artifact.data.sparkSession
    val m = artifact.meta("m").toInt
    val efC = artifact.meta("ef_construction").toInt
    // route each query to its nprobe nearest partitions
    val q = queries.select(col("qid").cast("long").as("qid"), col("vector"))
    val centroids = artifact.aux("centroids")
      .select(col("centroid_id").cast("long").as("id"), col("vector"))
    val probes = KnnJoin.knnJoin(q, centroids, nprobe, "l2")
      .select(col("qid"), col("id").cast("int").as("centroid_id"))
      .join(broadcast(q), Seq("qid"))
    // co-partition queries with their target graph partition, build the
    // NSW per partition, answer all routed queries against it
    val met = metric
    val efS = efSearch
    val outSchema = StructType(Seq(
      StructField("qid", LongType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("dist", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val tagged = artifact.data
      .select(col("centroid_id"), col("id"), col("vector"), lit(null).cast("long").as("qid"))
      .unionByName(probes
        .select(col("centroid_id"), lit(-1L).as("id"), col("vector"), col("qid")))
      .repartition(artifact.meta("n_partitions").toInt, col("centroid_id"))
    val merged = tagged.mapPartitions { it =>
      val baseIds = new scala.collection.mutable.ArrayBuffer[Long]()
      val baseVecs = new scala.collection.mutable.ArrayBuffer[Array[Float]]()
      // dedup query probe copies: when several centroid groups hash into
      // one Spark partition, a query routed to each would otherwise search
      // the same merged graph multiple times and flood the global merge
      // with duplicate (qid, id) rows
      val qSeen = new java.util.HashSet[Long]()
      val qIds = new scala.collection.mutable.ArrayBuffer[Long]()
      val qVecs = new scala.collection.mutable.ArrayBuffer[Array[Float]]()
      it.foreach { r =>
        if (r.isNullAt(3)) {
          baseIds += r.getLong(1); baseVecs += r.getSeq[Float](2).toArray
        } else if (qSeen.add(r.getLong(3))) {
          qIds += r.getLong(3); qVecs += r.getSeq[Float](2).toArray
        }
      }
      if (baseIds.isEmpty || qIds.isEmpty) Iterator.empty
      else {
        val g = NswGraph.build(baseVecs.toArray, m, efC, met)
        qIds.iterator.zip(qVecs.iterator).flatMap { case (qid, qv) =>
          g.search(qv, k, efS).map { case (i, d) => Row(qid, baseIds(i), d) }
        }
      }
    }(enc)
    // merge across probed partitions → global top-k per query
    merged.groupBy("qid")
      .agg(TopKByDist.topK(col("id"), col("dist"), k).as("nn"))
      .select(col("qid"), posexplode(col("nn")).as(Seq("__pos", "__nn")))
      .select(col("qid"), (col("__pos") + 1).cast("int").as("rank"),
        col("__nn.id").as("id"), col("__nn.dist").as("dist"))
  }
}

/** Navigable-small-world graph (single layer; Malkov et al. 2014 — the
  * base layer of HNSW) with incremental insertion and beam search. */
final class NswGraph(vecs: Array[Array[Float]], metric: String) {
  private val nbrs = Array.fill(vecs.length)(new scala.collection.mutable.ArrayBuffer[Int]())

  private[operators] def link(a: Int, b: Int): Unit = {
    nbrs(a) += b
    nbrs(b) += a
  }

  @inline private def dist(a: Array[Float], b: Array[Float]): Double = {
    var i = 0
    if (metric == "cosine") {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0.0) 1.0 else 1.0 - dot / den
    } else {
      var acc = 0.0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
      math.sqrt(acc)
    }
  }

  /** beam search from node 0; returns (index, dist) ascending, ≤ k */
  def search(q: Array[Float], k: Int, ef: Int): Array[(Int, Double)] = {
    if (vecs.isEmpty) return Array.empty
    val visited = new java.util.HashSet[Integer]()
    val cand = new java.util.PriorityQueue[(Double, Int)](
      (x: (Double, Int), y: (Double, Int)) => java.lang.Double.compare(x._1, y._1))
    val best = new BoundedTopK(math.max(k, ef))
    val d0 = dist(q, vecs(0))
    cand.add((d0, 0)); visited.add(0); best.insert(0L, d0)
    while (!cand.isEmpty) {
      val (d, node) = cand.poll()
      val worst = if (best.size < best.k) Double.PositiveInfinity else best.dists(0)
      if (d > worst) { cand.clear() }
      else {
        val ns = nbrs(node)
        var i = 0
        while (i < ns.length) {
          val nb = ns(i)
          if (visited.add(nb)) {
            val dn = dist(q, vecs(nb))
            val w = if (best.size < best.k) Double.PositiveInfinity else best.dists(0)
            if (dn < w) { cand.add((dn, nb)); best.insert(nb.toLong, dn) }
          }
          i += 1
        }
      }
    }
    best.sorted.take(k).map { case (i, d) => (i.toInt, d) }
  }
}

object NswGraph {
  /** incremental insertion: each node links to its m nearest among the
    * already-inserted set (found by beam search), bidirectionally */
  def build(vecs: Array[Array[Float]], m: Int, efC: Int, metric: String): NswGraph = {
    val g = new NswGraph(vecs, metric)
    var i = 1
    while (i < vecs.length) {
      val found = g.search(vecs(i), m, efC)
      found.foreach { case (j, _) =>
        if (j != i) { g.link(i, j) }
      }
      i += 1
    }
    g
  }
}
