package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** HNSW-family graph search, Spark-shaped (reference J11: FAISS
  * `IndexHNSWFlat` glue, hnsw.py:76-81 / modular.py:136-179).
  *
  * A single global navigable graph is inherently sequential and
  * pointer-chasing — the wrong shape for a cluster. SURVEY §2.3-J11
  * option (a): **IVF-of-NSW** — partition the base by coarse centroid and
  * build an independent small navigable-small-world graph per centroid
  * group **at build time** (the reference builds once, hnsw.py:76-81).
  * The index relation IS the per-node adjacency:
  * `(centroid_id, idx, id, vector, nbrs)` — persistable, partitionable by
  * `centroid_id`, and materialized under `build()` so `search()` only
  * routes queries, loads the arrays, and walks. Each group's graph build
  * is local and parallel, so build time scales with the largest group,
  * not n.
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
    // per-centroid NSW construction, ONCE, inside the build job: each
    // Spark partition holds whole centroid groups (repartition hashes the
    // grouping column), builds one graph per group, and emits the
    // adjacency rows that become the index relation
    val met = metric
    val mm = m; val efC = efConstruction
    val adjSchema = StructType(Seq(
      StructField("centroid_id", IntegerType, nullable = false),
      StructField("idx", IntegerType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("vector", ArrayType(FloatType, containsNull = false), nullable = false),
      StructField("nbrs", ArrayType(IntegerType, containsNull = false), nullable = false)))
    val adjEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(adjSchema)
    val adjacency = assigned.mapPartitions { it =>
      val groups = new java.util.HashMap[Int,
        (scala.collection.mutable.ArrayBuffer[Long],
         scala.collection.mutable.ArrayBuffer[Array[Float]])]()
      it.foreach { r =>
        val cid = r.getInt(2)
        var g = groups.get(cid)
        if (g == null) {
          g = (new scala.collection.mutable.ArrayBuffer[Long](),
            new scala.collection.mutable.ArrayBuffer[Array[Float]]())
          groups.put(cid, g)
        }
        g._1 += r.getLong(0)
        g._2 += r.getSeq[Float](1).toArray
      }
      import scala.jdk.CollectionConverters._
      groups.entrySet().iterator().asScala.flatMap { e =>
        val cid = e.getKey
        val (ids, vecs) = e.getValue
        val g = NswGraph.build(vecs.toArray, mm, efC, met)
        (0 until ids.length).iterator.map { i =>
          Row(cid, i, ids(i), vecs(i).toSeq, g.neighbors(i).toSeq)
        }
      }
    }(adjEnc)
      .persist()
    adjacency.count() // materialize: graph construction is a BUILD cost
    val spark = base.sparkSession
    import spark.implicits._
    val centroids = centers.zipWithIndex.toSeq.map { case (c, i) => (i, c) }
      .toDF("centroid_id", "vector")
    IndexArtifact(kind, adjacency,
      meta = Map("m" -> m.toString, "ef_construction" -> efConstruction.toString,
        "metric" -> metric, "n_partitions" -> centers.length.toString),
      aux = Map("centroids" -> centroids))
  }
}

final case class HnswSearcher(nprobe: Int = 2, efSearch: Int = 48,
    metric: String = "l2") extends Searcher {

  def search(artifact: IndexArtifact, queries: DataFrame, k: Int): DataFrame = {
    // route each query to its nprobe nearest centroid graphs
    val q = queries.select(col("qid").cast("long").as("qid"), col("vector"))
    val centroids = artifact.aux("centroids")
      .select(col("centroid_id").cast("long").as("id"), col("vector"))
    val probes = KnnJoin.knnJoin(q, centroids, nprobe, "l2")
      .select(col("qid"), col("id").cast("int").as("centroid_id"))
      .join(broadcast(q), Seq("qid"))
    // co-partition routed queries with the prebuilt adjacency rows; the
    // walk only LOADS arrays — no graph construction on the search path
    val met = metric
    val efS = efSearch
    val outSchema = StructType(Seq(
      StructField("qid", LongType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("dist", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val tagged = artifact.data
      .select(col("centroid_id"), col("idx"), col("id"), col("vector"),
        col("nbrs"), lit(null).cast("long").as("qid"))
      .unionByName(probes
        .select(col("centroid_id"), lit(-1).as("idx"), lit(-1L).as("id"),
          col("vector"), lit(null).cast("array<int>").as("nbrs"), col("qid")))
      .repartition(artifact.meta("n_partitions").toInt, col("centroid_id"))
    val merged = tagged.mapPartitions { it =>
      // bucket rows per centroid group: graphs are disjoint by centroid,
      // so a query routed to two groups in this partition searches each
      // and the global top-k merge dedups nothing (no overlapping ids)
      final class Group {
        var ids: Array[Long] = _
        var vecs: Array[Array[Float]] = _
        var nbrs: Array[Array[Int]] = _
        val rows = new scala.collection.mutable.ArrayBuffer[(Int, Long, Array[Float], Array[Int])]()
        val qIds = new scala.collection.mutable.ArrayBuffer[Long]()
        val qVecs = new scala.collection.mutable.ArrayBuffer[Array[Float]]()
      }
      val groups = new java.util.HashMap[Int, Group]()
      it.foreach { r =>
        val cid = r.getInt(0)
        var g = groups.get(cid)
        if (g == null) { g = new Group; groups.put(cid, g) }
        if (r.isNullAt(5)) {
          g.rows += ((r.getInt(1), r.getLong(2), r.getSeq[Float](3).toArray,
            r.getSeq[Int](4).toArray))
        } else {
          g.qIds += r.getLong(5)
          g.qVecs += r.getSeq[Float](3).toArray
        }
      }
      import scala.jdk.CollectionConverters._
      groups.values().iterator().asScala.flatMap { g =>
        if (g.rows.isEmpty || g.qIds.isEmpty) Iterator.empty
        else {
          val n = g.rows.length
          val ids = new Array[Long](n)
          val vecs = new Array[Array[Float]](n)
          val nbrs = new Array[Array[Int]](n)
          g.rows.foreach { case (idx, id, v, nb) =>
            ids(idx) = id; vecs(idx) = v; nbrs(idx) = nb
          }
          val graph = NswGraph.fromAdjacency(vecs, nbrs, met)
          g.qIds.iterator.zip(g.qVecs.iterator).flatMap { case (qid, qv) =>
            graph.search(qv, k, efS).map { case (i, d) => Row(qid, ids(i), d) }
          }
        }
      }
    }(enc)
    // merge across probed partitions → global top-k per query
    KnnJoin.topKExploded(merged, col("id"), col("dist"), k)
  }
}

/** Navigable-small-world graph (single layer; Malkov et al. 2014 — the
  * base layer of HNSW) with incremental insertion and beam search. */
final class NswGraph private (
    vecs: Array[Array[Float]], metric: String,
    private val nbrs: Array[scala.collection.mutable.ArrayBuffer[Int]]) {

  def this(vecs: Array[Array[Float]], metric: String) =
    this(vecs, metric,
      Array.fill(vecs.length)(new scala.collection.mutable.ArrayBuffer[Int]()))

  private[operators] def link(a: Int, b: Int): Unit = {
    nbrs(a) += b
    nbrs(b) += a
  }

  /** adjacency list of node i (for serialization into the index relation) */
  def neighbors(i: Int): Array[Int] = nbrs(i).toArray

  private val isCosine = metric == "cosine"

  // scalar by default; Vector API only via graft.simd.enabled opt-in
  // (floor-tier tolerance — see SimdDist's scope note)
  @inline private def dist(a: Array[Float], b: Array[Float]): Double =
    if (isCosine) SimdDist.kernel.cosineDist(a, b)
    else SimdDist.kernel.l2(a, b)

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

  /** reconstruct a prebuilt graph from serialized adjacency arrays — the
    * search-path loader; does NO insertion work */
  def fromAdjacency(vecs: Array[Array[Float]], adjacency: Array[Array[Int]],
      metric: String): NswGraph = {
    val nbrs = adjacency.map { a =>
      val b = new scala.collection.mutable.ArrayBuffer[Int](a.length)
      b ++= a
      b
    }
    new NswGraph(vecs, metric, nbrs)
  }
}
