package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Locality-sensitive hashing index + bucket-probe search, re-expressed as
  * relational operators (reference: `src/algorithms/lsh.py`).
  *
  *  - build: per-table hash of every base vector → a bucket relation
  *    `(table, key, id)` — the index IS a DataFrame, partitionable and
  *    bucketable by `(table, key)` at cluster scale;
  *  - probe: hash queries the same way, then a plain **equi-join** on
  *    `(table, key)` (J3/J4) — Catalyst picks broadcast vs shuffled hash
  *    join; no custom physical operator needed;
  *  - vote: `groupBy(qid, id).count` over multi-table collisions (J5),
  *    ranked `(votes desc, id asc)` — deterministic tie-break for the
  *    reference's insertion-order `most_common` (SURVEY §7.4-6);
  *  - cap + exact rerank (J6/J7) via [[KnnJoin.rerank]];
  *  - empty-candidate fallback to brute force (lsh.py:266-269) as an
  *    anti-join + union.
  *
  * Hyperplanes/offsets are generated deterministically from the seed on
  * the driver (tiny: tables × hashSize × dim floats) and ship inside the
  * hash closure — the Spark analog of the reference's
  * `np.random.RandomState(seed)` hyperplane init (lsh.py:60-76).
  *
  * Two hash families, as in the reference:
  *  - sign-random-projection for cosine: key = packed sign bits of
  *    `v · plane_h` (lsh.py:78-80);
  *  - E2LSH for L2: `floor((p·v + b) / w)` per hash fn (lsh.py:82-84),
  *    the int tuple combined into one 64-bit key polynomially.
  */
final case class LshIndexer(
    numTables: Int,
    hashSize: Int,
    bucketWidth: Double,
    metric: String,
    seed: Long) extends Indexer {
  require(hashSize <= 62, "hashSize must fit in a long key")
  val kind = "lsh"

  def build(base: DataFrame): IndexArtifact = {
    val spark = base.sparkSession
    val dim = LshModel.dimOf(base, "vector")
    val model = LshModel(numTables, hashSize, dim, bucketWidth, metric, seed)
    val hashUdf = model.hashUdf(spark)
    val buckets = base
      .select(col("id").cast("long").as("id"), col("vector"))
      .withColumn("__keys", hashUdf(col("vector")))
      .select(col("id"), posexplode(col("__keys")).as(Seq("table", "key")))
    IndexArtifact(kind, buckets,
      meta = Map(
        "num_tables" -> numTables.toString, "hash_size" -> hashSize.toString,
        "bucket_width" -> bucketWidth.toString, "metric" -> metric,
        "seed" -> seed.toString, "dim" -> dim.toString),
      aux = Map("vectors" -> base))
  }
}

final case class LshSearcher(
    candidateMultiplier: Int,
    maxCandidates: Option[Int],
    fallbackToBruteforce: Boolean,
    metric: String) extends Searcher {

  // The fallback path caches the reranked relation (it is read twice:
  // missing-qid probe + result). A repeated-search loop (Experiment
  // repeats, BaselineCompare warm+3) would otherwise accumulate one dead
  // cache entry per call for the life of the session — so each search
  // unpersists the previous call's cache, bounding live entries to one.
  @transient private var prevCache: DataFrame = _

  private def trackCache(df: DataFrame): DataFrame = synchronized {
    if (prevCache != null) prevCache.unpersist()
    prevCache = df
    df
  }

  def search(artifact: IndexArtifact, queries: DataFrame, k: Int): DataFrame = {
    val spark = artifact.data.sparkSession
    val meta = artifact.meta
    val model = LshModel(
      meta("num_tables").toInt, meta("hash_size").toInt, meta("dim").toInt,
      meta("bucket_width").toDouble, meta("metric"), meta("seed").toLong)
    val hashUdf = model.hashUdf(spark)
    val cap = maxCandidates.getOrElse(candidateMultiplier * k)

    val q = queries.select(col("qid").cast("long").as("qid"), col("vector"))
    val qKeys = q
      .withColumn("__keys", hashUdf(col("vector")))
      .select(col("qid"), posexplode(col("__keys")).as(Seq("table", "key")))

    // J3/J4 bucket-probe equi-join; broadcast the (small) query-key side
    val collisions = artifact.data.join(broadcast(qKeys), Seq("table", "key"))
    // J5 vote + J6 cap in one aggregate chain: top-cap by (votes desc,
    // id asc) via the bounded heap on dist = −votes — map-side partial
    // aggregation instead of a full per-qid window sort of all candidates
    val capped = collisions.groupBy(col("qid"), col("id")).count()
      .groupBy(col("qid"))
      .agg(TopKByDist.topK(col("id"), -col("count").cast("double"), cap).as("cand"))
      .select(col("qid"), explode(col("cand")).as("c"))
      .select(col("qid"), col("c.id").as("id"))
    // J7 exact rerank of the candidate pairs
    val reranked = KnnJoin.rerank(capped, q, artifact.aux("vectors"), k, metric)

    if (!fallbackToBruteforce) reranked
    else {
      // qids with zero candidates → route through the exact scan (J6
      // fallback). The reranked relation is tiny (≤ queries × k rows), so
      // cache it and CHECK for missing qids first: in the common case
      // (every query had candidates) the result plan then contains no
      // fallback scan at all, instead of paying an empty-broadcast pass
      // over the full base per search. `missing` itself needs no cache:
      // both its uses read the already-cached reranked relation.
      val cached = trackCache(reranked.cache())
      val missing = q.join(cached.select("qid").distinct(), Seq("qid"), "left_anti")
      if (missing.isEmpty) cached
      else cached.unionByName(
        KnnJoin.knnJoin(missing, artifact.aux("vectors"), k, metric))
    }
  }
}

/** Deterministic hash-family parameters + the hashing closure. */
final case class LshModel(
    numTables: Int, hashSize: Int, dim: Int,
    bucketWidth: Double, metric: String, seed: Long) extends Serializable {

  /** planes(table)(h) = gaussian dim-vector; offsets(table)(h) ∈ [0, w) */
  @transient private lazy val planesAndOffsets = {
    val rnd = new java.util.Random(seed)
    val planes = Array.fill(numTables, hashSize, dim)(rnd.nextGaussian().toFloat)
    val offsets = Array.fill(numTables, hashSize)(rnd.nextDouble() * bucketWidth)
    (planes, offsets)
  }

  def hashUdf(spark: SparkSession): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val (planes, offsets) = planesAndOffsets
    val w = bucketWidth
    val cosine = metric == "cosine" || metric == "ip" || metric == "angular"
    val nt = numTables; val hs = hashSize
    udf { (v: Seq[Float]) =>
      val arr = v.toArray
      val keys = new Array[Long](nt)
      var t = 0
      while (t < nt) {
        var key = 0L
        var h = 0
        while (h < hs) {
          val plane = planes(t)(h)
          var dot = 0.0
          var i = 0
          while (i < plane.length) { dot += plane(i) * arr(i); i += 1 }
          if (cosine) {
            if (dot >= 0) key |= (1L << h) // sign bit packing (lsh.py:79-80,102)
          } else {
            val bucket = math.floor((dot + offsets(t)(h)) / w).toLong // E2LSH
            key = key * 1000003L + bucket // polynomial tuple combine
          }
          h += 1
        }
        keys(t) = key
        t += 1
      }
      keys
    }
  }
}

object LshModel {
  def dimOf(df: DataFrame, c: String): Int = {
    import org.apache.spark.sql.functions.{col => f, size => sz}
    df.select(sz(f(c))).head().getInt(0)
  }
}
