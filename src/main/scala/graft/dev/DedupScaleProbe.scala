package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** 1000×-shaped probe of the two heaviest dedup paths (VERDICT r12
  * stretch #8): minhash banding and connected-components pointer
  * jumping, on synthetic data one decade past the 100× pass (5M docs /
  * ~11M edges vs 500k docs at 100×), with NO oracle cost — the probe
  * validates the SCALE story (bucket skew, round counts, lineage
  * truncation), not values (the 10×/100× gates own those).
  *
  * Data shapes chosen to stress exactly what breaks at scale:
  *  - duplicate clusters with a heavy-tailed but BOUNDED size
  *    distribution (most docs singletons/pairs, bands of 10- and
  *    100-clusters) — hot band buckets are where the r11 minhash skew
  *    stall lived;
  *  - one deliberately hot near-clique cluster (size `hotClique`) whose
  *    band bucket alone yields ~hot²/2 candidate pairs — the worst-case
  *    key the banded slim join must survive;
  *  - long CHAINS (length `chainLen`) in the components graph — clique
  *    clusters converge in 2-3 rounds and prove nothing about pointer
  *    jumping; a 10k-chain needs ~log₂ rounds and exercises the maxIter
  *    bound and per-round lineage truncation.
  *
  * Usage: runMain graft.dev.DedupScaleProbe [nDocs=5000000] [cpus from
  * SPARK_GRAFT_CPUS]. Prints a per-stage table; run in tmux, ~10 min.
  *
  * Measured (2026-08-16, 5M docs, local[28], GRAFT_CC_VERBOSE):
  *
  *   minhash  materialize 5M docs           6.8 s
  *   minhash  band-bucket skew profile      9.7 s
  *            buckets=19,997,350  p50=1  p99=1  max=610
  *   minhash  full dup-pair join           36.4 s   254,634 verified pairs
  *   cc       edges=5,254,134 (pairs + 500×10k-chains), distributed path
  *   cc       13 rounds (log₂(10k) ≈ 13.3 predicted), jump 2.6-5.5 s/rnd,
  *            total 90.3 s; 507 components, chain components exactly 10k
  *
  * Reading: the banded slim join's bucket histogram stays flat one
  * decade past the 100× pass (max bucket 610 of 20M — the hot clique's
  * jittered signatures spread as designed), the pair join's cost tracks
  * its OUTPUT (a first-attempt fixture with an unbounded head cluster
  * emitted 150M pairs in 690 s — quadratic output, not a skew stall),
  * and pointer jumping's round count follows the graph diameter's log,
  * not its size, with per-round cost flat across rounds (lineage
  * truncation holding). Both paths scale one decade past the gates.
  */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toLong).getOrElse(5_000_000L)
    val hotClique = 2000
    val chainLen = 10000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dedup1000x] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }

    // ---- minhash arm: 5M synthetic short texts with SKEWED-BUT-BOUNDED
    // dup clusters (a first attempt drew cluster ranks from an unbounded
    // Zipf; its head cluster collected ~5% of ALL docs and the pair join
    // correctly emitted ~150M pairs — a quadratic OUTPUT no dedup system
    // should materialize, i.e. a degenerate fixture, not a skew test).
    // Banded sizes instead: ids [0, hot) one hot near-clique (the skew
    // pole the banded join must survive), then bands of cluster size
    // 100 / 10 / 2, remainder singletons — heavy-tailed like real dup
    // distributions, max pair output ~25M. Text = 12 cluster-determined
    // tokens + ~12.5% per-doc jitter — at 3-word shingles that is a shingle
    // jaccard of ~0.5 (a substituted token kills 3 shingles), so the
    // verification threshold is 0.4: mates pass, non-mates (random draws
    // from a 100k vocab) stay at ~0.
    val b1 = nDocs / 10; val b2 = (3 * nDocs) / 10; val b3 = (6 * nDocs) / 10
    val docs = spark.range(nDocs).toDF("doc_id")
      .withColumn("cluster",
        when(col("doc_id") < hotClique, lit(0L))
          .when(col("doc_id") < b1, col("doc_id") / 100 + 1L)
          .when(col("doc_id") < b2, col("doc_id") / 10 + 1000000L)
          .when(col("doc_id") < b3, col("doc_id") / 2 + 3000000L)
          .otherwise(col("doc_id") + 10000000L))
      .withColumn("text",
        concat_ws(" ", transform(sequence(lit(0), lit(11)), p =>
          when(abs(xxhash64(col("doc_id"), p)) % 8 === 0,
            concat(lit("j"), (abs(xxhash64(col("doc_id"), p, lit(7)))
              % 100000L).cast("string")))
            .otherwise(concat(lit("c"),
              (abs(xxhash64(col("cluster"), p)) % 50000L).cast("string"))))))
      .select("doc_id", "text")
      .repartition(cpus.toInt * 2)
    docs.cache(); timed("minhash: materialize 5M docs")(docs.count())

    // band-bucket skew profile (the slim (id, key) relation the banded
    // join shuffles): p50/p99/max bucket sizes — the r11 stall was ONE
    // bucket holding every replica of every doc
    val sig = docs.select(col("doc_id").as("id"),
      Dedup.minhashSignature(col("text"), 3, 16, 42).as("sig"))
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => concat_ws("_", lit("b"), b.cast("string"),
          concat_ws(",", slice(col("sig"), b * 4 + 1, lit(4))))))
        .as(Seq("band", "key")))
      .groupBy("key").agg(count(lit(1)).as("n"))
    timed("minhash: band-bucket skew profile") {
      val q = banded.agg(
        expr("percentile_approx(n, 0.5)").as("p50"),
        expr("percentile_approx(n, 0.99)").as("p99"),
        max("n").as("max"), count(lit(1)).as("buckets")).collect()(0)
      println(s"[dedup1000x]   buckets=${q.getAs[Long]("buckets")} " +
        s"p50=${q.get(0)} p99=${q.get(1)} max=${q.getAs[Long]("max")}")
    }
    val pairs = timed("minhash: full dup-pair join (5M docs)") {
      val p = Dedup.minhashDupPairs(docs, "doc_id", "text",
        shingleLen = 3, numHashes = 16, bands = 4, threshold = 0.4)
        .localCheckpoint()
      println(s"[dedup1000x]   verified pairs=${p.count()}")
      p
    }

    // ---- components arm: clique edges from the minhash pairs PLUS
    // synthetic chains — 500 chains × 10k nodes each, needing ~log₂(10k)
    // ≈ 14 pointer-jumping rounds (clique clusters alone converge in 2-3
    // and prove nothing about round scaling). Chain node ids live above
    // the doc id space so the graphs compose without collisions.
    val chainBase = nDocs + 1
    val nChains = 500
    val chainEdges = spark.range(nChains.toLong * (chainLen - 1))
      .select(
        (col("id") / (chainLen - 1)).cast("long").as("c"),
        (col("id") % (chainLen - 1)).as("p"))
      .select(
        (lit(chainBase) + col("c") * chainLen + col("p")).as("a"),
        (lit(chainBase) + col("c") * chainLen + col("p") + 1).as("b"))
    val allEdges = pairs.select("a", "b").union(chainEdges)
      .localCheckpoint()
    val nE = allEdges.count()
    println(s"[dedup1000x] components: edges=$nE (pairs + ${nChains}×${chainLen}-chains)")
    timed("components: pointer-jumping total") {
      val labels = Dedup.connectedComponents(allEdges, maxIter = 25,
        driverEdgeCap = 0L) // force the DISTRIBUTED path — the probe's point
      val comp = labels.groupBy("comp").agg(count(lit(1)).as("n"))
        .agg(max("n").as("max"), count(lit(1)).as("n_components")).collect()(0)
      println(s"[dedup1000x]   components=${comp.getAs[Long]("n_components")} " +
        s"largest=${comp.getAs[Long]("max")} (chain clusters must be $chainLen)")
    }
    spark.stop()
  }
}
