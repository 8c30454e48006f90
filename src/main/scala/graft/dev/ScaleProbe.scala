package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Bm25, Dedup, KnnJoin, Sampling, TextAnalysis}

/** Scale probe: the 100× question, answered empirically on one box.
  *
  * Replicates sf0.1 documents `factor`× with per-replica token renaming
  * (`w` → `w``xR`), so replicas share no vocabulary: near-dup pair
  * density stays constant per replica while rows, vocabulary and
  * postings scale ×factor — the honest corpus-growth shape (plain
  * duplication would instead create factor-sized dup cliques and
  * quadratic pair blowup, which real pipelines kill with exact dedup
  * first; that composition is probed separately). Embeddings replicate
  * plainly (the kNN probe stresses the O(n²) distance engine, twins are
  * fine).
  *
  * Prints one line per operator: seconds + output cardinality. Run:
  *   sbt "runMain graft.dev.ScaleProbe /root/testdata/sf0.1 100 10"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docFactor = args.lift(1).map(_.toInt).getOrElse(100)
    val embFactor = args.lift(2).map(_.toInt).getOrElse(10)
    val localDir = s"target/spark-local-probe-${ProcessHandle.current().pid()}"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDir)
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(tag: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    val docs0 = Tables.load(spark, sfDir, "documents")
    val docs = docs0
      .select(explode(sequence(lit(0), lit(docFactor - 1))).as("rep"),
        col("doc_id"), col("text"), col("lang"))
      .select(
        (col("doc_id") * docFactor + col("rep")).as("doc_id"),
        // rename every token per replica: replicas share zero vocabulary
        regexp_replace(col("text"), lit("(\\S+)"),
          concat(lit("$1q"), col("rep"))).as("text"),
        col("lang"))
      .repartition(32).cache()
    val nDocs = docs.count()
    println(s"[probe] documents scaled to $nDocs rows (factor $docFactor)")

    timed("exact_fingerprint_dedup") {
      docs.groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
        .agg(count(lit(1)).as("n"))
    }
    timed("text_quality+repetition") {
      docs.select(TextAnalysis.qualityScore(col("text")).as("q"),
          TextAnalysis.repetitionStats(col("text")).as("r"))
        .filter(col("q") >= 0.5 && col("r.dup_3gram_frac") < 0.9)
    }
    timed("hash_sample_10pct") {
      Sampling.sampleByHash(docs, "doc_id", 0.1)
    }
    timed("minhash_dup_pairs") {
      Dedup.minhashDupPairs(docs, "doc_id", "text",
        shingleLen = 3, numHashes = 16, bands = 4, threshold = 0.7)
    }
    timed("simhash_dup_pairs") {
      Dedup.simhashDupPairs(docs, "doc_id", "text", maxHamming = 3)
    }
    timed("winnow_dup_pairs") {
      Dedup.winnowDupPairs(docs, "doc_id", "text",
        n = 4, w = 4, minShared = 2, dfCap = 128)
    }
    timed("jaccard_prefix_pairs") {
      Dedup.jaccardSimilarityJoinPrefix(docs, "doc_id", "text", "lang", 0.9)
    }
    timed("connected_components") {
      Dedup.componentLabels(docs, "doc_id",
        Dedup.jaccardSimilarityJoinPrefix(docs, "doc_id", "text", "lang", 0.9))
    }

    timed("bm25_topk_100q") {
      // ~100 queries spread across replicas; disjoint replica vocabularies
      // mean the postings equi-join prunes each query to its own replica —
      // the selectivity a term-bucketed index buys at scale
      Bm25.searchTopK(docs,
        docs.filter(col("doc_id") % 5003 === 0)
          .select(col("doc_id").as("qid"), col("text").as("qtext")),
        "doc_id", "text", "qid", "qtext", k = 10)
    }

    val emb0 = Tables.load(spark, sfDir, "embeddings")
    val emb = emb0
      .select(explode(sequence(lit(0), lit(embFactor - 1))).as("rep"),
        col("vec_id"), col("embedding"))
      .select((col("vec_id") * embFactor + col("rep")).as("vec_id"),
        col("embedding"))
      .repartition(32).cache()
    println(s"[probe] embeddings scaled to ${emb.count()} rows (factor $embFactor)")

    timed("knn_top_pairs") {
      KnnJoin.knnJoin(emb, emb, k = 21, metric = "cosine",
          queryIdCol = "vec_id", queryVecCol = "embedding",
          baseIdCol = "vec_id", baseVecCol = "embedding")
        .filter(col("id") =!= col("qid"))
        .select(least(col("qid"), col("id")).as("a"),
          greatest(col("qid"), col("id")).as("b"))
        .dropDuplicates("a", "b").orderBy(col("a"), col("b")).limit(20)
    }
    spark.stop()
    // leave no scratch behind (Bench's stale sweep is the backstop)
    try {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      val root = Path.of(localDir)
      if (Files.exists(root))
        Files.walk(root).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => { try Files.deleteIfExists(p) catch { case _: Throwable => () }; () })
    } catch { case _: Throwable => () }
  }
}
