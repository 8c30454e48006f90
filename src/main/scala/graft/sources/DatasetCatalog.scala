package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.KnnJoin

/** Named dataset catalog — the reference's `AVAILABLE_DATASETS` +
  * load/process/cache orchestration (dataset.py:31-56, 112-273) made
  * config-addressable: a benchmark config can say `datasets: [glove50]`
  * and get canonical (id, vector) train/test/gt DataFrames.
  *
  * Acquisition: pass `download=true` (plus optional `url=`) and missing
  * raw files are fetched first via [[Fetch.ensure]] — the reference's
  * `Dataset.download` (FTP for sift1m, HTTP zip for glove50). Default is
  * off: in a zero-egress environment the raw files must already sit under
  * the catalog root. The processed canonical parquet is cached via the
  * S13 digest cache either way, so re-runs skip parsing.
  */
object DatasetCatalog {

  final case class Bundle(
      name: String, metric: String,
      train: DataFrame, test: DataFrame, gt: Option[DataFrame])

  final case class Spec(
      name: String, metric: String, description: String,
      /** (spark, rootDir, cacheRoot, options) → bundle */
      resolve: (SparkSession, String, String, Map[String, String]) => Bundle)

  private def opt(o: Map[String, String], k: String, d: String) = o.getOrElse(k, d)

  /** exact GT for datasets that don't ship one (dataset.py computes GT
    * with brute force the same way, dataset.py:608-636) */
  private def computeGt(test: DataFrame, train: DataFrame, k: Int,
      metric: String): DataFrame =
    KnnJoin.knnJoinAgg(test, train, k, metric)
      .select(col("qid"), transform(col("nn"), x => x("id")).as("gt_ids"))

  /** split a canonical base into (train, test) with a deterministic
    * seeded test subset (dataset.py:638-652 discipline) */
  private def split(base: DataFrame, nTest: Int, seed: Long)
      : (DataFrame, DataFrame) = {
    val test = VectorSources.subsampleExact(base, "id", nTest, seed)
      .withColumnRenamed("id", "qid")
    val train = base.join(test.select(col("qid").as("id")), Seq("id"), "left_anti")
    (train, test)
  }

  val available: Map[String, Spec] = Map(
    // S4 deterministic generator — reference "random" (20k × 64, 256 q)
    "random" -> Spec("random", "l2",
      "seeded gaussian vectors (counter-based RNG, partition-invariant)",
      (spark, _, _, o) => {
        val (train, test, gt) = RandomDataset.dataset(spark,
          opt(o, "train_size", "20000").toLong,
          opt(o, "test_size", "256").toLong,
          opt(o, "dims", "64").toInt,
          opt(o, "gt_k", "100").toInt,
          opt(o, "seed", "42").toLong,
          opt(o, "metric", "l2"))
        Bundle("random", opt(o, "metric", "l2"), train, test, Some(gt))
      }),
    // S3 GloVe text codec — reference "glove50" (glove.6B.50d.txt)
    "glove50" -> Spec("glove50", "l2",
      "GloVe 50-d text embeddings parsed from the published txt format",
      (spark, root, cache, o) => {
        val file = s"$root/${opt(o, "file", "glove.6B.50d.txt")}"
        val base = VectorSources.cachedOrBuild(spark, cache, "glove50",
          o + ("file" -> file))(
          VectorSources.readGloveText(spark, file))
        val (train, test) = split(base,
          opt(o, "test_size", "256").toInt, opt(o, "seed", "42").toLong)
        val gt = computeGt(test, train, opt(o, "gt_k", "100").toInt, "l2")
        Bundle("glove50", "l2", train, test, Some(gt))
      }),
    // S1/S2 fvecs+ivecs codecs — reference "sift1m" (TEXMEX layout:
    // base/query fvecs + groundtruth ivecs)
    "sift1m" -> Spec("sift1m", "l2",
      "SIFT1M fvecs base/queries with published ivecs ground truth",
      (spark, root, cache, o) => {
        val baseF = s"$root/${opt(o, "base_file", "sift_base.fvecs")}"
        val queryF = s"$root/${opt(o, "query_file", "sift_query.fvecs")}"
        val gtF = s"$root/${opt(o, "gt_file", "sift_groundtruth.ivecs")}"
        val train = VectorSources.cachedOrBuild(spark, cache, "sift1m_base",
          o + ("file" -> baseF))(VectorSources.readFvecs(spark, baseF))
        val test = VectorSources.readFvecs(spark, queryF)
          .withColumnRenamed("id", "qid")
        val gt = VectorSources.readIvecsAsIds(spark, gtF)
        Bundle("sift1m", "l2", train, test, Some(gt))
      }),
    // pre-embedded corpus parquet (the reference's msmarco path embeds
    // with MiniLM then caches — model inference is descoped per SURVEY
    // §7.5, so this entry starts from the cached-embedding equivalent)
    "msmarco-preembedded" -> Spec("msmarco-preembedded", "cosine",
      "pre-embedded passage vectors (parquet, auto-resolved columns), cosine",
      (spark, root, cache, o) => {
        val file = s"$root/${opt(o, "file", "msmarco_embeddings.parquet")}"
        val base = VectorSources.cachedOrBuild(spark, cache, "msmarco_pre",
          o + ("file" -> file))(
          VectorSources.canonicalize(spark.read.parquet(file)))
        val (train, test) = split(base,
          opt(o, "test_size", "70").toInt, opt(o, "seed", "42").toLong)
        val gt = computeGt(test, train, opt(o, "gt_k", "100").toInt, "cosine")
        Bundle("msmarco-preembedded", "cosine", train, test, Some(gt))
      }))

  def names: Seq[String] = available.keys.toSeq.sorted

  def resolve(spark: SparkSession, name: String, rootDir: String,
      cacheRoot: String, options: Map[String, String]): Bundle = {
    val spec = available.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown dataset '$name' (available: ${names.mkString(", ")})"))
    if (options.get("download").exists(_.toBoolean))
      Fetch.ensure(name, rootDir, options.get("url"))
    spec.resolve(spark, rootDir, cacheRoot, options)
  }
}
