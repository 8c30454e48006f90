package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector dataset ingestion (reference §2.1 scans/sources):
  *
  *  - S1/S2 fvecs/ivecs: SIFT binary format, per-row
  *    `[int32 dim][dim × float32|int32]` (dataset.py:522-574). Decoded
  *    distributed via `binaryFile` + a per-file flatMap — each file's rows
  *    carry positional ids offset by file order, matching the reference's
  *    positional-index convention;
  *  - S3 GloVe text: `word v1 … v50` lines (dataset.py:628-635);
  *  - S6 column auto-detection: embedding/id candidate names or first
  *    float-array field, struct children included (dataset.py:1167-1268);
  *  - S10 TSV corpus reader (embed_msmarco.py:63-88);
  *  - S11 exact-k seeded subsampler (subsample_msmarco.py:62-164);
  *  - S13 digest-keyed parquet cache (dataset.py:237-273).
  */
object VectorSources {

  // ------------------------------------------------------------ S1/S2 fvecs
  /** decode one .fvecs/.ivecs payload to (rowIdx, values) pairs */
  private def decodeVecs(bytes: Array[Byte], intPayload: Boolean)
      : Iterator[(Long, Array[Float])] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    new Iterator[(Long, Array[Float])] {
      private var idx = 0L
      def hasNext: Boolean = bb.remaining() >= 4
      def next(): (Long, Array[Float]) = {
        val dim = bb.getInt
        val out = new Array[Float](dim)
        var i = 0
        while (i < dim) {
          out(i) = if (intPayload) bb.getInt.toFloat else bb.getFloat
          i += 1
        }
        val r = (idx, out); idx += 1; r
      }
    }
  }

  /** read .fvecs file(s) → (id long, vector array<float>); id = row
    * position (file order). Distributed: one task per file. */
  def readFvecs(spark: SparkSession, path: String): DataFrame =
    readVecs(spark, path, intPayload = false)

  /** read .ivecs (int payload — ground-truth lists) → (id, vector) with
    * the int values widened to float for a uniform schema; use
    * [[readIvecsAsIds]] for GT id lists. */
  def readIvecs(spark: SparkSession, path: String): DataFrame =
    readVecs(spark, path, intPayload = true)

  /** GT shape: (qid long, gt_ids array<long>) */
  def readIvecsAsIds(spark: SparkSession, path: String): DataFrame =
    readIvecs(spark, path).select(col("id").as("qid"),
      transform(col("vector"), x => x.cast("long")).as("gt_ids"))

  private def readVecs(spark: SparkSession, path: String, intPayload: Boolean)
      : DataFrame = {
    val files = spark.read.format("binaryFile").load(path)
      .select("path", "content")
      .collect()
      .sortBy(_.getString(0))
    // rows per file must be known to assign global positional ids; dims
    // are fixed per file so row count = bytes / (4 + 4·dim)
    var offset = 0L
    val parts = files.map { r =>
      val bytes = r.getAs[Array[Byte]]("content")
      val start = offset
      if (bytes.length >= 4) {
        val dim = java.nio.ByteBuffer.wrap(bytes, 0, 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
        offset += bytes.length / (4L + 4L * dim)
      }
      (start, bytes)
    }
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("vector", ArrayType(FloatType, containsNull = false), nullable = false)))
    val rdd = spark.sparkContext
      .parallelize(parts.toIndexedSeq, math.max(1, parts.length))
      .flatMap { case (start, bytes) =>
        decodeVecs(bytes, intPayload).map { case (i, v) =>
          org.apache.spark.sql.Row(start + i, v)
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** write the canonical fvecs binary for round-trip tests/interop */
  def writeFvecs(path: String, vectors: Seq[Array[Float]]): Unit = {
    val total = vectors.map(v => 4 + 4 * v.length).sum
    val bb = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vectors.foreach { v =>
      bb.putInt(v.length)
      v.foreach(bb.putFloat)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bb.array())
  }

  // --------------------------------------------------------------- S3 glove
  /** GloVe text lines `word v1 v2 …` → (id by file order via zipWithIndex,
    * word, vector array<float>) */
  def readGloveText(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("word", StringType, nullable = false),
      StructField("vector", ArrayType(FloatType, containsNull = false), nullable = false)))
    val rdd = spark.sparkContext.textFile(path)
      .zipWithIndex()
      .map { case (line, idx) =>
        val parts = line.trim.split(" ")
        org.apache.spark.sql.Row(idx, parts.head,
          parts.tail.map(_.toFloat))
      }
    spark.createDataFrame(rdd, schema)
  }

  // ------------------------------------------------------------ S6 resolver
  val vectorColumnCandidates: Seq[String] = Seq("emb", "embedding", "vector")
  val idColumnCandidates: Seq[String] = Seq("_id", "id", "doc_id", "passage_id", "vec_id")

  private def isVectorField(f: StructField): Boolean = f.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** resolve (vectorCol, idCol) by candidate names, falling back to the
    * first float-array field / first integral field; struct children are
    * searched one level deep as `parent.child` (dataset.py:1240-1243) */
  def resolveColumns(df: DataFrame,
      requestedVector: Option[String] = None,
      requestedId: Option[String] = None): (String, String) = {
    val fields = df.schema.fields.toSeq
    val flat: Seq[(String, StructField)] = fields.flatMap { f =>
      f.dataType match {
        case st: StructType =>
          Seq(f.name -> f) ++ st.fields.map(c => s"${f.name}.${c.name}" -> c)
        case _ => Seq(f.name -> f)
      }
    }
    def find(requested: Option[String], candidates: Seq[String],
        fallback: ((String, StructField)) => Boolean, what: String): String =
      requested
        .orElse(candidates.find(c => flat.exists(_._1 == c)))
        .orElse(flat.find(fallback).map(_._1))
        .getOrElse(throw new IllegalArgumentException(
          s"could not resolve $what column in schema ${df.schema.simpleString}"))
    val vec = find(requestedVector, vectorColumnCandidates,
      p => isVectorField(p._2), "vector")
    val id = find(requestedId, idColumnCandidates,
      p => p._2.dataType == LongType || p._2.dataType == IntegerType, "id")
    (vec, id)
  }

  /** canonicalize any parquet vector table to (id long, vector array<float>) */
  def canonicalize(df: DataFrame,
      requestedVector: Option[String] = None,
      requestedId: Option[String] = None): DataFrame = {
    val (vec, id) = resolveColumns(df, requestedVector, requestedId)
    df.select(col(id).cast("long").as("id"),
      col(vec).cast(ArrayType(FloatType)).as("vector"))
  }

  // ---------------------------------------------------------------- S10 tsv
  def readTsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").option("header", "true").csv(path)

  // ---------------------------------------------------------- S11 subsample
  /** Exact-k seeded subsample (the reference samples an exact index set,
    * subsample_msmarco.py:62-113 — semantically different from
    * df.sample's Bernoulli fraction, as SURVEY S11 notes): deterministic
    * hash order, partitioning-invariant. */
  def subsampleExact(df: DataFrame, idCol: String, k: Int, seed: Long): DataFrame =
    df.withColumn("__h", xxhash64(lit(seed), col(idCol)))
      .orderBy(col("__h"), col(idCol))
      .limit(k)
      .drop("__h")

  // -------------------------------------------------------------- S13 cache
  /** digest-keyed parquet cache of a processed dataset: key = sha256 of
    * canonical-JSON options (reference uses md5 of sorted-JSON,
    * dataset.py:237-244 — same idea, stronger hash). `_SUCCESS` marker
    * (written by Spark) doubles as the completeness sentinel. */
  def cachedOrBuild(spark: SparkSession, cacheRoot: String, name: String,
      options: Map[String, String])(build: => DataFrame): DataFrame = {
    val digest = ArtifactStore.sha256(ArtifactStore.canonicalJson(options)).take(16)
    val dir = s"$cacheRoot/${name}_$digest"
    val success = java.nio.file.Paths.get(dir, "_SUCCESS")
    if (java.nio.file.Files.exists(success)) spark.read.parquet(dir)
    else {
      val df = build
      df.write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    }
  }
}
