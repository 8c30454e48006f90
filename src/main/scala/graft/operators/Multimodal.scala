package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media as opaque `binary` columns + typed metadata, with
  * decode / feature-extraction / frame-sampling as batched per-partition
  * transforms.
  *
  * The Spark-side plumbing — schema, batching, partition-parallel UDF
  * shape, deterministic outputs — is real and tested. The actual codec
  * call is STUBBED (no image/audio libraries in this environment) behind
  * [[MediaCodecStub]]: a deterministic fake that derives "features" from
  * the bytes. Swapping in a real decoder is a one-function change with
  * the same `Iterator[Row] => Iterator[Row]` contract (the Scala analog
  * of a pandas-batch UDF).
  */
object Multimodal {

  /** canonical media schema: (media_id, kind, payload, meta) */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType, nullable = false),
      StructField("declared_format", StringType, nullable = true))),
      nullable = false)))

  /** Wrap a text/doc table into the media shape (payload = utf-8 bytes) —
    * used by fixtures; real pipelines land bytes from object storage. */
  def fromDocuments(docs: DataFrame, idCol: String, textCol: String,
      kind: String = "image"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"),
        lit("raw/utf8").as("declared_format")).as("meta"))

  val featureDim = 8

  /** Batched per-partition feature extraction: binary payload →
    * fixed-width float feature vector. Output schema:
    * (media_id, kind, n_bytes, features array<float>). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select("media_id", "kind", "payload")
      .mapPartitions { rows =>
        // batch shape: decode amortized per-partition, like mapInPandas
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("payload")
          val feats = MediaCodecStub.decodeAndFeaturize(bytes, featureDim)
          Row(r.getLong(0), r.getString(1), bytes.length.toLong, feats)
        }
      }(enc)
  }

  /** Resize: re-scale each payload's decoded raster to `targetBytes` —
    * the byte-stream analog of image resizing. The Spark-side plumbing
    * (media schema in/out, per-partition batching, meta propagation) is
    * real; the resample itself is the codec-stub boundary
    * ([[MediaCodecStub.resampleBytes]], nearest-neighbor over the byte
    * stream — a real image codec plugs in there). Output keeps
    * [[mediaSchema]], so resize composes with [[extractFeatures]] and
    * [[sampleFrames]]; payloads already at or below `targetBytes` pass
    * through unchanged (no upsampling surprises on mixed corpora). */
  def resize(media: DataFrame, targetBytes: Int): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema)
    media.select("media_id", "kind", "payload", "meta")
      .mapPartitions { rows =>
        rows.map { r =>
          // null-tolerant like decodeAndFeaturize's empty-payload path: a
          // null payload or meta struct passes through as an
          // empty/zero-fill row instead of NPE-failing the whole task
          val bytes = Option(r.getAs[Array[Byte]]("payload"))
            .getOrElse(Array.emptyByteArray)
          val out =
            if (bytes.length <= targetBytes) bytes
            else MediaCodecStub.resampleBytes(bytes, targetBytes)
          val fmt = Option(r.getStruct(3))
            .flatMap(meta => Option(meta.getString(1)))
            .map(f => if (bytes.length <= targetBytes) f else s"$f/resized")
            .orNull
          Row(r.getLong(0), r.getString(1), out,
            Row(out.length.toLong, fmt))
        }
      }(enc)
  }

  /** Frame sampling: split payload into `frameSize`-byte frames, keep
    * every `stride`-th — the byte-level analog of video frame-sampling,
    * exercising the explode/repartition path a real sampler needs.
    * Output: (media_id, frame_no, frame binary). */
  def sampleFrames(media: DataFrame, frameSize: Int, stride: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select("media_id", "payload")
      .flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("payload")
        val frames = bytes.grouped(frameSize).toArray
        frames.indices.collect {
          case i if i % stride == 0 => Row(r.getLong(0), i, frames(i))
        }
      }(enc)
  }
}

/** STUB decoder — deterministic fake standing in for an image/audio codec
  * (??? in the design sense: the real implementation plugs in here).
  * Features are byte-histogram moments so tests get stable, meaningful
  * values with zero native dependencies. */
object MediaCodecStub {

  /** nearest-neighbor byte resample to exactly `target` bytes — the
    * stub standing in for a codec's raster resize (deterministic:
    * out(i) = in(floor(i·n/target))) */
  def resampleBytes(payload: Array[Byte], target: Int): Array[Byte] = {
    val n = payload.length
    val out = new Array[Byte](target)
    var i = 0
    while (i < target) {
      out(i) = payload(((i.toLong * n) / target).toInt)
      i += 1
    }
    out
  }

  def decodeAndFeaturize(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (payload.isEmpty) return out
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xFF
      out(i % dim) += b / 255.0f
      i += 1
    }
    var j = 0
    while (j < dim) { out(j) = out(j) / payload.length * dim; j += 1 }
    out
  }
}
