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
  * shape, deterministic outputs — is real and tested. Since r12 the
  * IMAGE decode is real too: [[MediaCodec]] wires `javax.imageio`
  * (PNG/JPEG/BMP/GIF — JDK built-ins, zero new dependencies) behind the
  * same boundary, and AUDIO decode is real for the JDK's built-in
  * containers (`javax.sound.sampled`: WAV/AIFF/AU 16-bit PCM —
  * [[MediaCodec.decodeAudio]]). [[MediaCodecStub]] (a deterministic
  * byte-moment fake) remains the fallback for payloads no installed
  * reader recognizes — video stays stubbed (the JDK has no video
  * codec). Swapping in further decoders remains a one-function change
  * with the same `Iterator[Row] => Iterator[Row]` contract (the Scala
  * analog of a pandas-batch UDF).
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
  def fromDocuments(docs0: DataFrame, idCol: String, textCol: String,
      kind: String = "image"): DataFrame = {
    // media consumers are codec-bound (cost ∝ rows, not bytes): floor the
    // scan parallelism before the payload projection (r14, Par scaladoc)
    val docs = Par.fan(docs0, col(idCol))
    docs.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"),
        lit("raw/utf8").as("declared_format")).as("meta"))
  }

  val featureDim = 8

  /** Batched per-partition feature extraction: binary payload →
    * fixed-width float feature vector. Output schema:
    * (media_id, kind, n_bytes, features array<float>). Payloads a JDK
    * image reader recognizes get REAL raster features
    * ([[MediaCodec.decodeAndFeaturize]]); everything else falls back to
    * the deterministic byte-moment stub. */
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
          val feats = MediaCodec.decodeAndFeaturize(bytes, featureDim)
          Row(r.getLong(0), r.getString(1), bytes.length.toLong, feats)
        }
      }(enc)
  }

  /** Real image decode, relationally: payload → (media_id, decoded,
    * width, height, channels, sum_r, sum_g, sum_b). Channel SUMS (exact
    * longs over the decoded raster), not means — integer outputs hash
    * identically across engines, the project-wide oracle discipline.
    * Undecodable payloads survive as `decoded = false` zero rows rather
    * than failing the task (mixed corpora always carry junk bytes). */
  def decodeImageStats(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("decoded", BooleanType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          MediaCodec.decode(r.getAs[Array[Byte]]("payload")) match {
            case Some(img) =>
              val (sr, sg, sb) = MediaCodec.channelSums(img)
              Row(id, true, img.getWidth, img.getHeight,
                img.getColorModel.getNumColorComponents, sr, sg, sb)
            case None => Row(id, false, 0, 0, 0, 0L, 0L, 0L)
          }
        }
      }(enc)
  }

  /** Deterministic PNG fixture generator: one real PNG per id with
    * id-derived dimensions (w = 8 + id%13, h = 8 + id%7) and per-pixel
    * channels r=(id+x)%256, g=(7·id+y)%256, b=(13·id+x+y)%256 — every
    * raster statistic is analytically computable, so a DuckDB oracle
    * can hash-check REAL decoded bytes (the `mm_decode` gate). Encoding
    * runs executor-side per partition; real pipelines land bytes from
    * object storage instead. */
  def syntheticImages(ids: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema)
    // encode is codec-bound: floor the parallelism (r14, Par scaladoc)
    Par.fan(ids.select(col(idCol).cast("long").as("media_id")), col("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val w = (8 + id % 13).toInt
          val h = (8 + id % 7).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val cr = ((id + x) % 256).toInt
              val cg = ((7 * id + y) % 256).toInt
              val cb = ((13 * id + x + y) % 256).toInt
              img.setRGB(x, y, (cr << 16) | (cg << 8) | cb)
              x += 1
            }
            y += 1
          }
          val bytes = MediaCodec.encodePng(img)
          Row(id, "image", bytes, Row(bytes.length.toLong, "image/png"))
        }
      }(enc)
  }

  /** Deterministic WAV fixture generator (the audio analog of
    * [[syntheticImages]]): one real RIFF/WAVE payload per id —
    * 16-bit signed PCM, id-derived shape (frames = 64 + id%41,
    * channels = 1 + id%2, rate = 8000·(1 + id%3)) and per-sample
    * formula s(id, frame i, channel c) = ((31·id + 7·i + 13·c) mod
    * 65536) − 32768, so every decoded sample statistic is analytically
    * computable and a DuckDB oracle can hash-check REAL decoded bytes
    * (the `mm_audio` gate). Encoding runs executor-side per partition
    * through `javax.sound.sampled` — the exact writer a real pipeline's
    * landed bytes would have come from. */
  def syntheticWavs(ids: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema)
    // encode is codec-bound: floor the parallelism (r14, Par scaladoc)
    Par.fan(ids.select(col(idCol).cast("long").as("media_id")), col("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val nFrames = (64 + id % 41).toInt
          val ch = (1 + id % 2).toInt
          val rate = (8000 * (1 + id % 3)).toInt
          val samples = new Array[Short](nFrames * ch)
          var i = 0
          while (i < nFrames) {
            var c = 0
            while (c < ch) {
              samples(i * ch + c) =
                (((31L * id + 7L * i + 13L * c) % 65536) - 32768).toShort
              c += 1
            }
            i += 1
          }
          val bytes = MediaCodec.encodeWav(samples, ch, rate)
          Row(id, "audio", bytes, Row(bytes.length.toLong, "audio/wav"))
        }
      }(enc)
  }

  /** Real audio decode, relationally: payload → (media_id, decoded,
    * sample_rate, channels, n_frames, sum_ch0, sum_ch1). Channel SUMS
    * over the decoded 16-bit samples (exact longs — the integer-output
    * oracle discipline); mono payloads report sum_ch1 = 0. Undecodable
    * payloads survive as `decoded = false` zero rows, mirroring
    * [[decodeImageStats]]. */
  def decodeAudioStats(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("decoded", BooleanType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("sum_ch0", LongType, nullable = false),
      StructField("sum_ch1", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          MediaCodec.decodeAudio(r.getAs[Array[Byte]]("payload")) match {
            case Some(st) =>
              Row(id, true, st.sampleRate, st.channels, st.nFrames,
                st.channelSums(0),
                if (st.channels > 1) st.channelSums(1) else 0L)
            case None => Row(id, false, 0, 0, 0L, 0L, 0L)
          }
        }
      }(enc)
  }

  /** Deterministic uncompressed-AVI fixture generator (the video analog
    * of [[syntheticImages]]/[[syntheticWavs]]): one real RIFF AVI per id
    * — 24bpp BI_RGB DIB frames, id-derived shape (w = 8 + id%9,
    * h = 8 + id%5, frames = 3 + id%4, fps = 10 + id%5) and per-pixel
    * channel formulas chosen SEPARABLE so the oracle needs no
    * per-pixel unnest (r depends on (f,x) only, g on (f,y), b on
    * (f,x)): r = (id + 3f + x) % 256, g = (5·id + f + y) % 256,
    * b = (11·id + 2f + x) % 256. Every decoded statistic is analytic
    * in doc_id, so a DuckDB oracle hash-checks REAL container bytes
    * (the `mm_video` gate). */
  def syntheticAvis(ids: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema)
    // encode is codec-bound: floor the parallelism (r14, Par scaladoc)
    Par.fan(ids.select(col(idCol).cast("long").as("media_id")), col("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val w = (8 + id % 9).toInt
          val h = (8 + id % 5).toInt
          val nf = (3 + id % 4).toInt
          val fps = (10 + id % 5).toInt
          val frames = (0 until nf).map { f =>
            val px = new Array[Int](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val cr = ((id + 3 * f + x) % 256).toInt
                val cg = ((5 * id + f + y) % 256).toInt
                val cb = ((11 * id + 2 * f + x) % 256).toInt
                px(y * w + x) = (cr << 16) | (cg << 8) | cb
                x += 1
              }
              y += 1
            }
            px
          }
          val bytes = MediaCodec.encodeAvi(w, h, fps, frames)
          Row(id, "video", bytes, Row(bytes.length.toLong, "video/avi"))
        }
      }(enc)
  }

  /** Real video decode, relationally: payload → (media_id, decoded,
    * width, height, fps, n_frames, sum_r, sum_g, sum_b) with exact
    * per-channel pixel sums over ALL frames. Undecodable payloads
    * survive as decoded = false zero rows, mirroring
    * [[decodeImageStats]]/[[decodeAudioStats]]. */
  def decodeVideoStats(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("decoded", BooleanType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("fps", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          MediaCodec.decodeVideo(r.getAs[Array[Byte]]("payload")) match {
            case Some(st) =>
              Row(id, true, st.width, st.height, st.fps, st.nFrames,
                st.sumR, st.sumG, st.sumB)
            case None => Row(id, false, 0, 0, 0, 0, 0L, 0L, 0L)
          }
        }
      }(enc)
  }

  /** REAL frame sampling: decode each AVI container, keep every
    * `stride`-th frame, re-encode each kept frame as PNG — output rows
    * are (media_id, frame_no, payload image/png), directly composable
    * with [[decodeImageStats]] (the video → keyframe-corpus path of a
    * multimodal training pipeline). Undecodable payloads yield no
    * rows. Contrast [[sampleFrames]], the byte-level stub variant. */
  def sampleVideoFrames(media: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, s"stride must be positive: $stride")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select("media_id", "payload")
      .flatMap { r =>
        val id = r.getLong(0)
        MediaCodec.decodeVideoFrames(r.getAs[Array[Byte]]("payload"), stride)
          .getOrElse(IndexedSeq.empty)
          .map { case (f, img) => Row(id, f, MediaCodec.encodePng(img)) }
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

/** REAL image codec over `javax.imageio` (JDK built-in readers: PNG,
  * JPEG, BMP, GIF — zero new dependencies; reference anchor: the decode
  * step a mapInPandas image pipeline would run per batch). Decode is
  * null-safe and exception-safe — any unrecognized or corrupt payload
  * routes to the [[MediaCodecStub]] fallback (features) or a
  * decoded=false row ([[Multimodal.decodeImageStats]]), never a task
  * failure. */
object MediaCodec {

  // ImageIO defaults to DISK-backed stream caching: every read/write
  // creates (and deletes) a temp file. The payloads here are in-memory
  // byte arrays — the cache is pure overhead, and at 32 concurrent
  // decode tasks it adds filesystem churn per image (r14). Memory
  // caching is semantically identical (same codecs, same bytes).
  javax.imageio.ImageIO.setUseCache(false)

  // javax.sound's AudioSystem facade re-runs provider discovery on EVERY
  // getAudioInputStream/write call (JDK13Services.getProviders is
  // class-synchronized and instantiates a fresh ServiceLoader each
  // time): at 32 concurrent decode tasks the lock serializes the whole
  // stage — r14 measured the fanned-out mm_audio SLOWER than its old
  // single-task run. Providers are process-static, so discover them once
  // and drive the same SPI directly; AudioSystem stays the fallback if
  // no cached provider accepts a payload.
  private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toSeq
  }
  private lazy val audioWriters: Seq[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala.toSeq
  }
  // last reader that accepted a payload, tried first on the next one: a
  // homogeneous corpus (the normal case) then pays ZERO rejected-provider
  // attempts — each rejection constructs an UnsupportedAudioFileException
  // whose fillInStackTrace dominated the parallel decode profile (the
  // MIDI reader sorts before the WAV reader in provider order)
  @volatile private var hotAudioReader: javax.sound.sampled.spi.AudioFileReader = null

  /** ImageIO.read, total: None on null/empty/unrecognized/corrupt bytes */
  def decode(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (payload == null || payload.isEmpty) None
    else
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload)))
      catch { case _: Exception => None }

  /** lossless PNG encode (fixtures + resize round-trips) */
  def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** exact per-channel pixel sums over the sRGB raster (longs — the
    * integer-output oracle discipline; getRGB normalizes every color
    * model to 8-bit sRGB, so the sums are codec-independent) */
  def channelSums(img: java.awt.image.BufferedImage): (Long, Long, Long) = {
    val w = img.getWidth; val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val p = row(x)
        sr += (p >>> 16) & 0xFF; sg += (p >>> 8) & 0xFF; sb += p & 0xFF
        x += 1
      }
      y += 1
    }
    (sr, sg, sb)
  }

  /** decoded-audio summary: format facts + exact per-channel sample sums */
  final case class AudioStats(sampleRate: Int, channels: Int,
      nFrames: Long, channelSums: Array[Long])

  /** lossless 16-bit PCM WAV encode via `javax.sound.sampled` (fixtures;
    * `samples` are frame-interleaved: s(i·ch + c) = frame i, channel c) */
  def encodeWav(samples: Array[Short], channels: Int,
      sampleRate: Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      sampleRate.toFloat, 16, channels, channels * 2, sampleRate.toFloat,
      /*bigEndian=*/ false)
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(2 * i) = (samples(i) & 0xFF).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt,
      samples.length.toLong / channels)
    val baos = new java.io.ByteArrayOutputStream()
    // cached-provider write (same SPI AudioSystem would resolve; see
    // audioWriters note) — identical bytes, no per-call provider scan
    audioWriters.find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE, ais)) match {
      case Some(w) => w.write(ais, AudioFileFormat.Type.WAVE, baos)
      case None => AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    }
    baos.toByteArray
  }

  /** AudioSystem decode, total: None on null/empty/unrecognized/corrupt
    * bytes or non-16-bit/non-PCM encodings (the JDK's own readers cover
    * WAV, AIFF and AU containers). Handles both endiannesses so AIFF
    * (big-endian) decodes identically to WAV. */
  def decodeAudio(payload: Array[Byte]): Option[AudioStats] =
    if (payload == null || payload.isEmpty) None
    else
      try {
        import javax.sound.sampled._
        // cached-provider decode: try each discovered AudioFileReader on
        // a fresh in-memory stream (what AudioSystem does per call, minus
        // the synchronized re-discovery); fall back to the facade if none
        // accepts, preserving its exact behavior for exotic setups
        def viaProviders: Option[AudioInputStream] = {
          val hot = hotAudioReader
          if (hot != null) {
            try return Some(hot.getAudioInputStream(
              new java.io.ByteArrayInputStream(payload)))
            catch { case _: UnsupportedAudioFileException => () }
          }
          val it = audioReaders.iterator
          while (it.hasNext) {
            val r = it.next()
            if (r ne hot) {
              try {
                val s = r.getAudioInputStream(
                  new java.io.ByteArrayInputStream(payload))
                hotAudioReader = r
                return Some(s)
              } catch { case _: UnsupportedAudioFileException => () }
            }
          }
          None
        }
        val ais = viaProviders.getOrElse(AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload)))
        try {
          val fmt = ais.getFormat
          if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
              fmt.getSampleSizeInBits != 16) None
          else {
            val bytes = ais.readAllBytes()
            val ch = fmt.getChannels
            val be = fmt.isBigEndian
            val n = bytes.length / 2
            val sums = new Array[Long](ch)
            var i = 0
            while (i < n) {
              val s =
                if (be) ((bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xFF)).toShort
                else ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xFF)).toShort
              sums(i % ch) += s
              i += 1
            }
            Some(AudioStats(fmt.getSampleRate.toInt, ch, n.toLong / ch, sums))
          }
        } finally ais.close()
      } catch { case _: Exception => None }

  // ------------------------------------------------------------------
  // VIDEO: uncompressed AVI (RIFF 'AVI ', 24bpp BI_RGB DIB frames) —
  // the one mainstream video container a zero-dependency JVM can
  // encode AND decode byte-exactly (the DIB payload is raw bottom-up
  // BGR, so there is no entropy coder to reimplement). This closes the
  // codec-stub boundary for video the way javax.imageio/javax.sound
  // did for images/audio: the bytes are a REAL format any media player
  // or ffmpeg ingests, and the Spark operators decode actual container
  // bytes, not a fake. Compressed codecs (H.264 etc.) remain out of
  // scope — the JDK ships no such decoder ([[MediaCodecStub]] stays
  // the documented fallback for unrecognized payloads).
  // ------------------------------------------------------------------

  /** decoded-video summary: container facts + exact per-channel pixel
    * sums over ALL frames (longs — the integer-output oracle
    * discipline) */
  final case class VideoStats(width: Int, height: Int, fps: Int,
      nFrames: Int, sumR: Long, sumG: Long, sumB: Long)

  private def wLE32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xFF); o.write((v >>> 8) & 0xFF)
    o.write((v >>> 16) & 0xFF); o.write((v >>> 24) & 0xFF)
  }
  private def wLE16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xFF); o.write((v >>> 8) & 0xFF)
  }
  private def wFcc(o: java.io.ByteArrayOutputStream, s: String): Unit =
    o.write(s.getBytes("US-ASCII"))

  /** Uncompressed-AVI encode: `frames` are w·h packed 0xRRGGBB ints,
    * row-major top-down; written as 24bpp bottom-up BGR DIB chunks
    * (rows padded to 4 bytes) with a standard idx1 index. The output
    * is a spec-complete RIFF AVI. */
  def encodeAvi(w: Int, h: Int, fps: Int,
      frames: Seq[Array[Int]]): Array[Byte] = {
    require(w > 0 && h > 0 && fps > 0 && frames.nonEmpty)
    require(frames.forall(_.length == w * h), "frame size mismatch")
    val rowBytes = (w * 3 + 3) & ~3
    val frameBytes = rowBytes * h
    val n = frames.length

    def dib(px: Array[Int]): Array[Byte] = {
      val out = new Array[Byte](frameBytes)
      var y = 0
      while (y < h) {
        val src = (h - 1 - y) * w // bottom-up
        val dst = y * rowBytes
        var x = 0
        while (x < w) {
          val p = px(src + x)
          out(dst + 3 * x) = (p & 0xFF).toByte // B
          out(dst + 3 * x + 1) = ((p >>> 8) & 0xFF).toByte // G
          out(dst + 3 * x + 2) = ((p >>> 16) & 0xFF).toByte // R
          x += 1
        }
        y += 1
      }
      out
    }

    val o = new java.io.ByteArrayOutputStream()
    // sizes: hdrl LIST = 4 + (8+56) + (8 + 4 + (8+56) + (8+40))
    val strlSize = 4 + 8 + 56 + 8 + 40
    val hdrlSize = 4 + 8 + 56 + 8 + strlSize
    val moviSize = 4 + n * (8 + frameBytes)
    val idx1Size = 16 * n
    val riffSize = 4 + 8 + hdrlSize + 8 + moviSize + 8 + idx1Size
    wFcc(o, "RIFF"); wLE32(o, riffSize); wFcc(o, "AVI ")
    wFcc(o, "LIST"); wLE32(o, hdrlSize); wFcc(o, "hdrl")
    wFcc(o, "avih"); wLE32(o, 56)
    wLE32(o, 1000000 / fps) // dwMicroSecPerFrame
    wLE32(o, frameBytes * fps) // dwMaxBytesPerSec
    wLE32(o, 0) // dwPaddingGranularity
    wLE32(o, 0x10) // AVIF_HASINDEX
    wLE32(o, n); wLE32(o, 0) // totalFrames, initialFrames
    wLE32(o, 1) // streams
    wLE32(o, frameBytes) // suggestedBufferSize
    wLE32(o, w); wLE32(o, h)
    wLE32(o, 0); wLE32(o, 0); wLE32(o, 0); wLE32(o, 0) // reserved
    wFcc(o, "LIST"); wLE32(o, strlSize); wFcc(o, "strl")
    wFcc(o, "strh"); wLE32(o, 56)
    wFcc(o, "vids"); wFcc(o, "DIB ")
    wLE32(o, 0); wLE16(o, 0); wLE16(o, 0) // flags, priority, language
    wLE32(o, 0) // initialFrames
    wLE32(o, 1); wLE32(o, fps) // scale, rate → fps
    wLE32(o, 0); wLE32(o, n) // start, length
    wLE32(o, frameBytes); wLE32(o, -1); wLE32(o, 0) // bufSize, quality, sampleSize
    wLE16(o, 0); wLE16(o, 0); wLE16(o, w); wLE16(o, h) // rcFrame
    wFcc(o, "strf"); wLE32(o, 40)
    wLE32(o, 40); wLE32(o, w); wLE32(o, h)
    wLE16(o, 1); wLE16(o, 24) // planes, bitCount
    wLE32(o, 0) // BI_RGB
    wLE32(o, frameBytes)
    wLE32(o, 0); wLE32(o, 0); wLE32(o, 0); wLE32(o, 0)
    wFcc(o, "LIST"); wLE32(o, moviSize); wFcc(o, "movi")
    frames.foreach { px =>
      wFcc(o, "00db"); wLE32(o, frameBytes); o.write(dib(px))
    }
    wFcc(o, "idx1"); wLE32(o, idx1Size)
    var f = 0
    while (f < n) {
      wFcc(o, "00db"); wLE32(o, 0x10) // AVIIF_KEYFRAME
      wLE32(o, 4 + f * (8 + frameBytes)); wLE32(o, frameBytes)
      f += 1
    }
    o.toByteArray
  }

  private def rLE32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
      ((b(p + 2) & 0xFF) << 16) | ((b(p + 3) & 0xFF) << 24)
  private def rLE16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
  private def fcc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "US-ASCII")

  /** parsed container: dims + fps + (offset, length) of each DIB frame
    * chunk's data within the payload */
  private final case class AviLayout(w: Int, h: Int, fps: Int,
      frames: IndexedSeq[(Int, Int)])

  /** RIFF walk, total: None unless the payload is a well-formed AVI
    * whose single video stream is uncompressed 24bpp BI_RGB. Frame
    * chunks are located from the movi LIST directly ('00db'/'00dc'),
    * so a missing/odd idx1 cannot corrupt the decode. */
  private def parseAvi(b: Array[Byte]): Option[AviLayout] =
    try {
      if (b == null || b.length < 12 || fcc(b, 0) != "RIFF" ||
        fcc(b, 8) != "AVI ") return None
      var w = 0; var h = 0; var fps = 0
      var bitCount = 0; var compression = -1
      val frames = IndexedSeq.newBuilder[(Int, Int)]

      def walk(from: Int, to: Int, inHdrl: Boolean, inMovi: Boolean,
          depth: Int): Unit = {
        // depth cap: a corrupt/crafted payload of ~N/12 nested 12-byte
        // LISTs would otherwise recurse ~N/12 frames deep and throw
        // StackOverflowError — an Error the `case _: Exception` guard
        // below does NOT catch, crashing the executor task instead of
        // returning None. Real AVIs nest ≤4 (RIFF→hdrl→strl / movi→rec)
        if (depth > 16) return
        var pos = from
        while (pos + 8 <= to) {
          val id = fcc(b, pos)
          val size = rLE32(b, pos + 4)
          if (size < 0 || pos + 8 + size > to) return
          id match {
            case "LIST" if size >= 4 =>
              val lt = fcc(b, pos + 8)
              walk(pos + 12, pos + 8 + size,
                inHdrl || lt == "hdrl" || lt == "strl", inMovi || lt == "movi",
                depth + 1)
            case "strh" if inHdrl && size >= 32 &&
                fcc(b, pos + 8) == "vids" =>
              val scale = rLE32(b, pos + 8 + 20)
              val rate = rLE32(b, pos + 8 + 24)
              if (scale > 0) fps = rate / scale
            case "strf" if inHdrl && size >= 40 =>
              w = rLE32(b, pos + 8 + 4)
              h = rLE32(b, pos + 8 + 8)
              bitCount = rLE16(b, pos + 8 + 14)
              compression = rLE32(b, pos + 8 + 16)
            case c if inMovi && (c.endsWith("db") || c.endsWith("dc")) =>
              frames += ((pos + 8, size))
            case _ => ()
          }
          pos += 8 + size + (size & 1) // chunks pad to even
        }
      }
      walk(12, math.min(b.length, 8 + rLE32(b, 4)), inHdrl = false,
        inMovi = false, depth = 0)
      val fr = frames.result()
      // dimension plausibility bound: every downstream consumer does Int
      // arithmetic on w/h (rowBytes = w*3+3, threshold = h*rowBytes,
      // BufferedImage w*h ints). A crafted strf with w or h near 2^30
      // overflows those products to negative, re-admitting truncated
      // chunks past the short-chunk guards and throwing AIOOBE/OOM from
      // OUTSIDE this try — crashing the task instead of yielding no
      // rows. 16384 keeps w*3 (≤49k), h*rowBytes (≤8.1e8), and w*h*4
      // (≤1.1e9) all inside Int range while exceeding 8K video.
      if (w <= 0 || h <= 0 || w > 16384 || h > 16384 || fps <= 0 ||
        bitCount != 24 || compression != 0 || fr.isEmpty) None
      else Some(AviLayout(w, h, fps, fr))
    } catch { case _: Exception => None }

  /** decode + exact per-channel pixel sums over every frame */
  def decodeVideo(payload: Array[Byte]): Option[VideoStats] =
    parseAvi(payload).map { lay =>
      val rowBytes = (lay.w * 3 + 3) & ~3
      var sr = 0L; var sg = 0L; var sb = 0L
      lay.frames.foreach { case (off, len) =>
        val rows = math.min(lay.h, len / rowBytes)
        var y = 0
        while (y < rows) {
          val base = off + y * rowBytes
          var x = 0
          while (x < lay.w) {
            sb += payload(base + 3 * x) & 0xFF
            sg += payload(base + 3 * x + 1) & 0xFF
            sr += payload(base + 3 * x + 2) & 0xFF
            x += 1
          }
          y += 1
        }
      }
      VideoStats(lay.w, lay.h, lay.fps, lay.frames.length, sr, sg, sb)
    }

  /** extract every `stride`-th frame as a BufferedImage (index order:
    * frame 0, stride, 2·stride, …) — bottom-up BGR DIB back to a
    * top-down RGB raster */
  def decodeVideoFrames(payload: Array[Byte],
      stride: Int): Option[IndexedSeq[(Int, java.awt.image.BufferedImage)]] =
    parseAvi(payload).map { lay =>
      val rowBytes = (lay.w * 3 + 3) & ~3
      // skip short '00db' chunks (len < h·rowBytes): reading h full rows
      // from one would pull garbage bytes from the neighboring chunk —
      // or run off the payload end and fail the Spark task — violating
      // the "undecodable payloads yield no rows" contract. Mirrors
      // decodeVideo's rows = min(h, len/rowBytes) guard, stricter: a
      // partial frame is dropped rather than emitted truncated. Long
      // threshold: parseAvi bounds w,h ≤ 16384 so h*rowBytes fits Int,
      // but the comparison must never overflow even if that bound moves.
      lay.frames.indices.collect {
        case f if f % stride == 0 &&
            lay.frames(f)._2.toLong >= lay.h.toLong * rowBytes =>
          val (off, _) = lay.frames(f)
          val img = new java.awt.image.BufferedImage(
            lay.w, lay.h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < lay.h) {
            val base = off + (lay.h - 1 - y) * rowBytes
            var x = 0
            while (x < lay.w) {
              val bch = payload(base + 3 * x) & 0xFF
              val gch = payload(base + 3 * x + 1) & 0xFF
              val rch = payload(base + 3 * x + 2) & 0xFF
              img.setRGB(x, y, (rch << 16) | (gch << 8) | bch)
              x += 1
            }
            y += 1
          }
          (f, img)
      }
    }

  /** Real decode when a reader recognizes the payload — features are
    * raster statistics (dims, aspect, per-channel means, luma) scaled
    * to the stub's [0, ~1] range; otherwise the stub's byte moments.
    * Deterministic either way. */
  def decodeAndFeaturize(payload: Array[Byte], dim: Int): Array[Float] =
    decode(payload) match {
      case Some(img) =>
        val w = img.getWidth; val h = img.getHeight
        val n = w.toLong * h
        val (sr, sg, sb) = channelSums(img)
        val mr = sr.toFloat / n / 255f
        val mg = sg.toFloat / n / 255f
        val mb = sb.toFloat / n / 255f
        val full = Array[Float](
          w / 4096f, h / 4096f, w.toFloat / h, mr, mg, mb,
          0.299f * mr + 0.587f * mg + 0.114f * mb,
          img.getColorModel.getNumColorComponents / 4f)
        java.util.Arrays.copyOf(full, dim)
      case None => MediaCodecStub.decodeAndFeaturize(payload, dim)
    }
}

/** STUB decoder — deterministic fake standing in for the audio/video
  * codecs this environment lacks, and the fallback when no JDK image
  * reader recognizes a payload (real image decode lives in
  * [[MediaCodec]]). Features are byte-histogram moments so tests get
  * stable, meaningful values with zero native dependencies. */
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
