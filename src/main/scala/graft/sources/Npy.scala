package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** S7: `.npy` embedding-matrix ingestion (reference
  * `_process_msmarco_preembedded` npy branch, dataset.py:966-1108).
  * NPY v1/v2 header parse (public format spec) → (id, vector) DataFrame;
  * the reference's memmap concern disappears once converted to parquet
  * (SURVEY S7: "parquet scan is already out-of-core").
  *
  * Supports the shapes the reference uses: 2-D float32/float64 arrays,
  * C-order, little-endian.
  */
object Npy {

  final case class Header(dtype: String, fortranOrder: Boolean, shape: Seq[Int])

  def readHeader(bytes: Array[Byte]): (Header, Int) = {
    require(bytes.length > 10 &&
      bytes(0) == 0x93.toByte && new String(bytes, 1, 5) == "NUMPY",
      "not an NPY file")
    val major = bytes(6)
    val (headerLen, dataStart) =
      if (major == 1) {
        val l = ByteBuffer.wrap(bytes, 8, 2).order(ByteOrder.LITTLE_ENDIAN)
          .getShort.toInt & 0xFFFF
        (l, 10 + l)
      } else {
        val l = ByteBuffer.wrap(bytes, 8, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
        (l, 12 + l)
      }
    val header = new String(bytes, dataStart - headerLen, headerLen)
    def extract(re: String): String =
      re.r.findFirstMatchIn(header).map(_.group(1)).getOrElse(
        throw new IllegalArgumentException(s"bad npy header: $header"))
    val dtype = extract("'descr':\\s*'([^']+)'")
    val fortran = extract("'fortran_order':\\s*(True|False)") == "True"
    val shape = extract("'shape':\\s*\\(([^)]*)\\)")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq
    (Header(dtype, fortran, shape), dataStart)
  }

  /** read a 2-D float .npy into (id long, vector array<float>), ids =
    * row positions (the reference's positional convention) */
  def read(spark: SparkSession, path: String): DataFrame = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val (h, dataStart) = readHeader(bytes)
    require(h.shape.length == 2, s"expected 2-D array, got shape ${h.shape}")
    require(!h.fortranOrder, "fortran-order npy not supported")
    val Seq(n, dim) = h.shape
    val bb = ByteBuffer.wrap(bytes, dataStart, bytes.length - dataStart)
      .order(ByteOrder.LITTLE_ENDIAN)
    val rows = (0 until n).map { i =>
      val v = new Array[Float](dim)
      var j = 0
      h.dtype match {
        case "<f4" => while (j < dim) { v(j) = bb.getFloat; j += 1 }
        case "<f8" => while (j < dim) { v(j) = bb.getDouble.toFloat; j += 1 }
        case other => throw new IllegalArgumentException(s"unsupported dtype $other")
      }
      Row(i.toLong, v)
    }
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("vector", ArrayType(FloatType, containsNull = false), nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.length / 65536)),
      schema)
  }

  /** write the canonical 2-D float32 npy (round-trip/testing/interop) */
  def write(path: String, vectors: Seq[Array[Float]]): Unit = {
    val n = vectors.length
    val dim = if (n == 0) 0 else vectors.head.length
    val headerBody = s"{'descr': '<f4', 'fortran_order': False, 'shape': ($n, $dim), }"
    val padded = headerBody + " " * ((64 - (10 + headerBody.length + 1) % 64) % 64) + "\n"
    val bb = ByteBuffer.allocate(10 + padded.length + n * dim * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0x93.toByte).put("NUMPY".getBytes).put(1.toByte).put(0.toByte)
    bb.putShort(padded.length.toShort)
    bb.put(padded.getBytes)
    vectors.foreach(_.foreach(bb.putFloat))
    Files.write(Paths.get(path), bb.array())
  }
}
