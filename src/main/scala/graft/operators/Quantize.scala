package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 8-bit scalar quantization (reference: FAISS `SQ8` via
  * `configs/benchmark_config.yaml:36-60`, glue modular.py:277-286).
  *
  * Build: per-dimension min/max over the base set (a per-partition
  * float-array fold + driver merge — see [[Sq8Model.fitBounds]]), then
  * each vector encoded to one byte per dimension. 4× memory reduction,
  * matching FAISS SQ8's role; codes live in a `binary` column.
  *
  * Search: asymmetric — the query stays float, base vectors are
  * dequantized inside the distance kernel. No rerank (the reference's SQ8
  * is approximate-by-construction; recall < 1 expected).
  */
final case class Sq8Indexer() extends Indexer {
  val kind = "sq8"

  def build(base: DataFrame): IndexArtifact = {
    val (lo, hi) = Sq8Model.fitBounds(base)
    val model = Sq8Model(lo, hi)
    val spark = base.sparkSession
    import spark.implicits._
    // boxing-free encode (see IvfIndexer.build note)
    val data = base
      .select(col("id").cast("long").as("id"), col("vector"))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (i, v) => (i, model.encode(v)) })
      .toDF("id", "codes")
    IndexArtifact(kind, data,
      meta = Map(
        "lo" -> lo.mkString(","),
        "hi" -> hi.mkString(",")))
  }
}

final case class Sq8Searcher(metric: String) extends Searcher
    with QueryBroadcastLifecycle {
  def search(artifact: IndexArtifact, queries: DataFrame, k: Int): DataFrame = {
    beginSearch()
    val lo = artifact.meta("lo").split(",").map(_.toFloat)
    val hi = artifact.meta("hi").split(",").map(_.toFloat)
    // query vectors indexed by qidx: driver-held for the LocalScan path,
    // one broadcast for the partition-buffered query-major scan
    // (see AdcScan / PqSearcher note)
    val spark = artifact.data.sparkSession
    val (qids, qVecs) = LocalScan.queryVecsAlways(queries)
    val localTable = LocalScan.codeTable(artifact.data, ivf = false)
    val mode = Sq8Model.mode(metric)
    // ONE inline scorer on both paths (see IvfSq8Searcher): shared
    // query-independent deq table + j-block-tiled scoreChunk replaced
    // the per-query (q−x)² LUT formulation (Sq8Model.luts)
    val scorer: AdcScan.Scorer =
      new AdcScan.Sq8Scorer(
        trackLut(spark, localTable.isDefined, qVecs), lo, hi, mode)
    localTable match {
      case Some(ct) => LocalScan.scanCodesFull(spark, ct, qids, k, scorer)
      case None => AdcScan.searchTopK(artifact.data, qids, k, scorer)
    }
  }
}

object Sq8Model {
  /** scan-kernel metric mode: 0 = L2, 1 = IP, 2 = cosine */
  def mode(metric: String): Int =
    if (metric == "cosine" || metric == "angular") 2
    else if (metric == "ip" || metric == "dot") 1
    else 0

  /** Per-query SQ8 distance LUT, flattened dim×256 doubles:
    * lut[i·256 + c] = (qᵢ − dequant(i, c))² for L2 (mode 0) or
    * −qᵢ·dequant(i, c) for IP (mode 1). The dequantized value per
    * (dim, code) is query-independent, so scoring collapses to the PQ
    * ADC shape (pure lookup-adds via [[AdcScan.PqLutScorer]], dim
    * "subspaces" of one element each) — element-for-element the same
    * double arithmetic as [[AdcScan.Sq8Scorer]]'s inline dequant
    * (IEEE negation and identical accumulation order), so results are
    * bit-identical; LocalScanSpec asserts this against the distributed
    * path, which keeps the inline scorer (a dim×256-per-query LUT
    * broadcast would be ~200 MB at 384-d × 256 queries — fine in driver
    * memory, wasteful on the wire). Cosine (mode 2) needs three
    * accumulators and stays on the inline scorer. */
  def luts(qVecs: Array[Array[Float]], lo: Array[Float], hi: Array[Float],
      mode: Int): Array[Array[Double]] = {
    val dim = lo.length
    val out = new Array[Array[Double]](qVecs.length)
    java.util.stream.IntStream.range(0, qVecs.length).parallel().forEach { qi =>
      val q = qVecs(qi)
      val lut = new Array[Double](dim * 256)
      var i = 0
      while (i < dim) {
        val span = hi(i) - lo(i)
        val qq = q(i).toDouble
        var c = 0
        while (c < 256) {
          val x = lo(i) + (c / 255.0) * span
          lut(i * 256 + c) =
            if (mode == 1) -(qq * x)
            else { val d = qq - x; d * d }
          c += 1
        }
        i += 1
      }
      out(qi) = lut
    }
    out
  }

  /** per-dimension (min, max) in ONE pass: a per-partition float-array
    * fold + driver merge. The former posexplode → groupBy(pos) plan
    * shuffled n·dim scalar rows (38M at 100k × 384-d) to aggregate dim
    * of them; min/max are order-independent, so the fold is exact. */
  def fitBounds(base: DataFrame): (Array[Float], Array[Float]) = {
    val parts = base.select(col("vector")).rdd.mapPartitions { it =>
      var lo: Array[Float] = null
      var hi: Array[Float] = null
      it.foreach { r =>
        val v = r.getSeq[Float](0)
        if (lo == null) {
          lo = v.toArray; hi = v.toArray
        } else {
          var i = 0
          while (i < lo.length) {
            val x = v(i)
            if (x < lo(i)) lo(i) = x
            if (x > hi(i)) hi(i) = x
            i += 1
          }
        }
      }
      if (lo == null) Iterator.empty else Iterator.single((lo, hi))
    }.collect()
    require(parts.nonEmpty, "sq8: empty base relation")
    val (lo, hi) = parts.head
    parts.tail.foreach { case (l, h) =>
      var i = 0
      while (i < lo.length) {
        if (l(i) < lo(i)) lo(i) = l(i)
        if (h(i) > hi(i)) hi(i) = h(i)
        i += 1
      }
    }
    (lo, hi)
  }
}

final case class Sq8Model(lo: Array[Float], hi: Array[Float]) extends Serializable {
  /** primitive encode (consumed by the boxing-free mapPartitions builds) */
  def encode(v: Array[Float]): Array[Byte] = {
    val out = new Array[Byte](v.length)
    var i = 0
    while (i < out.length) {
      val span = hi(i) - lo(i)
      val t = if (span <= 0f) 0.0 else (v(i) - lo(i)).toDouble / span
      val c = math.max(0, math.min(255, math.round(t * 255).toInt))
      out(i) = (c - 128).toByte
      i += 1
    }
    out
  }

}
