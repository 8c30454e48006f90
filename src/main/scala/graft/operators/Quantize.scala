package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 8-bit scalar quantization (reference: FAISS `SQ8` via
  * `configs/benchmark_config.yaml:36-60`, glue modular.py:277-286).
  *
  * Build: per-dimension min/max over the base set (posexplode →
  * groupBy(pos) — a single shuffle of dim-sized cardinality), then each
  * vector encoded to one byte per dimension. 4× memory reduction, matching
  * FAISS SQ8's role; codes live in a `binary` column.
  *
  * Search: asymmetric — the query stays float, base vectors are
  * dequantized inside the distance kernel. No rerank (the reference's SQ8
  * is approximate-by-construction; recall < 1 expected).
  */
final case class Sq8Indexer() extends Indexer {
  val kind = "sq8"

  def build(base: DataFrame): IndexArtifact = {
    // per-dim min/max: tiny aggregate (dim rows), collected to the driver
    val stats = base
      .select(posexplode(col("vector")).as(Seq("pos", "x")))
      .groupBy("pos").agg(min("x").as("lo"), max("x").as("hi"))
      .orderBy("pos")
      .collect()
    val lo = stats.map(_.getAs[Float]("lo"))
    val hi = stats.map(_.getAs[Float]("hi"))
    val codes = Sq8Model(lo, hi).encodeUdf()
    val data = base.select(
      col("id").cast("long").as("id"),
      codes(col("vector")).as("codes"))
    IndexArtifact(kind, data,
      meta = Map(
        "lo" -> lo.mkString(","),
        "hi" -> hi.mkString(",")))
  }
}

final case class Sq8Searcher(metric: String) extends Searcher
    with QueryBroadcastLifecycle {
  def search(artifact: IndexArtifact, queries: DataFrame, k: Int): DataFrame = {
    val lo = artifact.meta("lo").split(",").map(_.toFloat)
    val hi = artifact.meta("hi").split(",").map(_.toFloat)
    // query vectors ship in the scoring closure keyed by qid — only
    // (qid, codes) cross the row boundary (see PqSearcher note)
    val spark = artifact.data.sparkSession
    val model = Sq8Model(lo, hi)
    val dist = model.distByQidUdf(
      trackBroadcast(spark, model.collectQueries(queries)), metric)
    import spark.implicits._
    val q = queries.select(col("qid").cast("long").as("qid")).as[Long]
      .collect().sorted.toSeq.toDF("qid")
    val scored = artifact.data
      .crossJoin(broadcast(q))
      .select(col("qid"), col("id"),
        dist(col("qid"), col("codes")).as("__dist"))
    KnnJoin.topKExploded(scored, col("id"), col("__dist"), k)
  }
}

final case class Sq8Model(lo: Array[Float], hi: Array[Float]) extends Serializable {
  def encodeUdf(): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val l = lo; val h = hi
    udf { (v: Seq[Float]) =>
      val out = new Array[Byte](v.length)
      var i = 0
      while (i < out.length) {
        val span = h(i) - l(i)
        val t = if (span <= 0f) 0.0 else (v(i) - l(i)).toDouble / span
        val c = math.max(0, math.min(255, math.round(t * 255).toInt))
        out(i) = (c - 128).toByte
        i += 1
      }
      out
    }
  }

  /** collected (qid → vector) map for [[distByQidUdf]]'s broadcast */
  def collectQueries(queries: org.apache.spark.sql.DataFrame): Map[Long, Array[Float]] =
    queries.select(col("qid").cast("long"), col("vector")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  /** asymmetric distance keyed by qid: query vectors collected once on
    * the driver, shipped as a broadcast (NOT captured in the closure —
    * that would serialize them into every task binary); per row only
    * (qid, codes) deserialize. The caller passes the broadcast and owns
    * its lifecycle (see QueryBroadcastLifecycle). */
  def distByQidUdf(bc: org.apache.spark.broadcast.Broadcast[Map[Long, Array[Float]]],
      metric: String)
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val l = lo; val h = hi
    val cosine = metric == "cosine" || metric == "angular"
    val ip = metric == "ip" || metric == "dot"
    udf { (qid: Long, codes: Array[Byte]) =>
      val q = bc.value(qid)
      var acc = 0.0; var dot = 0.0; var nq = 0.0; var nb = 0.0
      var i = 0
      while (i < codes.length) {
        val c = (codes(i) + 128) / 255.0
        val x = l(i) + c * (h(i) - l(i))
        val qq = q(i).toDouble
        if (cosine) { dot += qq * x; nq += qq * qq; nb += x * x }
        else if (ip) { dot += qq * x }
        else { val d = qq - x; acc += d * d }
        i += 1
      }
      if (cosine) {
        val den = math.sqrt(nq) * math.sqrt(nb)
        if (den == 0.0) 1.0 else 1.0 - dot / den
      } else if (ip) -dot
      else math.sqrt(acc)
    }
  }
}
