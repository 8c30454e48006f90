package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S12: text → embedding boundary (reference `embed_msmarco.py:116-201`,
  * SentenceTransformer batch encode). Model inference is explicitly out
  * of engine-parity scope (SURVEY §7.5) — this trait pins the pluggable
  * boundary so a real encoder (ONNX/JNI/external service) drops in with
  * the same batched, partition-parallel contract. */
trait Embedder extends Serializable {
  def dim: Int
  /** df with `textCol` → df + `vector array<float>` */
  def embed(df: DataFrame, textCol: String): DataFrame
}

/** Deterministic stand-in: hashed bag-of-words projection (a real, useful
  * baseline embedding — not a placeholder value). Each token hashes to a
  * bucket and a sign; vectors are L2-normalized. */
final case class HashingEmbedder(dim: Int = 64) extends Embedder {
  def embed(df: DataFrame, textCol: String): DataFrame = {
    val d = dim
    val u = udf { (t: String) =>
      val out = new Array[Float](d)
      if (t != null) {
        t.trim.toLowerCase.split("\\s+").foreach { tok =>
          val h = graft.operators.Dedup.splitmix64(tok.hashCode.toLong)
          val b = ((h % d) + d).toInt % d
          out(b) += (if ((h & 1L) == 0L) 1f else -1f)
        }
        var norm = 0.0
        var i = 0
        while (i < d) { norm += out(i).toDouble * out(i); i += 1 }
        val nn = math.sqrt(norm)
        if (nn > 0) { i = 0; while (i < d) { out(i) = (out(i) / nn).toFloat; i += 1 } }
      }
      out
    }
    df.withColumn("vector", u(col(textCol)))
  }
}
