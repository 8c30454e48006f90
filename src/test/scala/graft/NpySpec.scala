package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Embedder, HashingEmbedder, Npy}

class NpySpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("S7 npy round trip with positional ids") {
    val dir = java.nio.file.Files.createTempDirectory("npy").toString
    val vs = (0 until 30).map(i => Array(i.toFloat, i * 0.5f, -i.toFloat))
    Npy.write(s"$dir/emb.npy", vs)
    val df = Npy.read(spark, s"$dir/emb.npy")
    assert(df.count() == 30)
    import org.apache.spark.sql.functions.col
    val row7 = df.filter(col("id") === 7).select("vector").as[Seq[Float]].head()
    assert(row7 == Seq(7f, 3.5f, -7f))
  }

  test("S7 npy header parse rejects non-npy") {
    intercept[IllegalArgumentException] {
      Npy.readHeader("not an npy file at all".getBytes)
    }
  }

  test("J2 gram-trick L2 ranks identically to elementwise L2") {
    val (train, testQ, _) = graft.sources.RandomDataset.dataset(
      spark, 128, 8, 8, 1, seed = 55)
    val a = graft.operators.KnnJoin.knnJoin(testQ, train, 5, "l2")
      .select("qid", "rank", "id").as[(Long, Int, Long)].collect().sorted.toSeq
    val b = graft.operators.KnnJoin.knnJoin(testQ, train, 5, "l2_gram")
      .select("qid", "rank", "id").as[(Long, Int, Long)].collect().sorted.toSeq
    assert(a == b)
  }

  test("S12 embedder boundary: deterministic, normalized, similar texts closer") {
    val e: Embedder = HashingEmbedder(32)
    val docs = Seq((0L, "spark catalyst engine"), (1L, "spark catalyst optimizer"),
      (2L, "completely different words entirely")).toDF("id", "text")
    val out = e.embed(docs, "text").select("id", "vector")
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    def cos(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    assert(math.abs(out(0)._2.map(x => x.toDouble * x).sum - 1.0) < 1e-6)
    assert(cos(out(0)._2, out(1)._2) > cos(out(0)._2, out(2)._2))
  }
}
