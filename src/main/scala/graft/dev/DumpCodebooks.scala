package graft.dev

import org.apache.spark.sql.SparkSession

/** dev aid: print the seeded PQ codebooks of the gate config
  * (16 subspaces x 64 centroids, seed=42 over sf0.01 embeddings) as SQL
  * list literals. */
object DumpCodebooks {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val b = graft.Tables.embBase(spark, "/root/testdata/sf0.01")
    val art = graft.operators.PqIndexer(numSubspaces = 16, numCentroids = 64,
      seed = 42).build(b)
    val rows = art.aux("codebooks")
      .select("subspace", "centroid", "vector").collect()
      .sortBy(r => (r.getInt(0), r.getInt(1)))
    val sb = new StringBuilder
    rows.foreach { r =>
      val lst = r.getSeq[Float](2).map(_.toString).mkString("[", ",", "]")
      sb.append(s"(${r.getInt(0)}, ${r.getInt(1)}, $lst::REAL[]),\n")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/codebooks.sql"), sb.toString)
    println("wrote /tmp/codebooks.sql " + sb.length)
    spark.stop()
  }
}
