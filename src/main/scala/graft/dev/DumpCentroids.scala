package graft.dev

import org.apache.spark.sql.SparkSession

/** dev aid: print the seeded IVF coarse centroids of the gate config
  * (nlist=16, seed=42 over sf0.01 embeddings) as SQL list literals. */
object DumpCentroids {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val b = graft.Tables.embBase(spark, "/root/testdata/sf0.01")
    val art = graft.operators.IvfIndexer(nlist = 16, seed = 42).build(b)
    val rows = art.aux("centroids")
      .select("centroid_id", "vector").collect()
      .sortBy(_.getInt(0))
    val sb = new StringBuilder
    rows.foreach { r =>
      val lst = r.getSeq[Float](1).map(_.toString).mkString("[", ",", "]")
      sb.append(s"(${r.getInt(0)}, $lst::REAL[]),\n")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/centroids.sql"), sb.toString)
    println("wrote /tmp/centroids.sql " + sb.length)
    spark.stop()
  }
}
