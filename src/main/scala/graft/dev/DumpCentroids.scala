package graft.dev

import org.apache.spark.sql.SparkSession

/** dev aid: print seeded IVF coarse centroids as SQL list literals for
  * hash-model oracle blocks. args: [nlist=16] — gate configs: 16 for the
  * j8 probes, 8 for dedup_semantic. */
object DumpCentroids {
  def main(args: Array[String]): Unit = {
    val nlist = if (args.length > 0) args(0).toInt else 16
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val b = graft.Tables.embBase(spark, "/root/testdata/sf0.01")
    val art = graft.operators.IvfIndexer(nlist = nlist, seed = 42).build(b)
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
