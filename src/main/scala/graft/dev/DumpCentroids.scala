package graft.dev

import org.apache.spark.sql.SparkSession

/** dev aid: print seeded IVF coarse centroids as SQL list literals for
  * hash-model oracle blocks. args: [nlist=16] [subset: all|even] — gate
  * configs: 16/all for the j8 probes, 8/all for dedup_semantic, 16/even
  * for j8_ivf_append (trained on the even ids, append arrives after). */
object DumpCentroids {
  def main(args: Array[String]): Unit = {
    val nlist = if (args.length > 0) args(0).toInt else 16
    val subset = if (args.length > 1) args(1) else "all"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = graft.Tables.embBase(spark, "/root/testdata/sf0.01")
    val b = if (subset == "even")
      all.filter(org.apache.spark.sql.functions.col("id") % 2 === 0)
    else all
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
