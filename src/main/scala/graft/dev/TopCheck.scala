package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.Tables
object TopCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = Tables.load(spark, dir, "embeddings")
      val lsh = Dedup.embeddingDupPairsCandidates(e, "vec_id", "embedding")
        .orderBy(col("cosine").desc, col("a"), col("b")).limit(20)
        .select(col("a"), col("b"), round(col("cosine"), 6).as("cosine")).collect()
      val t = e.select(col("vec_id").cast("long").as("id"), col("embedding").as("v"))
      val sim = lit(1.0) - graft.functions.VectorFunctions.cosine_dist(col("l.v"), col("r.v"))
      val exact = t.as("l").join(t.as("r"), col("l.id") < col("r.id"))
        .select(col("l.id").as("a"), col("r.id").as("b"), sim.as("cosine"))
        .orderBy(col("cosine").desc, col("a"), col("b")).limit(20)
        .select(col("a"), col("b"), round(col("cosine"), 6).as("cosine")).collect()
      val same = lsh.map(_.toSeq).toSeq == exact.map(_.toSeq).toSeq
      println(s"[topcheck] $dir match=$same")
      if (!same) {
        println("lsh:   " + lsh.map(_.toSeq).mkString(" "))
        println("exact: " + exact.map(_.toSeq).mkString(" "))
      }
    }
    spark.stop()
  }
}
