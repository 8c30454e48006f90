package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** one-off: dump signatures + band keys for two docs (r9 off-by-one) */
object MinhashSigDebug {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ids = args.lift(1).getOrElse("1290,3624").split(",").map(_.toLong)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup
    val docs = graft.Tables.load(spark, dir, "documents")
      .filter(col("doc_id").isin(ids: _*))
    val withSig = docs
      .select(col("doc_id").cast("long").as("id"),
        Dedup.shingleHashes(col("text"), 3).as("sh"))
      .withColumn("sig", Dedup.minhashSignatureFromHashes(col("sh"), 16, 42))
    withSig.select(col("id"), col("sh"), col("sig")).collect().foreach { r =>
      println(s"id=${r.getLong(0)}")
      println("  sh= " + r.getSeq[Long](1).mkString(","))
      println("  sig=" + r.getSeq[Long](2).mkString(","))
    }
    spark.stop()
  }
}
