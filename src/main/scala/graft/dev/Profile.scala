package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** scratch profiling main (dev aid, not part of the driver contract) */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val docs = Tables.load(spark, dir, "documents")

    val withSig = docs
      .select(col("doc_id").cast("long").as("id"),
        Dedup.shingleHashes(col("text"), 3).as("sh"))
      .withColumn("sig", Dedup.minhashSignatureFromHashes(col("sh"), 16, 42))
      .cache()
    time("shingle+sig materialize") { withSig.count() }

    val banded = withSig.select(
      col("id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => concat_ws("_", lit("b"), b.cast("string"),
          concat_ws(",", slice(col("sig"), b * 4 + 1, lit(4))))))
        .as(Seq("band", "key")))
      .select(col("id"), col("sh"), col("key"))
    time("banded count") { banded.count() }

    val pairsRaw = banded.as("l").join(banded.as("r"),
        col("l.key") === col("r.key") && col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"),
        col("l.sh").as("sha"), col("r.sh").as("shb"))
    time("collision pairs count") { println("  pairs=" + pairsRaw.count()) }

    val dd = pairsRaw.dropDuplicates("a", "b")
    time("dropDuplicates count") { println("  dd=" + dd.count()) }

    val jac = dd.select(col("a"), col("b"),
      (size(array_intersect(col("sha"), col("shb"))).cast("double") /
        size(array_union(col("sha"), col("shb")))).as("jaccard"))
      .filter(col("jaccard") >= 0.7)
    time("jaccard verify") { println("  dups=" + jac.count()) }

    // ---- jaccard similarity join stages
    val t = docs.select(col("doc_id").cast("long").as("id"),
      col("lang").as("block"),
      array_distinct(Dedup.tokens(col("text"))).as("toks"))
      .withColumn("n", size(col("toks"))).cache()
    time("tokens materialize") { t.count() }
    val posting = t.select(col("id"), col("block"), col("n"),
      explode(col("toks")).as("tok"))
    time("posting count") { println("  posting=" + posting.count()) }
    val inter = posting.as("l").join(posting.as("r"),
        col("l.block") === col("r.block") && col("l.tok") === col("r.tok") &&
          col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("a"), col("r.id").as("b"))
      .agg(count(lit(1)).as("inter"),
        first(col("l.n")).as("na"), first(col("r.n")).as("nb"))
    time("inverted join+agg") { println("  pairs=" + inter.count()) }

    spark.stop()
  }
}
