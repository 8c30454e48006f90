package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Bm25

/** Champion-list operating-point sweep (r11 VERDICT stretch #7): the
  * `text_bm25_champion` gate pins championListSize=32 — a constant
  * chosen for the gate, not measured. This probe runs the 10×-scaled
  * documents corpus (the scale where champion lists become the
  * at-scale scoring path) and reports, per N:
  *
  *   - top-5 agreement vs the EXACT ranking (fraction of (query, rank)
  *     cells identical to exact — the serving-quality metric),
  *   - wall seconds for the scoring pass.
  *
  * Baselines: the WAND path gives the exact answer at bounded
  * candidates, so champion lists only matter when even WAND's
  * per-partition DAAT is too hot (e.g. stream-serving) — the sweep
  * quantifies what N buys.
  *
  * Usage: runMain graft.dev.ChampionSweep [dir=/tmp/sfbig] [Ns=8,16,32,64,128]
  */
object ChampionSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/sfbig")
    val ns = args.lift(1).getOrElse("8,16,32,64,128").split(",").map(_.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "12")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet").cache()
    docs.count()
    val queries = docs.filter(col("doc_id") % 53 === 0)
      .select(col("doc_id").as("qid"),
        substring(col("text"), 1, 200).as("qtext")).cache()
    val nq = queries.count()
    println(s"[champ] $dir: ${docs.count()} docs, $nq queries")

    def run(champ: Option[Int], label: String) = {
      val t0 = System.nanoTime()
      val res = Bm25.searchTopK(docs, queries, "doc_id", "text",
          "qid", "qtext", k = 5, championListSize = champ)
        .select("query_id", "doc_id", "rank").cache()
      val n = res.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[champ] $label%-10s rows=$n%-8d ${secs}%6.1f s")
      (res, secs)
    }
    // WAND (exact, bounded candidates) as the time reference
    val tw0 = System.nanoTime()
    val wand = Bm25.searchTopKWand(docs, queries, "doc_id", "text",
      "qid", "qtext", k = 5).select("query_id", "doc_id", "rank").cache()
    val nWand = wand.count()
    println(f"[champ] wand       rows=$nWand%-8d ${(System.nanoTime()-tw0)/1e9}%6.1f s  (exact)")

    val (exact, _) = run(None, "exact")
    for (n <- ns) {
      val (res, _) = run(Some(n), s"champ-$n")
      val agree = res.join(exact,
        Seq("query_id", "doc_id", "rank"), "left_semi").count()
      println(f"[champ]   N=$n%-4d top5 agreement=${agree.toDouble / math.max(1, exact.count())}%.4f")
      res.unpersist()
    }
    spark.stop()
  }
}
