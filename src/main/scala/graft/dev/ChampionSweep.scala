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
  *
  * Measured (2026-08-15, 10× corpus: 50k docs / 944 queries, k=5):
  *
  *   wand       13.8 s   EXACT (bit-identical to the relational path)
  *   exact      99.1 s   (relational Σ qf·df scoring join)
  *   champ-8     3.1 s   top5 agreement vs exact 0.029
  *   champ-16    2.7 s   0.054
  *   champ-32    3.1 s   0.102
  *   champ-64    2.8 s   0.168
  *   champ-128   2.9 s   0.266
  *
  * Reading: on THIS corpus (40-word jittered synthetic vocabulary,
  * df(t) ≈ corpus size for every term) champion truncation destroys
  * the exact ranking at any affordable N — the impact distribution is
  * flat, so the top-N cut is near-arbitrary. That is a property of the
  * data, not the operator (real Zipfian corpora concentrate impact);
  * the operational conclusion stands regardless: WAND is the at-scale
  * EXACT operating point (7× under the relational join here, bounded
  * candidates), and champion lists are only for corpora whose impact
  * histograms are verified top-heavy — at an N swept per-corpus, not a
  * universal constant. The text_bm25_champion gate pins truncated
  * SEMANTICS (engine vs oracle), which this sweep does not change.
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
