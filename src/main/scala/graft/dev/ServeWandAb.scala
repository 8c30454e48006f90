package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Bm25

/** A/B of the persisted-index BM25 serve path: relational Σ qf·df
  * scoring join ([[Bm25.searchFromIndex]]) vs the block-max WAND kernel
  * over the same term-pruned index relations
  * ([[Bm25.searchFromIndexWand]]) — VERDICT r12 stretch #7. Results are
  * contracted bit-identical (asserted here per rep), so this measures
  * pure serving cost. Interleaved min-of-N.
  *
  * Usage: runMain graft.dev.ServeWandAb [dir=/tmp/sfbig] [reps=5]
  */
object ServeWandAb {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/sfbig")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet").cache()
    docs.count()
    val queries = docs.filter(col("doc_id") % 53 === 0)
      .select(col("doc_id").as("qid"),
        substring(col("text"), 1, 200).as("qtext")).cache()
    val nq = queries.count()
    val table = "serve_wand_ab_idx"
    Bm25.ensureIndex(docs, "doc_id", "text", table, buckets = 8)
    println(s"[servewand] $dir: ${docs.count()} docs, $nq queries, index ready")

    def relational(): Array[org.apache.spark.sql.Row] =
      Bm25.searchFromIndex(spark, table, queries, "qid", "qtext", k = 5)
        .select("query_id", "doc_id", "rank").orderBy("query_id", "rank")
        .collect()
    def wand(): Array[org.apache.spark.sql.Row] =
      Bm25.searchFromIndexWand(spark, table, queries, "qid", "qtext", k = 5)
        .select("query_id", "doc_id", "rank").orderBy("query_id", "rank")
        .collect()

    // equality check once (bit-identical contract), then timing passes
    val a = relational(); val b = wand()
    require(a.length == b.length && a.indices.forall(i => a(i) == b(i)),
      s"serve WAND diverged from relational: ${a.length} vs ${b.length} rows")
    println(s"[servewand] equality: ${a.length} rows identical")

    var bestR = Double.MaxValue; var bestW = Double.MaxValue
    (1 to reps).foreach { r =>
      def t(f: () => Array[org.apache.spark.sql.Row]): Double = {
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      val (tr, tw) =
        if (r % 2 == 1) { val x = t(relational _); val y = t(wand _); (x, y) }
        else { val y = t(wand _); val x = t(relational _); (x, y) }
      bestR = math.min(bestR, tr); bestW = math.min(bestW, tw)
      println(f"[servewand] rep $r: relational=$tr%6.2f s  wand=$tw%6.2f s")
    }
    println(f"[servewand] BEST relational=$bestR%6.2f s  wand=$bestW%6.2f s  " +
      f"speedup=${bestR / bestW}%4.2f×")
    spark.stop()
  }
}
