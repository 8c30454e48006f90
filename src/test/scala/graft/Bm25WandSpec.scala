package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bm25

/** Block-max WAND exact BM25: contracted bit-identical to the exact
  * relational path ([[Bm25.searchTopK]]) — same fixed-point scores,
  * same (score desc, doc_id asc) tie-break — at every block size and
  * partitioning. */
class Bm25WandSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def exact(docs: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, k: Int) =
    Bm25.searchTopK(docs, queries, "id", "text", "qid", "qtext", k = k)
      .select("query_id", "doc_id", "rank", "score")
      .as[(Long, Long, Int, Double)].collect().sortBy(r => (r._1, r._3)).toSeq

  private def wand(docs: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame, k: Int, blockSize: Int) =
    Bm25.searchTopKWand(docs, queries, "id", "text", "qid", "qtext", k = k,
        blockSize = blockSize)
      .select("query_id", "doc_id", "rank", "score")
      .as[(Long, Long, Int, Double)].collect().sortBy(r => (r._1, r._3)).toSeq

  test("tiny corpus: WAND ≡ exact, including scores and tie order") {
    val corpus = Seq(
      (1L, "the quick brown fox"),
      (2L, "the lazy dog"),
      (3L, "quick quick quick fox"),
      (4L, "dog eats dog food"),
      // 5 and 6 are byte-identical → identical scores for any query:
      // the tie must resolve by doc_id asc on both paths
      (5L, "brown dog fox"),
      (6L, "brown dog fox")).toDF("id", "text")
    val queries = Seq((10L, "quick fox"), (20L, "dog"), (30L, "brown fox dog"),
      (40L, "absent_term"), (50L, "absent_term dog")).toDF("qid", "qtext")
    for (bs <- Seq(1, 2, 64))
      assert(wand(corpus, queries, k = 3, blockSize = bs) ==
        exact(corpus, queries, k = 3), s"blockSize=$bs")
  }

  test("randomized skewed corpus: WAND ≡ exact across block sizes and k") {
    // Zipf-ish vocabulary (a few stopword-like terms shared by most docs
    // + a long tail) — the regime WAND's pruning and the tie-heavy
    // fixed-point scores stress hardest
    val rnd = new scala.util.Random(42)
    val common = Vector("alpha", "beta", "gamma")
    val rare = (0 until 40).map(i => s"w$i").toVector
    val docs = (0L until 300L).map { i =>
      val n = 2 + rnd.nextInt(9)
      val toks = (0 until n).map { _ =>
        if (rnd.nextInt(10) < 6) common(rnd.nextInt(common.size))
        else rare(rnd.nextInt(rare.size))
      }
      (i, toks.mkString(" "))
    }.toDF("id", "text")
    val queries = (0L until 25L).map { i =>
      val n = 1 + rnd.nextInt(4)
      (1000L + i, (0 until n).map { _ =>
        if (rnd.nextBoolean()) common(rnd.nextInt(common.size))
        else rare(rnd.nextInt(rare.size))
      }.mkString(" "))
    }.toDF("qid", "qtext")
    for (bs <- Seq(1, 3, 64); k <- Seq(1, 5)) {
      assert(wand(docs, queries, k = k, blockSize = bs) ==
        exact(docs, queries, k = k), s"blockSize=$bs k=$k")
    }
  }

  test("documents table: WAND ≡ exact and partitioning-invariant") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .selectExpr("doc_id as id", "text", "source")
    val queries = docs.filter($"id" % 23 === 0)
      .selectExpr("id as qid", "substring(text, 1, 200) as qtext")
    val e = exact(docs, queries, k = 5)
    assert(e.nonEmpty)
    assert(wand(docs, queries, k = 5, blockSize = 64) == e)
    // doc-side partitioning must not change anything (each doc's
    // postings are re-co-located by the WAND shuffle)
    assert(wand(docs.repartition(7, $"source"), queries, k = 5,
      blockSize = 64) == e)
  }

  test("searchFromIndexWand over-cap branch: chunked serve over the " +
      "full index ≡ under-cap vocab-literal serve") {
    // the over-cap serve branch (no vocab isin literal — it would be a
    // million-entry In — full postings/df table scans feeding WAND's own
    // chunked route) was exercised by no gate until r14: every serve
    // gate stays under the cap. Pin its equivalence by serving the SAME
    // batch twice, cap high then forced low, and requiring bit-identical
    // results (ranks AND fixed-point scores).
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .selectExpr("doc_id as id", "text")
    val queries = docs.filter($"id" % 23 === 0)
      .selectExpr("id as qid", "substring(text, 1, 200) as qtext")
    val key = "graft.bm25.serveBatchCap"
    val old = sys.props.get(key)
    try {
      Bm25.buildIndex(docs, "id", "text", "wandix_cap", buckets = 4)
      def serve() = Bm25.searchFromIndexWand(
          spark, "wandix_cap", queries, "qid", "qtext", k = 5)
        .select("query_id", "doc_id", "rank", "score")
        .as[(Long, Long, Int, Double)].collect()
        .sortBy(r => (r._1, r._3)).toSeq
      val underCap = serve()
      assert(underCap.nonEmpty)
      sys.props(key) = "200" // ~22 queries × ~30 terms → several chunks
      assert(serve() == underCap,
        "over-cap index serve must union to the under-cap answers")
    } finally {
      old match {
        case Some(v) => sys.props(key) = v
        case None => sys.props -= key
      }
      Seq("wandix_cap_postings", "wandix_cap_df", "wandix_cap_stats")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("over-cap query batch chunks query-disjoint: exact union, never the relational join") {
    // the 100× pass caught the original over-cap fallback silently
    // re-materializing the relational Σ qf·df candidates (the precise
    // spill blow-up WAND exists to remove) — over-cap batches must now
    // CHUNK and union, bit-identical to the uncapped run
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .selectExpr("doc_id as id", "text")
    val queries = docs.filter($"id" % 23 === 0)
      .selectExpr("id as qid", "substring(text, 1, 200) as qtext")
    val key = "graft.bm25.serveBatchCap"
    val old = sys.props.get(key)
    val uncapped = wand(docs, queries, k = 5, blockSize = 64)
    try {
      sys.props(key) = "200" // ~22 queries × ~30 terms → ~4 chunks
      assert(wand(docs, queries, k = 5, blockSize = 64) == uncapped)
      // a SINGLE query wider than the cap is the one degenerate shape
      // that still routes relationally — results must stay exact
      val wide = Seq((99L, (0 until 60).map(i => s"tok$i").mkString(" ")))
        .toDF("qid", "qtext")
      val corpus = Seq((1L, "tok1 tok2 tok3"), (2L, "tok4 tok5"),
        (3L, "tok1 tok59")).toDF("id", "text")
      sys.props(key) = "10"
      assert(wand(corpus, wide, k = 2, blockSize = 64) ==
        exact(corpus, wide, k = 2))
    } finally old match {
      case Some(v) => sys.props(key) = v
      case None => sys.props -= key
    }
  }
}
