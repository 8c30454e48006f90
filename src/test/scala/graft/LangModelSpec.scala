package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LangModel

/** Hand-computed add-alpha bigram LM scores. */
class LangModelSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private val corpus = Seq((1L, "a b a"), (2L, "b a")).toDF("id", "text")

  test("bigrams carry multiplicity and positions") {
    val bg = LangModel.bigrams(corpus, "id", "text")
      .as[(Long, String, String)].collect().sorted.toSeq
    assert(bg == Seq((1L, "a", "b"), (1L, "b", "a"), (2L, "b", "a")))
  }

  test("nll matches hand-computed smoothed bigram probabilities") {
    // counts: c(a,b)=1 c(b,a)=2; contexts: c(a)=1 c(b)=2; V=2, alpha=0.5
    // P(b|a) = 1.5/2   -> -ln = 0.28768207... -> 287682
    // P(a|b) = 2.5/3   -> -ln = 0.18232155... -> 182322
    val r = LangModel.nllScore(corpus, corpus, "id", "text", "id", "text")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(r == Seq((1L, 2L, 287682L + 182322L), (2L, 1L, 182322L)))
  }

  test("unseen bigrams/contexts get the smoothed floor, not a crash") {
    val novel = Seq((9L, "z q")).toDF("id", "text")
    // c_vw=0, c_v=0: P = 0.5/(0.5*2) = 0.5 -> -ln = 0.693147... -> 693147
    val r = LangModel.nllScore(novel, corpus, "id", "text", "id", "text")
      .as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((9L, 1L, 693147L)))
    // perplexity view: exp(0.693147) ~ 2.0 (uniform over V=2)
    val ppl = LangModel.perplexity(novel, corpus, "id", "text", "id", "text")
      .select("ppl").as[Double].head()
    assert(math.abs(ppl - 2.0) < 1e-4)
  }

  test("reference-corpus scoring is partitioning-invariant") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def run(d: org.apache.spark.sql.DataFrame) =
      LangModel.nllScore(d, d, "doc_id", "text", "doc_id", "text")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val a = run(docs)
    assert(a.nonEmpty && a.forall(_._3 > 0))
    assert(a == run(docs.repartition(11, $"lang")))
  }
}
