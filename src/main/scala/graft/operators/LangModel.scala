package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet-style n-gram language-model perplexity scoring — the quality
  * filter large corpus pipelines (CCNet, RedPajama, Dolma) run with a
  * KenLM model: score every document's fluency under a reference LM
  * and keep the low-perplexity head/middle of the distribution. Here
  * the LM is a bigram model with add-alpha smoothing trained
  * relationally on a reference corpus — the model IS two count
  * relations, so training is an explode + partial-combinable groupBy
  * and scoring is an equi-join, both 1000-executor shapes:
  *
  *   - training: bigram occurrences → `(v, w, c_vw)` counts and
  *     context totals `(v, c_v)`; vocabulary size is a one-row
  *     aggregate. All map-side combinable.
  *   - scoring: each document's bigrams LEFT-join the count relations
  *     on their keys (unseen bigrams smooth to alpha mass, so a model
  *     trained on one corpus scores any other); the per-document
  *     negative-log-likelihood accumulates as fixed-point longs
  *     (`round(-ln P · 1e6)`) — associative, partitioning- and
  *     engine-independent, same discipline as [[Bm25]] — with the
  *     per-doc aggregate map-side combinable.
  *
  * Reference corpus and scored corpus may differ (the CCNet shape:
  * Wikipedia-trained LM scoring Common Crawl).
  */
object LangModel {

  /** `(doc_id, v, w)` bigram occurrences WITH multiplicity (unlike
    * [[Dedup.shingles]], which distincts per doc for dedup semantics);
    * docs with fewer than two tokens contribute nothing. */
  def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), Dedup.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("toks"), lit(1), size(col("toks")) - 1).as("v"),
        slice(col("toks"), lit(2), size(col("toks")) - 1).as("w"))).as("bg"))
      .select(col("doc_id"), col("bg.v").as("v"), col("bg.w").as("w"))

  /** Per-document NLL under an add-`alpha` bigram LM trained on
    * `reference`: `(doc_id, n_bigrams, nll_fixed)` where `nll_fixed` is
    * the sum over bigrams of `round(-ln P(w|v) · 1e6)` (divide by
    * `1e6 · n_bigrams` and exponentiate for perplexity — kept as the
    * exact integer so downstream thresholds and cross-engine replays
    * are bit-stable). `P(w|v) = (c_vw + alpha) / (c_v + alpha·V)` with
    * `V` the reference vocabulary size; bigrams and contexts unseen in
    * the reference get the smoothed floor. */
  def nllScore(docs: DataFrame, reference: DataFrame,
      idCol: String, textCol: String, refIdCol: String, refTextCol: String,
      alpha: Double = 0.5): DataFrame = {
    val refBg = bigrams(reference, refIdCol, refTextCol)
    val cvw = refBg.groupBy("v", "w").agg(count(lit(1)).as("c_vw"))
    val cv = refBg.groupBy("v").agg(count(lit(1)).as("c_v"))
    val vocab = reference
      .select(explode(Dedup.tokens(col(refTextCol))).as("t"))
      .agg(countDistinct("t").cast("double").as("vsize"))

    bigrams(docs, idCol, textCol)
      .join(cvw, Seq("v", "w"), "left")
      .join(cv, Seq("v"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("p",
        (coalesce(col("c_vw"), lit(0L)) + lit(alpha)) /
          (coalesce(col("c_v"), lit(0L)) + lit(alpha) * col("vsize")))
      .withColumn("nll_fixed", round(-log(col("p")) * lit(1e6), 0).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("nll_fixed").as("nll_fixed"))
  }

  /** Perplexity view over [[nllScore]]: adds
    * `ppl = exp(nll_fixed / (1e6 · n_bigrams))` for human consumption
    * (thresholding should use the integer columns). */
  def perplexity(docs: DataFrame, reference: DataFrame,
      idCol: String, textCol: String, refIdCol: String, refTextCol: String,
      alpha: Double = 0.5): DataFrame =
    nllScore(docs, reference, idCol, textCol, refIdCol, refTextCol, alpha)
      .withColumn("ppl",
        exp(col("nll_fixed") / (lit(1e6) * col("n_bigrams"))))
}
