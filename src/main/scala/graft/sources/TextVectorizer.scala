package graft.sources

import org.apache.spark.ml.feature.{HashingTF, IDF, NGram, RegexTokenizer}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S9: TF-IDF text vectorization (reference `_process_msmarco_tfidf`,
  * dataset.py:668-856 — sklearn TfidfVectorizer(max_features,
  * ngram_range=(1,2))) re-expressed as the idiomatic spark.ml pipeline:
  * RegexTokenizer → unigram+bigram union → HashingTF(numFeatures) → IDF.
  *
  * Differences from sklearn (documented, SURVEY S9): hashing-trick
  * vocabulary instead of a fitted top-max_features vocabulary (no global
  * vocab state to collect — the scalable choice), and smoothed IDF
  * matching Spark's formula. Semantic parity: same pipeline shape,
  * deterministic, dense float32 vectors out.
  */
object TextVectorizer {

  final case class Model(
      idf: org.apache.spark.ml.feature.IDFModel, numFeatures: Int)

  /** fit on a corpus; `textCol` → fitted model */
  def fit(corpus: DataFrame, textCol: String, numFeatures: Int = 1024): Model = {
    val tf = termFrequencies(corpus, textCol, numFeatures)
    val idf = new IDF().setInputCol("__tf").setOutputCol("__tfidf")
    Model(idf.fit(tf), numFeatures)
  }

  /** transform any table with `textCol` into (…, vector array<float>) */
  def transform(df: DataFrame, textCol: String, model: Model): DataFrame = {
    val tf = termFrequencies(df, textCol, model.numFeatures)
    model.idf.transform(tf)
      .withColumn("vector",
        vector_to_array(col("__tfidf")).cast("array<float>"))
      .drop("__tf", "__tfidf", "__toks", "__bigrams", "__terms")
  }

  private def termFrequencies(df: DataFrame, textCol: String,
      numFeatures: Int): DataFrame = {
    val tokenizer = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol("__toks")
      .setPattern("\\W+").setToLowercase(true)
    val toks = tokenizer.transform(df)
    val bigrams = new NGram().setN(2)
      .setInputCol("__toks").setOutputCol("__bigrams")
      .transform(toks)
      // ngram_range=(1,2): unigrams ∪ bigrams
      .withColumn("__terms", concat(col("__toks"), col("__bigrams")))
    new HashingTF().setInputCol("__terms").setOutputCol("__tf")
      .setNumFeatures(numFeatures)
      .transform(bigrams)
  }
}
