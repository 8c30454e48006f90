package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein, SIGIR
  * 1998) — the standard diversified re-ranker for RAG context selection:
  * from a per-query candidate pool, greedily pick
  * `argmax λ·rel(d) − μ·max_{s∈S} sim(d, s)` so later picks are relevant
  * but not redundant with what's already selected.
  *
  * Scale shape: the candidate pool IS the output of the heavy retrieval
  * operator ([[KnnJoin]] / any ANN path) — m ≤ a few dozen rows per
  * query — so the greedy runs per-query-local in one `mapGroups` over a
  * single small shuffle of n_queries·m rows, bounded O(m·dim) state per
  * group, no corpus access. The canonical re-ranker split: retrieval
  * distributed, re-ranking per-query-local.
  *
  * Determinism: relevance and pairwise similarity use the same ascending
  * double cosine chain as [[graft.functions.VecCosineDist]]'s family
  * (dot/(‖a‖·‖b‖), j-ascending accumulation), `max` over selected is
  * order-free, ties break by id, and λ/μ are passed as two explicit
  * literals (computing μ = 1−λ in floating point would not reproduce a
  * 0.3 literal bit-exactly). First pick: max-sim term is 0.0.
  */
object Mmr {

  /** cosine SIMILARITY with the oracle's exact double chain; zero-norm →
    * similarity 0.0 ([[graft.functions.VecCosineDist]]'s convention,
    * dist 1.0 ⇔ sim 0.0) — without the guard a zero vector yields NaN
    * scores and the greedy argmax can never pick anything */
  private def sim(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = a.length
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** Diversify `candidates` (`qid, id` plus query/item vectors joined in)
    * down to `nSelect` per query → `(qid, step, id, score)` in selection
    * order. `candidates`: the retrieval stage's per-query pool with
    * columns (qid, id, qvec, vector). */
  def rerank(candidates: DataFrame, nSelect: Int,
      lam: Double = 0.7, mu: Double = 0.3): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val ds = candidates.select(
      col("qid").cast("long").as("qid"), col("id").cast("long").as("id"),
      col("qvec"), col("vector").as("vec"))
      .as[(Long, Long, Seq[Float], Seq[Float])]
    ds.groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        // sorted by id: a deterministic base order for the greedy scan
        val pool = it.toArray.sortBy(_._2)
        val rel = pool.map(c => sim(c._3, c._4))
        val m = pool.length
        val nSel = math.min(nSelect, m)
        val maxsim = Array.fill(m)(0.0)
        val taken = new Array[Boolean](m)
        var out = Vector.empty[(Long, Int, Long, Double)]
        var step = 0
        while (step < nSel) {
          var best = -1; var bestScore = Double.NegativeInfinity
          var i = 0
          while (i < m) {
            if (!taken(i)) {
              val s = lam * rel(i) - mu * maxsim(i)
              // strict >: ties keep the earlier (smaller-id) candidate
              if (s > bestScore) { bestScore = s; best = i }
            }
            i += 1
          }
          taken(best) = true
          out :+= ((qid, step + 1, pool(best)._2, bestScore))
          // fold the new pick into every remaining candidate's max-sim
          var j = 0
          while (j < m) {
            if (!taken(j)) {
              val sj = sim(pool(j)._4, pool(best)._4)
              if (sj > maxsim(j)) maxsim(j) = sj
            }
            j += 1
          }
          step += 1
        }
        out.iterator
      }(Encoders.product[(Long, Int, Long, Double)])
      .toDF("qid", "step", "id", "score")
  }

  /** Retrieval + MMR in one call: exact cosine top-`m` pool via
    * [[KnnJoin]], vectors joined back, diversified to `nSelect`.
    * The pool (n_queries·m rows) is BROADCAST against the corpus for the
    * vector re-attach — without the hint Catalyst's stats on the
    * aggregate-derived side can pick a sort-merge join that shuffles the
    * corpus, the one thing this operator must never do. */
  def diversifiedTopK(queries: DataFrame, base: DataFrame, m: Int,
      nSelect: Int, lam: Double = 0.7, mu: Double = 0.3): DataFrame = {
    val cand = KnnJoin.knnJoin(queries, base, k = m, metric = "cosine")
      .select(col("qid"), col("id"))
    val pool = base.select(col("id"), col("vector"))
      .join(broadcast(cand), Seq("id"))
      .join(broadcast(queries.select(col("qid"), col("vector").as("qvec"))), Seq("qid"))
    rerank(pool.select(col("qid"), col("id"), col("qvec"), col("vector")),
      nSelect, lam, mu)
  }
}
