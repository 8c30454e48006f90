package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion (RRF, Cormack et al. SIGIR
  * 2009) of independently ranked retrieval arms — the standard way
  * production search stacks combine lexical BM25 with dense-vector kNN
  * for RAG / training-data retrieval.
  *
  * `rrf(d) = Σ_arms 1 / (k0 + rank_arm(d))` over the arms that retrieved
  * `d` at all; documents surfacing in several arms accumulate, documents
  * deep in one arm still contribute. `k0 = 60` is the paper's constant.
  *
  * Scale shape: each arm is already a per-query top-k relation (≤
  * n_queries·k rows — the arms do the 100 TB heavy lifting with their own
  * operators: [[Bm25]] never reshuffles the corpus, [[KnnJoin]] scans the
  * base once), so fusion is one small shuffle over
  * O(n_queries · k · n_arms) rows, INDEPENDENT of corpus size, followed
  * by the bounded-heap top-k. Adding an arm adds a union branch, not a
  * corpus pass.
  *
  * Determinism: contributions are fixed-point longs
  * (`round(1e12 / (k0+rank))`) so the fused score is an associative
  * integer sum — identical under any partitioning / engine, same device
  * as [[Bm25]]'s fixed-point scoring. Final order is (score desc, id asc).
  */
object Hybrid {

  val ScoreScale = 1e12

  /** Fuse ranked arms, each a relation `(qid: long-castable,
    * id: long-castable, rank: 1-based int)`, into the per-query RRF top-k:
    * `(qid, rank, id, rrf)` with `rrf` the fused score rounded to 6
    * decimals (ranked on the raw fixed-point sum, not the rounded alias).
    */
  def rrfFuse(arms: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame =
    rrfFuseWeighted(arms.map(_ -> 1.0), k, k0)

  /** Weighted RRF: `rrf(d) = Σ_arms w_a / (k0 + rank_a(d))` — the common
    * production knob when one arm is known stronger (e.g. 0.75 lexical /
    * 0.25 dense for keyword-heavy corpora). The weight folds into the
    * fixed-point contribution BEFORE rounding (`round(w·S/(k0+rank))`),
    * so the fused score stays an associative integer sum — identical
    * under any partitioning, and w_a = 1 reproduces [[rrfFuse]]'s
    * contributions bit-exactly. Prefer binary-exact weights (0.5, 0.75,
    * 0.25…) when an external replay must reproduce `w·S` exactly.
    * Same scale shape as unweighted: fusion shuffles
    * O(n_queries·k·n_arms) rows, corpus-size-independent. */
  def rrfFuseWeighted(arms: Seq[(DataFrame, Double)], k: Int,
      k0: Int = 60): DataFrame = {
    require(arms.nonEmpty, "rrfFuse needs at least one arm")
    require(arms.forall(_._2 >= 0.0), "rrf arm weights must be >= 0")
    val contribs = arms.map { case (a, w) =>
      a.select(
        col("qid").cast("long").as("qid"),
        col("id").cast("long").as("id"),
        round(lit(w * ScoreScale) / (lit(k0.toDouble) + col("rank").cast("double")), 0)
          .cast("long").as("__c"))
    }.reduce(_ union _)
    val fused = contribs
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("__c")).as("__f"))
    // bounded-heap top-k on the negated fixed score: (dist asc, id asc)
    // == (score desc, id asc); |f| ≤ n_arms·1.7e10 is double-exact
    KnnJoin.topKExploded(
        fused.select(col("qid"), col("id"), negate(col("__f")).cast("double").as("__d")),
        col("id"), col("__d"), k)
      .select(col("qid"), col("rank"), col("id"),
        round(negate(col("dist")) / lit(ScoreScale), 6).as("rrf"))
  }
}
