package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mmr

/** MMR diversified re-ranking semantics. */
class MmrSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  private def sim(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("matches the local greedy trajectory on random data") {
    val base = graft.sources.RandomDataset.vectors(spark, n = 150, dim = 8, seed = 41)
    val q = base.filter($"id" % 50 === 0).select($"id".as("qid"), $"vector")
    val got = Mmr.diversifiedTopK(q, base, m = 12, nSelect = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap

    val vecs = base.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val queries = vecs.filter(_._1 % 50 == 0)
    for ((qid, qv) <- queries) {
      // pool: top-12 by (1 - sim, id) — VecCosineDist's exact chain
      val pool = vecs.map { case (id, v) => (id, v, sim(qv, v)) }
        .sortBy { case (id, _, s) => (1 - s, id) }.take(12).sortBy(_._1)
      val rel = pool.map(_._3)
      val taken = Array.fill(pool.length)(false)
      val maxsim = Array.fill(pool.length)(0.0)
      var expect = Vector.empty[(Long, Int, Long, Double)]
      for (step <- 1 to 6) {
        var best = -1; var bs = Double.NegativeInfinity
        for (i <- pool.indices if !taken(i)) {
          val s = 0.7 * rel(i) - 0.3 * maxsim(i)
          if (s > bs) { bs = s; best = i }
        }
        taken(best) = true
        expect :+= ((qid, step, pool(best)._1, bs))
        for (j <- pool.indices if !taken(j)) {
          val sj = sim(pool(j)._2, pool(best)._2)
          if (sj > maxsim(j)) maxsim(j) = sj
        }
      }
      assert(got(qid) === expect, s"qid=$qid")
    }
  }

  test("near-duplicates are demoted below a diverse candidate") {
    // a and a2 nearly identical and most relevant; b diverse. Pure
    // relevance orders (a, a2, b); diversity-heavy MMR picks b second.
    val qv = Seq(1f, 0f, 0f)
    val pool = Seq(
      (0L, 10L, qv, Seq(1f, 0.05f, 0f)), // a
      (0L, 11L, qv, Seq(1f, 0.06f, 0f)), // a2 (near-dup of a)
      (0L, 12L, qv, Seq(0.9f, 0f, 0.6f)) // b (diverse)
    ).toDF("qid", "id", "qvec", "vector")
    val order = Mmr.rerank(pool, nSelect = 3, lam = 0.3, mu = 0.7)
      .orderBy("step").collect().map(_.getLong(2)).toSeq
    assert(order === Seq(10L, 12L, 11L))
  }

  test("zero-norm vectors score 0 similarity instead of poisoning the greedy") {
    val qv = Seq(1f, 0f)
    val pool = Seq(
      (0L, 1L, qv, Seq(1f, 0.1f)),
      (0L, 2L, qv, Seq(0f, 0f)), // zero vector: rel 0, sim-to-anything 0
      (0L, 3L, qv, Seq(0.8f, 0.4f))
    ).toDF("qid", "id", "qvec", "vector")
    val got = Mmr.rerank(pool, nSelect = 3).orderBy("step").collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    // all three emitted (no crash), the zero vector ranked last
    assert(got.length == 3 && got.last._2 == 2L)
  }
}
