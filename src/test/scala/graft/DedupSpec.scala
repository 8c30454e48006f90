package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Dedup-family semantics beyond plan shape (PlanQualitySpec covers the
  * no-cartesian guarantees): the simhash pigeonhole contract at larger
  * hamming radii, and the embedding near-dup approximate/exact contract. */
class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  /** base texts plus 1-token mutations → a corpus dense in low-hamming
    * fingerprint pairs (the regime the pigeonhole blocking must not miss) */
  private lazy val mutatedDocs = {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron")
    val bases = (0 until 25).map { i =>
      (0 until 12).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val docs = bases.zipWithIndex.flatMap { case (t, i) =>
      val toks = t.split(" ")
      val mutated = toks.updated(rnd.nextInt(toks.length),
        vocab(rnd.nextInt(vocab.size))).mkString(" ")
      Seq((2L * i, t), (2L * i + 1, mutated))
    }
    docs.toDF("doc_id", "text")
  }

  test("simhash pigeonhole holds for maxHamming 3, 8, 11 (exact pair parity)") {
    // brute-force oracle over the same fingerprints
    val fps = mutatedDocs.select(col("doc_id"),
        Dedup.simhash(col("text")).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    for (mh <- Seq(3, 8, 11)) {
      val expected = (for {
        (a, fa) <- fps; (b, fb) <- fps
        if a < b && java.lang.Long.bitCount(fa ^ fb) <= mh
      } yield (a, b)).toSet
      val got = Dedup.simhashDupPairs(mutatedDocs, "doc_id", "text", maxHamming = mh)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected,
        s"maxHamming=$mh: missing=${expected -- got} extra=${got -- expected}")
      // regression guard for the ceil-chunk bug: mh>=8 used to silently
      // drop chunks (mh=11) or key everything to one bucket (mh=8)
      if (mh >= 8) assert(expected.nonEmpty, "test corpus must exercise the radius")
    }
  }

  test("simhash chunking rejects out-of-range radii") {
    intercept[IllegalArgumentException] {
      Dedup.simhashDupPairs(mutatedDocs, "doc_id", "text", maxHamming = 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.simhashDupPairs(mutatedDocs, "doc_id", "text", maxHamming = 64)
    }
  }

  test("lshHashSizeFor scales with threshold and prunes at the requested sim") {
    // monotone: higher similarity thresholds allow longer hashes
    val h5 = Dedup.lshHashSizeFor(0.5, 32)
    val h7 = Dedup.lshHashSizeFor(0.7, 32)
    val h9 = Dedup.lshHashSizeFor(0.9, 32)
    assert(h5 <= h7 && h7 <= h9, s"not monotone: $h5 $h7 $h9")
    // t=0.9 must actually prune (the 3-bit candidate default does not)
    assert(h9 >= 8, s"h(0.9)=$h9 barely prunes")
    // recall arithmetic: miss prob at the threshold stays under target
    for ((t, h) <- Seq((0.5, h5), (0.7, h7), (0.9, h9))) {
      val p = math.pow(1.0 - math.acos(t) / math.Pi, h)
      val miss = math.pow(1.0 - p, 32)
      assert(miss <= 1e-3 + 1e-12, s"t=$t h=$h miss=$miss")
    }
  }

  test("lshHashSizeFor falls back to h=1 when even one plane misses the target") {
    // t=0.3, 4 tables: solving for missProb=1e-3 yields h < 1 — the old
    // clamp-to-2 inflated the realized miss; h=1 is the minimal-miss bucketing
    assert(Dedup.lshHashSizeFor(0.3, 4) == 1)
    // and the normal regime is untouched
    assert(Dedup.lshHashSizeFor(0.9, 32) >= 8)
  }

  test("repeated minhashDupPairs calls retire the previous signature cache") {
    def run(): Unit =
      Dedup.minhashDupPairs(mutatedDocs, "doc_id", "text").count()
    run()
    val first = Dedup.sigCacheSlot.current
    assert(first != null && first.storageLevel.useMemory,
      "first call's signature relation should be cached")
    run()
    val second = Dedup.sigCacheSlot.current
    assert(first.storageLevel.useMemory == false,
      "previous call's cache entry must be unpersisted")
    assert(second.storageLevel.useMemory, "live call's cache entry stays")
  }

  test("connectedComponents ≡ union-find oracle on random graphs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 3) {
      val n = 60
      val edges = (0 until 80).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
        .distinct
      // driver union-find oracle
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> {
          // component = min id within the component among graph nodes
          val r = find(v.toInt)
          edges.flatMap(e => Seq(e._1, e._2)).distinct
            .filter(u => find(u.toInt) == r).min
        }).toMap
      val pairsDf = edges.toDF("a", "b")
      // both physical strategies must agree with the oracle: the driver
      // union-find fast path (default under the edge cap) and the
      // distributed pointer-jumping path (cap 0 forces it)
      val fast = Dedup.connectedComponents(pairsDf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast == expected, s"trial $trial fast: ${fast.toSeq.diff(expected.toSeq)}")
      val dist = Dedup.connectedComponents(pairsDf, driverEdgeCap = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dist == expected, s"trial $trial dist: ${dist.toSeq.diff(expected.toSeq)}")
    }
  }

  test("keepCanonicalPerComponent retains one doc per transitive chain") {
    // chain 1~2, 2~3 (1 and 3 not paired): pairwise b-dropping removes
    // both 2 and 3; cluster-aware retention keeps exactly the min id
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "x"), (9L, "solo"))
      .toDF("doc_id", "text")
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val kept = Dedup.keepCanonicalPerComponent(docs, "doc_id", chain)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 9L), s"kept $kept")
    val labels = Dedup.componentLabels(docs, "doc_id", chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
  }

  test("embeddingDupPairs (approx, auto hashSize) ≡ exact on gate embeddings") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // the synthetic gate embeddings top out near cosine ~0.48 — the
    // threshold must sit inside the populated regime to exercise recall
    val t = 0.45
    val exact = Dedup.embeddingDupPairsExact(e, "vec_id", "embedding", t)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Dedup.embeddingDupPairs(e, "vec_id", "embedding", t)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "gate data should contain near-dup embeddings")
    // seeded and deterministic; at the 1e-3 per-pair miss budget the
    // small gate pair set should reproduce exactly
    assert(approx == exact,
      s"missing=${exact -- approx} extra=${approx -- exact}")
  }

  test("crossDocSpanStats matches hand-computed span sharing") {
    val docs = Seq(
      (1L, "a b c d e f"),       // spans: "a b c d e", "b c d e f"
      (2L, "a b c d e x"),       // spans: "a b c d e", "b c d e x"
      (3L, "z z z z z"),         // 1 unique span, unshared
      (4L, "q w"),               // shorter than n → 0 spans
      (5L, ""),                  // empty → 0 spans
      // within-doc repeats collapse: 11 positional 5-grams, 5 distinct
      (6L, "m n o p q m n o p q m n o p q")
    ).toDF("doc_id", "text")
    val got = Dedup.crossDocSpanStats(docs, "doc_id", "text", n = 5)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == Seq(
      (1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5), (3L, 1L, 0L, 0.0),
      (4L, 0L, 0L, 0.0), (5L, 0L, 0L, 0.0), (6L, 5L, 0L, 0.0)))
    // hashed-span variant (the wide-corpus shuffle shape) agrees exactly
    val hashed = Dedup.crossDocSpanStats(docs, "doc_id", "text", n = 5,
        hashSpans = true)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(hashed == got)
  }

  test("winnowing: shared >= w+n-1 token run guarantees a shared fingerprint") {
    val n = 4; val w = 4
    // docs 1 and 2 share exactly a 7-token run (= w+n-1) inside
    // otherwise-disjoint text; doc 3 shares nothing
    val run = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      (1L, s"one two three $run four five six"),
      (2L, s"seven eight $run nine ten eleven twelve"),
      (3L, "completely different words with no overlap at all here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowDupPairs(docs, "doc_id", "text", n, w,
        minShared = 1, dfCap = 128)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)),
      s"w+n-1 shared run must fingerprint identically, got $pairs")
    // sampling density: ~2/(w+1) of gram positions selected
    val fpCount = Dedup.winnowArray(
      (1 to 500).map(i => s"tok$i").mkString(" "), n, w).length
    assert(fpCount > 100 && fpCount < 300, s"density off: $fpCount/497")
    // short doc (< w grams): exactly one fingerprint, the global min
    val short = Dedup.winnowArray("a b c d e", n, w) // m = 2 grams
    assert(short.length == 1)
    // < n tokens → empty; null-safe
    assert(Dedup.winnowArray("a b c", n, w).isEmpty)
    assert(Dedup.winnowArray(null, n, w).isEmpty)
    // determinism + unsigned-min: selected values are a subset of gram
    // hashes and stable across calls
    val t = "the quick brown fox jumps over the lazy dog again and again"
    assert(Dedup.winnowArray(t, n, w).toSeq == Dedup.winnowArray(t, n, w).toSeq)
  }

  test("semanticDupPairs: k=1 ≡ exact; k-means blocking finds only true pairs") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val t = 0.3
    val exact = Dedup.embeddingDupPairsExact(e, "vec_id", "embedding", t)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // one cluster = no blocking = exactly the all-pairs result
    val k1 = Dedup.semanticDupPairs(e, "vec_id", "embedding",
        numClusters = 1, threshold = t)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(k1 == exact, s"k=1 must equal exact: ${k1.size} vs ${exact.size}")
    // blocked pairs are a SUBSET of the exact pairs (no false positives;
    // misses are the documented cell-boundary cases)
    val k8 = Dedup.semanticDupPairs(e, "vec_id", "embedding",
        numClusters = 8, threshold = t)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(k8.subsetOf(exact), s"blocked pairs invented ${(k8 -- exact).size}")
    assert(k8.nonEmpty, "gate data should contain within-cluster pairs")
    // retention: survivors = all ids minus the b-side of some pair
    val kept = Dedup.semanticDedup(e, "vec_id", "embedding",
        numClusters = 8, threshold = t)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val dropped = k8.map(_._2)
    assert(kept.intersect(dropped).isEmpty && kept.nonEmpty)
  }

  test("semanticDupPairs cluster-size cap: subset semantics, stratification bites") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val t = 0.3
    def pairs(cap: Int): Set[(Long, Long)] =
      Dedup.semanticDupPairs(e, "vec_id", "embedding", numClusters = 8,
          threshold = t, maxClusterSize = cap)
        .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(Int.MaxValue)
    val capped = pairs(16)
    // the guard only ever REMOVES candidate comparisons: capped pairs are
    // a strict subset once the cap is below the largest cluster
    assert(capped.subsetOf(uncapped),
      s"cap invented pairs: ${(capped -- uncapped).size}")
    assert(capped.size < uncapped.size,
      "a 16-row cap under 8 coarse clusters must split something")
    assert(capped.nonEmpty, "within-stratum pairs must survive")
    // deterministic: same seed, same strata, same result
    assert(capped == pairs(16))
  }
}
