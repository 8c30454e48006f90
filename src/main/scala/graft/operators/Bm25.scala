package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Okapi BM25 full-text retrieval as relational operators — the lexical
  * complement to the vector-search family (the reference engine is
  * vector-only; a training-data pipeline needs lexical retrieval for
  * eval-set leakage hunts, hard-negative mining and quality audits,
  * where near-verbatim overlap beats embedding similarity).
  *
  * Everything is DataFrame logic over an inverted index kept AS a
  * relation:
  *
  *   - `postings` — explode + partial-combinable groupBy; at scale this
  *     is the classic build-the-inverted-index shuffle on (doc, term),
  *     paid once and reusable (write it bucketed by term and scoring
  *     joins are co-located — see [[graft.sources.Bucketing]]).
  *   - corpus statistics (N, avgdl) are a one-row aggregate broadcast
  *     into the scoring expression; document frequencies join against
  *     the tiny query-term relation FIRST, so the full `df` table never
  *     rides along — only the ≤|query terms| rows that matter.
  *   - scoring joins the postings to the broadcast query-term relation
  *     on `term` (the corpus-sized side is never reshuffled), then one
  *     groupBy (query, doc) whose width is bounded by actual matches.
  *   - per-query top-k is the rank-filter window form: on Spark 4
  *     Catalyst rewrites it to a Partial `WindowGroupLimit`, so each map
  *     partition forwards at most k rows per query before the exchange
  *     (measured in dev/DomainCapProbe.scala for the same shape).
  *
  * Cross-engine determinism AND aggregate speed come from the same
  * choice: each per-term contribution is rounded to a fixed-point long
  * (`round(s · 1e6)`) before summing. Long addition is associative, so
  * the per-(query, doc) score is independent of partitioning, shuffle
  * order and engine — no ordered fold, no per-group arrays — and the
  * aggregate is a plain codegen'd `sum(long)` with map-side partial
  * combine (an earlier `collect_list` + sorted-fold formulation was
  * engine-stable too, but shuffled every term row into per-group
  * arrays and ran the fold through interpreted higher-order functions
  * — ~40× slower at 44M score rows). Ranking compares the fixed longs
  * with doc id as the tiebreak; 1e-6 score resolution means docs
  * closer than that tie and resolve by id, identically everywhere.
  * Tokenization is the corpus-wide convention:
  * `split(trim(lower(text)), "\s+")` ([[Dedup.tokens]]).
  */
object Bm25 {

  /** Inverted-index postings relation `(doc_id, term, tf, dl)` — term
    * frequency per (document, term) with the document's token length
    * carried on every posting (denormalized so scoring needs no second
    * join back to a doc-length table). */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    postingsOf(docLengths(docs, idCol, textCol))

  private def postingsOf(dls: DataFrame): DataFrame =
    dls.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term", "dl")
      .agg(count(lit(1)).as("tf"))

  /** `(doc_id, dl, toks)` — tokenized docs with token count; the scan
    * both `postings` and the corpus statistics derive from. Tokenize is
    * CPU-bound per row, so the scan parallelism is floored (r14, see
    * [[Par]]). */
  private def docLengths(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Par.fanText(docs, col(idCol))
      .select(col(idCol).as("doc_id"), Dedup.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")))

  // the tokenized-docs relation feeds BOTH the corpus stats aggregate and
  // the postings build: cached once per search call (retiring the previous
  // call's entry, same discipline as Dedup's slots) the corpus text is
  // tokenized ONCE per call instead of once per consumer (r14; before,
  // searchTopK* tokenized the corpus twice — stats + postings)
  private[operators] val dlsCacheSlot = new Dedup.CacheSlot
  private[operators] val postCacheSlot = new Dedup.CacheSlot

  /** BM25 top-k search: `queries (qIdCol, qTextCol)` against
    * `docs (idCol, textCol)`; returns
    * `(query_id, doc_id, rank, score)` with `rank` 1-based per query,
    * ordered by (score desc, doc_id asc), at most `k` rows per query.
    *
    * `k1`/`b` are the standard Robertson parameters; idf is the
    * Lucene-style `ln(1 + (N - df + 0.5)/(df + 0.5))` (never negative).
    * Query term frequency is ignored (distinct query terms), the common
    * retrieval simplification. */
  def searchTopK(docs: DataFrame, queries: DataFrame,
      idCol: String, textCol: String, qIdCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      championListSize: Option[Int] = None,
      championRescore: Boolean = false): DataFrame = {
    // one-row corpus stats from the CACHED pre-explode scan (no postings
    // shuffle, no second tokenize pass — r14)
    val dls = dlsCacheSlot.track(docLengths(docs, idCol, textCol).cache())
    val stats = dls
      .agg(count(lit(1)).cast("double").as("n_docs"),
        avg("dl").as("avgdl"))
    // the postings relation feeds TWO consumers (the df aggregate and the
    // scoring join); without a persist each branch re-runs the explode +
    // groupBy shuffle from scratch. Spill-safe MEMORY_AND_DISK;
    // session cache-clear (or the caller) reclaims it. The repeated-batch
    // path avoids the issue structurally — buildIndex materializes the
    // postings once as a bucketed table.
    searchTopKOverPostings(
      postCacheSlot.track(postingsOf(dls).cache()), stats,
      queries, qIdCol, qTextCol, k, k1, b,
      championListSize = championListSize,
      championRescore = championRescore)
  }

  /** Scoring over a prebuilt `(doc_id, term, tf, dl)` postings relation
    * and a one-row `(n_docs, avgdl)` stats relation — the 100 TB path:
    * materialize `postings` once (bucketed by `term`, see
    * [[graft.sources.Bucketing]] / [[buildIndex]]) and serve every query
    * batch from it without re-tokenizing the corpus; `searchTopK`
    * derives both inline for the one-shot case.
    *
    * `prebuiltDf`: an optional `(term, df)` relation persisted with the
    * index ([[buildIndex]]). When present, serving never aggregates the
    * postings at all — df rows for the query terms come from a
    * term-keyed lookup join. When absent, df is computed from the
    * postings, but ONLY after a broadcast semi-join against the query
    * vocabulary: aggregating first and joining after would shuffle the
    * full term dictionary per batch — at 100 TB that full-corpus
    * aggregate would dominate a 5-term query's cost. */
  def searchTopKOverPostings(post: DataFrame, stats: DataFrame,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      prebuiltDf: Option[DataFrame] = None,
      championListSize: Option[Int] = None,
      championRescore: Boolean = false): DataFrame =
    scoreQTerms(post, stats, qtermsOf(queries, qIdCol, qTextCol),
      k, k1, b, prebuiltDf, championListSize, championRescore)

  /** `(query_id, term)` — the distinct query-term relation scoring joins
    * against. */
  private def qtermsOf(queries: DataFrame, qIdCol: String,
      qTextCol: String): DataFrame =
    queries.select(col(qIdCol).as("query_id"),
      explode(array_distinct(Dedup.tokens(col(qTextCol)))).as("term"))

  private def scoreQTerms(post: DataFrame, stats: DataFrame,
      qterms: DataFrame, k: Int, k1: Double, b: Double,
      prebuiltDf: Option[DataFrame],
      championListSize: Option[Int] = None,
      championRescore: Boolean = false): DataFrame = {
    // per-term document frequency, restricted to the query vocabulary
    // BEFORE the aggregate: the semi-join keeps only postings of query
    // terms (a broadcast filter — the corpus side never moves), so the
    // groupBy aggregates ≤ |matching postings| rows instead of the whole
    // term dictionary. df values for surviving terms are identical.
    val df = prebuiltDf.getOrElse {
      val qvocab = qterms.select("term").distinct()
      post.join(broadcast(qvocab), Seq("term"), "left_semi")
        .groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    }
    // per-TERM idf/avgdl relation (≤ query vocabulary rows). The scoring
    // contribution s = f(idf(term), tf, dl, avgdl) does not depend on the
    // query at all, so it is computed once per matching POSTING below and
    // the query fan-out joins in afterwards — Σ_t qf(t)·df(t) joined rows
    // carry a precomputed long instead of each paying the double chain +
    // BigDecimal HALF_UP round (r14; identical doubles per posting ⇒
    // identical fixed-point longs ⇒ identical results, oracle-verified)
    val tdf = df.crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .select("term", "idf", "avgdl")

    // Champion lists (Manning/Raghavan/Schütze §7.1.3): the scoring
    // join's candidate space is Σ_t qf(t)·df(t) — a stopword term shared
    // by q queries and n docs alone contributes q·n rows, which is what
    // overflowed local disk at the 100× pass (9.4k queries × 500k docs).
    // Truncating each term's postings to its top-N by the QUERY-
    // INDEPENDENT impact tf/(tf + k1·(1−b+b·dl/avgdl)) — monotone in the
    // term's BM25 contribution, since idf is constant per term — bounds
    // the candidate space to Σ_t qf(t)·min(df(t), N). df/idf stay the
    // EXACT corpus statistics (truncation applies to scoring candidates
    // only). The rank-filter window compiles to a Partial
    // WindowGroupLimit, so each map partition forwards ≤ N rows per term
    // before the exchange. None = exact scoring (the gate path).
    val champPost = championListSize.map { n =>
      val qvocab = qterms.select("term").distinct()
      post.join(broadcast(qvocab), Seq("term"), "left_semi")
        .crossJoin(broadcast(stats.select("avgdl")))
        .withColumn("imp",
          col("tf") / (col("tf") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
        // fixed-point BEFORE ranking (same rationale as score_fixed):
        // an ulp difference in avgdl between engines must not flip a
        // champion near-tie — 1e-9 resolution absorbs it, ties resolve
        // by doc_id identically everywhere
        .withColumn("imp_fixed", round(col("imp") * lit(1e9), 0).cast("long"))
        .withColumn("crank", row_number().over(Window.partitionBy("term")
          .orderBy(col("imp_fixed").desc, col("doc_id"))))
        .filter(col("crank") <= n)
        .select("doc_id", "term", "tf", "dl")
    }
    val postScoring = champPost.getOrElse(post)

    def scoreExpr(df0: DataFrame): DataFrame = df0
      .withColumn("s",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      // fixed-point: associative long sum (see object scaladoc)
      .withColumn("s_fixed", round(col("s") * lit(1e6), 0).cast("long"))

    // Champion lists as CANDIDATE GENERATION (MRS §7.1.3's actual use),
    // not truncated scoring: the champion traversal proposes (query,
    // doc) pairs — Σ_t qf(t)·min(df(t), N) of them — and each candidate
    // is then rescored with its FULL term overlap against the query, so
    // a candidate's score is its exact BM25 (only docs outside every
    // query term's champion list can be missed). At scale the rescore
    // join touches only candidate docs' postings (a semi-join on the
    // candidate doc set), never Σ qf·df. Truncated scoring (rescore
    // off) keeps the r11 gate semantics: each term contributes only its
    // champion entries, so tail contributions are lost and top-5
    // agreement collapses on heavy-tailed queries (dev/ChampionSweep:
    // ≤0.22 even on the Zipf corpus).
    // s_fixed per posting FIRST (tiny broadcast term join), query fan-out
    // joins the slim (query_id, term) relation after — see tdf note above
    val scored = champPost match {
      case Some(cp) if championRescore =>
        val cand = cp.join(broadcast(qterms), Seq("term"))
          .select("query_id", "doc_id").distinct()
        val candDocs = cand.select("doc_id").distinct()
        scoreExpr(post.join(candDocs, Seq("doc_id"), "left_semi")
            .join(broadcast(tdf), "term"))
          .join(broadcast(qterms), Seq("term"))
          .join(cand, Seq("query_id", "doc_id"), "left_semi")
      case _ => scoreExpr(postScoring.join(broadcast(tdf), "term"))
        .join(broadcast(qterms), Seq("term"))
    }

    val agg = scored.groupBy("query_id", "doc_id")
      .agg(sum("s_fixed").as("score_fixed"))

    agg
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("score_fixed").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"),
        (col("score_fixed") / lit(1e6)).as("score"))
  }

  // ------------------------------------------------------- block-max WAND

  /** The per-posting fixed-point BM25 contribution, replicating the
    * relational path's expression tree OPERATION FOR OPERATION so the
    * WAND path's longs are bit-identical to the exact path's:
    * Catalyst evaluates
    * `idf * (tf * (k1+1)) / (tf + k1 * ((1-b) + (b * dl) / avgdl))`
    * in IEEE double with exactly this association, then
    * `round(s * 1e6, 0)` via `java.math.BigDecimal.valueOf` HALF_UP
    * (RoundBase's DoubleType codegen), then a double→long cast. */
  private[operators] def contribFixed(idf: Double, tf: Long, dl: Int,
      avgdl: Double, k1: Double, b: Double): Long = {
    val s = idf * (tf.toDouble * (k1 + 1.0)) /
      (tf.toDouble + k1 * ((1.0 - b) + (b * dl.toDouble) / avgdl))
    java.math.BigDecimal.valueOf(s * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
  }

  /** EXACT BM25 top-k via distributed block-max WAND ([[WandKernel]]) —
    * same results as [[searchTopK]] (bit-identical scores, same
    * (score desc, doc_id asc) tie-break), but the candidate space never
    * materializes: the exact relational path's scoring join emits
    * Σ_t qf(t)·df(t) rows before aggregating (the 100× pass's one local
    * spill overflow), while this path shuffles the query-vocab postings
    * ONCE (hash-partitioned by doc so every doc's terms are co-located),
    * then each partition answers every query document-at-a-time with
    * threshold pruning and forwards at most k rows per (partition,
    * query) to the global top-k — P·nq·k rows total, df-independent.
    *
    * Scale shape: work parallelism is across doc partitions (each task
    * runs all queries over its local docs, θ-pruned); the query batch is
    * driver-collected and broadcast (capped at [[serveBatchCap]] —
    * above it, the batch is CHUNKED query-disjoint and each chunk runs
    * WAND, an exact union; only a single degenerate corpus-shaped
    * "query" wider than the cap itself routes to the relational join).
    * doc ids must be castable to long (the DAAT cursors and the
    * tie-break order compare longs). */
  def searchTopKWand(docs: DataFrame, queries: DataFrame,
      idCol: String, textCol: String, qIdCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      blockSize: Int = 64): DataFrame = {
    // tokenize once, cached: stats and postings share the scan (r14)
    val dls = dlsCacheSlot.track(docLengths(docs, idCol, textCol).cache())
    val stats = dls
      .agg(count(lit(1)).cast("double").as("n_docs"), avg("dl").as("avgdl"))
    // postings feeds the df aggregate AND the scoring scan (same reuse
    // rationale as searchTopK's cache)
    searchWandOverPostings(postCacheSlot.track(postingsOf(dls).cache()), stats,
      queries, qIdCol, qTextCol, k, k1, b)
  }

  /** [[searchTopKWand]] over a prebuilt postings/stats/df layout (the
    * [[buildIndex]] serving shape). */
  def searchWandOverPostings(post: DataFrame, stats: DataFrame,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      prebuiltDf: Option[DataFrame] = None,
      blockSize: Int = 64,
      precollectedQt: Option[Array[org.apache.spark.sql.Row]] = None)
      : DataFrame = {
    val spark = post.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val qt = qtermsOf(queries, qIdCol, qTextCol)
    // a caller that already collected the (query_id, term) batch for its
    // own cap/vocab decision (searchFromIndexWand) passes it through —
    // one driver job and one tokenization pass per serve batch, the same
    // reuse discipline searchFromIndex documents for the relational path
    val qtRows = precollectedQt.getOrElse(qt.limit(serveBatchCap + 1).collect())
    if (qtRows.length > serveBatchCap) {
      // Over-cap query batch: CHUNK it, never fall back to the
      // relational scoring join. WAND is per-query independent, so a
      // query-disjoint split unions to the exact same result, each
      // chunk's driver footprint stays under the cap, and the df/idf
      // values are unchanged (they are per-term corpus statistics —
      // the chunk only narrows WHICH terms are looked up). The 100×
      // pass caught the original fallback re-materializing the exact
      // path's Σ qf·df candidates and overflowing local disk — the
      // precise failure WAND exists to remove (found r12).
      val nQueries = queries.select(col(qIdCol)).distinct()
        .limit(serveBatchCap + 1).count()
      if (nQueries <= 1)
        // a SINGLE query wider than the cap cannot chunk further —
        // corpus-shaped "query" text; the relational join is the
        // honest plan for that degenerate shape
        return scoreQTerms(post, stats, qt, k, k1, b, prebuiltDf)
      val qtCount = qt.count()
      // fan-out bounded per level (a 1000-chunk flat union nests the
      // plan past analyzer stack depth); a still-over-cap chunk simply
      // re-chunks on re-entry, so coverage is unchanged at log depth
      val nChunks = math.min(32L, math.max(2L,
        (qtCount + serveBatchCap - 1) / serveBatchCap)).toInt
      return (0 until nChunks).map { i =>
        searchWandOverPostings(post, stats,
          queries.filter(pmod(hash(col(qIdCol)), lit(nChunks)) === i),
          qIdCol, qTextCol, k, k1, b, prebuiltDf, blockSize)
      }.reduce(_ unionByName _)
    }

    // per-term idf over the query vocabulary, computed by the SAME Spark
    // expressions as the exact path (collected, so the doubles entering
    // contribFixed are bit-identical to what the relational plan feeds
    // its scoring expression). avgdl rides along on every row (it comes
    // from the same one-row stats crossJoin the idf needs anyway), so the
    // corpus stats and the idf map land in ONE driver job instead of two
    // (r14 — per WAND call, and the hybrid gates make three such calls)
    val vocab = qtRows.map(_.getString(1)).distinct.toSeq
    import spark.implicits._
    val qvocabDf = vocab.toDF("term")
    val dfRel = prebuiltDf
      .map(_.join(broadcast(qvocabDf), Seq("term"), "left_semi"))
      .getOrElse(post.join(broadcast(qvocabDf), Seq("term"), "left_semi")
        .groupBy("term").agg(count(lit(1)).cast("double").as("df")))
    val idfRows = dfRel.crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .select("term", "idf", "avgdl").collect()
    val idfMap: Map[String, Double] =
      idfRows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    // empty vocab ⇒ no postings match ⇒ avgdl is never read by a kernel
    val avgdl =
      if (idfRows.nonEmpty) idfRows(0).getDouble(2)
      else stats.collect()(0).getAs[Double]("avgdl")

    // dense query index (the DAAT tasks and the local-top-k rows carry an
    // int, not the caller's id type; the original ids join back at the
    // end from a broadcast-small map)
    val qidsBuf = scala.collection.mutable.ArrayBuffer.empty[Any]
    val qTermsBuf = scala.collection.mutable.ArrayBuffer.empty[scala.collection.mutable.ArrayBuffer[String]]
    val qIdx = scala.collection.mutable.HashMap.empty[Any, Int]
    qtRows.foreach { r =>
      val id = r.get(0)
      val i = qIdx.getOrElseUpdate(id, {
        qidsBuf += id
        qTermsBuf += scala.collection.mutable.ArrayBuffer.empty[String]
        qidsBuf.length - 1
      })
      // only terms that exist in the corpus can contribute
      if (idfMap.contains(r.getString(1))) qTermsBuf(i) += r.getString(1)
    }
    val qTerms: Array[Array[String]] = qTermsBuf.map(_.toArray).toArray
    val bcTerms = spark.sparkContext.broadcast(qTerms)
    val bcIdf = spark.sparkContext.broadcast(idfMap)
    val bsz = blockSize

    // query-vocab postings, ONE shuffle: co-locate each doc's postings,
    // term-major doc-ascending within the partition so the per-term
    // arrays build in a single streaming pass
    val slim = post.join(broadcast(qvocabDf), Seq("term"), "left_semi")
      .select(col("term"),
        col("doc_id").cast("long").as("doc_id"),
        col("tf").cast("long").as("tf"),
        col("dl").cast("int").as("dl"))
      .repartition(col("doc_id"))
      .sortWithinPartitions("term", "doc_id")

    val local = slim.mapPartitions { it =>
      val idf = bcIdf.value
      val lists = new java.util.HashMap[String, WandPostings]()
      var curTerm: String = null
      var curIdf = 0.0
      val idsB = scala.collection.mutable.ArrayBuilder.make[Long]
      val cbB = scala.collection.mutable.ArrayBuilder.make[Long]
      def flush(): Unit = if (curTerm != null) {
        lists.put(curTerm, WandPostings(idsB.result(), cbB.result(), bsz))
        idsB.clear(); cbB.clear()
      }
      it.foreach { r =>
        val t = r.getString(0)
        if (t != curTerm) { flush(); curTerm = t; curIdf = idf(t) }
        idsB += r.getLong(1)
        cbB += contribFixed(curIdf, r.getLong(2), r.getInt(3), avgdl, k1, b)
      }
      flush()
      val qts = bcTerms.value
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
      var qi = 0
      while (qi < qts.length) {
        val terms = qts(qi)
        var present = 0
        val pls = new Array[WandPostings](terms.length)
        var ti = 0
        while (ti < terms.length) {
          val pl = lists.get(terms(ti))
          if (pl != null) { pls(present) = pl; present += 1 }
          ti += 1
        }
        if (present > 0) {
          val q = qi // stable capture for the emit closure
          WandKernel.run(java.util.Arrays.copyOf(pls, present), k,
            (docId, sc) => out += ((q, docId, sc)))
        }
        qi += 1
      }
      out.iterator
    }.toDF("qidx", "doc_id", "score_fixed")

    // original query ids join back from a broadcast-small local relation
    val qidField = qt.schema.head
    val qidRows: java.util.List[Row] = java.util.Arrays.asList(
      qidsBuf.zipWithIndex.map { case (v, i) => Row(i, v) }.toSeq: _*)
    val qidDf = spark.createDataFrame(qidRows, StructType(Seq(
      StructField("qidx", IntegerType, nullable = false),
      StructField("query_id", qidField.dataType, qidField.nullable))))

    local
      .withColumn("rank", row_number().over(Window.partitionBy("qidx")
        .orderBy(col("score_fixed").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .join(broadcast(qidDf), "qidx")
      .select(col("query_id"), col("doc_id"), col("rank"),
        (col("score_fixed") / lit(1e6)).as("score"))
  }

  /** Persist the inverted index for repeated serving: postings bucketed
    * by `term` (the scoring join's key — co-located, exchange-free
    * reads), `(term, df)` document frequencies, and the one-row
    * `(n_docs, avgdl)` stats — each as a managed table under
    * `<table>_postings` / `_df` / `_stats`. The postings shuffle and the
    * full-dictionary df aggregate are paid ONCE here; serving
    * ([[searchFromIndex]]) touches only the postings and df rows of the
    * batch's query terms. */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String,
      table: String, buckets: Int = 32): Unit = {
    val spark = docs.sparkSession
    val post = postings(docs, idCol, textCol)
    graft.sources.Bucketing.writeBucketed(post, s"${table}_postings",
      "term", buckets)
    // df from the already-bucketed postings: the groupBy("term") plans
    // exchange-free on the bucketed layout
    graft.sources.Bucketing.dropWithLocation(spark, s"${table}_df")
    spark.table(s"${table}_postings")
      .groupBy("term").agg(count(lit(1)).cast("double").as("df"))
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_df")
    graft.sources.Bucketing.dropWithLocation(spark, s"${table}_stats")
    docLengths(docs, idCol, textCol)
      .agg(count(lit(1)).cast("double").as("n_docs"), avg("dl").as("avgdl"))
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_stats")
  }

  /** [[buildIndex]] exactly once per index name: a no-op when the three
    * index tables already sit in the catalog. The caller owns keying the
    * name by input CONTENT identity, not just a path — managed tables
    * outlive the JVM, so a name that doesn't change when the corpus at
    * the same path changes would silently serve a stale index (the gate
    * folds a file-count/bytes/mtime fingerprint of the corpus into the
    * name for exactly this reason). This is the fixture path that lets a
    * repeated-serving bench time serving without re-paying the one-time
    * build. */
  def ensureIndex(docs: DataFrame, idCol: String, textCol: String,
      table: String, buckets: Int = 32): Unit = {
    val cat = docs.sparkSession.catalog
    val ready = Seq("_postings", "_df", "_stats")
      .forall(sfx => cat.tableExists(table + sfx))
    if (!ready) buildIndex(docs, idCol, textCol, table, buckets)
  }

  /** Serve a query batch from a [[buildIndex]] layout: no corpus
    * tokenization, no postings aggregate — df and stats are persisted
    * lookups, and the postings/df scans carry an `isin` filter on the
    * batch's query-term vocabulary. The vocabulary is collected on the
    * driver first (one job over the QUERY batch — the side that is small
    * by definition), because a literal In on the bucket column is what
    * unlocks bucket pruning + parquet pushdown: without it the scoring
    * join would stream every postings bucket per batch, which at corpus
    * scale reads the whole index to answer a 5-term query. */
  def searchFromIndex(spark: org.apache.spark.sql.SparkSession,
      table: String, queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      championListSize: Option[Int] = None): DataFrame = {
    // The query batch is the broadcast-small side by contract, and it
    // feeds three places (vocab filter, df lookup, scoring join) — so pay
    // ONE job to land it on the driver and serve every consumer from a
    // LocalRelation: no repeated derivation jobs, broadcasts without a
    // collect stage, and the vocabulary literal in hand. The collect is
    // CAPPED (same discipline as LocalScan.queryVecsCapped): a caller
    // that hands a huge "batch" must not OOM the driver or build a
    // million-entry In literal — above the cap, fall back to the
    // streaming plan (distributed qterms broadcast into the joins; every
    // postings bucket is read, which is the correct trade when the query
    // vocabulary is no longer small).
    val qt = qtermsOf(queries, qIdCol, qTextCol)
    val cap = serveBatchCap
    val rows = qt.limit(cap + 1).collect()
    if (rows.length > cap)
      scoreQTerms(
        spark.table(s"${table}_postings"),
        spark.table(s"${table}_stats"), qt, k, k1, b,
        prebuiltDf = Some(spark.table(s"${table}_df")),
        championListSize = championListSize)
    else {
      val qterms = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), qt.schema)
      val vocab = rows.map(_.getString(1)).distinct.toSeq
      val termIn = col("term").isin(vocab: _*)
      scoreQTerms(
        spark.table(s"${table}_postings").filter(termIn),
        spark.table(s"${table}_stats"), qterms, k, k1, b,
        prebuiltDf = Some(spark.table(s"${table}_df").filter(termIn)),
        championListSize = championListSize)
    }
  }

  /** [[searchFromIndex]] with the scoring pass routed through the
    * block-max WAND kernel instead of the relational Σ qf·df join —
    * results are CONTRACTED bit-identical (same fixed-point
    * contributions, same (score desc, id) tie-break; the
    * `text_bm25_wand` gate pins that equivalence), so callers serving a
    * persisted index get WAND's bounded candidates (≤ P·nq·k forwarded
    * rows) at the same answers. Keeps the serve path's two structural
    * wins: postings/df scans carry the batch's vocabulary as an `isin`
    * literal (bucket pruning + parquet pushdown — only query-term
    * buckets are read), and df/stats are persisted lookups, never a
    * corpus aggregate. Measured at the 10× serve shape (50k docs, 944
    * doc-prefix queries, dev/ServeWandAb, equality-asserted then
    * interleaved min-of-2): WAND 3.6 s vs relational 290 s — the
    * relational arm's Σ qf·df join materializes ~1.9B candidate rows on
    * that corpus (every query shares the 40-word head vocabulary),
    * exactly the blow-up WAND's θ-pruned DAAT never builds. */
  def searchFromIndexWand(spark: org.apache.spark.sql.SparkSession,
      table: String, queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qt = qtermsOf(queries, qIdCol, qTextCol)
    val rows = qt.limit(serveBatchCap + 1).collect()
    if (rows.length > serveBatchCap)
      // over-cap batch: no vocabulary literal (it would be a
      // million-entry In) — WAND's own chunked over-cap route applies
      searchWandOverPostings(
        spark.table(s"${table}_postings"),
        spark.table(s"${table}_stats"), queries, qIdCol, qTextCol, k, k1, b,
        prebuiltDf = Some(spark.table(s"${table}_df")))
    else {
      val vocab = rows.map(_.getString(1)).distinct.toSeq
      val termIn = col("term").isin(vocab: _*)
      searchWandOverPostings(
        spark.table(s"${table}_postings").filter(termIn),
        spark.table(s"${table}_stats"), queries, qIdCol, qTextCol, k, k1, b,
        prebuiltDf = Some(spark.table(s"${table}_df").filter(termIn)),
        precollectedQt = Some(rows))
    }
  }

  /** max (query_id, term) rows [[searchFromIndex]] lands on the driver
    * before routing the batch through the streaming plan instead */
  def serveBatchCap: Int =
    sys.props.get("graft.bm25.serveBatchCap").map(_.toInt)
      .orElse(sys.env.get("GRAFT_BM25_SERVE_BATCH_CAP").map(_.toInt))
      .getOrElse(200_000)
}
