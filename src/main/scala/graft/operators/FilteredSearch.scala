package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Filtered ANN search — the vector-DB "metadata predicate + vector
  * search" shape (reference anchor: the candidate-filter semantics of
  * modular.py:484-486 composed with the probe pipeline of
  * modular.py:277-286), generalized across the index family:
  *
  *  - **row-keyed indexes** (ivf, ivf_sq8, ivf_pq, lsh, sq8, pq,
  *    raw_vectors): the predicate restricts the index RELATION via a
  *    broadcast-able semi-join BEFORE the probe — pre-filtering, so
  *    partition pruning and the predicate compose in one plan and the
  *    top-k is never starved by post-filtering. At cluster scale the
  *    semi-join pushes below the probe join and the scan only reads
  *    surviving rows.
  *  - **graph/tree indexes** (hnsw, hnsw_global, covertree): the walk
  *    needs the full graph for navigation (restricting the adjacency
  *    relation would sever connectivity — dangling idx references), so
  *    each searcher runs an IDSelector-style traversal (FAISS
  *    `SearchParameters.sel`): every node navigates, only allowed ids
  *    enter the result heap, and the beam/pruning bound comes from the
  *    allowed heap — so the walk digs deeper under selective predicates
  *    instead of collapsing like post-filtering (found at the 100×
  *    scaled pass). The cover-tree selector walk stays EXACT over the
  *    allowed subset. Only when the allowed set exceeds the driver
  *    bitmap cap does the oversample+post-filter fallback apply
  *    (k·oversample candidates per query; recall ~1/selectivity).
  */
object FilteredSearch {

  /** index kinds whose searchers consume a row-keyed index relation —
    * the predicate composes before the probe with no recall penalty
    * beyond the shrunken candidate pool itself */
  val preFilterKinds: Set[String] =
    Set("ivf", "ivf_sq8", "ivf_pq", "lsh", "sq8", "pq", "raw_vectors")

  /** Restrict a row-keyed artifact to `allowed` (a one-column `id`
    * relation): the searcher-visible index contains only allowed rows.
    * The same restriction [[IndexAppend.delete]] makes permanent. */
  def restrict(artifact: IndexArtifact, allowed: DataFrame): IndexArtifact = {
    require(preFilterKinds.contains(artifact.kind),
      s"restrict: kind '${artifact.kind}' is not row-keyed — use " +
        "search(...) which post-filters graph/tree walks")
    val al = allowed.select(col("id").cast("long").as("id"))
    val restricted = artifact.copy(
      data = artifact.data.join(al, Seq("id"), "left_semi"))
    // LSH reranks from its aux vector relation — restrict it too so a
    // disallowed candidate can't resurface at rerank
    if (artifact.kind == "lsh" && artifact.aux.contains("vectors"))
      restricted.copy(aux = restricted.aux + ("vectors" ->
        artifact.aux("vectors").join(al, Seq("id"), "left_semi")))
    else restricted
  }

  /** Search `artifact` for the top-k allowed neighbors of each query.
    * `allowed`: one-column `id` relation (the predicate's satisfying
    * set). `oversample` applies wherever a post-filter fallback can
    * run: the generic `case _` searchers, AND the hnsw_global/covertree
    * selector walks' internal over-cap fallback (threaded through since
    * r12 — previously that fallback hardcoded 4×, silently ignoring a
    * caller who sized oversample for a selective predicate whose
    * allowed set exceeded the driver bitmap cap). Per-centroid hnsw
    * needs no oversampling: its over-cap route is the distributed
    * selector plan, not a post-filter.
    *
    * `strictSelector`: demand the selector walk — if the allowed set
    * exceeds [[HnswSearcher.allowedLocalCap]] and the searcher would
    * cross into the APPROXIMATE oversample fallback, fail loudly
    * instead. Exactness-contracted callers (the `j12_covertree_filtered`
    * hash gate) set this so a future scale decade surfaces the cap by
    * name rather than as an opaque hash mismatch. */
  def search(searcher: Searcher, artifact: IndexArtifact, queries: DataFrame,
      k: Int, allowed: DataFrame, oversample: Int = 4,
      strictSelector: Boolean = false): DataFrame = {
    if (preFilterKinds.contains(artifact.kind))
      searcher.search(restrict(artifact, allowed), queries, k)
    else searcher match {
      // per-centroid graph: IDSelector-style traversal — walk the full
      // graph, collect only allowed ids; the beam bound comes from the
      // allowed heap so the walk digs deeper under selective predicates
      // (post-filtering's recall collapses once the allowed GT sits
      // beyond the unrestricted walk depth — found at the 100× pass)
      case h: HnswSearcher if artifact.kind == "hnsw" =>
        h.searchFiltered(artifact, queries, k, allowed)
      // global HNSW: selector walk on the driver-built model (also
      // covers auto-routed kind="hnsw" artifacts — delegates to the
      // per-centroid selector walk at the pinned routed_nprobe)
      case g: HnswGlobalSearcher =>
        g.searchFiltered(artifact, queries, k, allowed, oversample,
          strictSelector)
      // cover tree: selector walk stays EXACT over the allowed subset
      // (pruning bound from the allowed-only heap only ever loosens)
      case c: CoverTreeSearcher if artifact.kind == "covertree" =>
        c.searchFiltered(artifact, queries, k, allowed, oversample,
          strictSelector)
      case _ =>
        val al = allowed.select(col("id").cast("long").as("id"))
        val res = searcher.search(artifact, queries, k * math.max(1, oversample))
        KnnJoin.topKExploded(
          res.join(al, Seq("id"), "left_semi").select("qid", "id", "dist"),
          col("id"), col("dist"), k)
    }
  }
}
