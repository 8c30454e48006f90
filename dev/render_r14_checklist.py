#!/usr/bin/env python3
"""Render the OPTIMIZATION_r14.md per-query checklist from two bench
artifacts (before/after full-gate runs of THIS session, same box).

Usage: python3 dev/render_r14_checklist.py before.json after.json
Prints a markdown table: query | before s | after s | delta | note.
Notes come from the ANNOT map below — one line per gate stating what was
changed (and which guide section) or why it was deliberately left alone.
"""
import json
import sys

TOUCH_MM = "Par.fan before codec projections; ImageIO/audio SPI fixes (§2.5/§4.5)"
TOUCH_JACC = "fanText tokenize; AQE 64k floor; prefix relation cached (§2.4/§2.5/§5)"
TOUCH_BM25 = "tokenize cached once/call; s_fixed per posting pre-fan-out; WAND 1-job stats+idf (§1.2/§2.3)"
TOUCH_HYB = "lexical arm = WAND improvements; dense arm unchanged (§2.3)"
FLOOR_ONLY = "session-wide AQE 64k coalescing floor only; operator untouched"
UNTOUCHED_FAST = "already at the per-query harness floor (~0.1-0.3 s); untouched"
UNTOUCHED_ANN = ("build+search+GT gate; driver-side model training dominates — "
                 "models are literal-pinned by the oracle, so training math/jobs "
                 "left byte-identical (only OPQ's per-vector maps parallelize safely)")

ANNOT = {
    "mm_video": TOUCH_MM + "; synthesized AVIs cached (encode once, not per branch)",
    "mm_decode": TOUCH_MM,
    "mm_audio": TOUCH_MM + "; hot-reader SPI cache (0.49→0.10 s micro)",
    "mm_pipeline": TOUCH_MM,
    "dedup_jaccard_pairs": TOUCH_JACC,
    "dedup_jaccard_sampled": TOUCH_JACC + "; small real floor-overhead on the induced mod-7 corpus",
    "dedup_components": TOUCH_JACC + "; union-find edges collected in 1 job under 1M edges",
    "dedup_components_sampled": TOUCH_JACC + "; planning overhead of the added caches shows at this tiny scale (A/B: +0.1-0.3 s real)",
    "dedup_minhash": "fanText before shingle+sig UDF (§2.5)",
    "dedup_simhash": "fanText before simhash UDF (§2.5)",
    "dedup_span_stats": "fanText before shingling (§2.5)",
    "dedup_winnow": FLOOR_ONLY,
    "dedup_exact_fp": UNTOUCHED_FAST,
    "dedup_semantic": FLOOR_ONLY + "; seeded k-means literal-pinned",
    "dedup_embedding_top": "Par.fan on the self-kNN base side — n·n pair scan was 1 task (§2.5)",
    "dedup_embedding_sampled": "same fan, 16 KB/task scaled",
    "text_bm25_topk": TOUCH_BM25,
    "text_bm25_champion": TOUCH_BM25 + " (champion truncation unchanged)",
    "text_bm25_serve": "serve path reuses prebuilt index; WAND stats+idf now 1 driver job",
    "text_bm25_wand": TOUCH_BM25,
    "text_bm25_wand_sampled": TOUCH_BM25 + "; floor overhead on the mod-13 subcorpus",
    "hybrid_rrf": TOUCH_HYB,
    "hybrid_rrf_weighted": TOUCH_HYB,
    "hybrid_rrf_sampled": TOUCH_HYB,
    "corpus_kcenter": "driver-local greedy under collect cap — 2 jobs/center → 1 collect (§5)",
    "j9_opq_adc": "OPQ rotate/reconstruct maps parallel (bit-exact); Procrustes Σ kept sequential (oracle-pinned)",
    "bucketed_join": "independent bucketed writes overlapped from driver threads (§2.6); catalog serializes most of it — small effect",
    "pipeline_corpus_clean": "inherits minhash/fanText improvements; composition unchanged",
    "q1_agg": UNTOUCHED_FAST,
    "p1_normalize": UNTOUCHED_FAST,
    "p5_text_filter": UNTOUCHED_FAST,
    "t1_global_topk": UNTOUCHED_FAST,
    "a14_dedup_text": UNTOUCHED_FAST,
    "a7_latency_stats": UNTOUCHED_FAST,
    "a1_a6_metrics": UNTOUCHED_FAST,
    "a1_a6_metrics_sampled": UNTOUCHED_FAST,
    "skew_salted_join": UNTOUCHED_FAST,
    "corpus_sample": UNTOUCHED_FAST,
    "corpus_mixture": UNTOUCHED_FAST,
    "corpus_domain_cap": UNTOUCHED_FAST,
    "j13_align_join": UNTOUCHED_FAST,
    "j14_train_test_split": UNTOUCHED_FAST,
    "st_window_agg": UNTOUCHED_FAST,
    "st_dedup_stateful": UNTOUCHED_FAST,
    "st_sessionize": FLOOR_ONLY,
    "st_index_serve": "streaming micro-batch machinery dominates (~0.3 s/batch); left alone — the gate exists to pin 2-batch ≡ 1-shot",
    "j1_knn_l2": FLOOR_ONLY + "; 40-query probe, scan task not the bottleneck",
    "j1_knn_cosine": FLOOR_ONLY,
    "j1_knn_sampled": FLOOR_ONLY,
    "j2_knn_gram": FLOOR_ONLY,
    "mine_hard_negatives": FLOOR_ONLY,
    "mine_hard_negatives_sampled": FLOOR_ONLY,
    "corpus_mmr": FLOOR_ONLY + "; per-query mapGroups greedy already local",
    "corpus_pack": FLOOR_ONLY,
    "text_chunk_windows": FLOOR_ONLY,
    "text_topk_ngrams": FLOOR_ONLY,
    "text_quality": FLOOR_ONLY + "; single shuffle-free UDF scan",
    "text_langid": FLOOR_ONLY,
    "text_repetition": FLOOR_ONLY,
    "text_pii_scrub": FLOOR_ONLY,
    "text_perplexity": FLOOR_ONLY + "; relational bigram train+score, 2 equi-shuffles",
    "text_c4_filter": FLOOR_ONLY,
    "decontam_overlap": FLOOR_ONLY + "; inverted-index equi-join shape already minimal",
}

ANN_GATES = [
    "j3_lsh_pipeline", "j4_e2lsh_pipeline", "j8_ivf_probe", "j8_ivf_append",
    "j8_ivf_filtered", "j8_ivf_fullprobe", "j9_pq_adc", "j10_ivf_sq8",
    "j10_sq8", "j10_ivf_pq", "j10_ivf_sq8_filtered", "j10_ivf_pq_filtered",
    "j11_hnsw", "j11_hnsw_global", "j11_append", "j11_delete",
    "j11_hnsw_filtered", "j12_covertree", "j12_covertree_filtered",
]
for g in ANN_GATES:
    ANNOT.setdefault(g, UNTOUCHED_ANN)


def main() -> None:
    before = json.load(open(sys.argv[1]))["queries"]
    after = json.load(open(sys.argv[2]))["queries"]
    names = sorted(after)
    print("| query | before s | after s | delta | note |")
    print("|---|---|---|---|---|")
    tb = ta = 0.0
    for n in names:
        b = before.get(n)
        a = after[n]
        note = ANNOT.get(n, "")
        if b is None:
            print(f"| {n} | — | {a:.2f} | — | {note} |")
            continue
        tb += b
        ta += a
        print(f"| {n} | {b:.2f} | {a:.2f} | {a - b:+.2f} | {note} |")
    print(f"| **total** | **{tb:.2f}** | **{ta:.2f}** | **{ta - tb:+.2f}** | |")


if __name__ == "__main__":
    main()
