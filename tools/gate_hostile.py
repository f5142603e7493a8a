"""Adversarial-input gate (r8 verdict ask #2): run the input-sensitive
subset of the registry against the HOSTILE fixtures
(``testdata_hostile/`` — empty/NULL/whitespace/10MB/astral docs,
identical/zero/huge/denormal vectors, tie-heavy degenerate events; see
``tools/gen_hostile_data.py``) and the all-EMPTY variant
(``testdata_hostile_empty/`` — zero-row documents/embeddings/events),
comparing each query's Spark result to its own ``oracle_sql()`` via
DuckDB on the SAME fixture — the exact method of the driver's
correctness gate, pointed at inputs the well-formed corpora never
exercise.

The subset is every registry entry whose semantics depend on the
CONTENT of documents/embeddings/events (dedup, text, similarity,
graph-over-embeddings, event statistics, sampling/curation) — the
classes the r8 verdict called out: RAKE's stopword split on
all-stopword/punctuation-only docs, char-entropy's empty-alphabet
case, DBSCAN's all-noise case, argmax tie-breaks on identical
vectors, cosine on zero vectors, changepoints on constant series.
TPC-H / kafka / lake / streaming entries are out of scope here: their
inputs are builder-controlled (topics, lake tables) or copied valid
TPC-H rows, so the hostile surface doesn't reach them.

Run: python tools/gate_hostile.py [GATE_HOSTILE.json]
Exits non-zero on any MISMATCH/ERROR. Writes per-query status for both
fixtures plus the run's fixture row counts.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HOSTILE = os.path.join(REPO, "testdata_hostile")
EMPTY = os.path.join(REPO, "testdata_hostile_empty")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# Input-sensitive registry subset (content-dependent semantics).
HOSTILE_QUERIES = [
    "events_value_domain_audit",
    "lake_iceberg_bucket_exact",
    "lake_iceberg_bucket_string",
    # --- dedup over document text ---
    "dedup_exact",
    "dedup_exact_substring",
    "dedup_substring_scrub",
    "dedup_minhash_lsh",
    "dedup_chunk_exact",
    "dedup_chunk_minhash",
    "dedup_cdc_chunks",
    "dedup_ngram_jaccard",
    "dedup_containment_pairs",
    "dedup_prefix_filter_jaccard",
    "dedup_simhash",
    "dedup_simhash64_pairs",
    "dedup_simhash_hamming_histogram",
    "dedup_levenshtein_blocked",
    "dedup_sorted_neighborhood",
    "dedup_winnowing_fingerprints",
    "dedup_canonical_by_quality",
    "dedup_connected_components",
    "dedup_incremental_new_vs_base",
    "dedup_source_density",
    "dedup_yield_report",
    # --- embeddings / similarity / graph ---
    "dedup_embedding_cosine",
    "dedup_semdedup_scaled",
    "sim_cosine_topk",
    "sim_lsh_ann_topk",
    "sim_ivf_ann_topk",
    "sim_kmeans_trained_topk",
    "sim_binary_hamming_topk",
    "sim_random_projection",
    "sim_rank_fusion_rrf",
    "embeddings_dbscan_cosine",
    "embeddings_kcenter_coreset",
    "embeddings_power_iteration_pc",
    "embeddings_int8_quantize",
    "graph_knn_mutual_components",
    "graph_pagerank_knn",
    "graph_triangle_clustering",
    "graph_label_propagation",
    "graph_near_dup_reachability",
    "graph_dup_degree_stats",
    # --- text analysis ---
    "text_char_entropy",
    "text_lang_id",
    "text_gopher_filter",
    "text_quality_score",
    "text_token_stats",
    "text_type_token_ratio",
    "text_rake_phrases",
    "text_rouge_candidates",
    "text_keywords_per_doc",
    "text_pii_redaction",
    "text_top_tokens",
    "text_fingerprint",
    "text_repeated_shingles",
    "text_kneser_ney_lm",
    "text_bigram_lm_score",
    "text_bm25_search",
    "text_tfidf_relevance",
    "text_inverted_index",
    "text_chunk_windows",
    "text_decontaminate",
    "text_vocab_prune",
    "corpus_eval_contamination",
    # --- event statistics (ties, constants, NULLs, +/-0.0) ---
    "events_cusum_changepoint",
    "events_ewma_anomaly",
    "events_outliers_mad",
    "events_zscore_outliers",
    "events_value_percentiles",
    "events_value_histogram",
    "events_value_winsorized",
    "events_seasonal_anomaly",
    "events_session_window",
    "events_transition_matrix",
    "events_user_trend_ols",
    "events_interarrival_stats",
    # --- sampling / curation over hostile docs ---
    "sample_documents_hash",
    "sample_stratified_by_lang",
    "pipeline_label_text_quality",
    "corpus_quantile_calibration",
    # --- r9 widening: every remaining entry whose input is the hostile
    # --- surface (documents/embeddings/events). TPC-H/kafka/lake/
    # --- streaming/multimodal entries stay out: their inputs are copied
    # --- valid TPC-H rows or builder-constructed topics/media.
    "corpus_importance_sample",
    "corpus_mix_dashboard",
    "corpus_mix_upsample",
    "corpus_temperature_plan",
    "dedup_cross_source_matrix",
    "dedup_lsh_recall_report",
    "events_approx_aggregates",
    "events_cohort_retention",
    "events_cube_counts",
    "events_dau_wau_stickiness",
    "events_funnel_conversion",
    "events_hourly_lerp",
    "events_hourly_locf",
    "events_json_props_stats",
    "events_pivot_type_counts",
    "events_props_inferred_stats",
    "events_quality_profile",
    "events_rolling_window",
    "events_rollup_counts",
    "events_sessionize_batch",
    "events_sliding_window_counts",
    "events_top_spenders_per_week",
    "events_tumbling_counts",
    "events_type_audience_overlap",
    "events_weekly_percentile_bands",
    "events_window_functions",
    "embeddings_label_centroids",
    "embeddings_shard_drift",
    "mv_incremental_event_stats",
    "pipeline_corpus_curation",
    "pipeline_curation_capstone",
    "pipeline_leakage_safe_split",
    "pipeline_post_dedup_token_budget",
    "pipeline_sequence_packing",
    "sample_shard_assignment",
    "sample_uniform_k_per_source",
    "sim_hard_negatives",
    "sim_int8_rerank_topk",
    "sim_lsh_multiprobe_topk",
    "sim_matryoshka_recall",
    "sim_pq_encode_seeded",
    "sim_pq_trained_encode",
    "sim_ivfpq_topk_seeded",
    "sim_ivfpq_residual_topk",
    "text_bpe_train",
    "text_bpe_encode",
    "text_bpe_token_stats",
    "text_feature_correlation",
    "text_novelty_attribution",
    "text_quality_calibrated",
]


def run_fixture(spark, fixture_dir: str) -> dict:
    import duckdb

    import __spark_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{fixture_dir}/{t}.parquet'"
        )

    qs, osql = e.queries(), e.oracle_sql()

    def h(d):
        return hashlib.md5(d.astype(str).to_csv().encode()).hexdigest()

    def norm(d):
        """Column-sort + row-sort + EXPLICIT dtype normalization (r9
        advice): the hash compares astype(str) output, so a dtype-only
        difference between Spark-toPandas and DuckDB .df() (int64 "5" vs
        null-upcast float64 "5.0", object None "None" vs NaN "nan") must
        not decide the verdict. Integers → nullable Int64, floats →
        float64, bools → nullable boolean, object NULLs → one sentinel."""
        import pandas as pd

        d = d.reindex(sorted(d.columns), axis=1)
        for c in d.columns:
            if pd.api.types.is_bool_dtype(d[c]):
                d[c] = d[c].astype("boolean")
            elif pd.api.types.is_integer_dtype(d[c]):
                d[c] = d[c].astype("Int64")
            elif pd.api.types.is_float_dtype(d[c]):
                d[c] = d[c].astype("float64")
            elif d[c].dtype == object:
                d[c] = d[c].where(d[c].notna(), "<NULL>")
        return d.sort_values(by=sorted(d.columns)).reset_index(drop=True)

    results: dict[str, dict] = {}
    for name in HOSTILE_QUERIES:
        fn = qs[name]
        t0 = time.time()
        try:
            sdf = fn(spark, fixture_dir).toPandas()
            odf = con.execute(osql[name]).df()
            sdf, odf = norm(sdf), norm(odf)
            ok = list(sdf.columns) == list(odf.columns) and h(sdf) == h(odf)
            results[name] = {
                "rows": len(sdf),
                "oracle_rows": len(odf),
                "status": "MATCH" if ok else "MISMATCH",
                "sec": round(time.time() - t0, 2),
            }
            print(
                name,
                "MATCH" if ok else f"MISMATCH rows {len(sdf)}/{len(odf)}",
                f"{time.time() - t0:.1f}s",
                flush=True,
            )
        except Exception as ex:  # noqa: BLE001 — record, keep sweeping
            results[name] = {"status": "ERROR", "err": str(ex)[:300]}
            print(name, "ERROR", str(ex)[:200], flush=True)
    con.close()
    return results


def main() -> int:
    from tansu_spark.session import get_spark

    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "GATE_HOSTILE.json"
    )
    only = os.environ.get("GATE_HOSTILE_ONLY")
    if only:
        sel = [q for q in HOSTILE_QUERIES if q in set(only.split(","))]
        HOSTILE_QUERIES[:] = sel

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    out = {"queries": len(HOSTILE_QUERIES), "fixtures": {}}
    for label, fdir in (("hostile", HOSTILE), ("hostile_empty", EMPTY)):
        if not os.path.isdir(fdir):
            print(f"missing fixture dir {fdir}; run tools/gen_hostile_data.py")
            return 2
        print(f"=== fixture: {label} ({fdir}) ===", flush=True)
        out["fixtures"][label] = run_fixture(spark, fdir)

    bad = {
        lab: [n for n, r in res.items() if r["status"] != "MATCH"]
        for lab, res in out["fixtures"].items()
    }
    out["bad"] = bad
    json.dump(out, open(out_path, "w"), indent=1)
    total_bad = sum(len(v) for v in bad.values())
    print("TOTAL", sum(len(r) for r in out["fixtures"].values()),
          "BAD", total_bad, bad, flush=True)
    return 1 if total_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
