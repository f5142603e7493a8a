"""Degeneracy tripwires: queries whose predicates bind to data LITERALS
(LIKE patterns, brand/segment/nation names, date windows, event types)
must stay non-trivially selective at sf0.01.

Why this exists: the driver's oracle gate compares Spark vs DuckDB on
the SAME data, so a predicate that silently stops matching (testdata
regeneration changed part names from digit-bearing to word pairs, orders
moved decades away from events) still "passes" — both engines agree on
an empty answer. A row FLOOR catches that drift. Floors are set at
roughly half the observed counts so organic data changes don't flap the
test, while a dead literal (count 0) always fails. Scalar aggregates are
additionally checked non-null — an empty input would make them NULL."""

from __future__ import annotations

import os

import pytest

from tansu_spark.queries import QUERIES

# Same override conftest.py honors (but floors are calibrated at sf0.01).
SF_DIR = os.environ.get("SPARK_GRAFT_FLOORS_SF_DIR", "/root/testdata/sf0.01")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR),
    reason=f"floors data dir {SF_DIR} absent — floors calibrated for sf0.01",
)

# name -> minimum rows at sf0.01 (~half of observed 2026-08)
FLOORS = {
    "tpch_q2_min_cost_supplier": 1,
    "tpch_q3_shipping_priority": 5,
    "tpch_q5_local_supplier_volume": 2,
    "tpch_q7_volume_shipping": 2,
    "tpch_q8_market_share": 1,
    "tpch_q9_product_profit": 80,
    "tpch_q11_important_stock": 150,
    "tpch_q16_supplier_cnt": 400,
    "tpch_q20_part_promotion": 1,
    "tpch_q21_waiting_supplier": 40,
    "tpch_q22_global_sales_opportunity": 1,
    "asof_join_tolerant_order": 300,
    "asof_join_next_order": 800,
    "dedup_minhash_lsh": 10,
    "graph_near_dup_reachability": 25,
    "events_zscore_outliers": 100,
    "events_hourly_locf": 10000,
    "text_bm25_search": 10,
    "text_gopher_filter": 250,
    "text_decontaminate_bloom": 245,
    "dedup_chunk_minhash": 20,
    "dedup_exact_substring": 490,
    "dedup_cdc_chunks": 40,
    # round-3 additions (VERDICT r3 ask #6; observed at sf0.01 2026-08-14)
    # dedup_semantic_cluster retired from the registry in r8 — its floor
    # moved to tests/test_similarity.py's contrast harness.
    "sim_kmeans_trained_topk": 20,       # observed 40 (8 queries × k)
    "sim_pq_trained_encode": 250,        # observed 500
    "pipeline_leakage_safe_split": 250,  # observed 500
    "sim_random_projection": 250,        # observed 500
    "text_chunk_windows": 350,           # observed 694 (binds to 64/48 grid)
    "dedup_chunk_exact": 3,              # observed 7 (needs repeated chunks)
    "corpus_temperature_plan": 10,       # observed 20 (one row per source)
    "corpus_mix_dashboard": 10,          # observed 20
    "sim_int8_rerank_topk": 20,          # observed 40
    "events_ewma_anomaly": 75,           # observed 150 (one row per user)
    "multimodal_dedup_report": 2,        # observed 3 (one row per modality)
    "graph_dup_degree_stats": 1,         # observed 2 (summary rows)
    # round-4 capstone: exactly one accounting row per stage
    "pipeline_curation_capstone": 8,
    "dedup_substring_scrub": 250,  # one row per document (500 at sf0.01)
    "multimodal_decode_roundtrip": 250,  # one row per document
    "multimodal_phash_dedup": 5,  # duplicated fingerprints (11 at sf0.01)
    "multimodal_frame_luma": 80,  # 2 frames x decodable video docs (~166)
    "multimodal_audio_frame_energy": 580,  # 7 frames x audio docs (1169)
    "multimodal_resize_verify": 80,  # one row per image doc (167)
    "pipeline_media_curation": 5,  # exactly one accounting row per stage
    # round-5 additions
    "dedup_semdedup_scaled": 250,  # one decision row per vector (500)
    "streaming_dedup_replay": 3,  # one row per event type (5 at sf0.01)
    "streaming_interval_join": 400,  # click->purchase pairs (860 at sf0.01)
    # every purchase emits, matched or null-padded (2157 at sf0.01)
    "streaming_interval_join_outer": 1000,
    "sim_binary_hamming_topk": 40,  # 8 queries x top-5 (exact)
    "sim_rank_fusion_rrf": 40,      # 8 queries x top-5 (exact)
    "lake_delete_vectors_mor": 2,   # one row per surviving linestatus
    "dedup_prefix_filter_jaccard": 12,  # exact pairs >= 0.5 (25 at sf0.01)
    "sim_matryoshka_recall": 24,  # exactly 8 queries x 3 truncation bands
    # round-6 additions
    "streaming_ewma_state": 75,  # one state row per user (150 at sf0.01)
    "streaming_static_enrich": 10,  # segments x event types (25 at sf0.01)
    "lake_restore_version": 3,  # one row per order priority (5 at sf0.01)
    "streaming_lake_sink": 4,  # exactly one row per topic partition
    # matched pairs + watermark-flushed negatives both ways (3418 at sf0.01)
    "streaming_interval_join_full": 1700,
    "text_kneser_ney_lm": 400,  # scored document slice (500 at sf0.01)
    "sim_knn_graph_lsh": 1000,  # ~5 neighbors x 500 vectors at sf0.01
    "sim_knn_graph_incremental": 1000,  # must equal the full rebuild
    "lake_write_audit_publish": 3,  # one row per order priority (5)
    "graph_knn_mutual_components": 150,  # clustered vectors (300 at sf0.01)
    "events_hourly_lerp": 10000,  # users x hourly spine (21950 at sf0.01)
    "corpus_quantile_calibration": 400,  # calibrated slice (500 at sf0.01)
    "kafka_group_lag_report": 4,  # exactly one row per topic partition
    "kafka_txn_visibility_report": 4,  # exactly one row per partition
    "multimodal_scene_cuts": 200,  # 5 deltas x video assets (415 at sf0.01)
    "orders_in_fulfillment_sweepline": 1200,  # calendar days (2499)
    "sim_lsh_multiprobe_topk": 40,  # exactly 8 queries x top-5
    # round-7 additions
    "kafka_avro_schema_evolution": 3,  # one row per event type (5 at sf0.01)
    "sim_ivfpq_residual_topk": 40,  # exactly 8 queries x top-5
    "graph_label_propagation": 300,  # labels reach ~full corpus (500 at sf0.01)
    "sketch_hll_distinct_users": 3,  # one row per event type (5 at sf0.01)
    "embeddings_power_iteration_pc": 64,  # exactly one row per dimension
    "streaming_hll_state": 3,  # one row per event type (5 at sf0.01)
    "dedup_winnowing_fingerprints": 30,  # overlap>=0.35 pairs (68 at sf0.01)
    "text_char_entropy": 400,  # one row per document (500 at sf0.01)
    "sketch_hll_union_pairs": 6,  # C(5,2) = 10 event-type pairs at sf0.01
    "events_user_trend_ols": 100,  # one row per user (150 at sf0.01)
    "dedup_levenshtein_blocked": 2,  # blocked fuzzy pairs (5 at sf0.01)
    "corpus_eval_contamination": 200,  # flagged train docs (477 at sf0.01)
    "streaming_cms_state": 10,  # exactly one row per probe user (16)
    "events_seasonal_anomaly": 150,  # |z|>=2.5 vs hour baseline (317)
    "dedup_sorted_neighborhood": 2,  # SNM-verified pairs (5 at sf0.01)
    "pipeline_quality_linear_probe": 10,  # one row per source (20)
    "graph_pagerank_knn": 400,  # one row per vector (500 at sf0.01)
    "embeddings_dbscan_cosine": 400,  # one row per vector (500 at sf0.01)
    "streaming_kmv_state": 3,  # one row per event type (5 at sf0.01)
    "embeddings_kcenter_coreset": 8,  # exactly k=8 selection rows
    "text_rouge_candidates": 14,  # LSH candidate pairs (28 at sf0.01)
    "events_cusum_changepoint": 20,  # alarmed users (47 of 150 at sf0.01)
    "lake_snapshot_expiry": 3,  # one row per event type (5 at sf0.01)
    "graph_triangle_clustering": 400,  # one row per vector (500 at sf0.01)
    "text_rake_phrases": 700,  # top-3 phrases per doc (1307 at sf0.01)
    "lake_clone_shallow": 3,  # one row per order priority (5 at sf0.01)
}

# scalar aggregates: exactly one row whose values must all be non-null
SCALARS = [
    "tpch_q6_forecast_revenue",
    "tpch_q14_promo_revenue_share",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_disjunctive_revenue",
    "events_funnel_conversion",
]


@pytest.mark.parametrize("name", sorted(FLOORS))
def test_row_floor(spark, name):
    n = QUERIES[name](spark, SF_DIR).count()
    assert n >= FLOORS[name], f"{name}: {n} rows < floor {FLOORS[name]}"


@pytest.mark.parametrize("name", SCALARS)
def test_scalar_non_null(spark, name):
    rows = QUERIES[name](spark, SF_DIR).collect()
    assert len(rows) >= 1, name
    vals = rows[0].asDict()
    assert all(v is not None for v in vals.values()), f"{name}: {vals}"
