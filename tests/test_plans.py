"""Physical-plan regression tests: the scale properties we claim
(pushdown, broadcast discipline, no accidental cartesian products) must be
visible in the executed plans — not just asserted in docstrings."""

from __future__ import annotations

import pytest

from tansu_spark.queries import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q6_all_predicates_pushed(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q6_forecast_revenue")
    for f in ("GreaterThanOrEqual(l_shipdate", "GreaterThanOrEqual(l_discount", "LessThan(l_quantity"):
        assert f in plan, f


def test_q1_column_pruning(spark, sf_dir):
    """The 11-column lineitem scan must read only the 7 columns Q1 uses."""
    plan = _plan(spark, sf_dir, "tpch_q1_pricing_summary")
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)", plan)
    assert m, plan
    read_cols = m.group(1)
    assert "l_orderkey" not in read_cols and "l_partkey" not in read_cols


def test_joins_never_cartesian(spark, sf_dir):
    """No query may degrade to CartesianProduct / BroadcastNestedLoop —
    except the two that broadcast a tiny query-vector set by design."""
    by_design = {
        "sim_cosine_topk",
        "sim_int8_rerank_topk",
        "sim_hard_negatives",
        # fixed-size audit slice: exact all-pairs ground truth on purpose
        "dedup_lsh_recall_report",
        # bounded 7-day range join over the tiny distinct-day list
        "events_dau_wau_stickiness",
    }
    for name in sorted(QUERIES):
        if name in by_design:
            continue
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        # nested-loop is acceptable only for broadcast single-row/agg frames
        if "BroadcastNestedLoopJoin" in plan:
            assert name in {"tpch_q14_promo_revenue_share", "text_tfidf_relevance",
                            "lake_zorder_key", "tpch_q22_global_sales_opportunity",
                            "tpch_q11_important_stock",
                            "kmv_supplier_overlap_by_brand",
                            "events_funnel_conversion",
                            # broadcasts the single-row corpus-stats frame
                            "text_bm25_search",
                            # broadcasts the single-row order-count frame
                            "market_basket_lift",
                            # broadcasts single-row removable/total frames
                            "dedup_yield_report",
                            # broadcasts the single-row min/max frame
                            "events_value_histogram",
                            # broadcasts the single-row max-chars frame
                            "corpus_importance_sample",
                            # broadcasts the single-row doc-count frame
                            "text_keywords_per_doc",
                            # broadcasts the single-row weight-total frame
                            "corpus_temperature_plan",
                            "corpus_mix_dashboard",
                            # broadcasts the 16-row centroid table against
                            # the query set for probe selection (plan-size
                            # constant in n_clusters x n_dims)
                            "sim_ivfpq_topk_seeded",
                            # assembles the per-stage accounting row from
                            # nine single-row count aggregates (every
                            # crossJoin side is exactly one row)
                            "pipeline_curation_capstone",
                            # same ledger pattern: seven crossJoins, each
                            # side a single-row count aggregate
                            # (queries/pipeline.py media-curation ledger)
                            "pipeline_media_curation"}, name


def test_asof_join_is_single_shuffle_window(spark, sf_dir):
    """The as-of join must plan as union + window (one shuffle on the key),
    never a range self-join."""
    plan = _plan(spark, sf_dir, "asof_join_latest_order")
    assert "RunningWindowFunction" in plan or "Window" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_semi_and_anti_join_operators(spark, sf_dir):
    assert "LeftSemi" in _plan(spark, sf_dir, "tpch_q4_order_priority")
    assert "LeftAnti" in _plan(spark, sf_dir, "anti_join_unsold_parts")


def test_pii_redaction_stays_in_codegen(spark, sf_dir):
    """The scrub is pure JVM string work: no Python stages, exactly one
    Exchange (the final groupBy on source)."""
    plan = _plan(spark, sf_dir, "text_pii_redaction")
    assert "Python" not in plan and "MapInPandas" not in plan
    assert plan.count("Exchange") <= 2, plan  # groupBy (+ AQE final)


def test_sequence_packing_two_exchanges_no_sort_global(spark, sf_dir):
    """Per-source window + final groupBy: exchanges hash on source /
    (source, seq_id) — never a global (singlePartition) sort."""
    plan = _plan(spark, sf_dir, "pipeline_sequence_packing")
    assert "SinglePartition" not in plan, plan
    assert "CartesianProduct" not in plan


def test_gopher_filter_map_only(spark, sf_dir):
    """The Gopher-rule filter is one codegen'd scan: per-document HOFs,
    no shuffle, no Python stage."""
    plan = _plan(spark, sf_dir, "text_gopher_filter")
    assert "Exchange" not in plan, plan
    assert "Python" not in plan and "MapInPandas" not in plan


def test_bloom_decontaminate_shape(spark, sf_dir):
    """Bloom prefilter stays JVM-side: bitmap bit tests in the projection
    (no Python), one broadcast HASH join for the exact verify (the
    bloom_hit conjunct must not defeat equi-key extraction), one
    partial-agg shuffle on doc_id."""
    plan = _plan(spark, sf_dir, "text_decontaminate_bloom")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Python" not in plan and "MapInPandas" not in plan


def test_chunk_minhash_no_self_join(spark, sf_dir):
    """Chunk-grain LSH keeps the bucket-groupBy topology: no join operator
    at all (candidate expansion is in-bucket), so the signature pipeline
    plans exactly once."""
    plan = _plan(spark, sf_dir, "dedup_chunk_minhash")
    for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
               "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert op not in plan, (op, plan)


def test_wire_roundtrips_single_python_stage(spark, sf_dir):
    """The binary wire codecs are ONE Arrow-batched MapInPandas stage over
    a pruned scan — no row-at-a-time UDFs, no extra shuffles."""
    for name in ("kafka_avro_roundtrip_stats", "kafka_proto_roundtrip_stats"):
        plan = _plan(spark, sf_dir, name)
        # formatted output lists each node twice (tree + detail)
        assert plan.count("MapInPandas") == 2, name
        assert "BatchEvalPython" not in plan, name  # no per-row Python
        assert plan.count("Exchange") <= 4, name  # <= 2 real exchanges


def test_pq_serving_broadcast_lut(spark, sf_dir):
    """PQ top-k joins the LUT via BroadcastHashJoin (never shuffles the
    encoded corpus on the join key) and partial-aggregates before its
    exchange."""
    from tansu_spark.queries.similarity import sim_pq_topk

    df = sim_pq_topk(spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_chunking_family_minimal_shuffles(spark, sf_dir):
    """Chunking is map-only (zero Exchange); chunk-level dedup adds
    exactly one partial-agg shuffle on the uniform md5 key; random
    projection is a pure scan."""
    plan = _plan(spark, sf_dir, "text_chunk_windows")
    assert "Exchange" not in plan, "chunking must not shuffle"
    plan = _plan(spark, sf_dir, "sim_random_projection")
    assert "Exchange" not in plan, "projection must not shuffle"
    plan = _plan(spark, sf_dir, "dedup_chunk_exact")
    # formatted output lists each node twice (tree + detail)
    assert plan.count("Exchange") <= 4, "chunk dedup: one real exchange"
    assert "partial_count" in plan or "HashAggregate" in plan


def test_token_arrays_never_cross_an_exchange(spark, sf_dir):
    """VERDICT r3 watch-item #4, pinned: the chunk/substring family's
    position explodes reference the full per-document token array (`t`)
    alongside each generated row. That is safe precisely BECAUSE the
    generate and the consuming projection fuse into one stage — the
    array must never appear in any Exchange's input, or a future edit
    that inserts a boundary there starts shuffling whole documents per
    position row."""
    import re

    family = [
        "text_chunk_windows",
        "dedup_chunk_exact",
        "dedup_chunk_minhash",
        "dedup_cdc_chunks",
        "dedup_exact_substring",
        "dedup_substring_scrub",
        "pipeline_curation_capstone",
    ]
    array_col = re.compile(r"\b[tv]#\d+")
    for name in family:
        plan = _plan(spark, sf_dir, name)
        for block in re.split(r"\n\n", plan):
            first = block.splitlines()[0] if block.splitlines() else ""
            if first.startswith("(") and "Exchange" in first:
                inputs = "\n".join(
                    ln for ln in block.splitlines() if ln.startswith("Input")
                )
                assert not array_col.search(inputs), (
                    f"{name}: token array crosses {first}: {inputs}"
                )
