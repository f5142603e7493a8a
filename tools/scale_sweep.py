"""Scale-sweep evidence: run representative queries at sf0.001 / 0.01 /
0.1 (100x data spread) and write SCALING.md with wall times and the
0.1/0.01 growth ratio per query.

What the ratios mean: at these local scales most queries are dominated
by fixed plan/scheduling cost, so wall time should grow FAR slower than
data (ratio << 10 across a 10x step). A query whose ratio approaches or
exceeds the data ratio has a super-linear term (quadratic pair
expansion, unbounded state) — the thing this sweep exists to catch
before it becomes 100 TB pain.

Run: python tools/scale_sweep.py  (idle machine; ~3 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["0.001", "0.01", "0.1"]

_APPENDIX_MARK = "## Pitfall"  # preserve everything from the first prose section on

# Representative, one per cost class.
NAMES = [
    "tpch_q1_pricing_summary",      # scan + partial agg
    "tpch_q3_shipping_priority",    # broadcast + shuffle join + top-k
    "tpch_q18_large_volume_customer",  # fact-fact join + agg filter
    "dedup_minhash_lsh",            # shingle explode + bucket groupBy
    "dedup_exact",                  # full-text hash groupBy
    "text_repeated_shingles",       # df join-back (skew-prone)
    "events_funnel_conversion",     # per-user ordered aggregation
    "sample_documents_hash",        # map-only filter (pure scan floor)
    "semi_reduced_join_urgent_orders",  # broadcast semi + shuffle join
    "graph_cc_star_user_chains",    # iterative (rounds ~ log chain)
    "text_bpe_encode",              # iterative train + nested-HOF map-only scan
    "text_bm25_search",             # single-row stats broadcast + TakeOrdered
    "text_inverted_index",          # two partial-agg shuffles, zipfian keys
    "kafka_avro_roundtrip_stats",   # Arrow-batched Python wire codec (linear/row)
    "text_pii_redaction",           # codegen'd regex scrub, map-only + 1 agg
    "pipeline_sequence_packing",    # per-source window + range explode
    "sim_ivfpq_topk_seeded",        # broadcast-LUT join + partial-agg fold
    "dedup_semantic_cluster",       # cluster-blocked pairwise (n^2/k bound)
    "dedup_semdedup_scaled",        # two-level quantizer, O(n*sqrt k) (r6)
    "sim_kmeans_trained_topk",      # exact-mean training agg + IVF serve
    "dedup_incremental_new_vs_base",  # batch-vs-base band join (cost ~ batch)
    "sketch_cms_user_frequency",    # bounded-cell sketch + broadcast probe
    "streaming_session_windows",    # real stateful streaming session run
    "dedup_exact_substring",        # stride-1 window explode (max row amp)
    "text_decontaminate_bloom",     # bitmap-literal gate + broadcast verify
    "dedup_chunk_minhash",          # chunk-grain LSH (amp ~ tokens/stride)
    "orders_fulfillment_latency",   # fact-fact join + per-group percentiles
    "events_ewma_anomaly",          # two-stage bounded fold (r4 rework)
    "pipeline_curation_capstone",   # composed 8-stage pipeline, 3 grains
    "dedup_substring_scrub",        # position-grain anti-join + reassembly
    "sim_knn_graph_lsh",            # multi-band bucket self-join (r6)
    "text_kneser_ney_lm",           # self-trained LM model join (r6)
    "streaming_ewma_state",         # applyInPandasWithState real run (r6)
    "dedup_winnowing_fingerprints", # winnowed fp pair join (r7; pair risk)
    "embeddings_power_iteration_pc",  # n x d^2 Gram explode + iterations (r7)
    "graph_label_propagation",      # kNN build + 2 label-join rounds (r7)
    "sim_ivfpq_residual_topk",      # zero-collect IVFADC dataflow (r7)
]


def main() -> None:
    from tansu_spark.queries import QUERIES
    from tansu_spark.session import get_spark

    spark = get_spark(app_name="tansu-scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    def release() -> None:
        # Same contract as bench.py: drop per-query leftovers but keep
        # the shared dedup chain's checkpoints alive (its self-heal
        # would otherwise rebuild inside every timed chain query).
        from tansu_spark.queries.pipeline import dedup_chain_protected_ids

        keep = dedup_chain_protected_ids()
        spark.catalog.clearCache()
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
        while it.hasNext():
            e = it.next()
            if int(e._1()) not in keep:
                e._2().unpersist(False)

    # Warm the JVM so sf0.001 isn't charged the first-ever codegen.
    QUERIES[NAMES[0]](spark, "/root/testdata/sf0.001").collect()

    table: dict[str, dict[str, float]] = {}
    for sf in SFS:
        d = f"/root/testdata/sf{sf}"
        for name in NAMES:
            release()
            t0 = time.perf_counter()
            QUERIES[name](spark, d).collect()
            table.setdefault(name, {})[sf] = time.perf_counter() - t0

    lines = [
        "# SCALING — wall time vs data size (local[32])",
        "",
        "Generated by `python tools/scale_sweep.py`. Data grows 10x per",
        "column; the last column is wall(sf0.1)/wall(sf0.01). At these",
        "sizes fixed plan/scheduling cost dominates, so healthy ratios sit",
        "well under the 10x data ratio; a ratio near/above 10 flags a",
        "super-linear term that would hurt at 100 TB. Iterative operators",
        "additionally grow with round count (log of chain length for",
        "star-CC), not just bytes.",
        "",
        "Known BY-DESIGN super-linear entry: `dedup_semantic_cluster` is",
        "quadratic WITHIN a cluster (n^2/k pairs) and this harness pins",
        "k=16 so the oracle can replay the seeded quantizer — its ratio",
        "approaches (10x)^2/10 = 10x as data grows. The SCALE-SAFE shape",
        "is `dedup_semdedup_scaled` (same decision list, TWO-LEVEL",
        "trained quantizer: c = ceil(sqrt(k)) coarse centroids in the",
        "task closure + a DISTRIBUTED fine-centroid table cogrouped on",
        "the coarse key, so assignment is O(n*sqrt k), pairwise ~32n,",
        "and driver model state O(sqrt n) — no stage quadratic, no O(n)",
        "collect; pinned by test_semdedup_scaled_driver_state_is_",
        "sublinear). Its sweep row below pins the ~linear 0.1/0.01",
        "ratio; the pinned-k query stays as the disclosed quadratic",
        "contrast.",
        "",
        "| query | sf0.001 s | sf0.01 s | sf0.1 s | 0.1/0.01 |",
        "|---|---|---|---|---|",
    ]
    for name in NAMES:
        r = table[name]
        ratio = r["0.1"] / r["0.01"] if r["0.01"] > 0 else float("nan")
        lines.append(
            f"| {name} | {r['0.001']:.2f} | {r['0.01']:.2f} | {r['0.1']:.2f} "
            f"| {ratio:.2f}x |"
        )
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
    )
    # Hand-maintained studies (e.g. the Python-vs-JVM appendix) live below
    # the marker; regeneration replaces only the sweep table above it.
    appendix = ""
    if os.path.exists(path):
        current = open(path).read()
        if _APPENDIX_MARK in current:
            appendix = current[current.index(_APPENDIX_MARK):]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
        if appendix:
            f.write("\n" + appendix)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
