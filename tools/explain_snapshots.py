"""Regenerate PLANS.md: formatted physical plans for headline queries,
each annotated with the scale property the plan is supposed to exhibit
(pushdown, broadcast choice, partial aggregation, semi-join reduction).

Run from the repo root AFTER changing operators:  python tools/explain_snapshots.py
The snapshot is evidence, not a test — plan-shape assertions that must
never regress live in tests/ (e.g. test_bucketed.py's zero-Exchange
check, test_prefilter.py's LeftSemi check).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"

# query name -> what a reviewer should verify in the plan
SNAPSHOTS: dict[str, str] = {
    "tpch_q1_pricing_summary": (
        "One scan, no joins: `PushedFilters` carries the shipdate bound into "
        "the parquet reader, `ReadSchema` holds only the 7 touched columns "
        "(of 16), and aggregation is two-phase — `HashAggregate(partial)` "
        "before the exchange, final after — so the shuffle moves one row per "
        "(returnflag, linestatus) per task, not 600k rows."
    ),
    "tpch_q6_forecast_revenue": (
        "Pure scan-aggregate: every predicate (shipdate range, discount "
        "band, quantity cap) appears in `PushedFilters`; the whole pipeline "
        "is a single `WholeStageCodegen` span feeding a global agg."
    ),
    "tpch_q3_shipping_priority": (
        "Join strategy split: `customer` (fixed-cardinality dim) arrives "
        "via `BroadcastHashJoin`; at bench scale orders⋈lineitem also "
        "broadcasts under AQE, but the plan keeps the shuffle form for the "
        "fact⋈fact pair when sizes demand it. TakeOrderedAndProject caps "
        "the result without a global sort."
    ),
    "semi_reduced_join_urgent_orders": (
        "Semi-join reduction: a `BroadcastHashJoin ... LeftSemi` filters "
        "lineitem MAP-SIDE with the filtered orders key set before the "
        "equi-join, so only ~7% of fact rows reach the join; the orders "
        "filter itself is in `PushedFilters`."
    ),
    "skew_salted_agg": (
        "Two-stage skew-safe aggregation: stage 1 groups on "
        "(event_type, salt) — `HashAggregate` keys show the salt column — "
        "stage 2 merges the ≤ n_salt partials per key. No single reducer "
        "ever owns a whole hot key."
    ),
    "dedup_minhash_lsh": (
        "One pass to candidate pairs: signatures/bands feed a bucket "
        "groupBy + in-bucket pair expansion (collect_list then index "
        "expansion) instead of a self-join — the plan has no duplicate "
        "scan of documents and exactly one exchange on the bucket key."
    ),
    "events_rollup_counts": (
        "`Expand` feeds ROLLUP grouping sets into a partial/final "
        "aggregate pair — the multi-level rollup costs one shuffle, not "
        "one per level."
    ),
    "text_bm25_search": (
        "Corpus statistics (N, Σdl, per-term df) collapse to ONE row via "
        "partial/final aggregation and come back over the scan as a "
        "`BroadcastNestedLoopJoin` of a single-row build side — scoring "
        "is then map-only expressions and the result is "
        "`TakeOrderedAndProject(20)`, never a global sort."
    ),
    "text_bpe_encode": (
        "The trained merge list is baked into one nested-HOF projection: "
        "the plan is scan → project → (no Exchange anywhere) — encoding "
        "is embarrassingly parallel; only the 5 tiny argmax jobs during "
        "training ever shuffle (and those move |pairs| rows, not the "
        "corpus)."
    ),
    "text_pii_redaction": (
        "PII scrub stays entirely in whole-stage codegen: "
        "regexp_extract_all counts and the chained regexp_replace are one "
        "Project over the scan — zero Exchange until the final partial-agg "
        "groupBy on source, which moves one row per source per task. No "
        "Python anywhere."
    ),
    "pipeline_leakage_safe_split": (
        "Split assignment is component-granular: the doc list LEFT-joins "
        "the (small) component table — broadcastable — and the split is a "
        "map-side md5 threshold on the canonical id. The expensive part "
        "(LSH -> verify -> CC) is the shared session chain, materialized "
        "once; this query itself adds one slim join."
    ),
    "dedup_chunk_exact": (
        "Composition shape: chunking is map-only (tokenize + sequence "
        "explode, zero Exchange), fingerprints are md5 (uniform keys, no "
        "skew), and the repeat-detection is ONE partial-agg shuffle — "
        "`HashAggregate(partial)` before the Exchange moves one row per "
        "distinct chunk per task, never text."
    ),
    "text_gopher_filter": (
        "Pure map-only filter: every Gopher gate (dominance, trigram "
        "repetition, stopword presence) is a higher-order function inside "
        "ONE `WholeStageCodegen` span over the scan — the plan has zero "
        "Exchange, zero join, zero Python. The filter touches every byte "
        "once; at 100 TB it is scan-bound by construction."
    ),
    "text_decontaminate_bloom": (
        "Bloom gate shape: the 16384-bit bitmap rides the projection as a "
        "256-long array literal (constant size in blocklist cardinality), "
        "the three bit tests are shiftright/& integer ops inside codegen, "
        "and the exact verify is a `BroadcastHashJoin` whose equi-key "
        "survived the extra bloom_hit conjunct — followed by one "
        "partial-agg Exchange on doc_id. No Python anywhere."
    ),
    "dedup_chunk_minhash": (
        "Chunk-grain LSH: the plan contains NO join operator — candidate "
        "pairs come from the bucket `HashAggregate` (collect_list + "
        "in-bucket expansion), so the chunk/shingle/signature pipeline "
        "plans exactly once; the only Exchanges are the signature groupBy "
        "on cid and the bucket groupBy on (band, band_sig)."
    ),
    "dedup_exact_substring": (
        "Rolling-window dedup: position explode is map-only, the "
        "fingerprint count is a uniform-key partial agg, the join-back is "
        "an equi-join on the fingerprint, and the islands window is "
        "`Window partitionBy doc_id` — every Exchange hashes on an "
        "unskewed key; nothing is global."
    ),
    "dedup_cdc_chunks": (
        "Content-defined chunking: per-row boundary hash in codegen, ONE "
        "per-doc running-sum window, chunk reassembly as a (doc, chunk) "
        "groupBy with order pinned via array_sort(struct(p, tok)), then "
        "the standard uniform-key fingerprint agg. Boundaries move with "
        "content, plans move with nothing."
    ),
    "events_ewma_anomaly": (
        "Recursive state, bounded BY CONSTRUCTION (the r3 perf-weak fix): "
        "stage A folds per (user, day) — the day bounds every collected "
        "array — stage B folds the 3-double day summaries per user "
        "(calendar-bounded), stage C re-folds each day seeded exactly. "
        "Four slim Exchanges replace the one unbounded collect_list; no "
        "row ever carries a user's full history."
    ),
    "pipeline_curation_capstone": (
        "The composed pipeline scans the corpus once per GRAIN: one "
        "doc-grain scan (fingerprint + Gopher HOFs, cached survivor ids), "
        "one chunk-grain and one substring-grain scan each semi-joined to "
        "the surviving ids, shingle grain on the shared chain's "
        "checkpointed table (`Scan ExistingRDD`). Stage shuffles are the "
        "SUM of the single-stage queries' shuffles — fingerprint window, "
        "component window, chunk-md5 agg, substring-fp agg + islands "
        "window, shingle agg, split/source aggs — nothing quadratic, and "
        "the only BroadcastNestedLoopJoins assemble nine SINGLE-ROW count "
        "aggregates into the 8-row accounting output."
    ),
    "dedup_semantic_cluster": (
        "SemDeDup cluster blocking: assignment is a map-only scan against "
        "literal centroids (no shuffle, no UDF), the pairwise stage is a "
        "self `SortMergeJoin`/`ShuffledHashJoin` on cluster id — ONE "
        "corpus shuffle, quadratic cost bounded per cluster — and the "
        "keep-decision is a broadcast-able anti-join of the slim drop "
        "list. Never all-pairs."
    ),
    "dedup_semdedup_scaled": (
        "The TWO-LEVEL SemDeDup (r6): coarse assignment is one Arrow-"
        "batched `MapInPandas` scan with only the c=ceil(sqrt(k)) coarse "
        "model in the closure (O(sqrt n) driver state, pytest-pinned); "
        "the fine model is a DISTRIBUTED table cogrouped with its "
        "members on the coarse key (`FlatMapCoGroupsInPandas` — one "
        "hash shuffle per side, the same co-partitioning a bucketed "
        "join uses), so per-vector scoring is O(cell/32)~=O(sqrt k) and "
        "NO O(n) model rows ever collect. The final assignment is "
        "checkpointed (`Scan ExistingRDD`) and the pairwise stage is a "
        "self-join on (coarse, fine) capped by the ~32-member fine-cell "
        "invariant — ~32n comparisons, linear. The keep-decision is the "
        "same slim anti-join."
    ),
    "streaming_dedup_replay": (
        "A REAL streaming run: the returned frame is the memory-sink "
        "table (`Scan` of the complete-mode result), the interesting "
        "plan being the STREAMING one — union of two file sources, "
        "`dropDuplicatesWithinWatermark` keyed on event_id (one state "
        "row per key until the watermark passes — bounded state), then "
        "the windowless count agg. Duplicates never reach the "
        "aggregate; the final table hash-equals the batch distinct."
    ),
    "sim_ivfpq_topk_seeded": (
        "PQ serving via the broadcast LUT table: the encoded-corpus scan "
        "reads 8-byte code arrays, `posexplode` is map-only, the LUT join "
        "is a `BroadcastHashJoin` on (sub, code) — plan size CONSTANT in "
        "the number of queries — and the per-(query, vector) fold is a "
        "partial HashAggregate before its exchange. The old per-query "
        "literal form grew O(Q x n_sub x n_codes) expression nodes."
    ),
    "pipeline_sequence_packing": (
        "Packing = per-SOURCE window cumsum (one hash Exchange on source "
        "— sources parallelize; never a global sort), a map-only "
        "`sequence()` explode emitting ~1 row per doc, and one partial-agg "
        "shuffle on (source, seq_id). Two exchanges total, each moving "
        "slim accounting rows, not text."
    ),
    "kafka_avro_roundtrip_stats": (
        "The binary-wire path's one concession to Python is visible and "
        "bounded: a single Arrow-batched `MapInPandas` stage (encode + "
        "decode back-to-back) sandwiched between the pruned parquet scan "
        "(ReadSchema: 3 columns) and the partial-agg groupBy. No "
        "row-at-a-time UDFs, no extra shuffles."
    ),
    "sim_knn_graph_lsh": (
        "k-NN graph candidate generation: the embedding arrays appear in "
        "exactly the per-band bucket self-join exchanges (one hash exchange "
        "per side on (band, bucket)); the pair-dedup HashAggregate and the "
        "per-node rank Window exchange only (id_a, id_b, cosine) scalars — "
        "no array column in their Input lists, no CartesianProduct anywhere."
    ),
    "text_kneser_ney_lm": (
        "Self-trained LM: model CTEs are partial-agg groupBys on uniformly "
        "hashed string keys (bg/w1/w2); the scoring join back to the bigram "
        "stream is an equi-join AQE can skew-split; the only driver-side "
        "value is the ntypes scalar literal. Per-doc aggregation sums "
        "BIGINT micro-probabilities — no double accumulation stage."
    ),
    "graph_pagerank_knn": (
        "Iterative graph op with a STATICALLY BOUNDED plan: the kNN "
        "adjacency is a checkpointed scan (built once), each of the 3 "
        "iterations is one hash-join of O(nk) scalar contributions + a "
        "partial-agg shuffle keyed on the destination id + one left join "
        "against the node frame; the count row rides a single-row "
        "BroadcastExchange. No embedding column appears after the "
        "adjacency build — verify ReadSchema on the iteration scans."
    ),
    "pipeline_quality_linear_probe": (
        "Training in the dataflow: ONE partial-agg shuffle produces the "
        "nine-Gram-sum single row (HashAggregate partial -> final over "
        "zero grouping keys), the Cramer solve is a Project over that row "
        "broadcast back (single-row BroadcastExchange), and scoring is a "
        "second scan — two corpus scans total, no gradient loop, no "
        "collect in the plan."
    ),
}


def main() -> None:
    from tansu_spark.queries import QUERIES
    from tansu_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    out = [
        "# PLANS — physical-plan snapshots for headline queries",
        "",
        "Generated by `python tools/explain_snapshots.py` at sf0.01; regenerate",
        "after operator changes. Each section states the scale property the",
        "plan must exhibit, then the `explain(\"formatted\")` output to check",
        "it against. (AQE finalizes some exchanges at runtime; these are the",
        "static plans Catalyst commits to before adaptive re-planning.)",
        "",
    ]
    for name, why in SNAPSHOTS.items():
        df = (QUERIES[name] if name in QUERIES else __import__('tansu_spark.queries.similarity', fromlist=[name]).__dict__[name])(spark, SF_DIR)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out += [f"## {name}", "", why, "", "```", plan.rstrip(), "```", ""]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path} ({len(SNAPSHOTS)} plans)")


if __name__ == "__main__":
    main()
