"""Sequence packing / shard assignment invariants (functions/packing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tansu_spark.functions.packing import sequence_pack, shard_assign, token_count
from tansu_spark.tables import load


def test_sequence_pack_conservation_and_fill(spark, sf_dir):
    """Token conservation: fills sum to the corpus token count; every
    non-tail sequence is exactly full; continuations only ever appear on
    a sequence that starts mid-document; seq_ids per source are dense
    from 0."""
    docs = load(spark, sf_dir, "documents")
    budget = 512
    packed = sequence_pack(docs, budget=budget).cache()

    total_tokens = docs.select(F.sum(token_count("text"))).first()[0]
    assert packed.select(F.sum("fill_tokens")).first()[0] == total_tokens

    per_src = (
        packed.groupBy("source")
        .agg(
            F.max("seq_id").alias("max_seq"),
            F.count(F.lit(1)).alias("n_seq"),
            F.sum("fill_tokens").alias("tok"),
        )
        .collect()
    )
    for r in per_src:
        assert r["n_seq"] == r["max_seq"] + 1  # dense seq ids from 0
        # ceil(tokens/budget) sequences per source
        assert r["n_seq"] == -(-r["tok"] // budget)

    rows = packed.collect()
    tails = {(r["source"], r["seq_id"]) for r in per_src for r in []}  # noqa: F841
    max_seq = {r["source"]: r["max_seq"] for r in per_src}
    for r in rows:
        if r["seq_id"] < max_seq[r["source"]]:
            assert r["fill_tokens"] == budget, r  # non-tail: exactly full
        assert 0 <= r["n_continuations"] <= 1  # at most one straddling doc
        assert r["first_doc"] <= r["last_doc"]
    packed.unpersist()


def test_sequence_pack_deterministic_under_partitioning(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    a = sorted(map(tuple, sequence_pack(docs, 512).collect()))
    b = sorted(map(tuple, sequence_pack(docs.repartition(13), 512).collect()))
    assert a == b


def test_shard_assign_stable_uniform_and_partition_free(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    s1 = {r["doc_id"]: r["shard"] for r in shard_assign(docs, "doc_id", 8).collect()}
    s2 = {
        r["doc_id"]: r["shard"]
        for r in shard_assign(docs.repartition(11), "doc_id", 8).collect()
    }
    assert s1 == s2  # partitioning-independent
    assert set(s1.values()) <= set(range(8))
    sizes = [list(s1.values()).count(i) for i in range(8)]
    assert min(sizes) > 0.5 * n / 8 and max(sizes) < 1.5 * n / 8  # uniform-ish
    # a different seed reshuffles
    s3 = {r["doc_id"]: r["shard"] for r in shard_assign(docs, "doc_id", 8, seed=1).collect()}
    assert s3 != s1
