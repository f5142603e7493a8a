"""Product quantization (functions/pq.py): code validity, encode
determinism, compression contract, and recall against brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tansu_spark.functions import pq as P
from tansu_spark.functions.similarity import brute_force_topk
from tansu_spark.tables import load


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def books(spark, emb):
    return P.train_codebooks(emb, n_sub=8, n_codes=16, n_iter=1, train_frac=0.5)


def test_codebooks_shape_and_determinism(spark, emb, books):
    assert len(books) == 8
    for book in books:
        assert len(book) == 16
        assert all(len(v) == 8 for _, v in book)
    # Training is partition-independent (decimal means + hash sample).
    again = P.train_codebooks(
        emb.repartition(7), n_sub=8, n_codes=16, n_iter=1, train_frac=0.5
    )
    assert books == again


def test_encode_codes_valid_and_deterministic(spark, emb, books):
    enc = P.pq_encode(emb, books)
    rows = enc.collect()
    assert len(rows) == emb.count()
    ids = {cid for book in books for cid, _ in book}
    for r in rows[:100]:
        assert len(r["codes"]) == 8  # 8 bytes of codes vs 256 bytes of f32
        assert set(r["codes"]) <= ids
        assert r["vnorm"] > 0
    again = {r["vec_id"]: r["codes"] for r in P.pq_encode(emb.repartition(5), books).collect()}
    assert {r["vec_id"]: r["codes"] for r in rows} == again


def test_pq_recall_vs_brute_force(spark, emb, books):
    """ADC top-5 must overlap the exact top-5 well above chance. With
    2000 corpus vectors, random top-5 overlap is ~0.0025 — require 0.2,
    two orders of magnitude above chance, robust to quantization noise."""
    queries = emb.filter(F.col("vec_id") < 8)
    enc = P.pq_encode(emb, books)
    approx = P.pq_topk(enc, queries, books, k=5)
    exact = brute_force_topk(emb, queries, k=5)

    def by_q(df, col):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    a, e = by_q(approx, "approx_cosine"), by_q(exact, "cosine")
    assert set(a) == set(e)
    recall = sum(len(a[q] & e[q]) for q in e) / sum(len(e[q]) for q in e)
    assert recall >= 0.2, f"recall {recall}"


def test_pq_scores_bounded(spark, emb, books):
    """Approximate cosine of the quantized vector stays in a sane band
    (quantization can push slightly past ±1, but not far)."""
    queries = emb.filter(F.col("vec_id") < 4)
    enc = P.pq_encode(emb, books)
    rows = P.pq_topk(enc, queries, books, k=3).collect()
    for r in rows:
        assert -1.5 <= r["approx_cosine"] <= 1.5


def test_serving_plan_constant_in_query_count(spark, emb, books):
    """The LUT travels as a broadcast TABLE, not per-query literal
    expressions: the optimized plan for 64 queries must be essentially
    the same size as for 2 queries (the literal form grew
    O(Q x n_sub x n_codes) expression nodes). Also pins value parity:
    the 2-query scores appear identically in the 64-query run."""
    enc = P.pq_encode(emb, books).localCheckpoint(eager=True)
    q2 = emb.filter(F.col("vec_id") < 2)
    q64 = emb.filter(F.col("vec_id") < 64)

    plan2 = P.pq_topk(enc, q2, books, k=3)._jdf.queryExecution().optimizedPlan().toString()
    plan64 = P.pq_topk(enc, q64, books, k=3)._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan64) < 2 * len(plan2), (len(plan2), len(plan64))

    small = {
        (r["query_id"], r["vec_id"]): r["approx_cosine"]
        for r in P.pq_topk(enc, q2, books, k=3).collect()
    }
    big = {
        (r["query_id"], r["vec_id"]): r["approx_cosine"]
        for r in P.pq_topk(enc, q64, books, k=3).collect()
        if r["query_id"] < 2
    }
    assert small == big  # bit-identical, not approximately equal
