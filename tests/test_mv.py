"""Incremental materialized view (streaming/mv.py): merge correctness vs
the from-scratch aggregate, replay idempotence, and bucket-local rewrites."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tansu_spark.streaming.mv import IncrementalView

AGGS = {
    "n": ("count", "*"),
    "v_sum": ("sum", "v"),
    "v_min": ("min", "v"),
    "v_max": ("max", "v"),
}


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k string, v bigint")


def _snapshot(view):
    return {
        r["k"]: (r["n"], r["v_sum"], r["v_min"], r["v_max"])
        for r in view.read().collect()
    }


def test_incremental_matches_from_scratch(spark, tmp_path):
    view = IncrementalView(spark, str(tmp_path / "v"), ["k"], AGGS, n_buckets=4)
    b1 = [("a", 1), ("a", 5), ("b", 2)]
    b2 = [("b", 7), ("c", 3)]
    b3 = [("a", -1), ("c", 100), ("d", 0)]
    for i, rows in enumerate([b1, b2, b3]):
        assert view.apply_batch(_batch(spark, rows), i)
    want = {
        r["k"]: (r["n"], r["v_sum"], r["v_min"], r["v_max"])
        for r in _batch(spark, b1 + b2 + b3)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("v_sum"),
            F.min("v").alias("v_min"),
            F.max("v").alias("v_max"),
        )
        .collect()
    }
    assert _snapshot(view) == want


def test_replayed_batch_is_skipped(spark, tmp_path):
    view = IncrementalView(spark, str(tmp_path / "v"), ["k"], AGGS, n_buckets=4)
    assert view.apply_batch(_batch(spark, [("a", 1)]), 0)
    before = _snapshot(view)
    # Restart-replay: same batch id arrives again — must be a no-op.
    assert not view.apply_batch(_batch(spark, [("a", 1)]), 0)
    assert _snapshot(view) == before


def test_untouched_buckets_not_rewritten(spark, tmp_path):
    view = IncrementalView(spark, str(tmp_path / "v"), ["k"], AGGS, n_buckets=64)
    keys = [(f"k{i}", i) for i in range(40)]
    assert view.apply_batch(_batch(spark, keys), 0)

    def files_by_bucket():
        out = {}
        for e in os.listdir(view.view_dir):
            if e.startswith("bucket="):
                d = os.path.join(view.view_dir, e)
                out[e] = sorted(
                    (f, os.path.getmtime(os.path.join(d, f)))
                    for f in os.listdir(d)
                    if f.endswith(".parquet")
                )
        return out

    before = files_by_bucket()
    # One-key batch: exactly one bucket directory may change.
    assert view.apply_batch(_batch(spark, [("k3", 1000)]), 1)
    after = files_by_bucket()
    changed = [b for b in before if before[b] != after.get(b)]
    assert len(changed) == 1
    assert set(after) == set(before)  # no bucket vanished

    got = _snapshot(view)
    assert got["k3"] == (2, 1003, 3, 1000)
    assert got["k5"] == (1, 5, 5, 5)


def test_stream_from_topic_maintains_view(spark, tmp_path):
    """End-to-end: broker produce → topic stream → foreachBatch-maintained
    view equals the batch aggregate of everything produced."""
    from tansu_spark.broker.broker import Broker
    from tansu_spark.streaming.source import topic_stream

    b = Broker(spark, str(tmp_path / "store"))
    b.create_topic("t", partitions=2)
    for i in range(3):
        b.produce_rows(
            "t",
            [{"key": f"u{j % 3}", "value": f"x{i}-{j}"} for j in range(10)],
        )
    view = IncrementalView(
        spark,
        str(tmp_path / "view"),
        ["key_str"],
        {"n": ("count", "*"), "bytes": ("sum", "nbytes")},
        n_buckets=4,
    )

    def decode(batch):
        return batch.select(
            F.col("key").cast("string").alias("key_str"),
            F.length("value").alias("nbytes"),
        )

    q = view.stream_from(
        topic_stream(b, "t"),
        checkpoint=str(tmp_path / "ckpt"),
        transform=decode,
    )
    q.awaitTermination(120)
    want = {
        r["key_str"]: (r["n"], r["bytes"])
        for r in decode(b.records("t"))
        .groupBy("key_str")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("nbytes").alias("bytes"))
        .collect()
    }
    got = {r["key_str"]: (r["n"], r["bytes"]) for r in view.read().collect()}
    assert got == want


def test_merge_overflow_of_canonical_width_raises(spark, tmp_path):
    """The merge path casts widened decimal sums back to the incoming
    batch's partial type; in non-ANSI mode an overflow would cast to NULL
    and silently corrupt the bucket forever after. The guard must raise
    instead (r9 advice). Trigger: a wide first batch (sum ~1e20 fits
    decimal(38,0)) then a narrow second batch whose partial type
    decimal(15,0) cannot hold the merged total."""
    from decimal import Decimal

    import pytest

    view = IncrementalView(
        spark, str(tmp_path / "vo"), ["k"], {"v_sum": ("sum", "v")}, n_buckets=2
    )
    wide = spark.createDataFrame(
        [("a", Decimal(10**20))], "k string, v decimal(38,0)"
    )
    assert view.apply_batch(wide, 0)
    narrow = spark.createDataFrame([("a", Decimal(1))], "k string, v decimal(5,0)")
    with pytest.raises(ArithmeticError, match="canonical width"):
        view.apply_batch(narrow, 1)
