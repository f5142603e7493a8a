"""Unit tests for skew-safe operators: salted_join equivalence with plain
joins (inner + left, including unmatched rows) beyond the oracle sweep."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tansu_spark.operators.salt import salted_join


def _sides(spark):
    # fact: skewed key 1 (90 rows), keys 2-4 sparse, key 99 has no dim row
    facts = spark.createDataFrame(
        [(1, i) for i in range(90)] + [(2, 1), (3, 2), (4, 3), (99, 4)],
        "k bigint, v bigint",
    )
    dims = spark.createDataFrame(
        [(1, "hot"), (2, "a"), (3, "b"), (4, "c"), (5, "unused")],
        "k bigint, name string",
    )
    return facts, dims


def test_salted_inner_join_equals_plain(spark):
    facts, dims = _sides(spark)
    got = salted_join(facts, dims, on="k", n_salt=4)
    want = facts.join(dims, "k")
    assert got.count() == want.count() == 93
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_salted_left_join_keeps_unmatched_once(spark):
    facts, dims = _sides(spark)
    got = salted_join(facts, dims, on="k", n_salt=4, how="left")
    want = facts.join(dims, "k", "left")
    assert got.count() == want.count() == 94
    unmatched = got.filter(F.col("k") == 99).collect()
    assert len(unmatched) == 1 and unmatched[0]["name"] is None


def test_salted_join_rejects_right(spark):
    facts, dims = _sides(spark)
    with pytest.raises(ValueError):
        salted_join(facts, dims, on="k", how="right")
