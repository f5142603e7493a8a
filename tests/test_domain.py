"""Numeric-domain enforcement (functions/domain.py): the product's
reject/clamp/null/fail path for values outside the documented oracle
parity domain (r9 advice — out-of-domain magnitudes must be validated,
not just absent from the hostile fixture)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tansu_spark.functions.domain import enforce_domain, in_domain


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(1, 5.0), (2, -1e12), (3, 1e12), (4, None), (5, 9.9e9)],
        "id bigint, v double",
    )


def test_reject_drops_only_violations(spark, df):
    got = enforce_domain(df, "v", -1e10, 1e10, mode="reject")
    assert sorted(r["id"] for r in got.collect()) == [1, 4, 5]


def test_clamp_pins_to_bounds(spark, df):
    got = {r["id"]: r["v"] for r in enforce_domain(df, "v", -1e10, 1e10, mode="clamp").collect()}
    assert got == {1: 5.0, 2: -1e10, 3: 1e10, 4: None, 5: 9.9e9}


def test_null_mode_nulls_violations(spark, df):
    got = {r["id"]: r["v"] for r in enforce_domain(df, "v", -1e10, 1e10, mode="null").collect()}
    assert got == {1: 5.0, 2: None, 3: None, 4: None, 5: 9.9e9}


def test_fail_mode_raises_with_violation_and_passes_clean(spark, df):
    with pytest.raises(ValueError, match="documented domain"):
        enforce_domain(df, "v", -1e10, 1e10, mode="fail")
    clean = df.where(F.col("id").isin(1, 4, 5))
    assert enforce_domain(clean, "v", -1e10, 1e10, mode="fail").count() == 3


def test_null_is_in_domain(spark, df):
    flags = {
        r["id"]: r["ok"]
        for r in df.select("id", in_domain("v", -1e10, 1e10).alias("ok")).collect()
    }
    assert flags == {1: True, 2: False, 3: False, 4: True, 5: True}


def test_unknown_mode_rejected(spark, df):
    with pytest.raises(ValueError, match="unknown domain mode"):
        enforce_domain(df, "v", 0, 1, mode="zap")
