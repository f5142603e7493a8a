"""Exact Iceberg bucket hashing (functions/iceberg_hash.py): the spec's
Appendix B murmur3 test vectors pinned on every form (withColumn chain,
single-Column fold, DuckDB CTE replay), cross-form and cross-engine
bit-equality on adversarial longs, and the LakeSink bucket() routing."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from tansu_spark.functions.iceberg_hash import (
    iceberg_bucket,
    iceberg_bucket_col,
    murmur3_cte_sql,
    murmur3_signed_col,
    with_murmur3,
)

# Iceberg spec, Appendix B "Bucket transform" test data (types the spec
# hashes as an 8-byte little-endian long): (input long, expected hash).
SPEC_VECTORS = [
    (34, 2017239379),                 # int/long 34
    (17486, -653330422),              # date 2017-11-16 as epoch days
    (81068000000, -662762989),        # time 22:31:08 as micros
    (1510871468000000, -2047944441),  # timestamp 2017-11-16T22:31:08 us
]

ADVERSARIAL = [0, -1, 1, -34, 2**63 - 1, -(2**63), 2**31, -(2**31), 0xFFFFFFFF]


def _ref(v: int) -> int:
    """Reference murmur3_x86_32(le8(v), 0) in plain Python."""
    v &= (1 << 64) - 1
    M = 0xFFFFFFFF

    def rotl(x, r):
        return ((x << r) | (x >> (32 - r))) & M

    h = 0
    for k in (v & M, (v >> 32) & M):
        k = (k * 0xCC9E2D51) & M
        k = rotl(k, 15)
        k = (k * 0x1B873593) & M
        h ^= k
        h = rotl(h, 13)
        h = (h * 5 + 0xE6546B64) & M
    h ^= 8
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & M
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & M
    h ^= h >> 16
    return h if h < (1 << 31) else h - (1 << 32)


def test_spec_vectors_all_forms(spark):
    vals = [v for v, _ in SPEC_VECTORS]
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    out = with_murmur3(df, "v", "h_chain").withColumn(
        "h_col", murmur3_signed_col("v")
    )
    got = {r["v"]: (r["h_chain"], r["h_col"]) for r in out.collect()}
    for v, exp in SPEC_VECTORS:
        assert got[v] == (exp, exp), (v, got[v], exp)


def test_bucket_matches_spec_formula(spark):
    df = spark.createDataFrame([(v,) for v, _ in SPEC_VECTORS], "v bigint")
    got = {
        r["v"]: (r["b"], r["b2"])
        for r in iceberg_bucket(df, "v", 16, "b")
        .withColumn("b2", iceberg_bucket_col("v", 16))
        .collect()
    }
    for v, h in SPEC_VECTORS:
        exp = (h & 0x7FFFFFFF) % 16
        assert got[v] == (exp, exp)


def test_cross_engine_and_reference_on_adversarial_longs(spark):
    rng = random.Random(20260816)
    vals = ADVERSARIAL + [rng.randint(-(2**63), 2**63 - 1) for _ in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    sp = {r["v"]: r["h"] for r in with_murmur3(df, "v", "h").collect()}
    con = duckdb.connect()
    q = murmur3_cte_sql(
        "SELECT * FROM (VALUES "
        + ",".join(f"({v})" for v in vals)
        + ") t(v)",
        "v",
        "v",
    )
    dd = dict(
        con.execute(
            f"SELECT v, CASE WHEN mm_h >= 2147483648 THEN mm_h - 4294967296"
            f" ELSE mm_h END FROM ({q})"
        ).fetchall()
    )
    con.close()
    for v in vals:
        assert sp[v] == dd[v] == _ref(v), v


def test_lakesink_bucket_routes_by_spec(spark):
    from tansu_spark.lake.sink import LakeSink

    df = spark.createDataFrame(
        [(v,) for v, _ in SPEC_VECTORS], "user_id bigint"
    )
    col, alias = LakeSink.partition_transform("bucket(16, user_id)", df)
    assert alias == "user_id_bucket"
    got = {r["user_id"]: r["b"] for r in df.withColumn("b", col).collect()}
    for v, h in SPEC_VECTORS:
        assert got[v] == (h & 0x7FFFFFFF) % 16


def test_lakesink_bucket_other_types_keep_md5_discipline(spark):
    # types outside the implemented murmur3 set (e.g. double — which
    # Iceberg does not bucket at all) keep the engine-portable md5
    # route (documented fallback)
    from tansu_spark.lake.sink import LakeSink

    df = spark.createDataFrame([(1.5,), (2.25,)], "k double")
    col, alias = LakeSink.partition_transform("bucket(8, k)", df)
    vals = [r["b"] for r in df.withColumn("b", col).collect()]
    assert all(0 <= b < 8 for b in vals)


def test_timestamp_and_date_bucket_hash_epoch_forms(spark):
    import datetime

    from tansu_spark.lake.sink import LakeSink

    df = spark.createDataFrame(
        [
            (
                datetime.date(2017, 11, 16),
                datetime.datetime(2017, 11, 16, 22, 31, 8),
            )
        ],
        "d date, ts timestamp",
    )
    dcol, _ = LakeSink.partition_transform("bucket(16, d)", df)
    tcol, _ = LakeSink.partition_transform("bucket(16, ts)", df)
    row = df.withColumn("db", dcol).withColumn("tb", tcol).collect()[0]
    # spec vectors: date 2017-11-16 hash -653330422; ts ... -2047944441
    assert row["db"] == (-653330422 & 0x7FFFFFFF) % 16
    assert row["tb"] == (-2047944441 & 0x7FFFFFFF) % 16


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))


# ------------------------------------------------------------------ strings
STRING_VALS = [
    "iceberg", "", "a", "ab", "abc", "abcd", "héllo wörld",
    "日本語テキスト", "x" * 100, "emoji 🎉 test", "foo",
]


def _ref_str(s: str) -> int:
    data = s.encode()
    M = 0xFFFFFFFF

    def rotl(x, r):
        return ((x << r) | (x >> (32 - r))) & M

    h = 0
    nb = len(data) // 4
    for i in range(nb):
        k = int.from_bytes(data[4 * i:4 * i + 4], "little")
        k = (k * 0xCC9E2D51) & M
        k = rotl(k, 15)
        k = (k * 0x1B873593) & M
        h ^= k
        h = rotl(h, 13)
        h = (h * 5 + 0xE6546B64) & M
    t = data[4 * nb:]
    if t:
        k = int.from_bytes(t, "little")
        k = (k * 0xCC9E2D51) & M
        k = rotl(k, 15)
        k = (k * 0x1B873593) & M
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & M
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & M
    h ^= h >> 16
    return h if h < (1 << 31) else h - (1 << 32)


def test_string_spec_vector_and_reference(spark):
    from tansu_spark.functions.iceberg_hash import (
        murmur3_str_signed_col,
        with_murmur3_str,
    )

    assert _ref_str("iceberg") == 1210000089  # spec Appendix B
    df = spark.createDataFrame([(v,) for v in STRING_VALS], "s string")
    out = with_murmur3_str(df, "s", "h1").withColumn(
        "h2", murmur3_str_signed_col("s")
    )
    got = {r["s"]: (r["h1"], r["h2"]) for r in out.collect()}
    for v in STRING_VALS:
        assert got[v] == (_ref_str(v), _ref_str(v)), v


def test_string_duckdb_replay_matches(spark):
    from tansu_spark.functions.iceberg_hash import murmur3_str_cte_sql

    con = duckdb.connect()
    vs = ",".join("('" + v.replace("'", "''") + "')" for v in STRING_VALS)
    q = murmur3_str_cte_sql(f"SELECT * FROM (VALUES {vs}) t(s)", "s", "s")
    dd = dict(
        con.execute(
            f"SELECT s, CASE WHEN mm_h >= 2147483648 THEN mm_h - 4294967296"
            f" ELSE mm_h END FROM ({q})"
        ).fetchall()
    )
    con.close()
    for v in STRING_VALS:
        assert dd[v] == _ref_str(v), v


def test_lakesink_string_bucket_is_spec_exact(spark):
    from tansu_spark.lake.sink import LakeSink

    df = spark.createDataFrame([(v,) for v in STRING_VALS if v], "k string")
    col, alias = LakeSink.partition_transform("bucket(8, k)", df)
    assert alias == "k_bucket"
    got = {r["k"]: r["b"] for r in df.withColumn("b", col).collect()}
    for v in STRING_VALS:
        if v:
            assert got[v] == (_ref_str(v) & 0x7FFFFFFF) % 8, v
