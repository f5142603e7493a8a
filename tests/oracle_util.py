"""Replica of the driver's correctness compare: run a Spark query and its
DuckDB oracle on the same parquet dir, sort columns by name, sort rows, and
demand (by default) exact value equality — the driver uses an
order-insensitive value-hash, so anything short of exact equality there is
a failed gate. Catch it here first."""

from __future__ import annotations

import datetime
import decimal

import duckdb
import pandas as pd

from tansu_spark.tables import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            df[c] = s.map(
                lambda v: v.isoformat()
                if isinstance(v, (datetime.date, datetime.datetime))
                else float(v)
                if isinstance(v, decimal.Decimal)
                else v.decode("utf-8", "replace")
                if isinstance(v, (bytes, bytearray))
                else tuple(v)
                if isinstance(v, (list, tuple))
                else v
            )
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def compare(spark_df, oracle_sql: str, sf_dir: str, atol: float = 0.0) -> None:
    got = _normalize(spark_df.toPandas())
    want = _normalize(duck_con(sf_dir).execute(oracle_sql).df())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count mismatch: spark={len(got)} oracle={len(want)}"
    if atol == 0.0:
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    else:
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, check_exact=False, atol=atol, rtol=0.0
        )
