"""Every registered query with an oracle is compared against DuckDB at
sf0.001 (the driver does the same at sf0.01) — exact equality, mirroring
the driver's value-hash gate."""

from __future__ import annotations

import pytest

from tansu_spark.queries import ORACLE, QUERIES
from tests.oracle_util import compare

ORACLED = sorted(ORACLE)


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    compare(df, ORACLE[name], sf_dir)


def test_rows_only_queries_run(spark, sf_dir):
    for name in sorted(set(QUERIES) - set(ORACLE)):
        n = QUERIES[name](spark, sf_dir).count()
        assert n >= 0, name
