"""KMV (k-minimum-values) distinct-count sketch — a mergeable cardinality
estimator with a deterministic, cross-engine-checkable construction.

Why KMV and not HyperLogLog here: HLL implementations differ between
engines (register layout, bias correction), so results can't be
oracle-verified. KMV's estimate is a pure function of the k smallest
hash values — with a shared hash (md5) the estimate is bit-identical
everywhere, while keeping HLL-class accuracy (rse ~ 1/sqrt(k-2)).

Estimator (Bar-Yossef et al. 2002): hash distinct values uniformly into
[0, H); if fewer than k distinct hashes exist the count is exact; else
estimate = (k-1) * H / u_k where u_k is the k-th smallest hash value.

At scale: the sketch is `groupBy(key).agg(k smallest distinct hashes)` —
shuffle carries at most k values per key per map partition (partial
aggregation collapses the rest), the same merge property production
sketch libraries (DataSketches) rely on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 10 hex chars of md5 -> uniform integer in [0, 16^10). 16^10 = 2^40 keeps
# Horner arithmetic exact in BIGINT on both engines.
N_HEX = 10
H_SPACE = 16**N_HEX


def hash_value(col: str) -> Column:
    """Uniform hash to [0, 16^10): Horner fold of the first 10 hex chars
    of md5(cast(col as string)) — expressible identically in any SQL
    dialect with md5/substring/instr (see kmv_oracle_value_sql).
    ``col`` is a column name (the md5 subexpression is shared by CSE)."""
    v = F.lit(0).cast("long")
    for i in range(N_HEX):
        d = F.expr(
            f"instr('0123456789abcdef', substring(md5(CAST({col} AS STRING)), {i + 1}, 1)) - 1"
        )
        v = v * 16 + d
    return v


def kmv_oracle_value_sql(col: str) -> str:
    """The same Horner fold as hash_value, as engine-portable SQL."""
    expr = "CAST(0 AS BIGINT)"
    for i in range(N_HEX):
        d = f"(strpos('0123456789abcdef', substring(md5(CAST({col} AS VARCHAR)), {i + 1}, 1)) - 1)"
        expr = f"({expr} * 16 + {d})"
    return expr


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: int = 64,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col``.

    Output: group_cols + (n_hashes BIGINT — exact when < k),
    (est_distinct DOUBLE — the KMV estimate, == n_hashes when exact).
    """
    hv = df.select(*group_cols, hash_value(value_col).alias("_v")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_v")
    ranked = hv.withColumn("_rn", F.row_number().over(w))
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.max(F.when(F.col("_rn") == k, F.col("_v"))).alias("_uk"),
    )
    est = F.when(F.col("n_hashes") < k, F.col("n_hashes").cast("double")).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(float(H_SPACE)) / F.col("_uk"), round_digits)
    )
    return agg.select(*group_cols, "n_hashes", est.alias("est_distinct"))
