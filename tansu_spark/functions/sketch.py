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


def kmv_sketch(
    df: DataFrame, value_col: str, group_cols: list[str], k: int = 64
) -> DataFrame:
    """The sketch itself: per group, the k smallest distinct hash values
    (columns: group_cols + v). This is the state a production pipeline
    would persist — k longs per group — and what merge operates on."""
    hv = df.select(*group_cols, hash_value(value_col).alias("v")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("v")
    return hv.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k).drop(
        "_rn"
    )


def _estimate(n_col: Column, uk_col: Column, k: int, round_digits: int) -> Column:
    return F.when(n_col < k, n_col.cast("double")).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(float(H_SPACE)) / uk_col, round_digits)
    )


def kmv_merge_pairs(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: int = 64,
    round_digits: int = 6,
) -> DataFrame:
    """Pairwise set-cardinality estimates between groups, from merged
    sketches: |A|, |B|, |A∪B| (k smallest of the two sketches' union —
    the KMV merge rule), |A∩B| by inclusion-exclusion, and Jaccard.

    Scale path: after kmv_sketch each group is <= k longs, so the
    pairwise merge join touches sketch summaries, never the raw sets —
    the reason sketches exist. Output: (g_a, g_b, est_a, est_b,
    est_union, est_intersection, jaccard)."""
    sk = kmv_sketch(df, value_col, [group_col], k).select(
        F.col(group_col).alias("g"), "v"
    )
    per = sk.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"), F.max("v").alias("uk")
    )
    a = sk.select(F.col("g").alias("g_a"), "v")
    b = sk.select(F.col("g").alias("g_b"), "v")
    pairs = (
        per.select(F.col("g").alias("g_a"))
        .crossJoin(F.broadcast(per.select(F.col("g").alias("g_b"))))
        .filter(F.col("g_a") < F.col("g_b"))
    )
    merged = (
        pairs.join(a, "g_a")
        .unionByName(pairs.join(b, "g_b").select("g_a", "g_b", "v"))
        .distinct()
    )
    wp = Window.partitionBy("g_a", "g_b").orderBy("v")
    u = (
        merged.withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") <= k)
        .groupBy("g_a", "g_b")
        .agg(F.count(F.lit(1)).alias("n_u"), F.max("v").alias("uk_u"))
    )
    pa = per.select(F.col("g").alias("g_a"), F.col("n").alias("n_a"), F.col("uk").alias("uk_a"))
    pb = per.select(F.col("g").alias("g_b"), F.col("n").alias("n_b"), F.col("uk").alias("uk_b"))
    est_a = _estimate(F.col("n_a"), F.col("uk_a"), k, round_digits)
    est_b = _estimate(F.col("n_b"), F.col("uk_b"), k, round_digits)
    est_u = _estimate(F.col("n_u"), F.col("uk_u"), k, round_digits)
    inter = F.greatest(F.round(est_a + est_b - est_u, round_digits), F.lit(0.0))
    return (
        u.join(pa, "g_a")
        .join(pb, "g_b")
        .select(
            "g_a",
            "g_b",
            est_a.alias("est_a"),
            est_b.alias("est_b"),
            est_u.alias("est_union"),
            inter.alias("est_intersection"),
            F.round(inter / est_u, round_digits).alias("jaccard"),
        )
    )


def cms_cells(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    weight: Column | None = None,
) -> DataFrame:
    """Count-Min sketch CELLS (Cormode & Muthukrishnan 2005): one row per
    (row, col) bucket with its summed weight. Each key hashes to `depth`
    buckets (md5-seeded, so the sketch is identical on any engine or
    partitioning); a cell's count is the sum of every colliding key's
    weight. The cell table IS the sketch — mergeable by summing cells
    across sketches/partitions, the property production sketch stores
    rely on.

    Scale: one groupBy on (row, col) — at most depth x width cells leave
    each map partition regardless of input size."""
    w = F.lit(1).cast("long") if weight is None else weight
    rows = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(str(r)),
                                    F.lit(":"),
                                    F.col(key_col).cast("string"),
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % width
                ).alias("c"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(w.alias("_w"), F.explode(rows).alias("b"))
        .select(F.col("b.r").alias("row"), F.col("b.c").alias("col"), "_w")
        .groupBy("row", "col")
        .agg(F.sum("_w").cast("long").alias("cell"))
    )


def cms_estimate(
    cells: DataFrame, keys: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point queries against a CMS cell table: estimate(key) = min over
    the depth rows of the key's cell — never under the true count,
    over-counts bounded by collisions (eps ~ e/width with prob
    1 - e^-depth). The probe set joins the (tiny, <= depth x width) cell
    table; keys hashing to an untouched cell read 0."""
    probes = keys.select(F.col(key_col).alias("key")).distinct()
    probe_cells = probes.select(
        "key",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        (
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat(
                                            F.lit(str(r)),
                                            F.lit(":"),
                                            F.col("key").cast("string"),
                                        )
                                    ),
                                    1,
                                    8,
                                ),
                                16,
                                10,
                            ).cast("long")
                            % width
                        ).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("b"),
    ).select("key", "b.row", "b.col")
    return (
        probe_cells.join(F.broadcast(cells), ["row", "col"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("cell", F.lit(0))).cast("long").alias("estimate"))
    )
