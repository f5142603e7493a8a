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
    # Materialized once (optimization r10): the sketch table (<= k longs
    # per group) feeds the per-group summary and BOTH pair-merge sides —
    # lazily it replicated the whole raw-data distinct+window upstream
    # under each consumer (32 static scans in the r10 plan audit of
    # kmv_supplier_overlap_by_brand).
    sk = (
        kmv_sketch(df, value_col, [group_col], k)
        .select(F.col(group_col).alias("g"), "v")
        .localCheckpoint(eager=True)
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


# ----------------------------------------------------------------- HLL
# HyperLogLog (Flajolet et al. 2007) — register-explicit and md5-hashed,
# so unlike engine-native HLLs (the reason this module previously shipped
# only KMV) every intermediate IS oracle-checkable: the register table is
# a groupBy, and the harmonic sum is EXACT in f64 (each term is a single
# power of two in [2^-40, 2^0]; 256 such terms span < 53 mantissa bits,
# so the sum is exactly representable and order-independent).

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
_HLL_SUFFIX_BITS = 32  # 40-bit hash = 8 register bits + 32 rank bits
_HLL_SUFFIX_SPACE = 1 << _HLL_SUFFIX_BITS
# alpha_m for m = 256 — the SAME Python double literal is inlined on both
# engines, so the constant can't diverge.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def _rank_case_sql(suffix: str) -> str:
    """Leading-zero rank of a 32-bit suffix as a pure CASE ladder —
    integer comparisons only (no log2 rounding hazards), identical text
    on both engines. rank = leading_zeros + 1; all-zero suffix -> 33."""
    branches = [
        f"WHEN {suffix} >= {1 << (_HLL_SUFFIX_BITS - r)} THEN {r}"
        for r in range(1, _HLL_SUFFIX_BITS + 1)
    ]
    return "CASE " + " ".join(branches) + f" ELSE {_HLL_SUFFIX_BITS + 1} END"


def hll_registers(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-group HLL register table: group_cols + (reg INT, mx INT) —
    max leading-zero rank seen in each of the m=256 registers. This IS
    the sketch (mergeable by max over reg), and the shuffle carries at
    most m rows per group per map partition after partial aggregation."""
    v = hash_value(value_col)
    reg = (v / F.lit(_HLL_SUFFIX_SPACE)).cast("long")  # top 8 of 40 bits
    suffix = v % F.lit(_HLL_SUFFIX_SPACE)
    rank = F.expr(_rank_case_sql("_sfx"))
    return (
        df.select(*group_cols, reg.alias("reg"), suffix.alias("_sfx"))
        .withColumn("mx", rank)
        .groupBy(*group_cols, "reg")
        .agg(F.max("mx").alias("mx"))
    )


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    round_digits: int = 6,
) -> DataFrame:
    """Per-group HLL cardinality estimate. Output: group_cols +
    (regs_hit BIGINT, raw_estimate DOUBLE, est_distinct DOUBLE) — raw is
    alpha·m²/S with S the exact harmonic sum (untouched registers
    contribute 2^0 = 1); est applies the standard small-range linear-
    counting correction (m·ln(m/zeros) when raw <= 2.5m and zeros > 0)."""
    m = HLL_M
    regs = hll_registers(df, value_col, group_cols)
    per = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("regs_hit"),
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("_s_hit"),
    )
    s = (F.lit(float(m)) - F.col("regs_hit")) + F.col("_s_hit")
    raw = F.lit(HLL_ALPHA) * F.lit(float(m * m)) / s
    zeros = F.lit(m) - F.col("regs_hit")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return per.select(
        *group_cols,
        "regs_hit",
        F.round(raw, round_digits).alias("raw_estimate"),
        F.round(est, round_digits).alias("est_distinct"),
    )


def hll_oracle_sql(
    value_col: str, group_col: str, table: str, where: str = "TRUE"
) -> str:
    """DuckDB replay of hll_distinct for one group column: the same md5
    Horner hash, register split, CASE-ladder rank, exact harmonic sum,
    and correction branch."""
    m = HLL_M
    # CAST literals to DOUBLE: bare decimal literals parse as DECIMAL in
    # DuckDB and the alpha*m^2 product overflows DECIMAL(18).
    a = f"CAST({HLL_ALPHA!r} AS DOUBLE)"
    mm = f"CAST({float(m * m)!r} AS DOUBLE)"
    mf = f"CAST({float(m)!r} AS DOUBLE)"
    return f"""
    WITH hv AS (SELECT {group_col} AS g,
                       {kmv_oracle_value_sql(value_col)} AS v
                FROM {table} WHERE {where}),
    parts AS (SELECT g, v // {_HLL_SUFFIX_SPACE} AS reg,
                     v % {_HLL_SUFFIX_SPACE} AS sfx
              FROM hv),
    regs AS (SELECT g, reg, max({_rank_case_sql("sfx")}) AS mx
             FROM parts GROUP BY g, reg),
    per AS (SELECT g, CAST(count(*) AS BIGINT) AS regs_hit,
                   ({m} - count(*)) + sum(power(2.0, -mx)) AS s
            FROM regs GROUP BY g)
    SELECT g AS {group_col}, regs_hit,
           round({a} * {mm} / s, 6) AS raw_estimate,
           round(CASE WHEN {a} * {mm} / s <= {2.5 * m}
                       AND {m} - regs_hit > 0
                      THEN {mf} * ln({mf} / ({m} - regs_hit))
                      ELSE {a} * {mm} / s END, 6) AS est_distinct
    FROM per
    """


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
