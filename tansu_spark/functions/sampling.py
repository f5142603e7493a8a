"""Deterministic sampling operators for training-data pipelines.

The primitive is a hash-threshold filter: a row is kept iff
md5(seed ':' key) sorts below a hex threshold derived from the fraction.
md5 hex is fixed-length lowercase, so lexicographic comparison equals
numeric comparison on the underlying 128-bit value — the same filter
expression runs in any engine (the DuckDB oracles reuse it verbatim).

Why hash sampling instead of `df.sample()`:
- reproducible across runs, engines, partitionings and retries (rand()
  is none of those) — a training-data pipeline must be able to re-derive
  exactly which rows it trained on;
- key-consistent: sampling on a join/dedup key keeps or drops every row
  with that key together, so downstream joins of two independently
  sampled tables still line up;
- embarrassingly parallel: a codegen'd filter on the scan, no shuffle,
  no global coordination — identical cost at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key: Column | str, seed: int = 0) -> Column:
    """The 32-char md5 hex of (seed ':' key) — uniform over [0, 16^32)."""
    k = F.col(key) if isinstance(key, str) else key
    return F.md5(F.concat(F.lit(str(seed)), F.lit(":"), k.cast("string")))


def fraction_threshold(fraction: float) -> str:
    """Hex-string threshold such that P[md5 < threshold] = fraction
    (8-nibble resolution, ~2.3e-10 granularity)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    if fraction >= 1.0:
        return "g"  # sorts above every hex digit
    return format(int(fraction * 16**8), "08x")


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose key hashes under the
    fraction threshold. All rows sharing a key are kept or dropped
    together."""
    return df.filter(hash_bucket(key_col, seed) < F.lit(fraction_threshold(fraction)))


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: int = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample by language to
    rebalance a corpus). Strata not listed get `default_fraction`.
    One codegen'd CASE over the scan — no shuffle, no per-stratum jobs."""
    th = F.lit(fraction_threshold(default_fraction))
    for stratum, frac in sorted(fractions.items()):
        th = F.when(
            F.col(strata_col) == stratum, F.lit(fraction_threshold(frac))
        ).otherwise(th)
    return df.filter(hash_bucket(key_col, seed) < th)


def weighted_upsample(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    key_col: str,
    seed: int = 0,
    default_weight: float = 1.0,
) -> DataFrame:
    """Corpus mixing: emit each row `weight` times in expectation — the
    "epochs per source" knob of an LLM data-mixing pipeline. A weight of
    2.5 yields 2 copies of every row plus a 3rd for the deterministic
    50% of keys whose hash falls under the fractional threshold; weights
    < 1 downsample. Adds an `epoch` column (0-based copy index) so
    downstream shuffles can spread copies across the corpus.

    Map-only: one codegen'd CASE pair + array_repeat/posexplode, no
    shuffle, no RNG — the mix is reproducible row-for-row at any scale
    and any partitioning."""
    floor_w = F.lit(int(default_weight))
    th = F.lit(fraction_threshold(default_weight - int(default_weight)))
    for stratum, w in sorted(weights.items()):
        if w < 0:
            raise ValueError(f"weight must be >= 0, got {w} for {stratum!r}")
        is_s = F.col(strata_col) == stratum
        floor_w = F.when(is_s, F.lit(int(w))).otherwise(floor_w)
        th = F.when(is_s, F.lit(fraction_threshold(w - int(w)))).otherwise(th)
    extra = (hash_bucket(key_col, seed) < th).cast("int")
    n_copies = floor_w + extra
    return df.select(
        df["*"], F.posexplode(F.array_repeat(F.lit(1), n_copies)).alias("epoch", "_one")
    ).drop("_one")


def uniform_k_per_group(
    df: DataFrame, group_col: str, k: int, key_col: str, seed: int = 0
) -> DataFrame:
    """Exactly-k uniform sample per group (deterministic reservoir
    equivalent): rank rows within each group by their key hash and keep
    the first k. One shuffle on the group column; the hash order is
    computed map-side and ties break on the key itself so the result is
    a total order regardless of partitioning."""
    h = hash_bucket(key_col, seed)
    w = Window.partitionBy(group_col).orderBy(h, F.col(key_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def weighted_sample(
    df: DataFrame, key_col: str, weight: Column, seed: int = 0
) -> DataFrame:
    """Importance sampling: keep each row with probability ``weight``
    (a column in [0, 1] — e.g. a quality score), decided by the same
    deterministic md5 coin as `hash_sample`. u = hash/2^32 gives a
    uniform [0,1) draw that is identical in any engine; the row is kept
    iff u < weight. Reproducible, key-consistent, map-only — the
    scale-shape of quality-proportional corpus selection (keep good
    documents with high probability, long-tail junk with low, never a
    shuffle)."""
    from pyspark.sql import functions as F

    nib8 = F.substring(hash_bucket(key_col, seed), 1, 8)
    u = F.conv(nib8, 16, 10).cast("double") / F.lit(float(16**8))
    return df.filter(u < weight)
