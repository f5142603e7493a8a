"""Schema-driven synthetic data generator — the nisshi-generator equivalent
(S9: rhai scripts in proto field options, nisshi-generator/src/lib.rs:164-460;
example etc/schema/taxi.proto with rand(1000..=2000) etc).

Spark-first: generators are column *expressions* over a monotonically
increasing row id — `rand(seed)` / hash-derived choices, fully JVM-side and
deterministic per seed, not Python faker UDFs. Works identically over a
batch `spark.range` or a streaming rate source.

Generator spec per field:
    ("rand_int", lo, hi)      uniform integer in [lo, hi]
    ("rand_float", lo, hi)    uniform double in [lo, hi)
    ("rand_bool", p)          1 with probability p else 0
    ("choice", [a, b, ...])   uniform pick
    ("first_name",) / ("last_name",) / ("safe_email",)   faker-style picks
    ("uuid",)                 deterministic uuid-shaped string
    ("seq",)                  the row id itself
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_FIRST = ["Ada", "Alan", "Grace", "Edsger", "Barbara", "Donald", "Radia", "Ken"]
_LAST = ["Lovelace", "Turing", "Hopper", "Dijkstra", "Liskov", "Knuth", "Perlman", "Thompson"]


def _gen_column(spec: tuple, idx: Column, seed: int) -> Column:
    kind = spec[0]
    # Per-field deterministic stream: hash of (row id, seed) → uniform bits.
    h = F.abs(F.hash(idx, F.lit(seed)))
    u = (h % 1_000_000) / 1_000_000.0  # uniform [0, 1)
    if kind == "rand_int":
        lo, hi = spec[1], spec[2]
        return (F.lit(lo) + (h % (hi - lo + 1))).cast("long")
    if kind == "rand_float":
        lo, hi = spec[1], spec[2]
        return F.round(F.lit(lo) + u * (hi - lo), 6)
    if kind == "rand_bool":
        return (u < spec[1]).cast("int")
    if kind == "choice":
        arr = F.array(*[F.lit(x) for x in spec[1]])
        return arr[(h % len(spec[1])).cast("int")]
    if kind == "first_name":
        return _gen_column(("choice", _FIRST), idx, seed)
    if kind == "last_name":
        return _gen_column(("choice", _LAST), idx, seed)
    if kind == "safe_email":
        return F.concat(
            F.lower(_gen_column(("choice", _FIRST), idx, seed)),
            F.lit("@example.com"),
        )
    if kind == "uuid":
        hx = F.lower(F.md5(F.concat(idx.cast("string"), F.lit(f":{seed}"))))
        return F.concat_ws(
            "-",
            F.substring(hx, 1, 8),
            F.substring(hx, 9, 4),
            F.substring(hx, 13, 4),
            F.substring(hx, 17, 4),
            F.substring(hx, 21, 12),
        )
    if kind == "seq":
        return idx.cast("long")
    raise ValueError(f"unknown generator kind {kind!r}")


def generate_batch(
    spark: SparkSession,
    fields: dict[str, tuple],
    n: int,
    seed: int = 42,
    key_field: str | None = None,
) -> DataFrame:
    """Batch of n synthetic records: value = JSON of the generated fields
    (plus optional key column), ready for Broker.produce."""
    df = spark.range(n).withColumnRenamed("id", "_idx")
    idx = F.col("_idx")
    for i, (name, spec) in enumerate(fields.items()):
        df = df.withColumn(name, _gen_column(spec, idx, seed + i))
    value = F.to_json(F.struct(*[F.col(n_) for n_ in fields]))
    out = df.select(
        (F.col(key_field) if key_field else F.col("_idx")).cast("string").cast("binary").alias("key"),
        value.cast("binary").alias("value"),
    )
    return out


def generator_stream(
    spark: SparkSession,
    fields: dict[str, tuple],
    rows_per_second: int = 100,
    seed: int = 42,
    key_field: str | None = None,
) -> DataFrame:
    """Streaming form over the rate source (readStream.format('rate')) —
    same generator expressions keyed on the rate source's row value."""
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .withColumnRenamed("value", "_idx")
    )
    idx = F.col("_idx")
    df = src
    for i, (name, spec) in enumerate(fields.items()):
        df = df.withColumn(name, _gen_column(spec, idx, seed + i))
    value = F.to_json(F.struct(*[F.col(n_) for n_ in fields]))
    return df.select(
        F.col("timestamp"),
        (F.col(key_field) if key_field else F.col("_idx")).cast("string").cast("binary").alias("key"),
        value.cast("binary").alias("value"),
    )


# The taxi generator from the reference's demo (etc/schema/taxi.proto rhai
# options), as a spec:
TAXI_FIELDS: dict[str, tuple] = {
    "vendor_id": ("rand_int", 1, 2),
    "trip_id": ("rand_int", 1000, 2000),
    "trip_distance": ("rand_float", 0.5, 30.0),
    "fare_amount": ("rand_float", 3.0, 200.0),
    "store_and_fwd": ("rand_bool", 0.2),
}
