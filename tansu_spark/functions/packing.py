"""Sequence packing & shard assignment — the last-mile operators between a
curated corpus and a training run.

Reference parity: none (the reference has no training-data surface —
extension territory like dedup/similarity, SURVEY §2 driver extensions).

``sequence_pack``: GPT-style packed-sequence accounting. Documents are
concatenated per source in deterministic (doc_id) order into one token
stream, and the stream is cut into fixed ``budget``-token training
sequences; documents straddle cuts (their tokens split across two
sequences), so the report per sequence counts the docs that touch it,
its token fill (== budget for all but each source's tail sequence), and
how many docs were split by its leading boundary. This is the packing
bookkeeping a trainer needs to audit: how many sequences a corpus
yields at a context length, and the doc-boundary fragmentation rate.

Scale design: the cumulative offset is a per-SOURCE window (sources are
the packing unit; they parallelize across the cluster — no global
sort), the sequence fan-out is a map-only ``sequence()`` explode with
per-doc width ⌈tokens/budget⌉ (≈1 for normal docs), and the final
groupBy is a partial-agg shuffle on (source, seq_id). No driver state.

``shard_assign``: deterministic md5-derived shard ids (the same
cross-engine hash discipline as ``sampling.hash_bucket``): shard =
int(md5(seed:key)[:8], 16) % n_shards — reproducible on any engine or
partitioning, uniform, and key-consistent, so re-sharding a grown
corpus moves only data whose hash says so, never because a partitioner
changed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tansu_spark.functions.sampling import hash_bucket


def token_count(text_col: str = "text") -> Column:
    """Whitespace-run token count — the same [^ ]+ tokenization on every
    engine."""
    return F.size(F.regexp_extract_all(text_col, F.lit("[^ ]+"), F.lit(0)))


def sequence_pack(
    docs: DataFrame,
    budget: int,
    group_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per (group, seq_id): the packed-sequence accounting described in
    the module docstring. Zero-token docs are excluded (they occupy no
    stream positions)."""
    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.col(order_col).alias("oid"),
        token_count(text_col).cast("long").alias("n_tok"),
    ).filter(F.col("n_tok") > 0)
    w = Window.partitionBy("grp").orderBy("oid")
    spans = toks.select(
        "grp",
        "oid",
        "n_tok",
        (F.sum("n_tok").over(w) - F.col("n_tok")).alias("start"),
        F.sum("n_tok").over(w).alias("end"),
    )
    b = F.lit(budget)
    exploded = spans.select(
        "grp",
        "oid",
        "start",
        "end",
        F.explode(
            F.sequence(
                (F.col("start") / b).cast("long"),
                ((F.col("end") - 1) / b).cast("long"),
            )
        ).alias("seq_id"),
    )
    lo = F.greatest(F.col("start"), F.col("seq_id") * b)
    hi = F.least(F.col("end"), (F.col("seq_id") + 1) * b)
    return (
        exploded.groupBy(F.col("grp").alias(group_col), "seq_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(hi - lo).cast("long").alias("fill_tokens"),
            # a doc is SPLIT by this sequence's leading cut if it began
            # before the cut (continuation fragment)
            F.sum((F.col("start") < F.col("seq_id") * b).cast("int"))
            .cast("long")
            .alias("n_continuations"),
            F.min("oid").alias("first_doc"),
            F.max("oid").alias("last_doc"),
        )
    )


def shard_assign(
    df: DataFrame, key_col: str, n_shards: int, seed: int = 0
) -> DataFrame:
    """Append a deterministic `shard` column in [0, n_shards)."""
    nib8 = F.substring(hash_bucket(key_col, seed), 1, 8)
    shard = (F.conv(nib8, 16, 10).cast("long") % n_shards).cast("int")
    return df.withColumn("shard", shard)
