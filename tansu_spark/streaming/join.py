"""Stream-stream interval joins with watermark-bounded state.

Reference parity: the reference has no cross-topic join — consumers
correlate topics client-side. Structured Streaming makes the correlation
a first-class operator: two watermarked streams equi-join on a key with
an event-time interval predicate, and the watermarks BOUND THE JOIN
STATE — rows older than (watermark - interval slack) are evicted, so
state is O(in-flight window), not O(stream history). That state bound is
the whole difference between "joins two demos" and "runs for a year at
100 TB/day".

The batch twin (`interval_join`) is the same predicate on static frames —
used in tests to pin stream/batch agreement, and the right tool for
backfills over already-landed segments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pred(key: str, l_ts: str, r_ts: str, lower: str, upper: str):
    return (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{r_ts}") >= F.expr(f"l.{l_ts} - interval {lower}"))
        & (F.col(f"r.{r_ts}") <= F.expr(f"l.{l_ts} + interval {upper}"))
    )


def _project(left: DataFrame, right: DataFrame, key: str) -> list:
    # coalesce: for inner/left_outer the left key is always present; for
    # right/full outer the unmatched right rows carry the key alone.
    cols = [F.coalesce(F.col(f"l.{key}"), F.col(f"r.{key}")).alias(key)]
    cols += [F.col(f"l.{c}").alias(f"l_{c}") for c in left.columns if c != key]
    cols += [F.col(f"r.{c}").alias(f"r_{c}") for c in right.columns if c != key]
    return cols


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    l_ts: str,
    r_ts: str,
    lower: str = "0 seconds",
    upper: str = "5 minutes",
) -> DataFrame:
    """Batch twin: rows of `right` within [l_ts - lower, l_ts + upper] of
    each matching `left` row. Output columns: key, l_*, r_*."""
    j = left.alias("l").join(
        right.alias("r"), _pred(key, l_ts, r_ts, lower, upper), "inner"
    )
    return j.select(*_project(left, right, key))


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    l_ts: str,
    r_ts: str,
    lower: str = "0 seconds",
    upper: str = "5 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Streaming interval join: both sides watermarked on their event-time
    column, joined on `key` with the same interval predicate as the batch
    twin. Spark derives the state-retention bound for each side from the
    watermark plus the interval slack — late rows beyond it are dropped
    and their state evicted.

    ``how="left_outer"`` adds WATERMARK-EXPIRY NULL PADDING: a left row
    that found no right match emits once, null-padded, when the watermark
    passes its join window's upper bound (r_ts can no longer arrive) —
    the "purchases with NO click in 24 h" attribution shape. Matched rows
    still emit immediately; only the negative verdict waits for the
    watermark, which is exactly what bounds the state. Under an
    availableNow replay of a finite source, the final no-data batch
    advances the watermark past every event, so the result equals the
    batch left-outer twin row-for-row (pinned by the
    streaming_interval_join_outer gate entry)."""
    lw = left.withWatermark(l_ts, watermark)
    rw = right.withWatermark(r_ts, watermark)
    j = lw.alias("l").join(
        rw.alias("r"), _pred(key, l_ts, r_ts, lower, upper), how
    )
    return j.select(*_project(left, right, key))
