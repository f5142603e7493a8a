"""BPE tokenizer training: learn subword merges from a corpus.

The classic byte-pair-encoding training loop (the vocabulary-building
stage of an LLM data pipeline): pre-tokenize, aggregate to a WORD
FREQUENCY table, then repeatedly merge the globally most frequent
adjacent symbol pair. The key scale property — shared with fastBPE /
HuggingFace trainers — is that the corpus is scanned ONCE; every round
after that runs over the word-frequency table (|distinct words| rows,
millions at web scale vs trillions of tokens), so a round is one small
partial-agg shuffle plus a map-only merge application.

Cross-engine exactness: symbol sequences are space-joined strings folded
with a left-greedy accumulator (Spark `aggregate` HOF / DuckDB
`list_reduce` — both fold left over the symbol list, so "aaa" under
merge (a,a) becomes [aa, a], the standard BPE behavior); pair counts
are integer sums; the argmax tie-breaks lexicographically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tansu_spark.functions.text import bpe_tokens

# Pre-tokens are capped at 64 symbols before merge application, on BOTH
# engines: the left-greedy fold is O(len^2) in the word length (each
# step regex-scans a growing accumulator string), which natural-language
# words never notice (GPT-2-style pre-tokenization keeps them short) but
# a 100k-char single-token blob turns into ~10^10 char operations — the
# hostile gate measured it as a hang. Runs longer than 64 chars segment
# at fixed 64-char boundaries (merges never cross a segment boundary —
# the disclosed approximation); real corpora are bit-identical.
WORD_CAP = 64


def bpe_words(c) -> F.Column:
    """Pre-tokens segmented at WORD_CAP chars (see note above) — the
    unit the word-frequency table, training folds, and encode
    dictionary all share."""
    cap = F.lit(WORD_CAP)

    def seg(w):
        n_seg = ((F.length(w) - F.lit(1)) / cap).cast("int")
        return F.transform(
            F.sequence(F.lit(0), n_seg),
            lambda k: F.substring(w, k * cap + 1, cap),
        )

    return F.flatten(F.transform(bpe_tokens(c), seg))


# Fold one merge (a, b) -> m through a symbol string "s1 s2 ... sn".
# `[^ ]+$` (one-or-more, never empty) matches the last symbol exactly once
# in BOTH regex engines — `[^ ]*$` would double-fire in Java's replaceAll
# (an empty trailing match after the real one) but not in RE2.
_FOLD = """
split(aggregate(slice(s, 2, greatest(size(s)-1, 0)), element_at(s, 1),
  (acc, x) -> CASE WHEN regexp_extract(acc, '[^ ]+$', 0) = '{a}' AND x = '{b}'
                   THEN regexp_replace(acc, '[^ ]+$', '{m}')
                   ELSE concat(acc, ' ', x) END), ' ')
"""


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(wd, n): the corpus's pre-token frequency table — the only pass
    over the raw text."""
    return (
        docs.select(F.explode(bpe_words(text_col)).alias("wd"))
        .groupBy("wd")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bpe_train(docs: DataFrame, text_col: str = "text", n_merges: int = 5) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns a DataFrame
    (round, lhs, rhs, merged, pair_count) — the ordered merge list that
    IS a trained tokenizer.

    Each round: adjacent-pair counts weighted by word frequency (one
    shuffle over the word table), a 1-row argmax collect, then the merge
    applied map-side via the fold expression. The argmax literal is
    baked into the next round's plan, so every round's lineage stays
    constant-size (no growing iterative plan)."""
    wf = word_frequencies(docs, text_col).localCheckpoint(eager=True)
    return _train_from_wf(docs.sparkSession, wf, n_merges)


def _train_from_wf(spark, wf: DataFrame, n_merges: int) -> DataFrame:
    """Training rounds over a MATERIALIZED word-frequency table: the raw
    corpus is scanned exactly once (building ``wf``); without the
    upfront checkpoint the first argmax AND the first fold-materialize
    each re-ran the corpus explode+groupBy (two full scans — measured
    as most of an 8 s training pass at sf0.1)."""
    syms = wf.select(
        "n",
        F.expr("transform(sequence(1, length(wd)), i -> substring(wd, i, 1))").alias(
            "s"
        ),
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(n_merges):
        pairs = syms.filter(F.size("s") >= 2).select(
            "n",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(s)-1),"
                    " i -> concat(element_at(s, i), ' ', element_at(s, i+1)))"
                )
            ).alias("pair"),
        )
        best = (
            pairs.groupBy("pair")
            .agg(F.sum("n").cast("long").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b = best[0]["pair"].split(" ", 1)
        m = a + b
        merges.append((r, a, b, m, int(best[0]["cnt"])))
        syms = syms.select("n", F.expr(_FOLD.format(a=a, b=b, m=m)).alias("s"))
        # Truncate lineage every few rounds, not every round: a handful of
        # nested folds analyze fine, and skipping the per-round eager
        # materialization job halves the round count's job overhead. Deep
        # unchecked nesting is still avoided (k-fold expression nesting
        # blows up analysis time at high merge counts).
        if (r + 1) % 4 == 0:
            syms = syms.localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "round int, lhs string, rhs string, merged string, pair_count long"
    )


# Pre-tokenization as a SQL fragment (same regex as text.BPE_PATTERN) so
# the encoder can build one nested-HOF expression string. NB the doubled
# backslash: Spark's SQL parser escape-processes string literals, so a
# bare '\s' inside F.expr would silently become 's' (unlike F.lit, which
# ships the Python string verbatim).
_BPE_RE_SQL = r"regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)"

# Fold one merge through a space-joined symbol string s (the lambda var
# of the enclosing transform shadows the column name on purpose).
_FOLD_STR = """
aggregate(slice(sy, 2, greatest(size(sy)-1, 0)), element_at(sy, 1),
  (acc, x) -> CASE WHEN regexp_extract(acc, '[^ ]+$', 0) = '{a}' AND x = '{b}'
                   THEN regexp_replace(acc, '[^ ]+$', '{m}')
                   ELSE concat(acc, ' ', x) END)
"""


def bpe_encode(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 5,
    merges: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Tokenize every document under a trained BPE merge list (trains one
    with ``bpe_train`` when not given): returns (doc_id, n_pretokens,
    n_subwords, tokens_per_char) — the token-budget accounting an LLM
    pipeline runs over a candidate corpus.

    Dictionary-encoded, the fastBPE trick on the ENCODE side too: a
    word's subword count is a pure function of the word, so the K fold
    chains run once per DISTINCT pre-token (the vocabulary — millions of
    rows at web scale) instead of once per token INSTANCE (trillions).
    The corpus pass is then explode + a broadcast join against the tiny
    (word, n_sub) dictionary + one partial-agg shuffle on doc_id.
    Measured ~6x over folding every instance at sf0.1; the gap widens
    with corpus/vocabulary ratio."""
    words = None
    if merges is None:
        # One corpus scan serves BOTH training and the encode dictionary:
        # the materialized word-frequency table is the vocabulary.
        wf = word_frequencies(docs, text_col).localCheckpoint(eager=True)
        merges = [
            (r["lhs"], r["rhs"], r["merged"])
            for r in _train_from_wf(docs.sparkSession, wf, n_merges).collect()
        ]
        words = wf.select("wd")
    if words is None:
        words = docs.select(F.explode(bpe_words(text_col)).alias("wd")).distinct()
    # (wd, n_sub) dictionary: chars -> K folds, each a chained projection
    # over the DISTINCT word table (column refs, so no expression blowup).
    wtab = words.withColumn(
        "sy",
        F.expr("transform(sequence(1, length(wd)), i -> substring(wd, i, 1))"),
    )
    for a, b, m in merges:
        fold = _FOLD_STR.format(a=a, b=b, m=m)
        wtab = wtab.withColumn("sy", F.expr(f"split({fold}, ' ')"))
    wtab = wtab.select("wd", F.size("sy").cast("long").alias("_n_sub"))

    # n_pretokens falls out of the explode itself (count of non-null
    # occurrences) — recomputing it as size(regexp_extract_all(text))
    # after the join would re-run the full-text regex once per TOKEN
    # (Catalyst collapses projections into the join output; measured 5 s
    # of the old 6 s at sf0.1 was exactly that). The doc-length column
    # lives in its OWN subtree for the same reason: projected next to
    # the explode, CollapseProject carried text/length(text) through
    # the Generate and the join — per-token cost proportional to
    # DOCUMENT size, which the hostile 10 MB doc turned into a hang
    # (1.5M tokens x 10 MB). A doc_id join against the scan-grain
    # (doc_id, length) table keeps the exploded rows two scalars wide.
    nc = docs.select("doc_id", F.length(F.col(text_col)).alias("_nc"))
    occ = docs.select(
        "doc_id",
        F.explode_outer(bpe_words(text_col)).alias("wd"),
    )
    counted = (
        occ.join(F.broadcast(wtab), "wd", "left")
        .groupBy("doc_id")
        .agg(
            F.count("wd").cast("int").alias("n_pretokens"),
            F.sum(F.coalesce("_n_sub", F.lit(0))).cast("long").alias("n_subwords"),
        )
    )
    return counted.join(nc, "doc_id").select(
        "doc_id",
        "n_pretokens",
        "n_subwords",
        F.round(
            F.col("n_subwords").cast("double") / F.greatest(F.col("_nc"), F.lit(1)),
            6,
        ).alias("tokens_per_char"),
    )
