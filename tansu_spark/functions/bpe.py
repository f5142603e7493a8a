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
from tansu_spark.materialize import corpus_checkpoint

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
    wf = word_frequencies(docs, text_col).transform(corpus_checkpoint)
    return _train_from_wf(docs.sparkSession, wf, n_merges)


# Column-argument variant of _FOLD: the merge triple comes from a
# broadcast 1-row table (_a, _b, _m) instead of baked-in literals, so a
# round's fold can be PLANNED before the argmax result is known — the
# mechanism behind the two-merges-per-job training below. Behavior is
# identical: the same strings reach the same regexp_extract /
# regexp_replace calls whether they arrive as literals or columns.
_FOLD_COLS = """
split(aggregate(slice(s, 2, greatest(size(s)-1, 0)), element_at(s, 1),
  (acc, x) -> CASE WHEN regexp_extract(acc, '[^ ]+$', 0) = _a AND x = _b
                   THEN regexp_replace(acc, '[^ ]+$', _m)
                   ELSE concat(acc, ' ', x) END), ' ')
"""


def _train_from_wf(spark, wf: DataFrame, n_merges: int) -> DataFrame:
    """Training rounds over a MATERIALIZED word-frequency table: the raw
    corpus is scanned exactly once (building ``wf``); without the
    upfront checkpoint the first argmax AND the first fold-materialize
    each re-ran the corpus explode+groupBy (two full scans — measured
    as most of an 8 s training pass at sf0.1).

    TWO merges per collect (optimization r11, guide §1.2 serial-chain
    cost): the classic loop is inherently serial (merge r+1's argmax
    needs merge r), which cost one driver round-trip job per merge. The
    even round's argmax result now feeds the odd round INSIDE one plan:
    the best pair is a broadcast 1-row table cross-joined onto the
    symbol table, the fold reads it as COLUMNS (_FOLD_COLS), and the
    second argmax runs over that folded table — one collect returns both
    rounds' (pair, cnt) rows. Pair counts and tie-breaks are computed by
    the same expressions either way, so the learned merge list is
    bit-identical; the only cost is the even round's pair-count subtree
    appearing twice in the fused plan (once for its output row, once
    under the fold), which the measured job-overhead saving exceeds on
    the small word-frequency table."""
    syms = wf.select(
        "n",
        F.expr("transform(sequence(1, length(wd)), i -> substring(wd, i, 1))").alias(
            "s"
        ),
    )

    def pair_counts(df: DataFrame) -> DataFrame:
        return (
            df.filter(F.size("s") >= 2)
            .select(
                "n",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(s)-1),"
                        " i -> concat(element_at(s, i), ' ', element_at(s, i+1)))"
                    )
                ).alias("pair"),
            )
            .groupBy("pair")
            .agg(F.sum("n").cast("long").alias("cnt"))
        )

    def best1(df: DataFrame) -> DataFrame:
        return (
            pair_counts(df)
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
        )

    merges: list[tuple[int, str, str, str, int]] = []
    r = 0
    while r < n_merges:
        b1 = best1(syms)
        if r + 1 < n_merges:
            # Speculative odd round: apply the (not-yet-collected) best
            # pair via broadcast columns, take the argmax of the folded
            # table, return both rows in one collect.
            m1 = b1.select(
                F.split("pair", " ", 2).getItem(0).alias("_a"),
                F.split("pair", " ", 2).getItem(1).alias("_b"),
            ).withColumn("_m", F.concat("_a", "_b"))
            folded = syms.crossJoin(F.broadcast(m1)).select(
                "n", F.expr(_FOLD_COLS).alias("s")
            )
            b2 = best1(folded)
            rows = (
                b1.select(F.lit(r).alias("round"), "pair", "cnt")
                .unionByName(
                    b2.select(F.lit(r + 1).alias("round"), "pair", "cnt")
                )
                .orderBy("round")
                .collect()
            )
        else:
            rows = b1.select(F.lit(r).alias("round"), "pair", "cnt").collect()
        if not rows:
            break
        for row in rows:
            a, b = row["pair"].split(" ", 1)
            m = a + b
            merges.append((int(row["round"]), a, b, m, int(row["cnt"])))
            syms = syms.select(
                "n", F.expr(_FOLD.format(a=a, b=b, m=m)).alias("s")
            )
            # Truncate lineage every few rounds, not every round: a
            # handful of nested folds analyze fine, and skipping the
            # per-round eager materialization job halves the round
            # count's job overhead. Deep unchecked nesting is still
            # avoided (k-fold expression nesting blows up analysis time
            # at high merge counts).
            if len(merges) % 4 == 0:
                syms = syms.transform(corpus_checkpoint)
        if len(rows) < (2 if r + 1 < n_merges else 1):
            break  # the speculative round found no pairs left to merge
        r += len(rows)
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
    words: DataFrame | None = None,
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
    with corpus/vocabulary ratio.

    ``words`` (optional): a precomputed distinct pre-token table with
    column ``wd`` — callers that already hold the corpus vocabulary
    (e.g. a session-cached word-frequency table, r11) pass it here so
    the encode dictionary skips its own corpus explode+distinct."""
    if merges is None:
        # One corpus scan serves BOTH training and the encode dictionary:
        # the materialized word-frequency table is the vocabulary.
        wf = word_frequencies(docs, text_col).transform(corpus_checkpoint)
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
