"""BPE tokenizer training invariants (functions/bpe.py) — the oracle
pins exact values; these pin the algebraic properties that must hold on
ANY corpus and any partitioning."""

from __future__ import annotations

from tansu_spark.functions.bpe import bpe_train, word_frequencies


def test_bpe_train_invariants(spark, sf_dir):
    from tansu_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=4).collect()
    assert len(merges) == 4
    # rounds numbered consecutively; merged symbol is the concatenation
    for i, m in enumerate(merges):
        assert m["round"] == i
        assert m["merged"] == m["lhs"] + m["rhs"]
        assert m["pair_count"] > 0
    # classic BPE property: the best pair's count never increases round
    # over round (new pairs created by a merge are bounded by its count)
    counts = [m["pair_count"] for m in merges]
    assert counts == sorted(counts, reverse=True)


def test_bpe_train_partition_independent(spark, sf_dir):
    """The learned merge list must not depend on input partitioning —
    integer pair counts and the lexicographic tie-break make training
    deterministic (the property that lets the job run on any cluster
    layout)."""
    from tansu_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    a = bpe_train(docs.repartition(1), n_merges=3).collect()
    b = bpe_train(docs.repartition(13, "doc_id"), n_merges=3).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_word_frequencies_single_corpus_pass(spark, sf_dir):
    """Training operates on the word-frequency table: its row count is
    the distinct pre-token count, not the token count — the property
    that makes each merge round cheap at corpus scale."""
    from pyspark.sql import functions as F

    from tansu_spark.functions.text import bpe_tokens
    from tansu_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    wf = word_frequencies(docs)
    n_tokens = docs.select(
        F.sum(F.size(bpe_tokens("text"))).alias("n")
    ).first()["n"]
    assert wf.count() < n_tokens
    assert wf.agg(F.sum("n")).first()[0] == n_tokens


def test_bpe_encode_folds_dictionary_not_instances(spark, sf_dir):
    """Encoding is dictionary-encoded: the K fold chains run on the
    DISTINCT word table, which then broadcasts back over the corpus —
    the plan must show a BroadcastHashJoin (the dictionary) and the fold
    expression must sit on the (vocabulary-sized) build side, never on
    the per-document probe side."""
    from tansu_spark.functions.bpe import bpe_encode
    from tansu_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    df = bpe_encode(docs, n_merges=3)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # the probe side reads documents; the fold (an aggregate(...) HOF over
    # char splits) must appear exactly once per merge — on the dict side.
    assert plan.count("regexp_replace([^ ]+$") <= 3 * 2  # 3 merges, <=2 prints each
    # sanity: encoding never produces fewer subwords than pre-tokens
    from pyspark.sql import functions as F

    bad = df.filter(F.col("n_subwords") < F.col("n_pretokens")).count()
    assert bad == 0
