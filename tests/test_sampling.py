"""Unit tests for deterministic sampling / corpus-mixing operators beyond
the oracle sweep: reproducibility, key-consistency, and upsample copy
semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from tansu_spark.functions import sampling as S


def _df(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("stratum"),
    )


def test_hash_sample_reproducible_and_partition_independent(spark):
    df = _df(spark)
    a = sorted(r["k"] for r in S.hash_sample(df, "k", 0.25, seed=5).collect())
    b = sorted(
        r["k"] for r in S.hash_sample(df.repartition(13), "k", 0.25, seed=5).collect()
    )
    assert a == b and 0 < len(a) < 400


def test_hash_sample_fraction_monotone(spark):
    """A 10% sample is a strict subset of the 40% sample (same seed) —
    the threshold-filter property that lets pipelines grow a sample
    without resampling from scratch."""
    df = _df(spark)
    small = {r["k"] for r in S.hash_sample(df, "k", 0.1, seed=5).collect()}
    big = {r["k"] for r in S.hash_sample(df, "k", 0.4, seed=5).collect()}
    assert small < big


def test_stratified_fractions_zero_and_one(spark):
    df = _df(spark)
    out = S.stratified_hash_sample(
        df, "stratum", {"0": 0.0, "1": 1.0}, key_col="k", seed=2, default_fraction=0.5
    )
    by = {r["stratum"]: r["n"] for r in out.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert "0" not in by and by["1"] == 100
    assert 0 < by["2"] < 100 and 0 < by["3"] < 100


def test_uniform_k_per_group_exact_k(spark):
    df = _df(spark)
    out = S.uniform_k_per_group(df, "stratum", 7, key_col="k", seed=1)
    counts = [r["n"] for r in out.groupBy("stratum").agg(F.count("*").alias("n")).collect()]
    assert counts == [7, 7, 7, 7]


def test_weighted_upsample_copies_and_epochs(spark):
    df = _df(spark)
    out = S.weighted_upsample(
        df, "stratum", {"0": 3.0, "1": 0.0, "2": 1.5}, key_col="k", seed=9
    ).cache()
    by = {r["stratum"]: r["n"] for r in out.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert by["0"] == 300  # exactly 3 epochs
    assert "1" not in by  # weight 0 drops the stratum
    assert 100 < by["2"] < 200  # 1 full epoch + ~50% extra
    assert by["3"] == 100  # default weight 1.0
    # epoch is a 0-based copy index: stratum 0 rows carry epochs {0,1,2}.
    epochs = {r["epoch"] for r in out.filter(F.col("stratum") == "0").collect()}
    assert epochs == {0, 1, 2}
    # Reproducible: same call yields the same multiset of keys.
    again = S.weighted_upsample(
        df, "stratum", {"0": 3.0, "1": 0.0, "2": 1.5}, key_col="k", seed=9
    )
    assert sorted(r["k"] for r in again.collect()) == sorted(r["k"] for r in out.collect())
    out.unpersist()


def test_weighted_sample_proportional_and_deterministic(spark, sf_dir):
    """Keep-rate tracks the weight column; the draw is reproducible and
    partitioning-independent."""
    from pyspark.sql import functions as F

    from tansu_spark.functions.sampling import weighted_sample
    from tansu_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id")
    lo = docs.withColumn("p", F.lit(0.1))
    hi = docs.withColumn("p", F.lit(0.9))
    n = docs.count()
    n_lo = weighted_sample(lo, "doc_id", F.col("p")).count()
    n_hi = weighted_sample(hi, "doc_id", F.col("p")).count()
    assert 0.04 * n < n_lo < 0.18 * n
    assert 0.82 * n < n_hi < 0.97 * n

    # determinism under repartitioning; p=0 and p=1 are exact
    ids1 = {r["doc_id"] for r in weighted_sample(lo, "doc_id", F.col("p")).collect()}
    ids2 = {
        r["doc_id"]
        for r in weighted_sample(lo.repartition(9), "doc_id", F.col("p")).collect()
    }
    assert ids1 == ids2
    assert weighted_sample(docs.withColumn("p", F.lit(0.0)), "doc_id", F.col("p")).count() == 0
    assert weighted_sample(docs.withColumn("p", F.lit(1.0)), "doc_id", F.col("p")).count() == n
