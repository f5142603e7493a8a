"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Design for 100 TB:
- Exact dedup is a hash-groupBy (one shuffle on the digest — uniformly
  distributed, skew-free by construction).
- MinHash+LSH is the scale path for near-dup: per-doc signatures are a
  single explode+groupBy; candidate generation is an equi-join on
  (band, band_signature) — only colliding docs ever meet, so the join
  fan-out is proportional to true near-dup density, not |docs|^2.
- Exact-Jaccard verification runs only on LSH candidates.
- All hashing is md5-based so a SQL oracle (DuckDB) reproduces results
  bit-for-bit; Spark's xxhash64 would be faster per-byte but is not
  reproducible outside the JVM. At production scale swap `_mh` to
  xxhash64 — the topology is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tansu_spark.functions.text import fingerprint, tokens

# --- exact -----------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate grouping on the normalized-text digest: one row per
    distinct content, keeping the smallest id (deterministic winner) and the
    duplicate count."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_dups"))
    )


# --- shingling -------------------------------------------------------------


def with_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingles) — distinct token n-grams per document. Documents
    shorter than n tokens contribute their whole text as one shingle."""
    t = tokens(text_col)
    gram = F.expr(
        f"transform(sequence(0, size(split(trim({text_col}), '\\\\s+')) - {n}), "
        f"i -> concat(split(trim({text_col}), '\\\\s+')[i], ' ', "
        f"split(trim({text_col}), '\\\\s+')[i+1], ' ', "
        f"split(trim({text_col}), '\\\\s+')[i+2]))"
    )
    sh = F.when(F.size(t) >= n, gram).otherwise(F.array(F.concat_ws(" ", t)))
    return df.select(F.col(id_col), F.array_distinct(sh).alias("shingles"))


# --- MinHash + LSH ---------------------------------------------------------


def minhash_signatures(
    shingled: DataFrame, id_col: str = "doc_id", num_hashes: int = 8
) -> DataFrame:
    """(id, seed, mh): per-document MinHash signature rows.

    One hash family member per seed: mh = min over shingles of
    md5(seed ':' shingle). min over fixed-length hex strings is
    order-isomorphic to min over the underlying 128-bit integers.
    """
    spark = shingled.sparkSession
    seeds = spark.range(num_hashes).withColumnRenamed("id", "seed")
    exploded = shingled.select(F.col(id_col), F.explode("shingles").alias("s"))
    return (
        exploded.crossJoin(F.broadcast(seeds))
        .groupBy(id_col, "seed")
        .agg(F.min(F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("s")))).alias("mh"))
    )


def lsh_bands(sig: DataFrame, id_col: str = "doc_id", rows_per_band: int = 2) -> DataFrame:
    """(id, band, band_sig): group signature rows into bands; a band's
    signature is the seed-ordered concatenation of its minhashes."""
    return (
        sig.withColumn("band", F.expr(f"seed div {rows_per_band}"))
        .groupBy(id_col, "band")
        .agg(
            F.concat_ws(
                "|",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "mh"))), lambda x: x["mh"]
                ),
            ).alias("band_sig")
        )
    )


def lsh_candidate_pairs(bands: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct (doc_a < doc_b) pairs colliding in at least one band —
    the equi-join that replaces the quadratic all-pairs comparison."""
    a = bands.select(
        F.col(id_col).alias("doc_a"), F.col("band"), F.col("band_sig")
    )
    b = bands.select(
        F.col(id_col).alias("doc_b"), F.col("band"), F.col("band_sig")
    )
    return (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    rows_per_band: int = 2,
) -> DataFrame:
    """Full MinHash-LSH near-duplicate candidate pipeline."""
    sh = with_shingles(df, text_col, id_col)
    sig = minhash_signatures(sh, id_col, num_hashes)
    return lsh_candidate_pairs(lsh_bands(sig, id_col, rows_per_band), id_col)


def jaccard_verify(
    pairs: DataFrame, shingled: DataFrame, id_col: str = "doc_id", threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs: |A∩B| / |A∪B| on the
    distinct-shingle sets; keeps pairs at/above threshold.

    Runs only on LSH candidates, so the array intersection cost is bounded
    by true-duplicate density. Jaccard itself is a ratio of small integers —
    exact in both engines."""
    a = shingled.select(F.col(id_col).alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = shingled.select(F.col(id_col).alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(inter / F.greatest(union, F.lit(1)), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --- SimHash ---------------------------------------------------------------


def simhash16(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash fingerprint per document.

    Bit p is set iff sum over tokens of (+1 if hex digit p of md5(token)
    >= '8' else -1) is positive — i.e. the classic sign-of-weighted-sum
    SimHash with md5 nibbles as the per-dimension hash. 16 dimensions keep
    the expression SQL-small while preserving the operator shape; widening
    to 64 bits is the same expression over 64 nibbles of md5||md5.
    Token multiplicity contributes weight (standard SimHash term weighting).
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    h = tok.withColumn("h", F.md5(F.col("tok").cast("binary")))
    aggs = [
        F.sum(
            F.when(F.substring("h", p + 1, 1) >= "8", F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"c{p}")
        for p in range(16)
    ]
    counts = h.groupBy(id_col).agg(*aggs)
    fp = None
    for p in range(16):
        bit = F.when(F.col(f"c{p}") > 0, F.lit(1 << p)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return counts.select(F.col(id_col), fp.cast("int").alias("simhash"))


def simhash_pairs(
    fps: DataFrame, id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance. Blocked on the high byte
    (docs must agree on bits 8-15) so the self-join is an equi-join, then
    exact hamming over the remaining bits filters."""
    a = fps.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sh_a"))
    b = fps.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sh_b"))
    block_a = F.shiftright("sh_a", 8)
    block_b = F.shiftright("sh_b", 8)
    hamming = sum(
        (F.shiftright("sh_a", p).bitwiseAND(F.lit(1)) != F.shiftright("sh_b", p).bitwiseAND(F.lit(1))).cast("int")
        for p in range(16)
    )
    return (
        a.join(b, block_a == block_b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
