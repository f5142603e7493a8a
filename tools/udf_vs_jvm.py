"""Measure the three ways to compute embedding dot products in PySpark —
the evidence behind similarity.py's choice of execution strategy.

Strategies, scoring Q=16 query vectors against a replicated corpus
(sf0.1 embeddings x REPL copies, dim 64):

1. jvm_hof        — zip_with + aggregate fold (similarity.py::dot).
                    Pure JVM expressions: no Python workers, no Arrow
                    transfer; runs inside whole-stage codegen.
2. pandas_udf_pair — scalar @pandas_udf over the exploded (q_vec, vec)
                    pair rows. Vectorized numpy per Arrow batch, but the
                    pair explosion ships BOTH arrays per scored pair
                    through Arrow (Q x N x dim floats serialized).
3. mapinpandas_mat — mapInPandas over CORPUS batches with the query set
                    as a broadcast numpy matrix: one (batch x dim) @
                    (dim x Q) matrix multiply per batch; Arrow ships the
                    corpus ONCE regardless of Q.

Run: python tools/udf_vs_jvm.py [repl] [rounds]   (defaults 50, 3)
Writes nothing; prints a table to paste into SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from tansu_spark.functions.similarity import dot
from tansu_spark.session import get_spark
from tansu_spark.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_QUERIES = 16


def _corpus(spark, repl: int):
    emb = load(spark, SF_DIR, "embeddings")
    # Replicate with distinct ids; repartition so Arrow batches are real.
    c = (
        emb.select("vec_id", "embedding")
        .crossJoin(spark.range(repl).withColumnRenamed("id", "copy"))
        .select(
            (F.col("vec_id") + F.col("copy") * 1_000_000).alias("vec_id"),
            "embedding",
        )
        .repartition(32)
    )
    return c.localCheckpoint(eager=True)  # exclude generation from timing


def _queries(spark):
    q = load(spark, SF_DIR, "embeddings").orderBy("vec_id").limit(N_QUERIES)
    return [(int(r["vec_id"]), list(r["embedding"])) for r in q.collect()]


def jvm_hof(spark, corpus, qrows):
    qdf = spark.createDataFrame(
        [(i, v) for i, v in qrows], "query_id long, q_vec array<float>"
    )
    scored = corpus.crossJoin(F.broadcast(qdf)).select(
        F.sum(dot("embedding", "q_vec")).alias("s")
    )
    return scored.collect()[0]["s"]


def pandas_udf_pair(spark, corpus, qrows):
    @F.pandas_udf(DoubleType())
    def pair_dot(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [float(np.dot(np.asarray(x, np.float64), np.asarray(y, np.float64)))
             for x, y in zip(a, b)]
        )

    qdf = spark.createDataFrame(
        [(i, v) for i, v in qrows], "query_id long, q_vec array<float>"
    )
    scored = corpus.crossJoin(F.broadcast(qdf)).select(
        F.sum(pair_dot("embedding", "q_vec")).alias("s")
    )
    return scored.collect()[0]["s"]


def mapinpandas_mat(spark, corpus, qrows):
    qmat = np.asarray([v for _, v in qrows], dtype=np.float64)  # Q x dim
    bc = spark.sparkContext.broadcast(qmat)

    def score(batches):
        Q = bc.value
        for pdf in batches:
            M = np.stack(pdf["embedding"].map(np.asarray).values).astype(np.float64)
            yield pd.DataFrame({"s": (M @ Q.T).sum(axis=1)})

    out = corpus.mapInPandas(score, "s double").agg(F.sum("s").alias("s"))
    return out.collect()[0]["s"]


def main() -> None:
    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    corpus = _corpus(spark, repl)
    n = corpus.count()
    qrows = _queries(spark)
    print(f"corpus={n} vectors x dim64, queries={len(qrows)}, rounds={rounds}")

    results = {}
    checks = {}
    for name, fn in [
        ("jvm_hof", jvm_hof),
        ("pandas_udf_pair", pandas_udf_pair),
        ("mapinpandas_mat", mapinpandas_mat),
    ]:
        times = []
        for _ in range(rounds):
            t0 = time.monotonic()
            checks[name] = fn(spark, corpus, qrows)
            times.append(time.monotonic() - t0)
        results[name] = min(times)  # best-of-n: drops JIT/fork warmup
        print(f"{name:16s} best {min(times):6.2f}s  all {[round(t,2) for t in times]}")

    base = results["jvm_hof"]
    print("\n| strategy | best sec | vs jvm_hof |")
    print("|---|---|---|")
    for name, t in results.items():
        print(f"| {name} | {t:.2f} | {t / base:.2f}x |")
    vals = list(checks.values())
    spread = max(vals) - min(vals)
    print(f"\nchecksum spread across strategies: {spread:.6g} "
          f"(float order differs; must be ~0 relative to {vals[0]:.6g})")


if __name__ == "__main__":
    main()
