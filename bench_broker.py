#!/usr/bin/env python
"""Broker-path throughput bench: produce and fetch records/s.

Mirrors the reference's perf harness shape (nisshi-perf/src/lib.rs:522-660
reports records/s, MB/s and produce latency at a target record size;
defaults record_size=1024 B) so BASELINE.md can state comparable numbers.

Prints ONE JSON line on stdout; progress to stderr. Env knobs:
  SPARK_GRAFT_BROKER_RECORDS  total records to produce   (default 100_000)
  SPARK_GRAFT_BROKER_BATCH    records per produce call   (default 10_000)
  SPARK_GRAFT_BROKER_RECSIZE  value bytes per record     (default 1024)

The unit of produce here is a micro-batch (Spark's ingestion quantum —
SURVEY §2.1 S7: the reference's cross-request batcher exists to build
exactly these batches before its storage txn), so records/s at batch=N
is the honest comparison point, not batch=1 wire round-trips.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tansu_spark.broker.broker import Broker  # noqa: E402
from tansu_spark.session import get_spark  # noqa: E402


def main() -> None:
    total = int(os.environ.get("SPARK_GRAFT_BROKER_RECORDS", 100_000))
    batch = int(os.environ.get("SPARK_GRAFT_BROKER_BATCH", 10_000))
    rec_size = int(os.environ.get("SPARK_GRAFT_BROKER_RECSIZE", 1024))

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="bench_broker_")
    try:
        broker = Broker(spark, root)
        broker.create_topic("perf", partitions=8)
        payload = "x" * rec_size

        # warmup (plan compilation, parquet writer init)
        broker.produce_rows(
            "perf", [{"key": f"w{i}", "value": payload} for i in range(1000)]
        )

        produced = 0
        t0 = time.time()
        while produced < total:
            n = min(batch, total - produced)
            rows = [
                {"key": f"k{produced + i}", "value": payload} for i in range(n)
            ]
            broker.produce_rows("perf", rows)
            produced += n
            print(f"produced {produced}/{total}", file=sys.stderr)
        produce_s = time.time() - t0

        # PIPELINED Python-rows produce (r8 verdict ask #4): a second
        # thread builds + ships batch N+1's Arrow frame (driver→JVM
        # transfer) while the main thread runs batch N's parquet commit.
        # If the residual bottleneck really is page-cache writeback +
        # parquet commit (BASELINE.md r7 profile), the overlap gain is
        # bounded by the transfer share and stays < 1.5x.
        from concurrent.futures import ThreadPoolExecutor

        broker.create_topic("perf_pipe", partitions=8)

        def mk_frame(start: int, n: int):
            return broker.rows_to_frame(
                [{"key": f"k{start + i}", "value": payload} for i in range(n)]
            )

        ex = ThreadPoolExecutor(max_workers=1)
        produced_p = 0
        t3 = time.time()
        fut = ex.submit(mk_frame, 0, min(batch, total))
        while produced_p < total:
            df = fut.result()
            n = min(batch, total - produced_p)
            nxt = min(batch, total - (produced_p + n))
            if nxt > 0:
                fut = ex.submit(mk_frame, produced_p + n, nxt)
            broker.produce("perf_pipe", df)
            produced_p += n
            print(f"pipelined {produced_p}/{total}", file=sys.stderr)
        ex.shutdown()
        produce_pipe_s = time.time() - t3

        # DataFrame-source produce: rows generated JVM-side (spark.range),
        # no driver serialization — the shape of real ingestion (files,
        # streams), where the Python list path above is the CLI/cat shape.
        from pyspark.sql import functions as F

        broker.create_topic("perf_df", partitions=8)
        df_batch = (
            spark.range(batch)
            .select(
                F.concat(F.lit("k"), F.col("id")).cast("binary").alias("key"),
                F.lit(payload).cast("binary").alias("value"),
            )
            .cache()
        )
        df_batch.count()
        produced_df = 0
        t2 = time.time()
        while produced_df < total:
            broker.produce("perf_df", df_batch)
            produced_df += batch
            print(f"df-produced {produced_df}/{total}", file=sys.stderr)
        produce_df_s = time.time() - t2

        t1 = time.time()
        fetched = broker.fetch("perf").count()
        fetch_s = time.time() - t1

        out = {
            "metric": "broker_throughput",
            "produce_records_per_s": round(produced / produce_s, 1),
            "produce_mb_per_s": round(produced * rec_size / produce_s / 1e6, 2),
            "produce_pipelined_records_per_s": round(
                produced_p / produce_pipe_s, 1
            ),
            "produce_df_records_per_s": round(produced_df / produce_df_s, 1),
            "produce_df_mb_per_s": round(produced_df * rec_size / produce_df_s / 1e6, 2),
            "fetch_records_per_s": round(fetched / fetch_s, 1),
            "records": produced,
            "batch": batch,
            "record_size": rec_size,
            "unit": "records/sec",
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
