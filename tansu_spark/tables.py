"""Loaders for the driver-generated test tables (/root/testdata/sf*).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each (TESTDATA.md).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts contract: BIGINT nanoseconds since epoch, whatever the
        # parquet physical type is. Generations of the testdata have used
        # TIMESTAMP(NANOS) (Spark reads it only as long, via the legacy
        # conf — set here, not only in our session factory, because the
        # driver passes its own SparkSession) and TIMESTAMP(MICROS)
        # (read natively as timestamp_ntz, converted below; exact under
        # the UTC session timezone). Consumers convert with
        # `ts div 1000` → timestamp_micros (exact integer division).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # The ntz→timestamp cast below reads the session timezone; pin it
        # to UTC so a driver-supplied session with a non-UTC tz does not
        # shift every event ts by the offset.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes)["ts"] != "bigint":
            df = df.withColumn(
                "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
            )
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (mirrors the driver's
    DuckDB-side pre-registered views so spark.sql() parity tests read
    the same names)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
