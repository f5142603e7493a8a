"""Stream-stream interval join (streaming/join.py): the streaming result
must equal the batch twin on the same produced segments."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from tansu_spark.broker.broker import Broker
from tansu_spark.streaming.join import interval_join, stream_interval_join
from tansu_spark.streaming.source import topic_stream

BASE = datetime.datetime(2026, 1, 1, 12, 0, 0)


@pytest.fixture()
def broker(spark, tmp_path):
    b = Broker(spark, str(tmp_path / "store"))
    b.create_topic("clicks", partitions=2)
    b.create_topic("buys", partitions=2)
    clicks = [
        ("u1", 0), ("u1", 10), ("u2", 3), ("u3", 7), ("u4", 20),
    ]
    buys = [
        ("u1", 2),   # joins click@0 (within 5m) and NOT click@10 (before it)
        ("u1", 12),  # joins click@10
        ("u2", 30),  # outside 5m of click@3 — no join
        ("u3", 7),   # same-minute join
        ("u5", 1),   # no matching click user
    ]
    for topic, rows in (("clicks", clicks), ("buys", buys)):
        b.produce_rows(
            topic,
            [
                {
                    "key": u,
                    "value": f"{topic}@{m}",
                    "timestamp": BASE + datetime.timedelta(minutes=m),
                }
                for u, m in rows
            ],
        )
    return b


def _view(df):
    return df.select(
        F.col("key").cast("string").alias("user"),
        F.col("timestamp").alias("ts"),
        F.col("value").cast("string").alias("tag"),
    )


def _expected():
    return {("u1", "clicks@0", "buys@2"), ("u1", "clicks@10", "buys@12"),
            ("u3", "clicks@7", "buys@7")}


def test_batch_interval_join(spark, broker):
    got = interval_join(
        _view(broker.records("clicks")),
        _view(broker.records("buys")),
        key="user", l_ts="ts", r_ts="ts",
        lower="0 seconds", upper="5 minutes",
    )
    rows = {(r["user"], r["l_tag"], r["r_tag"]) for r in got.collect()}
    assert rows == _expected()


def test_stream_interval_join_matches_batch(spark, broker, tmp_path):
    joined = stream_interval_join(
        _view(topic_stream(broker, "clicks")),
        _view(topic_stream(broker, "buys")),
        key="user", l_ts="ts", r_ts="ts",
        lower="0 seconds", upper="5 minutes",
        watermark="10 minutes",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("sjoin")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["user"], r["l_tag"], r["r_tag"])
        for r in spark.sql("SELECT * FROM sjoin").collect()
    }
    assert rows == _expected()
