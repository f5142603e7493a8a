"""End-to-end reference-demo parity (VERDICT r5 ask #7): the README
lifecycle the reference ships as its canonical demo (README.md:155-163,
justfile:154-210) — `nisshi cat produce taxi etc/data/trips.json`
encodes a JSON array of trips into Protobuf per taxi.proto, the broker
validates and stores them, the lake sink materializes typed parquet,
and DuckDB reads the lake table back — composed here as one pytest over
reference-shaped data (fixtures/data/trips.json, re-authored trips in
the exact etc/data/trips.json shape; fixtures/schemas/taxi.proto).
"""

from __future__ import annotations

import glob
import io
import json
import os

import duckdb
import pytest

from tansu_spark.broker import Broker
from tansu_spark.cli import main
from tansu_spark.lake import LakeSink
from tansu_spark.registry import SchemaRegistry

SCHEMA_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "schemas")
TRIPS = os.path.join(os.path.dirname(__file__), "fixtures", "data", "trips.json")


def _run(store, *argv):
    out = io.StringIO()
    rc = main(["--store", store, "--schemas", SCHEMA_DIR, *argv], out=out)
    assert rc == 0
    return [json.loads(line) for line in out.getvalue().splitlines()]


def test_reference_demo_lifecycle(spark, tmp_path):
    store = str(tmp_path / "store")

    # 1. topic backed by taxi.proto, protobuf on the wire (the demo's
    #    `tansu topic create taxi` against the proto-backed registry)
    _run(store, "topic", "create", "taxi",
         "--config", "tansu.schema.wire=proto")

    # 2. `cat produce taxi trips.json`: JSON array file → per-schema
    #    protobuf encode → broker validate (wire-decode kernel) → store
    got = _run(store, "produce", "taxi", "--file", str(TRIPS))[0]
    assert got["produced"] == 5

    # 2b. the validate half of the demo: a trip violating the schema
    #     (unknown enum symbol) rejects — nothing lands
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps([{"value": {
        "vendor_id": 9, "trip_id": 1, "trip_distance": 1.0,
        "fare_amount": 1.0, "store_and_fwd": "MAYBE"}}]))
    with pytest.raises(ValueError, match="enum symbol"):
        _run(store, "produce", "taxi", "--file", str(bad))
    frontier = _run(store, "offsets", "taxi")[0]
    assert sum(frontier["latest"].values()) == 5

    # 3. `cat consume taxi` streams the records back in offset order
    consumed = _run(store, "consume", "taxi", "--max-records", "10")
    assert len(consumed) == 5

    # 4. lake sink: typed parquet table (the broker's proto decode
    #    feeding the lake — the Arrow conversion half of the demo)
    broker = Broker(spark, store, registry=SchemaRegistry(SCHEMA_DIR))
    sink = LakeSink(broker, str(tmp_path / "lake"))
    assert sink.store("taxi") == 5

    # 5. the README's closing step: DuckDB reads the lake parquet
    #    (`duckdb :memory: "SELECT * FROM 'data/taxi/*/*.parquet'"`)
    files = glob.glob(os.path.join(str(tmp_path / "lake"), "**", "*.parquet"),
                      recursive=True)
    assert files
    rows = duckdb.sql(
        f"""
        SELECT value.vendor_id AS vendor_id,
               value.trip_id AS trip_id,
               value.trip_distance AS trip_distance,
               value.fare_amount AS fare_amount,
               value.store_and_fwd AS store_and_fwd
        FROM read_parquet({files!r})
        ORDER BY trip_id
        """
    ).fetchall()
    want = [
        (1, 2000481, 3.2, 18.4, 0),
        (2, 2000482, 0.7, 7.55, 0),
        (2, 2000483, 5.9, 31.25, 1),  # Y → 1 (proto enum → Int32)
        (1, 2000484, 12.1, 55.0, 0),
        (3, 2000485, 1.1, 8.9, 1),
    ]
    assert rows == want
