"""CLI tests (nisshi-cli / nisshi-cat / nisshi-topic surface): drive
main() in-process against a scratch store — topic admin, produce from
JSON lines, consume, offsets, lag, maintain."""

from __future__ import annotations

import io
import json

import pytest

from tansu_spark.cli import main


@pytest.fixture()
def store(spark, tmp_path):
    # the CLI builds its own broker over get_spark() — same session
    return str(tmp_path / "store")


def run(store, *argv):
    out = io.StringIO()
    rc = main(["--store", store, *argv], out=out)
    assert rc == 0
    return [json.loads(line) for line in out.getvalue().splitlines()]


def test_topic_admin_roundtrip(store):
    assert run(store, "topic", "create", "t1", "--partitions", "2") == [
        {"created": "t1", "partitions": 2}
    ]
    run(store, "topic", "create", "t2", "--config", "cleanup.policy=compact")
    listed = run(store, "topic", "list")
    assert [t["name"] for t in listed] == ["t1", "t2"]

    desc = run(store, "topic", "describe", "t2")[0]
    by_name = {c["name"]: c for c in desc["configs"]}
    assert by_name["cleanup.policy"]["value"] == "compact"
    assert by_name["cleanup.policy"]["source"] == "DYNAMIC_TOPIC_CONFIG"

    run(store, "topic", "delete", "t1")
    assert [t["name"] for t in run(store, "topic", "list")] == ["t2"]


def test_produce_consume_offsets_lag(store, tmp_path):
    run(store, "topic", "create", "ev", "--partitions", "2")
    lines = tmp_path / "rows.jsonl"
    lines.write_text(
        "\n".join(
            json.dumps({"key": f"k{i}", "value": {"n": i}}) for i in range(6)
        )
    )
    got = run(store, "produce", "ev", "--file", str(lines))[0]
    assert got["produced"] == 6

    rows = run(store, "consume", "ev", "--max-records", "10")
    assert len(rows) == 6
    assert {json.loads(r["value"])["n"] for r in rows} == set(range(6))
    # offsets are contiguous per partition in consume order
    for p in {r["partition"] for r in rows}:
        offs = [r["offset"] for r in rows if r["partition"] == p]
        assert offs == list(range(len(offs)))

    fr = run(store, "offsets", "ev")[0]
    assert sum(fr["latest"].values()) == 6 and all(v == 0 for v in fr["earliest"].values())

    # group never committed: describe shows null committed/lag ("-"),
    # not lag = high_watermark (r7 advice fix)
    lag = run(store, "lag", "g1", "ev")[0]
    assert all(
        v["lag"] is None and v["committed"] is None
        for v in lag["partitions"].values()
    )

    report = run(store, "maintain")[0]
    assert "ev" in report["maintained"]


def test_cat_produce_encodes_wire_and_lake_is_duckdb_readable(spark, tmp_path):
    """The reference README's signature flow (README.md:128-175): `cat
    produce` reads a JSON ARRAY file and ENCODES each message into the
    topic's schema wire format (here protobuf); the lake materialization
    is then plain typed parquet that DuckDB reads directly."""
    import duckdb

    from tansu_spark.broker import Broker
    from tansu_spark.lake.sink import LakeSink
    from tansu_spark.registry import SchemaRegistry
    from tansu_spark.session import get_spark

    schemas = tmp_path / "schemas"
    schemas.mkdir()
    (schemas / "ride.proto").write_text(
        """
        syntax = "proto3";
        message Value {
          int64 vendor_id = 1;
          int64 ride_id = 2;
          double distance = 3;
          double fare = 4;
        }
        """
    )
    store = str(tmp_path / "store")
    run(store, "--schemas", str(schemas), "topic", "create", "ride",
        "--config", "tansu.schema.wire=proto")

    data = tmp_path / "rides.json"
    data.write_text(json.dumps([
        {"value": {"vendor_id": 1, "ride_id": 1000371, "distance": 1.8, "fare": 15.32}},
        {"value": {"vendor_id": 2, "ride_id": 1000372, "distance": 2.5, "fare": 22.15}},
        {"value": {"vendor_id": 2, "ride_id": 1000373, "distance": 0.9, "fare": 9.01}},
        {"value": {"vendor_id": 1, "ride_id": 1000374, "distance": 8.4, "fare": 42.13}},
    ]))
    got = run(store, "--schemas", str(schemas), "produce", "ride", "--file", str(data))[0]
    assert got["produced"] == 4

    # raw segments hold PROTO bytes, not JSON
    b = Broker(get_spark(), store, registry=SchemaRegistry(str(schemas)))
    raw = b.fetch("ride").select("value").first()["value"]
    assert not bytes(raw).lstrip().startswith(b"{")

    # lake materialization decodes to typed parquet; DuckDB reads it raw
    sink = LakeSink(b, str(tmp_path / "lake"))
    assert sink.store("ride") == 4
    rows = duckdb.sql(
        f"SELECT value.vendor_id AS v, value.ride_id AS r, value.fare AS f "
        f"FROM '{sink.table_dir('ride')}/*.parquet' ORDER BY r"
    ).fetchall()
    assert rows == [
        (1, 1000371, 15.32), (2, 1000372, 22.15),
        (2, 1000373, 9.01), (1, 1000374, 42.13),
    ]


def test_multibatch_produce_reports_all_partitions(store, tmp_path, monkeypatch):
    """r9 advice: a >1-batch pipelined produce must report base_offsets
    for EVERY touched partition (minimum offset per partition across all
    batches), not just partitions of the first batch — plus a `batches`
    field disclosing the produce was a sequence of commits."""
    from tansu_spark.broker.broker import Broker

    real = Broker.produce_rows_pipelined

    def small_batches(self, topic, rows, batch_size=10_000, **kw):
        return real(self, topic, rows, batch_size=4, **kw)

    monkeypatch.setattr(Broker, "produce_rows_pipelined", small_batches)
    run(store, "topic", "create", "mb", "--partitions", "3")
    lines = tmp_path / "rows.jsonl"
    # 12 rows / batch_size 4 = 3 commits; keys spread over all partitions
    lines.write_text(
        "\n".join(
            json.dumps({"key": f"k{i}", "value": {"n": i}}) for i in range(12)
        )
    )
    got = run(store, "produce", "mb", "--file", str(lines))[0]
    assert got["produced"] == 12
    assert got["batches"] == 3
    consumed = run(store, "consume", "mb", "--max-records", "100")
    touched = {str(r["partition"]) for r in consumed}
    assert set(got["base_offsets"]) == touched
    # each reported offset is the MINIMUM offset seen in that partition
    mins = {}
    for r in consumed:
        p = str(r["partition"])
        mins[p] = min(mins.get(p, r["offset"]), r["offset"])
    assert got["base_offsets"] == mins
