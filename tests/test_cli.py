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

    lag = run(store, "lag", "g1", "ev")[0]
    assert sum(v["lag"] for v in lag["partitions"].values()) == 6

    report = run(store, "maintain")[0]
    assert "ev" in report["maintained"]
