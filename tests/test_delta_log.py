"""Delta transaction-log export (lake/delta_log.py): spec-shape commits,
log-replay equivalence with the snapshot manifest, external-reader read
path, stats harvesting, and the documented refusal boundaries.

Reference parity: the reference commits lake writes through delta-rs's
log (nisshi-schema/src/lake/delta.rs); with no Delta runtime in this
container the export is verified the other way around — replaying OUR
emitted log must reconstruct exactly the file sets the manifest records,
and reading through the log must be row-identical to read_snapshot.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from tansu_spark.lake.delta_log import (
    export_delta_log,
    read_via_delta_log,
    replay_delta_log,
)
from tansu_spark.lake.maintain import compact_table
from tansu_spark.lake.snapshots import (
    commit_snapshot,
    expire_snapshots,
    load_manifest,
    read_snapshot,
    restore_version,
)


def _write(spark, d, ids, part=False):
    df = spark.createDataFrame(
        [(i, f"r{i}", i % 2) for i in ids], "id long, s string, p int"
    )
    w = df.coalesce(2).write.mode("append")
    if part:
        w = w.partitionBy("p")
    w.parquet(d)


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.select("id", "s", "p").collect())


def _log_files(d):
    log = os.path.join(d, "_delta_log")
    return sorted(n for n in os.listdir(log) if n.endswith(".json"))


def _commit_actions(d, v):
    path = os.path.join(d, "_delta_log", f"{v:020d}.json")
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_replay_matches_manifest_every_version(spark, tmp_path):
    d = str(tmp_path / "t")
    _write(spark, d, range(10))
    commit_snapshot(d)
    _write(spark, d, range(10, 25))
    commit_snapshot(d)
    compact_table(spark, d, target_bytes=1 << 40)  # rewrite -> v2

    assert export_delta_log(spark, d) == 2
    doc = load_manifest(d)
    for entry in doc["versions"]:
        paths, meta = replay_delta_log(d, entry["v"])
        assert paths == sorted(entry["files"]), f"v{entry['v']} diverges"
    assert meta["format"] == {"provider": "parquet", "options": {}}


def test_commit_zero_is_bootstrappable(spark, tmp_path):
    d = str(tmp_path / "t")
    _write(spark, d, range(8))
    commit_snapshot(d)
    export_delta_log(spark, d)

    actions = _commit_actions(d, 0)
    kinds = [next(iter(a)) for a in actions]
    assert kinds[0] == "commitInfo"
    assert "protocol" in kinds and "metaData" in kinds
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    assert {f.name for f in schema.fields} == {"id", "s", "p"}


def test_read_via_log_row_identical_and_partitioned(spark, tmp_path):
    d = str(tmp_path / "t")
    _write(spark, d, range(30), part=True)
    commit_snapshot(d)
    _write(spark, d, range(30, 40), part=True)
    commit_snapshot(d)
    export_delta_log(spark, d)

    got = read_via_delta_log(spark, d)
    assert _sorted_rows(got) == _sorted_rows(read_snapshot(spark, d))
    # Partition column came from directories via metaData/partitionColumns.
    _, meta = replay_delta_log(d)
    assert meta["partitionColumns"] == ["p"]
    adds = [a["add"] for a in _commit_actions(d, 0) if "add" in a]
    assert all(a["partitionValues"]["p"] in {"0", "1"} for a in adds)


def test_add_stats_match_data(spark, tmp_path):
    d = str(tmp_path / "t")
    _write(spark, d, range(50))
    commit_snapshot(d)
    export_delta_log(spark, d)

    adds = [a["add"] for a in _commit_actions(d, 0) if "add" in a]
    stats = [json.loads(a["stats"]) for a in adds]
    assert sum(s["numRecords"] for s in stats) == 50
    assert min(s["minValues"]["id"] for s in stats) == 0
    assert max(s["maxValues"]["id"] for s in stats) == 49
    assert all(s["nullCount"]["id"] == 0 for s in stats)
    for a in adds:
        assert a["size"] == os.path.getsize(os.path.join(d, a["path"]))


def test_incremental_export_after_restore(spark, tmp_path):
    d = str(tmp_path / "t")
    _write(spark, d, range(10))
    commit_snapshot(d)
    export_delta_log(spark, d)
    _write(spark, d, range(10, 20))
    commit_snapshot(d)
    restore_version(d, 0)  # v2 = v0's file set, force-committed

    before = _log_files(d)
    assert export_delta_log(spark, d) == 2
    after = _log_files(d)
    assert len(after) == len(before) + 2  # only v1, v2 written
    # Restore commit removes exactly the v1-only files.
    acts = _commit_actions(d, 2)
    assert any("remove" in a for a in acts)
    paths, _ = replay_delta_log(d, 2)
    assert paths == sorted(load_manifest(d)["versions"][-1]["files"])
    # Idempotent: nothing new on re-export.
    export_delta_log(spark, d)
    assert _log_files(d) == after


def test_incremental_diff_baseline_is_log_replay_not_manifest(spark, tmp_path):
    """After expire_snapshots drops manifest entries, the next export's
    diff baseline must be the on-disk log, not the (now shorter)
    manifest — otherwise removed files would be re-added."""
    d = str(tmp_path / "t")
    _write(spark, d, range(10))
    commit_snapshot(d)
    _write(spark, d, range(10, 20))
    commit_snapshot(d)
    export_delta_log(spark, d)
    compact_table(spark, d, target_bytes=1 << 40)  # v2 rewrite
    expire_snapshots(d, keep_last=1)  # manifest now starts at v2

    assert export_delta_log(spark, d) == 2
    paths, _ = replay_delta_log(d, 2)
    assert paths == sorted(load_manifest(d)["versions"][-1]["files"])
    assert _sorted_rows(read_via_delta_log(spark, d)) == _sorted_rows(
        read_snapshot(spark, d)
    )


def test_bootstrap_refused_when_history_expired_before_export(spark, tmp_path):
    d = str(tmp_path / "t")
    _write(spark, d, range(10))
    commit_snapshot(d)
    _write(spark, d, range(10, 20))
    commit_snapshot(d)
    compact_table(spark, d, target_bytes=1 << 40)
    expire_snapshots(d, keep_last=1)

    with pytest.raises(RuntimeError, match="version 0 or a checkpoint"):
        export_delta_log(spark, d)


def test_refuses_live_deletion_vectors(spark, tmp_path):
    from tansu_spark.lake.dv import DvTable

    d = str(tmp_path / "t")
    t = DvTable(spark, d)
    df = spark.createDataFrame([(i, f"r{i}", i % 2) for i in range(20)],
                               "id long, s string, p int")
    t.write(df)
    t.delete_where(F.col("id") < 5)
    commit_snapshot(t.data_dir)
    # The DV sidecar sits at <root>/_dv, SIBLING of data/ — the guard
    # must catch it when exporting the data dir itself.
    with pytest.raises(RuntimeError, match="deletion vectors"):
        export_delta_log(spark, t.data_dir)


def test_historical_version_read_fails_descriptively_after_relocation(
    spark, tmp_path
):
    d = str(tmp_path / "t")
    _write(spark, d, range(10))
    commit_snapshot(d)
    _write(spark, d, range(10, 20))
    commit_snapshot(d)
    export_delta_log(spark, d)
    compact_table(spark, d, target_bytes=1 << 40)
    export_delta_log(spark, d)

    # Latest reads fine; v0's files were relocated (retention-0 caveat).
    assert read_via_delta_log(spark, d).count() == 20
    with pytest.raises(FileNotFoundError, match="read_snapshot"):
        read_via_delta_log(spark, d, 0).count()
    # In-engine time travel still works via the relocation map.
    assert read_snapshot(spark, d, 0).count() == 10


def test_sink_config_exports_log_incrementally(spark, tmp_path):
    """tansu.lake.delta_log=true: every parquet store tick ALSO commits
    a Delta JSON log — the reference's always-through-the-log delta sink
    (delta.rs flush_and_commit), parquet-native."""
    from tansu_spark.broker.broker import Broker
    from tansu_spark.lake import LakeSink
    from tansu_spark.registry.registry import SchemaRegistry

    schema_dir = os.path.join(os.path.dirname(__file__), "fixtures", "schemas")
    broker = Broker(
        spark, str(tmp_path / "store"), registry=SchemaRegistry(schema_dir)
    )
    sink = LakeSink(broker, str(tmp_path / "lake"))
    broker.create_topic(
        "person", partitions=1, config={"tansu.lake.delta_log": "true"}
    )

    def people(n, start=0):
        broker.produce_rows(
            "person",
            [
                {
                    "key": f"{i:03d}-45-6789",
                    "value": f'{{"firstName":"f{i}","lastName":"l{i}","age":{i % 90}}}',
                }
                for i in range(start, start + n)
            ],
        )

    people(5)
    assert sink.store("person") == 5
    d = sink.table_dir("person")
    assert _log_files(d) == ["00000000000000000000.json"]
    people(3, start=5)
    assert sink.store("person") == 3
    assert _log_files(d) == [
        "00000000000000000000.json",
        "00000000000000000001.json",
    ]
    paths, _ = replay_delta_log(d)
    assert paths == sorted(load_manifest(d)["versions"][-1]["files"])
    assert read_via_delta_log(spark, d).count() == 8


def _append_n_versions(spark, d, n, rows_per=3, start=0):
    for i in range(n):
        lo = start + i * rows_per
        _write(spark, d, range(lo, lo + rows_per))
        commit_snapshot(d)


def test_checkpoint_written_at_interval(spark, tmp_path):
    from tansu_spark.lake.delta_log import (
        _last_checkpoint_version,
        replay_delta_log as _replay,
    )

    d = str(tmp_path / "t")
    _append_n_versions(spark, d, 12)
    assert export_delta_log(spark, d) == 11
    log = os.path.join(d, "_delta_log")
    assert _last_checkpoint_version(d) == 11
    assert os.path.exists(
        os.path.join(log, "00000000000000000011.checkpoint.parquet")
    )
    paths, meta = _replay(d)
    assert paths == sorted(load_manifest(d)["versions"][-1]["files"])
    assert meta["partitionColumns"] == []


def test_checkpoint_rows_have_exactly_one_action(spark, tmp_path):
    import pyarrow.parquet as pq

    d = str(tmp_path / "t")
    _append_n_versions(spark, d, 11)
    export_delta_log(spark, d)
    rows = pq.read_table(
        os.path.join(d, "_delta_log", "00000000000000000010.checkpoint.parquet")
    ).to_pylist()
    for r in rows:
        assert sum(r[k] is not None for k in ("protocol", "metaData", "add")) == 1
    n_adds = sum(r["add"] is not None for r in rows)
    assert n_adds == len(load_manifest(d)["versions"][-1]["files"])
    meta = next(r["metaData"] for r in rows if r["metaData"])
    from pyspark.sql.types import StructType

    StructType.fromJson(json.loads(meta["schemaString"]))  # parses


def test_log_truncation_after_checkpoint(spark, tmp_path):
    """The point of checkpoints: JSON commits at/before the checkpoint
    can be DELETED and the table still replays — while pre-checkpoint
    versions now fail by name, and post-truncation exports still diff
    against the checkpoint baseline (never re-adding removed files)."""
    d = str(tmp_path / "t")
    _append_n_versions(spark, d, 12)
    export_delta_log(spark, d)
    log = os.path.join(d, "_delta_log")
    for v in range(12):  # truncate everything the checkpoint covers
        p = os.path.join(log, f"{v:020d}.json")
        if os.path.exists(p):
            os.unlink(p)

    paths, _ = replay_delta_log(d)
    assert paths == sorted(load_manifest(d)["versions"][-1]["files"])
    assert read_via_delta_log(spark, d).count() == 36
    with pytest.raises((FileNotFoundError, KeyError)):
        replay_delta_log(d, 3)

    # Incremental export after truncation: baseline = checkpoint replay.
    _write(spark, d, range(36, 40))
    commit_snapshot(d)
    assert export_delta_log(spark, d) == 12
    paths, _ = replay_delta_log(d)
    assert paths == sorted(load_manifest(d)["versions"][-1]["files"])
    assert read_via_delta_log(spark, d).count() == 40


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None)
@given(
    ops=st.lists(
        st.sampled_from(["append", "compact", "restore", "export"]),
        min_size=2,
        max_size=6,
    )
)
def test_property_replay_equals_manifest_under_random_lifecycles(
    spark, tmp_path_factory, ops
):
    """INVARIANT: after ANY sequence of append / compact / restore ops —
    with exports interleaved at arbitrary points (incremental diffs
    against whatever the log already holds) — a final export replays to
    exactly the manifest's live set at EVERY version the log covers,
    and the external read of the latest version is row-identical to
    read_snapshot."""
    d = str(tmp_path_factory.mktemp("dlprop") / "t")
    nxt = 0
    versions_at_export: list[int] = []
    for op in ops:
        if op == "append" or nxt == 0:  # first op must create data
            _write(spark, d, range(nxt * 4, nxt * 4 + 4))
            commit_snapshot(d)
            nxt += 1
        elif op == "compact":
            compact_table(spark, d, target_bytes=1 << 40)
        elif op == "restore":
            v = load_manifest(d)["versions"][-1]["v"]
            restore_version(d, max(0, v - 1))
        elif op == "export":
            versions_at_export.append(export_delta_log(spark, d))
    final = export_delta_log(spark, d)
    doc = load_manifest(d)
    for entry in doc["versions"]:
        paths, _ = replay_delta_log(d, entry["v"])
        assert paths == sorted(entry["files"]), (ops, entry["v"])
    assert _sorted_rows(read_via_delta_log(spark, d)) == _sorted_rows(
        read_snapshot(spark, d)
    ), ops
    assert final == doc["versions"][-1]["v"]
