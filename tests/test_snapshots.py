"""Lake snapshot versioning (lake/snapshots.py): time travel across
appends and maintenance rewrites, and VACUUM via expire_snapshots."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tansu_spark.lake.snapshots import (
    commit_snapshot,
    expire_snapshots,
    read_snapshot,
)


def _write(spark, d, ids, part=False):
    df = spark.createDataFrame([(i, f"r{i}", i % 2) for i in ids], "id long, s string, p int")
    w = df.coalesce(2).write.mode("append")
    if part:
        w = w.partitionBy("p")
    w.parquet(d)


def test_time_travel_across_appends(spark, tmp_path):
    d = str(tmp_path / "t")
    _write(spark, d, range(10))
    assert commit_snapshot(d) == 0
    _write(spark, d, range(10, 25))
    assert commit_snapshot(d) == 1

    assert read_snapshot(spark, d, 0).count() == 10
    assert read_snapshot(spark, d, 1).count() == 25
    assert read_snapshot(spark, d).count() == 25  # default = latest
    # Unchanged re-commit collapses.
    assert commit_snapshot(d) == 1


def test_time_travel_survives_compaction(spark, tmp_path):
    from tansu_spark.lake.maintain import compact_table

    d = str(tmp_path / "t")
    for k in range(3):
        _write(spark, d, range(k * 10, k * 10 + 10), part=True)
        commit_snapshot(d)
    before_v1 = sorted(r["id"] for r in read_snapshot(spark, d, 1).collect())

    stats = compact_table(spark, d, target_bytes=1 << 30)
    assert stats  # small files merged
    # Current read sees only live (compacted) files — no double counting.
    assert spark.read.parquet(d).count() == 30
    # The pre-compaction version still reads byte-identically, including
    # its partition column, through _history.
    v1 = read_snapshot(spark, d, 1)
    assert sorted(r["id"] for r in v1.collect()) == before_v1
    assert sorted(v1.columns) == ["id", "p", "s"]
    assert v1.where(F.col("p") == 1).count() == 10
    # Compaction committed its own version.
    latest = read_snapshot(spark, d)
    assert latest.count() == 30


def test_expire_snapshots_vacuums_history(spark, tmp_path):
    from tansu_spark.lake.maintain import compact_table

    d = str(tmp_path / "t")
    for k in range(3):
        _write(spark, d, range(k * 10, k * 10 + 10))
        commit_snapshot(d)
    compact_table(spark, d, target_bytes=1 << 30)

    deleted = expire_snapshots(d, keep_last=1)
    assert deleted > 0
    # Latest still reads; expired version errors clearly.
    assert read_snapshot(spark, d).count() == 30
    with pytest.raises((FileNotFoundError, KeyError)):
        read_snapshot(spark, d, 1)
    # History files only referenced by dropped versions are gone.
    hist = os.path.join(d, "_history")
    leftover = [
        os.path.join(r, n)
        for r, _dd, ns in os.walk(hist)
        for n in ns
        if n.endswith(".parquet")
    ] if os.path.isdir(hist) else []
    assert leftover == []


def test_sink_store_commits_versions(spark, tmp_path):
    """LakeSink.store → one table version per materialized batch."""
    from tansu_spark.broker.broker import Broker
    from tansu_spark.lake.sink import LakeSink

    b = Broker(spark, str(tmp_path / "store"))
    b.create_topic("t", partitions=1)
    sink = LakeSink(b, str(tmp_path / "lake"))
    b.produce_rows("t", [{"key": "a", "value": "1"}])
    assert sink.store("t") == 1
    b.produce_rows("t", [{"key": "b", "value": "2"}, {"key": "c", "value": "3"}])
    assert sink.store("t") == 2

    d = sink.table_dir("t")
    assert read_snapshot(spark, d, 0).count() == 1
    assert read_snapshot(spark, d, 1).count() == 3


def test_restore_version_rewires_live_reads(spark, tmp_path):
    from tansu_spark.lake.maintain import compact_table
    from tansu_spark.lake.snapshots import restore_version

    d = str(tmp_path / "t")
    _write(spark, d, range(10))
    commit_snapshot(d)  # v0
    _write(spark, d, range(10, 25))
    commit_snapshot(d)  # v1
    compact_table(spark, d, target_bytes=1 << 30)  # v2 — v0/v1 files relocated

    v = restore_version(d, 0)
    assert v == 3
    # The PLAIN read — the path every engine uses — sees v0's data again.
    assert sorted(r["id"] for r in spark.read.parquet(d).collect()) == list(range(10))
    # Intermediate versions stay readable (restore relocates, never deletes).
    assert read_snapshot(spark, d, 1).count() == 25
    assert read_snapshot(spark, d, 2).count() == 25
    # The restore itself is a version: time travel to it and back out.
    assert read_snapshot(spark, d, 3).count() == 10
    restore_version(d, 2)
    assert spark.read.parquet(d).count() == 25
    # Restoring a vacuumed version errors clearly rather than partial-reading.
    restore_version(d, 0)
    expire_snapshots(d, keep_last=1)
    with pytest.raises((FileNotFoundError, KeyError)):
        restore_version(d, 1)


def test_restore_failure_is_atomic(spark, tmp_path):
    """A restore to a PARTIALLY-vacuumed version must raise without
    mutating the live file set — the two-pass plan-then-move contract
    (Delta RESTORE is log-only and therefore all-or-nothing). The old
    single-pass code moved resolvable files back live before discovering
    the missing one, leaving duplicated data readable."""
    from tansu_spark.lake.maintain import compact_table
    from tansu_spark.lake.snapshots import load_manifest, restore_version

    d = str(tmp_path / "t")
    _write(spark, d, range(10))  # coalesce(2) → v0 has 2 files
    commit_snapshot(d)  # v0
    _write(spark, d, range(10, 25))
    commit_snapshot(d)  # v1
    compact_table(spark, d, target_bytes=1 << 30)  # v2 — v0 files relocated

    # Simulate a partial vacuum: delete exactly ONE of v0's history files.
    doc = load_manifest(d)
    v0_files = doc["versions"][0]["files"]
    assert len(v0_files) >= 2
    os.unlink(os.path.join(d, doc["relocations"][v0_files[0]]))

    before = sorted(r["id"] for r in spark.read.parquet(d).collect())
    with pytest.raises(FileNotFoundError):
        restore_version(d, 0)
    # Live reads unchanged — no duplicated rows, no half-restored state.
    assert sorted(r["id"] for r in spark.read.parquet(d).collect()) == before
    # The surviving history file was NOT moved: v1 (which shares it) still
    # resolves every file it can, and the relocation map is intact.
    assert load_manifest(d)["relocations"].keys() == doc["relocations"].keys()


def test_restore_to_current_version_records_operation(spark, tmp_path):
    """No-op restore (target == current file set) still commits a version
    entry, like Delta RESTORE which always records the operation."""
    from tansu_spark.lake.snapshots import load_manifest, restore_version

    d = str(tmp_path / "t")
    _write(spark, d, range(10))
    commit_snapshot(d)  # v0
    v = restore_version(d, 0)
    assert v == 1
    entry = load_manifest(d)["versions"][-1]
    assert entry["operation"] == "restore(v0)"
    assert read_snapshot(spark, d, 1).count() == 10


def test_clone_shallow_zero_copy_divergent_histories(spark, tmp_path):
    """A shallow clone copies no data, reads the source version through
    external refs, diverges on append, and its snapshot expiry can never
    delete source files."""
    import glob

    from tansu_spark.lake.snapshots import clone_shallow

    src = str(tmp_path / "src")
    dst = str(tmp_path / "clone")
    _write(spark, src, range(10))
    commit_snapshot(src)
    clone_shallow(src, dst)
    assert glob.glob(f"{dst}/**/*.parquet", recursive=True) == []
    assert read_snapshot(spark, dst).count() == 10
    # Divergence: append to the clone only.
    _write(spark, dst, range(100, 105))
    commit_snapshot(dst)
    assert read_snapshot(spark, dst).count() == 15
    assert spark.read.parquet(src).count() == 10
    # Clone v0 still resolves after the append (external refs carried).
    assert read_snapshot(spark, dst, 0).count() == 10
    # Expiring the clone's history never touches source data files.
    expire_snapshots(dst, keep_last=1)
    assert spark.read.parquet(src).count() == 10
    assert read_snapshot(spark, dst).count() == 15


def test_clone_shallow_of_partitioned_source_parses_partition_dirs(spark, tmp_path):
    from tansu_spark.lake.snapshots import clone_shallow

    src = str(tmp_path / "psrc")
    dst = str(tmp_path / "pclone")
    _write(spark, src, range(12), part=True)
    commit_snapshot(src)
    clone_shallow(src, dst)
    got = read_snapshot(spark, dst)
    assert got.count() == 12
    assert set(r["p"] for r in got.select("p").distinct().collect()) == {0, 1}


def test_clone_of_compacted_source_uses_history_batch_base(spark, tmp_path):
    """A clone taken AFTER a source compaction holds external refs into
    the source's _history/<batch>/; the basePath for those refs must be
    the batch root (r8 advice) or Spark would try to parse
    `_history/<batch>` as partition directory segments."""
    from tansu_spark.lake.maintain import compact_table
    from tansu_spark.lake.snapshots import clone_shallow

    src = str(tmp_path / "hsrc")
    dst = str(tmp_path / "hclone")
    _write(spark, src, range(12), part=True)
    commit_snapshot(src)
    _write(spark, src, range(12, 24), part=True)
    commit_snapshot(src)
    compact_table(spark, src, target_bytes=1 << 30)
    # v0's files are now relocated under src/_history/<batch>/.
    clone_shallow(src, dst, version=0)
    got = read_snapshot(spark, dst)
    assert sorted(r["id"] for r in got.collect()) == list(range(12))
    assert set(r["p"] for r in got.select("p").distinct().collect()) == {0, 1}


def test_clone_of_vacuumed_source_version_raises_descriptive(spark, tmp_path):
    """A version still listed in the manifest but with a history file
    physically gone (partially vacuumed source) must fail clone_shallow
    with a descriptive FileNotFoundError, mirroring restore_version's
    pass-1 validation — not a bare KeyError (r8 advice)."""
    from tansu_spark.lake.maintain import compact_table
    from tansu_spark.lake.snapshots import clone_shallow, load_manifest

    src = str(tmp_path / "vsrc")
    _write(spark, src, range(10))
    commit_snapshot(src)
    _write(spark, src, range(10, 20))
    commit_snapshot(src)
    compact_table(spark, src, target_bytes=1 << 30)
    # Unlink a history file that version 0's manifest actually references
    # (resolved through the relocation map) — NOT glob order, which under
    # full-suite state can hand back a file v0 never referenced, letting
    # the clone legitimately succeed.
    doc = load_manifest(src)
    v0 = next(e for e in doc["versions"] if e["v"] == 0)
    victims = [
        os.path.join(src, doc["relocations"][rel])
        for rel in v0["files"]
        if rel in doc["relocations"]
        and not os.path.exists(os.path.join(src, rel))
        and os.path.exists(os.path.join(src, doc["relocations"][rel]))
    ]
    assert victims, "compaction should have relocated v0 files to history"
    os.unlink(victims[0])
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        clone_shallow(src, str(tmp_path / "vclone"), version=0)


def test_clone_read_after_source_maintenance_names_the_source(spark, tmp_path):
    """Source-side VACUUM after a clone invalidates the clone's external
    refs (Delta's documented shallow-clone hazard); the read error must
    name the clone source so the failure is diagnosable."""
    from tansu_spark.lake.maintain import compact_table
    from tansu_spark.lake.snapshots import clone_shallow

    src = str(tmp_path / "msrc")
    dst = str(tmp_path / "mclone")
    _write(spark, src, range(10))
    commit_snapshot(src)
    clone_shallow(src, dst)
    _write(spark, src, range(10, 20))
    commit_snapshot(src)
    compact_table(spark, src, target_bytes=1 << 30)
    expire_snapshots(src, keep_last=1)
    with pytest.raises(FileNotFoundError, match="shallow clone"):
        read_snapshot(spark, dst).collect()
