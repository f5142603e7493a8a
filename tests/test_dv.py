"""Deletion-vector merge-on-read tests (lake/dv.py).

The property that distinguishes MOR from the copy-on-write MERGE
(lake/merge.py): deletes never rewrite a data file — they append
positions — and the read anti-joins those positions back out.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tansu_spark.lake.dv import DvTable


def _data_state(data_dir: str) -> dict[str, tuple[int, float]]:
    return {
        f: (os.path.getsize(os.path.join(data_dir, f)),
            os.path.getmtime(os.path.join(data_dir, f)))
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    }


def test_deletes_never_rewrite_data_files(spark, tmp_path):
    t = DvTable(spark, str(tmp_path / "t"))
    t.write(spark.range(1000).select(
        F.col("id"), (F.col("id") % 10).alias("m")).repartition(3))
    before = _data_state(t.data_dir)

    t.delete_where(F.col("m") == 3)
    t.delete_where(F.col("id") < 50)

    assert _data_state(t.data_dir) == before  # byte-identical, untouched
    got = {r["id"] for r in t.read().collect()}
    want = {i for i in range(1000) if i % 10 != 3 and i >= 50}
    assert got == want


def test_second_generation_deletes_only_live_rows(spark, tmp_path):
    """Overlapping predicates across generations don't double-delete or
    resurrect: the second delete scans the MERGED view, and the anti-join
    dedups positions regardless."""
    t = DvTable(spark, str(tmp_path / "t"))
    t.write(spark.range(100).select("id").repartition(2))
    t.delete_where(F.col("id") % 2 == 0)
    t.delete_where(F.col("id") % 3 == 0)  # overlaps multiples of 6
    got = {r["id"] for r in t.read().collect()}
    assert got == {i for i in range(100) if i % 2 and i % 3}


def test_delete_where_many_equals_sequential_generations(spark, tmp_path):
    """The fused single-scan form (r10 optimization) must record exactly
    the store content the sequential delete_where chain records —
    including overlapping predicates, where generation 2 only sees rows
    live after generation 1 — and read back identically."""
    seq = DvTable(spark, str(tmp_path / "seq"))
    seq.write(spark.range(100).select("id").repartition(2))
    seq.delete_where(F.col("id") % 2 == 0)
    seq.delete_where(F.col("id") % 3 == 0)  # overlaps multiples of 6

    fused = DvTable(spark, str(tmp_path / "fused"))
    fused.write(spark.range(100).select("id").repartition(2))
    fused.delete_where_many([F.col("id") % 2 == 0, F.col("id") % 3 == 0])

    assert {r["id"] for r in fused.read().collect()} == {
        r["id"] for r in seq.read().collect()
    } == {i for i in range(100) if i % 2 and i % 3}
    # Store CONTENT identical: same deleted positions per file ordinal
    # (paths differ across the two scratch tables, so compare per-file
    # position sets keyed by file order).
    def store(t):
        rows = spark.read.parquet(t.dv_dir).collect()
        by_file = {}
        for r in rows:
            by_file.setdefault(r["_dv_file"].rsplit("/", 1)[-1], set()).add(
                r["_dv_pos"]
            )
        return sorted(by_file.values(), key=sorted)

    assert store(fused) == store(seq)
    # A later generation on the fused table still only deletes live rows.
    fused.delete_where(F.col("id") < 10)
    assert {r["id"] for r in fused.read().collect()} == {
        i for i in range(10, 100) if i % 2 and i % 3
    }


def test_deleted_fraction_feeds_compaction_decision(spark, tmp_path):
    t = DvTable(spark, str(tmp_path / "t"))
    t.write(spark.range(400).select("id").repartition(4))
    t.delete_where(F.col("id") < 100)
    frac = t.deleted_fraction_by_file().collect()
    assert len(frac) == 4
    total_deleted = sum(r["deleted"] for r in frac)
    assert total_deleted == 100
    for r in frac:
        assert 0.0 <= r["fraction"] <= 1.0
        assert r["deleted"] <= r["total"]


def test_empty_dv_reads_everything(spark, tmp_path):
    t = DvTable(spark, str(tmp_path / "t"))
    t.write(spark.range(10).select("id"))
    assert t.read().count() == 10
    frac = t.deleted_fraction_by_file().collect()
    assert all(r["deleted"] == 0 and r["fraction"] == 0.0 for r in frac)


def test_compact_folds_vectors_into_rewrites(spark, tmp_path):
    """OPTIMIZE half of MOR: files past the deleted-fraction threshold are
    rewritten without their dead rows and their vectors dropped; files
    below it stay byte-identical with their vectors intact. The merged
    view is unchanged by compaction."""
    t = DvTable(spark, str(tmp_path / "t"))
    # partition by range so one file takes ALL the deletes
    t.write(spark.range(400).select(
        "id", (F.col("id") < 100).cast("int").alias("hot")
    ).repartitionByRange(4, "id"))
    t.delete_where(F.col("id") < 90)  # ~90% of one file, 0% of others

    before_view = {r["id"] for r in t.read().collect()}
    before_files = _data_state(t.data_dir)

    victims = t.compact(threshold=0.5)
    assert len(victims) == 1

    after_view = {r["id"] for r in t.read().collect()}
    assert after_view == before_view  # compaction never changes the view

    after_files = _data_state(t.data_dir)
    untouched = {f: s for f, s in before_files.items()
                 if os.path.join(t.data_dir, f) not in [
                     v.replace("file://", "").replace("file:", "") for v in victims]}
    for f, s in untouched.items():
        if f in after_files:
            assert after_files[f] == s  # non-victims byte-identical
    # the folded file's vectors are gone; remaining DV rows (none here)
    frac = {r["file"]: r["deleted"] for r in t.deleted_fraction_by_file().collect()}
    assert all(d == 0 for d in frac.values())
