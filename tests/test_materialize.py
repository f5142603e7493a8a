"""Fault-tolerance materialization audit (r10 verdict "what's wrong" #3 /
ask #6): corpus-sized eager materializations must route through
``materialize.corpus_checkpoint`` so a cluster deployment can switch them
to RELIABLE checkpoints (recoverable after executor loss) with one env
var, while the local default stays ``localCheckpoint`` (bench-comparable,
and the single-node case has no executor-loss hazard)."""

from __future__ import annotations

import os
import re
from pathlib import Path

import pytest

from tansu_spark.materialize import corpus_checkpoint, materialize

PKG = Path(__file__).resolve().parent.parent / "tansu_spark"

# Every remaining direct .localCheckpoint( call site in the package must
# be on this list — each is a bounded, MODEL-sized frame (cheap to lose,
# cheap to rebuild), reviewed in OPTIMIZATION_r11.md. A new corpus-sized
# materialization must use corpus_checkpoint instead; adding a direct
# call fails this test until it is classified here.
MODEL_SIZED_ALLOWLIST = {
    "materialize.py": 1,  # the helper's own default path
    "functions/pq.py": 1,  # n_sub x n_codes codebook (~128 rows)
    "functions/sketch.py": 1,  # KMV/HLL registers (bounded by 2^p)
    "queries/analytics.py": 2,  # HLL registers; per-event-type 1-row-per-group
    "queries/similarity.py": 4,  # 16 centroids; 64x64 cov; 64-row vec; 1-row pick
}


def test_every_local_checkpoint_site_is_classified():
    found: dict[str, int] = {}
    for py in PKG.rglob("*.py"):
        rel = str(py.relative_to(PKG))
        n = 0
        for line in py.read_text().splitlines():
            stripped = line.strip()
            if stripped.startswith("#"):
                continue
            n += len(re.findall(r"\.localCheckpoint\(", line))
        if n:
            found[rel] = n
    assert found == MODEL_SIZED_ALLOWLIST, (
        "unclassified .localCheckpoint sites — corpus-sized frames must "
        f"use corpus_checkpoint (see materialize.py): {found}"
    )


def test_corpus_checkpoint_local_default_and_reliable_switch(
    spark, tmp_path, monkeypatch
):
    df = spark.range(0, 100).selectExpr("id", "id * 2 AS v")
    expect = {(r.id, r.v) for r in df.collect()}

    # Default: localCheckpoint — no checkpoint files written anywhere.
    monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_DIR", raising=False)
    local = corpus_checkpoint(df)
    assert {(r.id, r.v) for r in local.collect()} == expect

    # Env set: a RELIABLE checkpoint lands under the directory and the
    # frame is content-identical.
    ckpt = tmp_path / "ckpt"
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(ckpt))
    reliable = corpus_checkpoint(df)
    assert {(r.id, r.v) for r in reliable.collect()} == expect
    assert any(ckpt.rglob("*")), "reliable checkpoint wrote no files"

    # Model scale ignores the env var (stays local).
    n_before = sum(1 for _ in ckpt.rglob("*") if _.is_file())
    materialize(df, scale="model").collect()
    n_after = sum(1 for _ in ckpt.rglob("*") if _.is_file())
    assert n_after == n_before

    with pytest.raises(ValueError):
        materialize(df, scale="galaxy")
