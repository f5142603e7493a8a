"""Driver-gate rotation (__spark_entry__._ordered_names): never-green
queries first, then green-but-source-changed (fingerprint mismatch or
GATE_FORCE_REVERIFY), then green-and-unchanged — so a rewritten query
re-enters the bounded verification window instead of coasting on a stale
green row (round-6 verdict, "What's wrong #2")."""

from __future__ import annotations

import importlib.util
import os
import re

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def entry_mod():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_under_test", os.path.join(HERE, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_fingerprint_is_deterministic_and_source_bound():
    from tansu_spark.queries import QUERIES, fingerprint

    name = next(iter(QUERIES))
    fp = fingerprint(name)
    assert re.fullmatch(r"[0-9a-f]{16}", fp)
    assert fingerprint(name) == fp  # stable across calls
    # Distinct queries hash distinctly (source text differs).
    names = list(QUERIES)[:20]
    assert len({fingerprint(n) for n in names}) == len(names)


def test_ordered_names_is_a_permutation_of_the_registry(entry_mod):
    from tansu_spark.queries import QUERIES

    ordered = entry_mod._ordered_names()
    assert sorted(ordered) == sorted(QUERIES)


def test_changed_band_sorts_between_unverified_and_fresh(entry_mod, monkeypatch):
    from tansu_spark.queries import QUERIES

    names = list(QUERIES)
    never, changed_one, fresh_rest = names[0], names[1], names[2:]
    monkeypatch.setattr(
        entry_mod,
        "_latest_green_round",
        lambda: {n: 6 for n in names if n != never},
    )
    monkeypatch.setattr(
        entry_mod, "_changed_since_green", lambda latest: {changed_one}
    )
    monkeypatch.setattr(entry_mod, "GATE_FORCE_REVERIFY", set())
    ordered = entry_mod._ordered_names()
    assert ordered.index(never) < ordered.index(changed_one)
    assert all(ordered.index(changed_one) < ordered.index(n) for n in fresh_rest[:5])


def test_force_reverify_names_rotate_ahead_of_fresh(entry_mod):
    """With the real artifacts: dedup_semdedup_scaled (rewritten in r6
    after its r5 green) must sort ahead of an unchanged r6-green query."""
    ordered = entry_mod._ordered_names()
    for stale in ("dedup_semdedup_scaled", "sim_ivf_ann_topk"):
        assert ordered.index(stale) < ordered.index("tpch_q1_pricing_summary"), stale


def test_changed_since_green_reads_fingerprint_sidecar(entry_mod, monkeypatch):
    """A recorded fingerprint differing from the current one flags the
    query; an identical one doesn't; a round with no sidecar entry is
    silently skipped (GATE_FORCE_REVERIFY covers pre-sidecar rounds)."""
    import json

    from tansu_spark.queries import QUERIES, fingerprint

    a, b, c = list(QUERIES)[:3]
    sidecar = {"6": {a: "0" * 16, b: fingerprint(b)}}

    real_load = json.load

    def fake_load(f):
        if getattr(f, "name", "").endswith("gate_fingerprints.json"):
            return sidecar
        return real_load(f)

    monkeypatch.setattr(json, "load", fake_load)
    changed = entry_mod._changed_since_green({a: 6, b: 6, c: 5})
    assert changed == {a}
