#!/usr/bin/env python3
"""Record per-query source fingerprints for the driver-gate rotation.

Run at every ROUND CLOSE (before the final commit):

    python tools/write_gate_fingerprints.py <round-number>

Appends/overwrites the round's entry in ``gate_fingerprints.json``:
``{"7": {"tpch_q1_pricing_summary": "<sha16>", ...}, ...}``.

When the driver's CORRECTNESS_r<N>.json lands next round, a green row for
query X proves the code whose fingerprint is recorded under round N here.
``__spark_entry__._changed_since_green`` compares that against the current
fingerprint; a mismatch rotates X back into the verification window ahead
of unchanged already-verified queries (round-6 verdict, "What's wrong #2").
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    if len(sys.argv) != 2 or not sys.argv[1].isdigit():
        sys.exit(f"usage: {sys.argv[0]} <round-number>")
    # Normalize (e.g. '07' -> '7') so the key always matches the round
    # parsed from CORRECTNESS_r<N>.json in _changed_since_green.
    rnd = str(int(sys.argv[1]))

    from tansu_spark.queries import QUERIES, fingerprint

    path = os.path.join(HERE, "gate_fingerprints.json")
    try:
        doc = json.load(open(path))
    except (OSError, ValueError):
        doc = {}
    doc[rnd] = {name: fingerprint(name) for name in QUERIES}
    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"recorded {len(doc[rnd])} fingerprints for round {rnd} -> {path}")


if __name__ == "__main__":
    main()
