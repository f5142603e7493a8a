"""Control-normalized cross-round bench comparison (r6 verdict ask #4).

Usage:  python tools/bench_compare.py OLD.json NEW.json [threshold]

Both inputs are BENCH_DETAIL-style files ({"queries": {name: sec}, ...},
optionally with a "calibration" block). The host band is estimated from
the calibration controls when present (median of cpu_probe and the
tpch_q6 pure-scan control ratios) and otherwise from the MEDIAN per-query
ratio over shared queries — the same method argued by hand in r4/r5's
BASELINE.md host-contention sections, now mechanical.

A query is flagged only when its NEW/OLD ratio exceeds band * threshold
(default 1.3, the judge's regression bar) — i.e. it got slower BEYOND
what the whole host did.
"""

from __future__ import annotations

import json
import statistics
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        d = json.load(fh)
    if "queries" not in d:
        raise SystemExit(f"{path}: no 'queries' map")
    return d


def band(old: dict, new: dict) -> tuple[float, str]:
    ratios = []
    co, cn = old.get("calibration"), new.get("calibration")
    if co and cn:
        for key in ("cpu_probe_s", "scan_control_s"):
            if co.get(key) and cn.get(key):
                ratios.append(cn[key] / co[key])
        if ratios:
            return statistics.median(ratios), "calibration controls"
    shared = sorted(set(old["queries"]) & set(new["queries"]))
    ratios = [
        new["queries"][n] / old["queries"][n]
        for n in shared
        if old["queries"][n] > 0
    ]
    return statistics.median(ratios), f"median over {len(ratios)} shared queries"


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3

    b, src = band(old, new)
    shared = sorted(set(old["queries"]) & set(new["queries"]))
    print(f"host band: {b:.3f}x ({src}); regression bar: band * {threshold}")
    print(f"totals: old={sum(old['queries'].values()):.1f}s "
          f"new={sum(new['queries'].values()):.1f}s over {len(shared)} shared "
          f"({len(new['queries']) - len(shared)} new-only)")

    flagged = []
    for n in shared:
        o, w = old["queries"][n], new["queries"][n]
        if o <= 0:
            continue
        r = w / o
        if r > b * threshold and (w - o) > 0.5:
            flagged.append((r / b, r, o, w, n))
    for norm_r, r, o, w, n in sorted(flagged, reverse=True):
        print(f"  REGRESSION {n}: {o:.2f}s -> {w:.2f}s "
              f"({r:.2f}x raw, {norm_r:.2f}x beyond band)")
    if not flagged:
        print("  no per-query regressions beyond the band")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
