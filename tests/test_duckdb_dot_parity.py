"""Engine-upgrade canary (r9 verdict ask #6a): every similarity oracle
uses DuckDB's native ``list_inner_product`` on the assumption that it
accumulates SEQUENTIALLY — bit-identical to a left ``list_reduce`` fold
``acc + a[i]*b[i]``. That was verified by observation in r8; this test
PINS it on adversarial vectors, so a DuckDB upgrade that switches to
pairwise/SIMD-tree accumulation (different rounding) fails here first,
not as a mystery hash mismatch in 40 similarity oracles.

No Spark involvement — this is a DuckDB-internal contract check."""

from __future__ import annotations

import math
import random

import duckdb
import pytest


def _fold_sql(a: str, b: str) -> str:
    # The reference fold: strict left-to-right accumulation starting at
    # 0.0 (DuckDB 1.0's list_reduce takes no init — prepend it), i.e.
    # ((0.0 + a1*b1) + a2*b2) + ... exactly.
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(list_zip({a}, {b}), p -> p[1] * p[2])), "
        f"(x, y) -> x + y)"
    )


def _native_sql(a: str, b: str) -> str:
    return f"list_inner_product({a}, {b})"


def _lit(x: float) -> str:
    # inf/-inf/nan have no bare SQL literal — repr would bind as a column.
    if math.isinf(x) or math.isnan(x):
        return f"CAST('{x}' AS DOUBLE)"
    return repr(x)


def _check_pairs(pairs):
    con = duckdb.connect()
    for a, b in pairs:
        al = "[" + ",".join(_lit(x) for x in a) + "]::DOUBLE[]"
        bl = "[" + ",".join(_lit(x) for x in b) + "]::DOUBLE[]"
        native, fold = con.execute(
            f"SELECT {_native_sql(al, bl)}, {_fold_sql(al, bl)}"
        ).fetchone()
        # Bit-identity, not tolerance: NaN==NaN via bit pattern.
        assert (
            math.isnan(native)
            and math.isnan(fold)
            or native == fold
            and math.copysign(1, native) == math.copysign(1, fold)
        ), (native, fold, a[:4], b[:4])
    con.close()


def test_adversarial_cancellation_vectors():
    """Alternating huge/tiny terms with catastrophic cancellation — the
    case where accumulation ORDER changes the double result."""
    pairs = []
    a = [1e16, 1.0, -1e16, 1.0] * 16
    b = [1.0, 1e-16, 1.0, 1e16] * 16
    pairs.append((a, b))
    # Kahan-killer: sum of many small after one large.
    pairs.append(([1e18] + [1.0] * 127, [1.0] * 128))
    # Sign-flip ladder across 30 decades.
    pairs.append(
        (
            [(-1) ** i * 10.0 ** (i % 30) for i in range(64)],
            [(-1) ** (i // 2) * 10.0 ** (-(i % 30)) for i in range(64)],
        )
    )
    # Denormals and zero crossings.
    pairs.append(([5e-324, -5e-324, 0.0, -0.0] * 16, [1.0, 1.0, 1e308, 1e308] * 16))
    _check_pairs(pairs)


def test_random_vectors_match_fold():
    rng = random.Random(20260816)
    pairs = []
    for _ in range(25):
        n = rng.choice([3, 64, 257])
        a = [rng.uniform(-1, 1) * 10 ** rng.randint(-12, 12) for _ in range(n)]
        b = [rng.uniform(-1, 1) * 10 ** rng.randint(-12, 12) for _ in range(n)]
        pairs.append((a, b))
    _check_pairs(pairs)


def test_inf_nan_propagation_matches():
    inf = float("inf")
    pairs = [
        ([inf, 1.0], [1.0, 1.0]),
        ([inf, -inf], [1.0, 1.0]),  # inf + (-inf) = nan in both orders
        ([1e308, 1e308], [10.0, -10.0]),  # overflow mid-fold
    ]
    _check_pairs(pairs)


def test_single_element():
    # Empty vectors are deliberately NOT pinned: list_inner_product on
    # []::DOUBLE[] is an INTERNAL error in DuckDB 1.0 (poisons the
    # connection). The oracles never build empty vectors (N_DIMS is a
    # fixed 64), so the contract starts at length 1.
    _check_pairs([([3.5], [-2.0])])


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
