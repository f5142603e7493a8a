"""Adversarial-input fixture (r8 verdict ask #2): a parquet dataset with
the SAME table names/schemas as /root/testdata/sf*, but with the
documents/embeddings/events tables replaced by hostile degenerate
content — the input classes the well-formed generated corpora never
exercise and the sf0.1 branch gate can't reach:

documents: empty string, NULL text, whitespace-only, 1-char (ascii and
astral), all-stopword, punctuation-only, digits-only, one single ~10 MB
document, a 100k-char single token (no delimiter anywhere), unicode
(astral plane / ZWJ / combining marks / RTL / NUL-adjacent controls),
exact+near duplicate pairs, and a handful of normal docs so survivors
exist.

embeddings: a block of ALL-IDENTICAL vectors (ties everywhere — argmax
tie-breaks must agree across engines), ZERO vectors (cosine floor
1e-30), domain-edge magnitude (1e2 — two decades past unit scale,
inside the DECIMAL/INT64 1e12-grid parity domain), denormal
(1e-300, grid-underflow-to-zero on both engines), a one-hot vector, and deterministic pseudo-random fill so
model-seeding ranges (vec_id<16 centroids, 16..31 codebooks, <8
queries) stay populated.

events: single-event users, duplicate timestamps (window order ties),
a constant series (no changepoint), sign flips, +/-0.0, domain-edge
magnitudes (+/-9.9e9, the DECIMAL(12,2) parity-grid boundary), NULL
value rows, empty/NULL props.

TPC-H tables are copied from sf0.001 unchanged (the hostile surface is
the LLM-pipeline tables; kafka/lake/tpch queries still need valid
inputs).

Run: python tools/gen_hostile_data.py          -> testdata_hostile/
     python tools/gen_hostile_data.py --empty  -> testdata_hostile_empty/
                                         (zero-row documents/embeddings/
                                          events; schema-only parquet)

Deterministic: fixed LCG, no wall clock, no external RNG state.
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.001"

TPCH = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]

DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)
EMB_SCHEMA = pa.schema(
    [
        ("vec_id", pa.int64()),
        ("embedding", pa.list_(pa.float32())),
        ("label", pa.int32()),
    ]
)
EVT_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()),
        ("event_type", pa.string()),
        ("value", pa.float64()),
        ("props", pa.string()),
    ]
)

N_DIMS = 64
STOPWORDS = "the and of to a in is it you that".split()


def _lcg(seed: int):
    s = seed & 0x7FFFFFFF

    def nxt() -> int:
        nonlocal s
        s = (s * 1103515245 + 12345) % 2147483648
        return s

    return nxt


def hostile_documents() -> list[dict]:
    rnd = _lcg(42)
    words = [f"w{i}" for i in range(50)] + STOPWORDS
    rows: list[dict] = []

    def add(doc_id, text, lang="en", source="hostile"):
        rows.append(
            {
                "doc_id": doc_id,
                "text": text,
                "lang": lang,
                "source": source,
                "n_chars": len(text) if text is not None else None,
            }
        )

    add(0, "")  # empty string
    add(1, None, lang=None)  # NULL text (and NULL lang)
    add(2, "   \n\t  \r\n ")  # whitespace-only
    add(3, "a")  # 1 ascii char
    add(4, "\U0001f600")  # 1 astral char (surrogate pair in UTF-16)
    add(5, " ".join(STOPWORDS * 20))  # all-stopword
    add(6, "!!! ??? ... ;;; --- ,,, ((( )))")  # punctuation-only
    add(7, "0123456789 " * 30)  # digits
    add(8, "x" * 100_000)  # one 100k-char token, no delimiter
    # unicode stress: ZWJ families, combining marks, RTL, controls
    add(
        9,
        "family \U0001f468‍\U0001f469‍\U0001f467 combining"
        " éé rtl السلام mixed"
        " éßø ctrl end",
        lang="xx",
    )
    # exact duplicate pair + a near dup (one word differs)
    dup = " ".join(words[i % len(words)] for i in range(120))
    add(10, dup)
    add(11, dup)
    add(12, dup.replace(" w7 ", " w49 ", 1))
    # the single ~10 MB document: structured enough to produce many
    # distinct shingles/fingerprints, not one repeated gram
    big_words = []
    for i in range(1_400_000):
        big_words.append(words[(i * 7 + (i >> 5)) % len(words)])
        if i % 97 == 0:
            big_words.append(f"u{i}")
    big = " ".join(big_words)
    add(13, big[:10_000_000])
    # a doc that is one long repeat of a single 15+ char phrase
    # (every winnowing window identical -> df cap stress)
    add(14, ("common boiler plate " * 400).strip())
    add(15, ("common boiler plate " * 380).strip())
    # normal-ish docs so gates/survivors are non-trivial (ids 16..39)
    for d in range(16, 40):
        n = 40 + rnd() % 120
        add(d, " ".join(words[rnd() % len(words)] for _ in range(n)))
    return rows


def hostile_embeddings() -> list[dict]:
    rnd = _lcg(7)

    def vec(kind: str, i: int) -> list[float]:
        if kind == "zero":
            return [0.0] * N_DIMS
        if kind == "same":
            return [((j % 7) - 3) / 10.0 for j in range(N_DIMS)]
        if kind == "huge":
            # two decades beyond the unit-scale distribution, INSIDE the
            # similarity queries' documented numeric domain: the exact
            # cross-engine grids are DECIMAL(28,12)/INT64 at 1e12
            # resolution, so component products must stay < ~1e16.
            # (1e30 overflowed the grid CAST — DuckDB raises, Spark
            # NULLs — testing engine overflow, not our operators.
            # Out-of-domain magnitudes are not merely untested: the
            # product's ingest path rejects/clamps them —
            # tansu_spark/functions/domain.py, audited by the
            # events_value_domain_audit registry entry.)
            return [1e2 if j % 2 == 0 else -1e2 for j in range(N_DIMS)]
        if kind == "tiny":
            return [1e-300] * N_DIMS
        if kind == "onehot":
            return [1.0 if j == i % N_DIMS else 0.0 for j in range(N_DIMS)]
        return [((rnd() % 2001) - 1000) / 1000.0 for _ in range(N_DIMS)]

    rows = []
    for i in range(220):
        if i in (3, 4, 5):
            kind = "same"  # identical vectors INSIDE the seed range
        elif i == 6:
            kind = "zero"  # zero vector inside the seed range
        elif 40 <= i < 60:
            kind = "same"  # the all-identical block
        elif 60 <= i < 70:
            kind = "zero"  # zero-vector block
        elif i == 70:
            kind = "huge"
        elif i == 71:
            kind = "tiny"
        elif 72 <= i < 80:
            kind = "onehot"
        else:
            kind = "rand"
        rows.append(
            {"vec_id": i, "embedding": vec(kind, i), "label": i % 4}
        )
    return rows


def hostile_events() -> list[dict]:
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def add(user, sec, etype, value, props="{}"):
        nonlocal eid
        rows.append(
            {
                "event_id": eid,
                "ts": base + dt.timedelta(seconds=sec),
                "user_id": user,
                "event_type": etype,
                "value": value,
                "props": props,
            }
        )
        eid += 1

    # user 0: single event
    add(0, 0, "view", 1.0)
    # user 1: constant series (no changepoint)
    for i in range(30):
        add(1, i * 60, "view", 5.0)
    # user 2: duplicate timestamps (order ties) + sign flips
    for i in range(20):
        add(2, (i // 2) * 60, "click", (-1.0) ** i * (i + 1))
    # user 3: domain-edge magnitudes and +/-0.0. The event-stat queries'
    # exact cross-engine parity arithmetic is DECIMAL(12,2)-gridded
    # (documented numeric domain |value| < 1e10); the hostile point is
    # the EDGE of that domain, not beyond it — 1e308 made DuckDB raise
    # on the DECIMAL cast while Spark's non-ANSI cast NULLs, i.e. it
    # tested engine overflow behavior, not our operators. 1e-308 stays:
    # it must round to 0.00 identically on both engines.
    add(3, 0, "error", 9.9e9)
    add(3, 60, "error", -9.9e9)
    add(3, 120, "error", 0.0)
    add(3, 180, "error", -0.0)
    add(3, 240, "error", 1e-308)
    # user 4: NULL values and NULL/empty props
    add(4, 0, "view", None, None)
    add(4, 60, "view", 2.0, "")
    add(4, 120, "purchase", None, "{}")
    # user 5: a clean changepoint (level shift) for contrast
    for i in range(20):
        add(5, i * 60, "view", 1.0)
    for i in range(20, 40):
        add(5, i * 60, "view", 9.0)
    return rows


def write(out_dir: str, empty: bool) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in TPCH:
        shutil.copyfile(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(out_dir, f"{t}.parquet")
        )
    tables = {
        "documents": (DOC_SCHEMA, [] if empty else hostile_documents()),
        "embeddings": (EMB_SCHEMA, [] if empty else hostile_embeddings()),
        "events": (EVT_SCHEMA, [] if empty else hostile_events()),
    }
    for name, (schema, rows) in tables.items():
        tbl = pa.Table.from_pylist(rows, schema=schema)
        pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: {tbl.num_rows} rows")
    print(f"wrote {out_dir}")


if __name__ == "__main__":
    empty = "--empty" in sys.argv
    out = os.path.join(
        REPO, "testdata_hostile_empty" if empty else "testdata_hostile"
    )
    write(out, empty)
