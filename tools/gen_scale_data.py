#!/usr/bin/env python3
"""Generate a 10x replica of /root/testdata/sf0.1 at testdata_big/sf1/
(gitignored) for the second decade of the scaling sweep (r7 verdict ask
#1). The driver's own generator is not available, so sf1 is built from
sf0.1 by key-strided replication — statistically representative, not a
new sample:

* Dimension tables (region, nation) are copied once, TPC-H style.
* Key tables get 10 copies with consistent strides on every PK/FK
  (custkey +15000i, suppkey +1000i, partkey +20000i, orderkey +150000i,
  event_id +100000i, user_id +1500i, doc_id +5000i, vec_id +2000i), so
  every join relationship of the original holds per copy and fact/dim
  ratios are preserved.
* documents.text in copy i>0 goes through a per-copy STOPWORD-PRESERVING
  letter-shift cipher: every word NOT in a language's stopword list is
  translate()d a..z by i; stopwords pass through unchanged. WITHIN a
  copy all planted near-dup/substring structure survives bit-for-bit
  (the word-level cipher is a bijection applied uniformly — modulo a
  negligible chance a ciphered word collides with a stopword), while
  ACROSS copies shared content substrings vanish — so the corpus behaves
  like 10 independent shards: near-dup pair density per doc stays
  constant and candidate volume grows linearly, which is what a real 10x
  corpus does. Preserving stopwords is what keeps the QUALITY-GATE and
  LANG-ID behavior of the copies realistic (r9 fix): the original
  whole-text cipher turned "the/a/of/..." into non-stopwords, so
  Gopher's n_stop>=2 rule rejected 9 of 10 shards and every
  survivor-bound downstream stage (curation capstone stages 2-8) ran on
  sf0.1-sized data — the second decade silently wasn't one for those
  stages. Stopword trigrams DO now collide across shards, as they do in
  any real corpus — hub-key/df-cap discipline must absorb them, which is
  part of what the sweep should test. Coarse blocking keys (lang,
  length) are NOT varied, deliberately: blocks genuinely grow 10x in a
  10x corpus, and any per-block quadratic must show up in the sweep, not
  be masked.
* embeddings in copy i>0 get a per-copy random permutation of the 64
  dims (seeded, numpy): norms and within-copy cosines are exactly
  preserved, cross-copy cosines are scrambled — 10 independent shards
  of the same vector distribution.

Run: python tools/gen_scale_data.py          (~30 s, ~170 MB output)
     python tools/gen_scale_data.py --sf10   (third decade: 100 copies
                                              -> testdata_big/sf10,
                                              ~2.5 GB; the letter-shift
                                              cipher is replaced by a
                                              seeded alphabet
                                              PERMUTATION per copy —
                                              26 shift keys would
                                              collide across 100 copies
                                              and plant phantom
                                              cross-shard exact dups)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DST = os.path.join(HERE, "testdata_big", "sf1")

COPIES = 10
ALPHA = "abcdefghijklmnopqrstuvwxyz"

# --sf10 (third decade, r10): 100 strided copies of sf0.1 instead of 10.
# A letter-SHIFT cipher has only 26 keys, so 100 copies would collide
# (shift i and i+26 produce bit-identical shards -> phantom cross-shard
# exact dups a real 100x corpus would not have). The sf10 cipher is
# therefore a seeded random PERMUTATION of the alphabet per copy
# (keyspace 26!, copy 0 = identity) — still a bijection applied
# word-level with stopwords passed through, so every within-copy
# dup/near-dup/quality/lang-id property holds exactly as at sf1.
if "--sf10" in sys.argv:
    COPIES = 100
    DST = os.path.join(HERE, "testdata_big", "sf10")

STRIDES = {
    "customer": ("c_custkey", 15_000),
    "supplier": ("s_suppkey", 1_000),
    "part": ("p_partkey", 20_000),
    "orders": ("o_orderkey", 150_000),
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    threads = os.environ.get("GEN_SCALE_THREADS")
    if threads:
        con.execute(f"SET threads = {int(threads)}")

    def write(name: str, sql: str) -> None:
        out = os.path.join(DST, f"{name}.parquet")
        con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{name}: {n} rows")

    def copies(template: str) -> str:
        return " UNION ALL ".join(template.format(i=i) for i in range(COPIES))

    # Dimensions: copy once.
    for t in ("region", "nation"):
        write(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

    write(
        "customer",
        copies(
            f"SELECT c_custkey + {{i}} * 15000 AS c_custkey, c_name,"
            f" c_nationkey, c_acctbal, c_mktsegment FROM '{SRC}/customer.parquet'"
        ),
    )
    write(
        "supplier",
        copies(
            f"SELECT s_suppkey + {{i}} * 1000 AS s_suppkey, s_name,"
            f" s_nationkey, s_acctbal FROM '{SRC}/supplier.parquet'"
        ),
    )
    write(
        "part",
        copies(
            f"SELECT p_partkey + {{i}} * 20000 AS p_partkey, p_name, p_brand,"
            f" p_type, p_size, p_retailprice FROM '{SRC}/part.parquet'"
        ),
    )
    write(
        "orders",
        copies(
            f"SELECT o_orderkey + {{i}} * 150000 AS o_orderkey,"
            f" o_custkey + {{i}} * 15000 AS o_custkey, o_orderstatus,"
            f" o_totalprice, o_orderdate, o_orderpriority"
            f" FROM '{SRC}/orders.parquet'"
        ),
    )
    write(
        "lineitem",
        copies(
            f"SELECT l_orderkey + {{i}} * 150000 AS l_orderkey,"
            f" l_partkey + {{i}} * 20000 AS l_partkey,"
            f" l_suppkey + {{i}} * 1000 AS l_suppkey,"
            f" l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
            f" l_returnflag, l_linestatus, l_shipdate"
            f" FROM '{SRC}/lineitem.parquet'"
        ),
    )
    write(
        "events",
        copies(
            f"SELECT event_id + {{i}} * 100000 AS event_id, ts,"
            f" user_id + {{i}} * 1500 AS user_id, event_type, value, props"
            f" FROM '{SRC}/events.parquet'"
        ),
    )

    def shifted(i: int) -> str:
        if COPIES > 10:
            # Permutation cipher (see --sf10 note above): seeded, distinct
            # per copy, identity for copy 0.
            if i == 0:
                return ALPHA
            perm = np.random.RandomState(7000 + i).permutation(list(ALPHA))
            return "".join(perm)
        return ALPHA[i:] + ALPHA[:i]

    # Stopword-preserving word-level cipher (see module docstring): the
    # union of every language's heuristic stopword list, i.e. exactly the
    # words the engine's quality gates / lang-id key on.
    from tansu_spark.functions.text import STOPWORDS

    stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    stoplist = ", ".join(f"'{w}'" for w in stop)

    def cipher(i: int) -> str:
        if i == 0:
            return "text"
        return (
            "array_to_string(list_transform(string_split(text, ' '), "
            f"w -> CASE WHEN w IN ({stoplist}) THEN w "
            f"ELSE translate(w, '{ALPHA}', '{shifted(i)}') END), ' ')"
        )

    doc_selects = [
        f"SELECT doc_id + {i} * 5000 AS doc_id,"
        f" {cipher(i)} AS text,"
        f" lang, source, n_chars FROM '{SRC}/documents.parquet'"
        for i in range(COPIES)
    ]
    if COPIES <= 10:
        write("documents", " UNION ALL ".join(doc_selects))
    else:
        # 100 inline stoplists in one statement make a ~MB SQL string;
        # stage through a table in chunks instead.
        con.execute(f"CREATE TABLE _docs AS {doc_selects[0]}")
        for j in range(1, COPIES, 10):
            con.execute(
                "INSERT INTO _docs "
                + " UNION ALL ".join(doc_selects[j : j + 10])
            )
        write("documents", "SELECT * FROM _docs")
        con.execute("DROP TABLE _docs")

    # Embeddings: per-copy dim permutation (numpy), preserving float32.
    src = pq.read_table(f"{SRC}/embeddings.parquet")
    vec = np.array(src.column("embedding").to_pylist(), dtype=np.float32)
    vid = src.column("vec_id").to_numpy()
    lab = src.column("label").to_numpy()
    d = vec.shape[1]
    ids, labs, vecs = [], [], []
    for i in range(COPIES):
        perm = np.random.RandomState(1000 + i).permutation(d) if i else np.arange(d)
        ids.append(vid + i * 2000)
        labs.append(lab)
        vecs.append(vec[:, perm])
    table = pa.table(
        {
            "vec_id": pa.array(np.concatenate(ids), type=pa.int64()),
            "embedding": pa.array(
                list(np.concatenate(vecs)), type=pa.list_(pa.float32())
            ),
            "label": pa.array(np.concatenate(labs), type=pa.int32()),
        }
    )
    # row_group_size matters: a single-row-group parquet file is
    # UNSPLITTABLE, so every scan-heavy stage over the corpus runs in
    # ONE task regardless of cluster size (measured in the r10 third-
    # decade sweep: sim_kmeans_trained_topk 503.9s serial vs 48.0s with
    # 40 row groups at sf10). A real 10x corpus arrives as many
    # files/row groups; 5000-row groups keep the fixture splittable at
    # every scale.
    pq.write_table(
        table, os.path.join(DST, "embeddings.parquet"), row_group_size=5000
    )
    print(f"embeddings: {table.num_rows} rows")

    print(f"wrote {DST}")


if __name__ == "__main__":
    main()
