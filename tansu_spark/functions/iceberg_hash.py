"""EXACT Iceberg bucket-transform hashing (Iceberg spec, "Bucket
Transform Details" + Appendix B test vectors): murmur3_x86_32 of the
value's 8-byte little-endian form, seed 0 — for every type the spec
hashes as a long (int, long, date as epoch days, time/timestamp as
micros).

Closes the documented md5 divergence (lake/sink.py): murmur3 "exists in
neither DuckDB nor the oracle gate" as a builtin, but for a FIXED
8-byte input the whole hash is straight-line 32-bit arithmetic —
~20 chained expressions with no loop. The SAME step list generates the
Spark dataflow (withColumn chain → whole-stage codegen, no UDF) and the
DuckDB oracle CTE (nested SELECT chain), so the arithmetic tree is
identical in both engines and a bucket route is byte-level
reproducible by any reader that can run SQL.

Engine differences are confined to two formatter lambdas: xor
(Spark ``a ^ b`` / DuckDB ``xor(a, b)``) and shift-right (Spark
``shiftright(a, n)`` / DuckDB ``a >> n``; both arithmetic, and every
shifted value here is non-negative). 32-bit multiply-mod avoids signed
long overflow by 16-bit splitting: (a*c) mod 2^32 =
(((a>>16)*c mod 2^16)*2^16 + (a AND 0xFFFF)*c) mod 2^32.

Pinned vectors (tests/test_iceberg_hash.py, from the Iceberg spec):
hash(34) = 2017239379, hash(17486 d) = -653330422,
hash(81068000000 us) = -662762989,
hash(1510871468000000 us) = -2047944441.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 4294967296  # 2^32
_MASK32 = 4294967295


def _fmt_spark(a: str, b: str, op: str) -> str:
    return f"({a} ^ {b})" if op == "xor" else f"shiftright({a}, {b})"


def _fmt_duckdb(a: str, b: str, op: str) -> str:
    return f"xor({a}, {b})" if op == "xor" else f"({a} >> {b})"


def _shr_infix(a: str, n) -> str:
    return f"({a} >> {n})"


def _shr_fn(a: str, n) -> str:
    # Spark parses `>>` at top level but NOT inside a lambda body
    # (the lambda arrow makes `>>` ambiguous to the parser) — lambda
    # contexts must use the shiftright() function form.
    return f"shiftright({a}, {n})"


def _mulmod32(a: str, c, shr=_shr_infix) -> str:
    # (a*c) mod 2^32 without overflowing a signed 64-bit intermediate.
    return (
        f"(((({shr(a, 16)} * {c}) % 65536) * 65536"
        f" + ({a} % 65536) * {c}) % {_M32})"
    )


def _rotl32(x: str, r: int, shr=_shr_infix) -> str:
    # disjoint bit ranges: addition == bitwise OR, stays engine-neutral
    return f"((({x} * {1 << r}) % {_M32}) + {shr(x, 32 - r)})"


def murmur3_le8_steps(src: str, engine: str) -> list[tuple[str, str]]:
    """The full murmur3_x86_32(little_endian_8bytes(src), seed=0) as an
    ordered list of (column_name, sql_expr) steps; each step references
    only `src` and earlier step names, so both engines build it as a
    chain (withColumn / CTE) with no expression-tree blowup. The final
    step ``mm_h`` is the hash as an unsigned 32-bit value in [0, 2^32);
    signed form = mm_h - 2^32 when mm_h >= 2^31."""
    fmt = _fmt_spark if engine == "spark" else _fmt_duckdb
    x = lambda a, b: fmt(a, str(b), "xor")  # noqa: E731
    shr = lambda a, n: fmt(a, str(n), "shr")  # noqa: E731
    steps: list[tuple[str, str]] = []
    # little-endian words: low 32 bits first, then high 32 bits.
    # & masks two's complement correctly for negative longs on both
    # engines (arithmetic >> then mask for the high word).
    steps.append(("mm_k1", f"(CAST({src} AS BIGINT) & {_MASK32})"))
    steps.append(
        ("mm_k2", f"({shr(f'CAST({src} AS BIGINT)', 32)} & {_MASK32})")
    )
    h = "0"
    for i, k in enumerate(("mm_k1", "mm_k2"), 1):
        steps.append((f"mm_a{i}", _mulmod32(k, _C1)))
        steps.append((f"mm_b{i}", _rotl32(f"mm_a{i}", 15)))
        steps.append((f"mm_c{i}", _mulmod32(f"mm_b{i}", _C2)))
        steps.append((f"mm_d{i}", x(h, f"mm_c{i}")))
        steps.append((f"mm_e{i}", _rotl32(f"mm_d{i}", 13)))
        steps.append(
            (f"mm_h{i}", f"(({_mulmod32(f'mm_e{i}', 5)} + 3864292196) % {_M32})")
        )
        h = f"mm_h{i}"
    # 0xe6546b64 = 3864292196; length xor (8 bytes), then fmix32
    steps.append(("mm_l", x(h, 8)))
    steps.append(("mm_f1", x("mm_l", shr("mm_l", 16))))
    steps.append(("mm_f2", _mulmod32("mm_f1", 0x85EBCA6B)))
    steps.append(("mm_f3", x("mm_f2", shr("mm_f2", 13))))
    steps.append(("mm_f4", _mulmod32("mm_f3", 0xC2B2AE35)))
    steps.append(("mm_h", x("mm_f4", shr("mm_f4", 16))))
    return steps


_STEP_NAMES = [n for n, _ in murmur3_le8_steps("x", "spark")]


def with_murmur3(df: DataFrame, src: str, out: str) -> DataFrame:
    """Append ``out`` = SIGNED murmur3_x86_32(le8(src), 0) — the Java int
    Iceberg computes — as a chain of whole-stage-codegen expressions."""
    for name, sql in murmur3_le8_steps(src, "spark"):
        df = df.withColumn(name, F.expr(sql))
    signed = F.when(
        F.col("mm_h") >= 2147483648, F.col("mm_h") - F.lit(_M32)
    ).otherwise(F.col("mm_h"))
    return df.withColumn(out, signed.cast("int")).drop(*_STEP_NAMES)


def iceberg_bucket(df: DataFrame, src: str, n: int, out: str) -> DataFrame:
    """Append ``out`` = Iceberg bucket[n](src) for a long-hashed type:
    (murmur3 & Integer.MAX_VALUE) % n, byte-level per the spec."""
    for name, sql in murmur3_le8_steps(src, "spark"):
        df = df.withColumn(name, F.expr(sql))
    bucket = (F.col("mm_h") % 2147483648 % n).cast("int")
    return df.withColumn(out, bucket).drop(*_STEP_NAMES)


def murmur3_cte_sql(table_sql: str, src: str, extra_cols: str = "*") -> str:
    """DuckDB replay: wrap ``table_sql`` in a CTE-style nested-SELECT
    chain computing the same steps; exposes mm_h (unsigned) plus all of
    ``extra_cols``. Compose: SELECT (mm_h % 2147483648) % n AS bucket."""
    inner = f"SELECT {extra_cols}, {src} AS mm_src FROM ({table_sql})"
    q = inner
    for name, sql in murmur3_le8_steps("mm_src", "duckdb"):
        q = f"SELECT *, {sql} AS {name} FROM ({q})"
    return q


def murmur3_signed_col(src: str) -> Column:
    """The same hash as ONE Column (for call sites that cannot thread a
    withColumn chain, e.g. LakeSink.partition_transform): the two-word
    body and the fmix schedule run as ``aggregate`` folds whose lambda
    VARIABLES keep the expression text constant-size (a fully inlined
    nesting would double per step). Bit-identical to with_murmur3 —
    pinned in tests/test_iceberg_hash.py."""
    x = lambda a, b: _fmt_spark(a, str(b), "xor")  # noqa: E731
    shr = _shr_fn
    v = f"CAST({src} AS BIGINT)"
    k1 = f"({v} & {_MASK32})"
    k2 = f"({shr(v, 32)} & {_MASK32})"
    mix = _mulmod32(_rotl32(_mulmod32("k", _C1, shr), 15, shr), _C2, shr)
    h_upd = (
        f"(({_mulmod32(_rotl32(x('h', mix), 13, shr), 5, shr)}"
        f" + 3864292196) % {_M32})"
    )
    body = (
        f"aggregate(array({k1}, {k2}), CAST(0 AS BIGINT), (h, k) -> {h_upd})"
    )
    l = x(f"({body})", 8)
    fmix_step = _mulmod32(x("h", shr("h", "t.s")), "t.c", shr)
    fmix = (
        f"aggregate(array(named_struct('s', 16, 'c', {0x85EBCA6B}),"
        f" named_struct('s', 13, 'c', {0xC2B2AE35}),"
        f" named_struct('s', 16, 'c', 1)), CAST({l} AS BIGINT),"
        f" (h, t) -> {fmix_step})"
    )
    u = F.expr(fmix)
    return F.when(u >= 2147483648, u - F.lit(_M32)).otherwise(u).cast("int")


def iceberg_bucket_col(src: str, n: int) -> Column:
    """Iceberg bucket[n] as one Column: (hash & Integer.MAX_VALUE) % n."""
    signed = murmur3_signed_col(src)
    masked = signed.cast("bigint").bitwiseAND(F.lit(2147483647).cast("bigint"))
    return (masked % n).cast("int")


# --------------------------------------------------------------- strings
# Iceberg hashes strings as murmur3_x86_32 of their UTF-8 BYTES. Neither
# engine exposes byte indexing on binary directly, but both expose
# hex(encode(s)) — byte j is the 2-hex-char slice at 2j+1, CAST through
# the engine's hex-literal parse. The 4-byte-block body rides a fold
# (Spark `aggregate` over block indices / DuckDB `list_reduce` over the
# word list with the seed prepended), the 1-3 byte tail and fmix are
# straight-line steps. Spec vector pinned: "iceberg" -> 1210000089.


def _hex_expr(src: str, engine: str) -> str:
    if engine == "spark":
        return f"hex(encode({src}, 'UTF-8'))"
    return f"hex(encode({src}))"


def _len_expr(src: str, engine: str) -> str:
    if engine == "spark":
        return f"CAST(octet_length(encode({src}, 'UTF-8')) AS BIGINT)"
    return f"CAST(octet_length(encode({src})) AS BIGINT)"


def _byte(hexcol: str, j: str, engine: str) -> str:
    if engine == "spark":
        return (
            f"CAST(conv(substr({hexcol}, CAST(2*({j})+1 AS INT), 2),"
            f" 16, 10) AS BIGINT)"
        )
    return (
        f"CAST(concat('0x', substr({hexcol}, CAST(2*({j})+1 AS INTEGER), 2))"
        f" AS BIGINT)"
    )


def _word(hexcol: str, i: str, engine: str) -> str:
    return (
        f"({_byte(hexcol, f'4*({i})', engine)}"
        f" + {_byte(hexcol, f'4*({i})+1', engine)} * 256"
        f" + {_byte(hexcol, f'4*({i})+2', engine)} * 65536"
        f" + {_byte(hexcol, f'4*({i})+3', engine)} * 16777216)"
    )


def _eng(engine: str):
    if engine == "spark":
        x = lambda a, b: _fmt_spark(a, str(b), "xor")  # noqa: E731
        return x, _shr_fn
    x = lambda a, b: _fmt_duckdb(a, str(b), "xor")  # noqa: E731
    return x, _shr_infix


def _h_upd(hvar: str, kexpr: str, engine: str) -> str:
    x, shr = _eng(engine)
    mix = _mulmod32(_rotl32(_mulmod32(kexpr, _C1, shr), 15, shr), _C2, shr)
    return (
        f"(({_mulmod32(_rotl32(x(hvar, mix), 13, shr), 5, shr)}"
        f" + 3864292196) % {_M32})"
    )


def _k_mix(kexpr: str, engine: str) -> str:
    _, shr = _eng(engine)
    return _mulmod32(_rotl32(_mulmod32(kexpr, _C1, shr), 15, shr), _C2, shr)


def _body_fold(hexcol: str, nbcol: str, engine: str) -> str:
    if engine == "spark":
        # Aggregate lambdas are interpreted (CodegenFallback), so the
        # per-element tree must be SMALL: one conv() parse of the
        # 8-hex-char big-endian word + an arithmetic byteswap beats four
        # per-byte conv() calls ~3x (r10 sweep: the four-conv form put
        # lake_iceberg_bucket_string at 10.3x/decade, i.e. per-row cost
        # dominated everything). slice(sequence(0, nb), 1, nb) yields
        # 0..nb-1 and is empty at nb=0 (a bare sequence(0, nb-1) would
        # DESCEND there).
        be = f"CAST(conv(substr({hexcol}, CAST(8*i+1 AS INT), 8), 16, 10) AS BIGINT)"
        le = (
            f"(shiftright(w0, 24) + (shiftright(w0, 16) % 256) * 256"
            f" + (shiftright(w0, 8) % 256) * 65536 + (w0 % 256) * 16777216)"
        )
        words = (
            f"transform(transform(slice(sequence(0, {nbcol}), 1,"
            f" CAST({nbcol} AS INT)), i -> {be}), w0 -> {le})"
        )
        return (
            f"aggregate({words}, CAST(0 AS BIGINT),"
            f" (h, w) -> {_h_upd('h', 'w', 'spark')})"
        )
    words = (
        f"list_transform(range(0, CAST({nbcol} AS INTEGER)),"
        f" i -> {_word(hexcol, 'i', 'duckdb')})"
    )
    # list_reduce has no init arg: prepend the seed, f(seed, w0) first
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {words}),"
        f" (h, w) -> {_h_upd('h', 'w', 'duckdb')})"
    )


def _tail_k(hexcol: str, nbcol: str, lencol: str, engine: str) -> str:
    terms = []
    for j in range(3):
        b = _byte(hexcol, f"4*{nbcol}+{j}", engine)
        terms.append(
            f"(CASE WHEN {lencol} % 4 >= {j + 1} THEN {b} * {256 ** j}"
            f" ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def murmur3_str_steps(src: str, engine: str) -> list[tuple[str, str]]:
    """murmur3_x86_32(utf8_bytes(src), 0) as chain steps (CTE / withColumn),
    variable length: hex decode, block fold, tail, length xor, fmix."""
    x, shr = _eng(engine)
    steps = [
        ("mm_hex", _hex_expr(src, engine)),
        ("mm_len", _len_expr(src, engine)),
        # integer division: DuckDB `/` is FLOAT division (cast would
        # round 1.75 up to 2 and overrun the hex string); `//` floors.
        ("mm_nb", "CAST(mm_len // 4 AS BIGINT)" if engine == "duckdb"
         else "CAST(mm_len div 4 AS BIGINT)"),
        ("mm_body", _body_fold("mm_hex", "mm_nb", engine)),
        ("mm_tk", _tail_k("mm_hex", "mm_nb", "mm_len", engine)),
        ("mm_tm", _k_mix("mm_tk", engine)),
        ("mm_th",
         f"(CASE WHEN mm_len % 4 = 0 THEN mm_body"
         f" ELSE {x('mm_body', 'mm_tm')} END)"),
        ("mm_l", x("mm_th", "mm_len")),
        ("mm_f1", x("mm_l", shr("mm_l", 16))),
        ("mm_f2", _mulmod32("mm_f1", 0x85EBCA6B, shr)),
        ("mm_f3", x("mm_f2", shr("mm_f2", 13))),
        ("mm_f4", _mulmod32("mm_f3", 0xC2B2AE35, shr)),
        ("mm_h", x("mm_f4", shr("mm_f4", 16))),
    ]
    return steps


_STR_STEP_NAMES = [n for n, _ in murmur3_str_steps("x", "spark")]


def with_murmur3_str(df: DataFrame, src: str, out: str) -> DataFrame:
    """Append ``out`` = SIGNED murmur3 of src's UTF-8 bytes (chain form)."""
    for name, sql in murmur3_str_steps(src, "spark"):
        df = df.withColumn(name, F.expr(sql))
    signed = F.when(
        F.col("mm_h") >= 2147483648, F.col("mm_h") - F.lit(_M32)
    ).otherwise(F.col("mm_h"))
    return df.withColumn(out, signed.cast("int")).drop(*_STR_STEP_NAMES)


def murmur3_str_cte_sql(table_sql: str, src: str, extra_cols: str = "*") -> str:
    """DuckDB replay of the string hash as a nested-SELECT chain."""
    q = f"SELECT {extra_cols}, {src} AS mm_src FROM ({table_sql})"
    for name, sql in murmur3_str_steps("mm_src", "duckdb"):
        q = f"SELECT *, {sql} AS {name} FROM ({q})"
    return q


def murmur3_str_signed_col(src: str) -> Column:
    """String hash as ONE Column: the block fold is already compact; the
    tail/length/fmix chain composes around it (body text appears twice,
    in the r=0 and r>0 branches of the tail CASE)."""
    x, shr = _eng("spark")
    hexc = _hex_expr(src, "spark")
    ln = _len_expr(src, "spark")
    nb = f"CAST({ln} div 4 AS BIGINT)"
    body = _body_fold(hexc, nb, "spark")
    tk = _tail_k(hexc, nb, ln, "spark")
    th = (
        f"(CASE WHEN {ln} % 4 = 0 THEN ({body})"
        f" ELSE {x(f'({body})', _k_mix(tk, 'spark'))} END)"
    )
    l = x(th, ln)
    fmix_step = _mulmod32(x("h", shr("h", "t.s")), "t.c", shr)
    fmix = (
        f"aggregate(array(named_struct('s', 16, 'c', {0x85EBCA6B}),"
        f" named_struct('s', 13, 'c', {0xC2B2AE35}),"
        f" named_struct('s', 16, 'c', 1)), CAST({l} AS BIGINT),"
        f" (h, t) -> {fmix_step})"
    )
    u = F.expr(fmix)
    return F.when(u >= 2147483648, u - F.lit(_M32)).otherwise(u).cast("int")


def iceberg_bucket_str_col(src: str, n: int) -> Column:
    """Iceberg bucket[n] of a STRING column, spec-exact."""
    signed = murmur3_str_signed_col(src)
    masked = signed.cast("bigint").bitwiseAND(F.lit(2147483647).cast("bigint"))
    return (masked % n).cast("int")
