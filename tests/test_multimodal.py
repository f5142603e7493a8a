"""Multimodal plumbing tests: schema, mapInPandas batch shape, deterministic
fake kernels. The decode stub itself must raise (no codecs here)."""

from __future__ import annotations

import pytest

from tansu_spark.functions import multimodal as M


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (1, "image", b"\x89PNG-fake-bytes-1", "image/png", 800, 600, None),
        (2, "image", b"\x89PNG-fake-bytes-22", "image/png", 200, 100, None),
        (3, "video", b"\x00\x00ftyp-fake", "video/mp4", 1920, 1080, 3500),
        (4, "audio", None, "audio/wav", None, None, 2000),
    ]
    return spark.createDataFrame(rows, M.ASSET_SCHEMA)


def test_extract_features_shape_and_determinism(assets):
    out = M.extract_features(assets, feature_dim=8).collect()
    assert len(out) == 4
    by_id = {r.asset_id: r for r in out}
    assert by_id[1].n_bytes == 17
    assert len(by_id[1].feature) == 8
    assert by_id[4].n_bytes == 0 and by_id[4].content_digest is None
    # deterministic: same content → same digest/feature
    again = {r.asset_id: r for r in M.extract_features(assets, feature_dim=8).collect()}
    assert again[1].content_digest == by_id[1].content_digest
    assert again[1].feature == by_id[1].feature


def test_sample_frames(assets):
    rows = M.sample_frames(assets, every_ms=1000).collect()
    assert sorted(r.frame_ts_ms for r in rows) == [0, 1000, 2000, 3000]
    assert all(r.asset_id == 3 for r in rows)


def test_resize_plan(assets):
    rows = {r.asset_id: r for r in M.resize_plan(assets, max_side=512).collect()}
    assert rows[1].target_width == 512 and rows[1].target_height == 384
    assert rows[2].target_width == 200 and rows[2].target_height == 100


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        M._decode_image_bytes(b"anything")


# ---------------------------------------------------------------------------
# REAL decode kernels (r4): stdlib-decodable formats decode for real —
# test vectors are CONSTRUCTED in-test with stdlib too, so expected pixel/
# sample values are known exactly.
# ---------------------------------------------------------------------------


def _make_wav(freq_frames: list[int], rate: int = 8000) -> bytes:
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(freq_frames)}h", *freq_frames))
    return buf.getvalue()


def _make_bmp(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    import struct

    h, w = len(pixels), len(pixels[0])
    row_bytes = (w * 3 + 3) & ~3
    data = b""
    for row in reversed(pixels):  # bottom-up
        line = b"".join(bytes((b, g, r)) for (r, g, b) in row)
        data += line + b"\x00" * (row_bytes - len(line))
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(data), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + data


def _make_ppm(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    h, w = len(pixels), len(pixels[0])
    body = b"".join(bytes(px) for row in pixels for px in row)
    return f"P6\n# test\n{w} {h}\n255\n".encode() + body


def _make_png(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    import struct
    import zlib

    h, w = len(pixels), len(pixels[0])
    raw = b"".join(
        b"\x00" + b"".join(bytes(px) for px in row) for row in pixels
    )

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


_PIXELS = [
    [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)],
    [(0, 0, 0), (255, 255, 255), (128, 128, 128), (40, 50, 60)],
]


def test_decode_wav_exact():
    from tansu_spark.functions.multimodal import decode_wav

    frames = [0, 1000, -1000, 2000, -2000, 0]
    d = decode_wav(_make_wav(frames, rate=16000))
    assert d["sample_rate"] == 16000
    assert d["n_channels"] == 1
    assert d["bits"] == 16
    assert d["n_samples"] == len(frames)
    import math

    expect = math.sqrt(sum(f * f for f in frames) / len(frames))
    assert abs(d["rms"] - expect) < 1e-9


def test_decode_bmp_ppm_png_agree_exactly():
    """The same pixel grid through three containers must decode to the
    same dimensions and the same channel means — the decoders are
    independent parsers, so agreement is a real cross-check."""
    from tansu_spark.functions.multimodal import (
        decode_bmp,
        decode_image,
        decode_png,
        decode_ppm,
    )

    bmp = decode_bmp(_make_bmp(_PIXELS))
    ppm = decode_ppm(_make_ppm(_PIXELS))
    png = decode_png(_make_png(_PIXELS))
    n = sum(len(r) for r in _PIXELS)
    mean_r = sum(px[0] for row in _PIXELS for px in row) / n
    assert bmp["width"] == ppm["width"] == png["width"] == 4
    assert bmp["height"] == ppm["height"] == png["height"] == 2
    assert abs(bmp["mean_r"] - mean_r) < 1e-9
    assert abs(ppm["mean_r"] - mean_r) < 1e-9
    # PNG reports integer-luma mean; recompute it exactly
    luma = sum(
        (299 * r + 587 * g + 114 * b) // 1000 for row in _PIXELS for (r, g, b) in row
    ) / n
    assert abs(png["mean_luma"] - luma) < 1e-9
    # dispatch: all three route through decode_image by magic
    assert decode_image(_make_bmp(_PIXELS))["width"] == 4
    assert decode_image(_make_ppm(_PIXELS))["width"] == 4
    assert decode_image(_make_png(_PIXELS))["width"] == 4


def test_decode_png_filters_roundtrip():
    """Exercise Sub/Up/Average/Paeth unfiltering: build a PNG whose rows
    use each filter type explicitly and check the decoded luma equals
    the unfiltered grid's."""
    import struct
    import zlib

    from tansu_spark.functions.multimodal import decode_png

    w = 3
    rows = [
        bytes([10, 20, 30, 40, 50, 60, 70, 80, 90]),
        bytes([15, 25, 35, 45, 55, 65, 75, 85, 95]),
        bytes([12, 22, 32, 42, 52, 62, 72, 82, 92]),
        bytes([99, 98, 97, 96, 95, 94, 93, 92, 91]),
        bytes([1, 2, 3, 4, 5, 6, 7, 8, 9]),
    ]

    def filt(ftype, cur, prev):
        out = bytearray([ftype])
        ch = 3
        for i, x in enumerate(cur):
            a = cur[i - ch] if i >= ch else 0
            b = prev[i] if prev else 0
            c = prev[i - ch] if (prev and i >= ch) else 0
            if ftype == 0:
                out.append(x)
            elif ftype == 1:
                out.append((x - a) & 0xFF)
            elif ftype == 2:
                out.append((x - b) & 0xFF)
            elif ftype == 3:
                out.append((x - (a + b) // 2) & 0xFF)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out.append((x - pred) & 0xFF)
        return bytes(out)

    raw = b""
    prev = None
    for ftype, cur in zip((0, 1, 2, 3, 4), rows):
        raw += filt(ftype, cur, prev)
        prev = cur

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, len(rows), 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    d = decode_png(png)
    expect = sum(
        (299 * r[3 * x] + 587 * r[3 * x + 1] + 114 * r[3 * x + 2]) // 1000
        for r in rows
        for x in range(w)
    ) / (w * len(rows))
    assert d["width"] == w and d["height"] == len(rows)
    assert abs(d["mean_luma"] - expect) < 1e-9


def test_decode_asset_stats_mapinpandas(spark):
    """The Arrow-batched decode pass: real media rows decode with
    decode_ok=1 and exact stats; undecodable bytes are ACCOUNTED
    (decode_ok=0 + error) instead of failing the batch; video remains
    the named environment gate."""
    from tansu_spark.functions.multimodal import decode_asset_stats

    wav = _make_wav([0, 1000, -1000, 2000])
    png = _make_png(_PIXELS)
    rows = [
        (1, "image", bytearray(png), "image/png", None, None, None),
        (2, "audio", bytearray(wav), "audio/wav", None, None, None),
        (3, "image", bytearray(b"garbage-bytes"), None, None, None, None),
        (4, "video", bytearray(b"\x00\x00\x01\xba"), None, None, None, 1000),
    ]
    from tansu_spark.functions.multimodal import ASSET_SCHEMA

    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    got = {r["asset_id"]: r for r in decode_asset_stats(df).collect()}
    assert got[1]["decode_ok"] == 1 and got[1]["width"] == 4 and got[1]["height"] == 2
    assert got[2]["decode_ok"] == 1 and got[2]["sample_rate"] == 8000
    assert got[2]["n_samples"] == 4
    assert got[3]["decode_ok"] == 0 and "NotImplementedError" in got[3]["decode_error"]
    assert got[4]["decode_ok"] == 0 and "codecs" in got[4]["decode_error"]


def test_decode_y4m_exact_and_in_stats_pass(spark):
    """YUV4MPEG2 decodes for real (the codec-free video container):
    exact frame count and luma mean; through decode_asset_stats a Y4M
    video row comes back decode_ok=1 while codec-format video stays
    accounted."""
    from tansu_spark.functions.multimodal import (
        ASSET_SCHEMA,
        decode_asset_stats,
        decode_y4m,
        encode_y4m,
    )

    f1 = bytes(range(8)) + bytes(4)
    f2 = bytes([100] * 8) + bytes(4)
    y4m = encode_y4m([f1, f2], 4, 2)
    d = decode_y4m(y4m)
    assert d["width"] == 4 and d["height"] == 2 and d["n_frames"] == 2
    assert abs(d["mean_y"] - (sum(range(8)) + 800) / 16) < 1e-9

    rows = [
        (1, "video", bytearray(y4m), "video/x-yuv4mpeg", None, None, None),
        (2, "video", bytearray(b"\x00\x00\x01\xba"), None, None, None, None),
    ]
    got = {
        r["asset_id"]: r
        for r in decode_asset_stats(
            spark.createDataFrame(rows, ASSET_SCHEMA)
        ).collect()
    }
    assert got[1]["decode_ok"] == 1 and got[1]["n_samples"] == 2
    assert abs(got[1]["mean_level"] - d["mean_y"]) < 1e-9
    assert got[2]["decode_ok"] == 0 and "codecs" in got[2]["decode_error"]


def test_y4m_empty_line_and_odd_dims_raise_valueerror():
    """ADVICE r4: a stream with a trailing newline must raise the
    documented ValueError (not IndexError from tokenizing an empty
    line), and odd W/H must be rejected instead of silently corrupting
    the 4:2:0 frame stride."""
    import pytest as _pytest

    from tansu_spark.functions.multimodal import (
        decode_y4m,
        decode_y4m_frames,
        encode_y4m,
    )

    w, h = 4, 2
    frame = bytes(range(w * h)) + bytes(w * h // 2)
    good = encode_y4m([frame], w, h)
    assert decode_y4m(good)["n_frames"] == 1
    for fn in (decode_y4m, decode_y4m_frames):
        with _pytest.raises(ValueError, match="FRAME"):
            fn(good + b"\n")  # trailing newline → empty marker line
        with _pytest.raises(ValueError, match="odd"):
            fn(b"YUV4MPEG2 W3 H2 F25:1 C420\n")
