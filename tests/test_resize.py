"""resize_raw (numpy nearest-neighbor over RAW1 bitmaps) vs a pure-Python replay."""

from __future__ import annotations

import struct

from tag_spark.operators.multimodal import RAW_MAGIC, resize_raw


def raw1(w: int, h: int, c: int, pix: bytes) -> bytes:
    assert len(pix) == w * h * c
    return RAW_MAGIC + struct.pack(">HHB", w, h, c) + pix


def py_resize(w: int, h: int, c: int, pix: bytes, out_w: int, out_h: int) -> bytes:
    out = bytearray()
    for y in range(out_h):
        sy = (y * h) // out_h
        for x in range(out_w):
            sx = (x * w) // out_w
            base = (sy * w + sx) * c
            out += pix[base : base + c]
    return bytes(out)


def test_resize_matches_python_replay(spark):
    cases = [
        (1, 4, 3, 1, bytes(range(12))),  # downsample in x, up in y
        (2, 2, 2, 1, bytes([9, 8, 7, 6])),  # upsample both
        (3, 16, 14, 1, bytes(range(224))),  # downsample both
        (4, 5, 4, 3, bytes(range(60))),  # 3-channel
    ]
    df = spark.createDataFrame(
        [(aid, raw1(w, h, c, pix)) for aid, w, h, c, pix in cases],
        "asset_id long, payload binary",
    )
    got = {r["asset_id"]: r for r in resize_raw(df, out_w=6, out_h=5).collect()}
    for aid, w, h, c, pix in cases:
        r = got[aid]
        assert (r["src_width"], r["src_height"], r["out_width"], r["out_height"]) == (w, h, 6, 5)
        assert r["resizer"] == "numpy-nn"
        assert bytes(r["resized"]) == py_resize(w, h, c, pix, 6, 5), f"asset {aid}"


def test_resize_non_raw_payload_is_honest_stub(spark):
    df = spark.createDataFrame(
        [
            (1, b"\x89PNG\r\n\x1a\nnot-raw"),  # other format
            (2, None),  # null
            (3, b"RAW"),  # short
            # RAW1 magic but buffer shorter than the declared 4x3x1 pixels
            (4, RAW_MAGIC + struct.pack(">HHB", 4, 3, 1) + b"\x01\x02"),
            # RAW1 magic with declared zero width
            (5, RAW_MAGIC + struct.pack(">HHB", 0, 3, 1)),
        ],
        "asset_id long, payload binary",
    )
    rows = {r["asset_id"]: r for r in resize_raw(df).collect()}
    for aid in (1, 2, 3, 4, 5):
        assert rows[aid]["resizer"] == "stub"
        assert rows[aid]["resized"] is None
