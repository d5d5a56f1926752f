"""Multimodal asset handling: opaque binary payloads + typed metadata.

The reference treats embedded pictures exactly this way — an opaque blob
with (mime, type, description) metadata parsed from the container
(Picture struct, id3v2frames.go:545-551; base64 vorbis pictures,
vorbis.go:62-68; PNG sniffing, mp4.go:54-55). We scale the pattern: assets
live in a `binary` column with a metadata struct; builtin-expressible
fields (length, content hash, magic sniff) are pure JVM expressions, and
only genuinely-imperative decode work runs in Python — always over Arrow
batches (pandas UDF / `mapInPandas`), never one row at a time.

Dimension decodes are REAL for every format whose container spec allows
it without a codec: PNG/GIF via fixed-offset JVM expressions and JPEG via
a variable-offset SOF-marker walk (`jpeg_sof_dims`). Full pixel decode
libraries are NOT available in this container, so anything beyond header
metadata runs a clearly-marked deterministic STUB — the Spark-side
plumbing (schema, batching, partitioning, UDF signature) is real and
tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.MapType(T.StringType(), T.StringType()),
            True,
        ),
    ]
)

# magic prefixes, as the reference sniffs them (tag.go:41-56, mp4.go:54-55)
MAGIC = {
    "png": b"\x89PNG\r\n\x1a\n",
    "gif": b"GIF89a",
    "jpeg": b"\xff\xd8\xff",
    "wav": b"RIFF",
    "mp4": b"\x00\x00\x00\x18ftyp",
}

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def _u32be_bytes(v) -> "F.Column":
    """int expression -> 4 bytes big-endian, via hex round-trip (pure JVM)."""
    return F.unhex(F.lpad(F.hex(v.cast("long")), 8, "0"))


def _u16le_bytes(v) -> "F.Column":
    """int expression -> 2 bytes little-endian."""
    lo = F.lpad(F.hex(F.pmod(v.cast("long"), F.lit(256))), 2, "0")
    hi = F.lpad(F.hex(F.floor(v.cast("long") / 256)), 2, "0")
    return F.unhex(F.concat(lo, hi))


def _u16be_bytes(v) -> "F.Column":
    """int expression -> 2 bytes big-endian."""
    return F.unhex(F.lpad(F.hex(v.cast("long")), 4, "0"))


def jpeg_payload(width, height, pad_len) -> "F.Column":
    """Spec-conformant minimal JPEG header stream built from pure JVM
    expressions: SOI, a COM segment of VARIABLE length (``pad_len`` filler
    bytes — this is what makes the SOF offset per-row-variable, so a
    fixed-offset parser cannot fake the decode), then a baseline SOF0
    frame header carrying the u16-BE height/width, then EOI. The scan-side
    inverse is ``jpeg_sof_dims``."""
    com = F.concat(
        F.lit(b"\xff\xfe"),
        _u16be_bytes(pad_len + 2),  # segment length includes its own 2 bytes
        F.encode(F.repeat(F.lit("x"), pad_len.cast("int")), "UTF-8"),
    )
    sof0 = F.concat(
        F.lit(b"\xff\xc0"),
        _u16be_bytes(F.lit(17)),  # 2 len + 1 precision + 4 dims + 1 ncomp + 3*3
        F.lit(b"\x08"),  # precision 8
        _u16be_bytes(height),
        _u16be_bytes(width),
        F.lit(b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"),  # 3 components, 4:2:0
    )
    return F.concat(F.lit(b"\xff\xd8"), com, sof0, F.lit(b"\xff\xd9"))


def generate_assets(spark: SparkSession, n: int = 1000, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table: payload bytes derived from
    sha2(asset_id), prefixed with a real magic number per kind. Image
    assets carry a REAL spec-conformant header — PNG signature + IHDR
    chunk (deterministic width/height u32-BE, bit depth 8, color type 6)
    or GIF89a signature + logical-screen descriptor (u16-LE dims), or a
    JPEG SOI + variable-length COM + SOF0 stream — so BOTH decode paths
    (fixed-offset png_ihdr_dims / gif_screen_dims and the variable-offset
    jpeg_sof_dims marker walk) exercise real parsing, not stub
    pseudo-dimensions."""
    base = spark.range(n).select(F.col("id").alias("asset_id"))
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.pmod(F.xxhash64("asset_id", F.lit(seed)), F.lit(3)) + 1).cast("int"))
    width = (F.pmod(F.col("asset_id"), F.lit(1000)) + 16).cast("int")
    height = (F.pmod(F.col("asset_id") * 7, F.lit(1000)) + 16).cast("int")
    png_header = F.concat(
        F.lit(MAGIC["png"]),
        _u32be_bytes(F.lit(13)),  # IHDR data length
        F.lit(b"IHDR"),
        _u32be_bytes(width),
        _u32be_bytes(height),
        F.lit(b"\x08\x06\x00\x00\x00"),  # bit depth 8, RGBA, default methods
    )
    gif_header = F.concat(F.lit(b"GIF89a"), _u16le_bytes(width), _u16le_bytes(height))
    jpeg_header = jpeg_payload(width, height, F.pmod(F.col("asset_id"), F.lit(37)) + 1)
    img_fmt = F.pmod(F.col("asset_id"), F.lit(3))
    magic = (
        F.when((kind == "image") & (img_fmt == 0), png_header)
        .when((kind == "image") & (img_fmt == 1), gif_header)
        .when(kind == "image", jpeg_header)
        .when(kind == "audio", F.lit(MAGIC["wav"]))
        .otherwise(F.lit(MAGIC["mp4"]))
    )
    body = F.sha2(F.concat(F.col("asset_id").cast("string"), F.lit(seed)), 256).cast("binary")
    # payload length varies deterministically 1-16 body repeats
    reps = (F.pmod(F.xxhash64("asset_id", F.lit("len"), F.lit(seed)), F.lit(16)) + 1).cast("int")
    payload = F.concat(magic, F.aggregate(F.sequence(F.lit(1), reps), F.lit(b""), lambda acc, _: F.concat(acc, body)))
    mime = (
        F.when((kind == "image") & (img_fmt == 0), F.lit("image/png"))
        .when((kind == "image") & (img_fmt == 1), F.lit("image/gif"))
        .when(kind == "image", F.lit("image/jpeg"))
        .when(kind == "audio", F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
    )
    meta = F.create_map(F.lit("source"), F.concat(F.lit("gen-"), F.pmod(F.col("asset_id"), F.lit(10)).cast("string")))
    return base.select("asset_id", kind.alias("kind"), mime.alias("mime"), payload.alias("payload"), meta.alias("meta"))


def sniff_kind(payload_col: str = "payload"):
    """Magic-byte classification — P1/Identify analog, pure expressions."""
    p = F.col(payload_col)
    return (
        F.when(F.substring(p, 1, 8) == F.lit(MAGIC["png"]), F.lit("png"))
        .when((F.substring(p, 1, 6) == F.lit(b"GIF87a")) | (F.substring(p, 1, 6) == F.lit(b"GIF89a")), F.lit("gif"))
        .when(F.substring(p, 1, 3) == F.lit(MAGIC["jpeg"]), F.lit("jpeg"))
        .when(F.substring(p, 1, 4) == F.lit(MAGIC["wav"]), F.lit("wav"))
        .when(F.substring(p, 1, 8) == F.lit(MAGIC["mp4"]), F.lit("mp4"))
        .otherwise(F.lit("unknown"))
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_sha256", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("decoder", T.StringType(), False),  # 'header' | 'sof-scan' | 'stub'
    ]
)

# decode-only output of the vectorized UDF — everything builtin-expressible
# (byte length, content hash) stays a JVM expression and never enters Python
_DECODE_STRUCT = T.StructType(
    [
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("decoder", T.StringType(), False),
    ]
)


# SOF markers that carry frame dimensions (ITU T.81 table B.1): C0-CF minus
# DHT (C4), JPG (C8, reserved) and DAC (CC) — the baseline/progressive/
# lossless/hierarchical frame headers all share the same layout
# (length u16, precision u8, height u16-BE, width u16-BE).
_JPEG_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def jpeg_sof_dims(b: bytes) -> tuple[int, int] | None:
    """REAL JPEG dimension decode with zero dependencies: walk the marker
    segments from SOI until a SOF frame header and read height/width at
    fixed offsets WITHIN that segment. Unlike PNG/GIF this is genuinely
    variable-offset (COM/APPn/DQT/DHT segments of arbitrary length precede
    the SOF), so it runs in the Arrow-batched UDF, not a JVM substring —
    the imperative-walk analog of the reference's frame loop
    (id3v2.go:229-258) applied to the picture payload it stores opaquely
    (id3v2frames.go:545-551). Returns (width, height) or None for
    non-JPEG / truncated / SOF-less payloads."""
    if len(b) < 4 or b[0:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(b)
    while i + 3 < n:
        if b[i] != 0xFF:
            return None  # desynchronized: not a marker where one is required
        m = b[i + 1]
        if m == 0xFF:  # fill bytes before a marker are legal (B.1.1.2)
            i += 1
            continue
        if m == 0xD9:  # EOI before any SOF
            return None
        if m == 0x01 or 0xD0 <= m <= 0xD8:  # standalone markers, no length
            i += 2
            continue
        seglen = (b[i + 2] << 8) | b[i + 3]
        if seglen < 2:
            return None
        if m in _JPEG_SOF_MARKERS:
            if i + 9 > n:
                return None  # truncated frame header
            height = (b[i + 5] << 8) | b[i + 6]
            width = (b[i + 7] << 8) | b[i + 8]
            return (width, height)
        i += 2 + seglen
    return None


def _decode_batch(kind: pd.Series, payload: pd.Series) -> pd.DataFrame:
    """Arrow-batched decode for formats whose dimensions are NOT
    fixed-offset header fields. JPEG gets a REAL variable-offset SOF-marker
    scan (``jpeg_sof_dims``, ``decoder='sof-scan'``); anything else that
    claims to be an image falls to the clearly-labeled STUB deriving
    deterministic pseudo-dimensions from the content hash
    (``decoder='stub'`` — PIL absent from this container). PNG and GIF
    never reach this path: their dims are real JVM header decodes
    (png_ihdr_dims / gif_screen_dims)."""
    widths: list[int | None] = []
    heights: list[int | None] = []
    decoders: list[str] = []
    for k, p in zip(kind, payload):
        b = bytes(p) if p is not None else b""
        if k != "image":
            widths.append(None)
            heights.append(None)
            decoders.append("stub")
            continue
        dims = jpeg_sof_dims(b)
        if dims is not None:
            widths.append(dims[0])
            heights.append(dims[1])
            decoders.append("sof-scan")
            continue
        if _HAS_PIL:  # pragma: no cover
            raise NotImplementedError("real decode path requires PIL-compatible payloads")
        digest = hashlib.sha256(b).hexdigest()
        widths.append(16 + int(digest[:4], 16) % 4080)
        heights.append(16 + int(digest[4:8], 16) % 4080)
        decoders.append("stub")
    return pd.DataFrame({"width": widths, "height": heights, "decoder": decoders})


def decode_image_features(df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Feature-extraction over image payloads.

    ``n_bytes`` and ``content_sha256`` are pure JVM expressions
    (``F.length`` / ``F.sha2`` — codegen'd, vectorized, no Python).
    Width/height are REAL decodes for PNG (IHDR u32-BE) and GIF
    (logical-screen u16-LE) via fixed-offset JVM expressions
    (``decoder='header'``) and for JPEG via the variable-offset SOF-marker
    walk in the Arrow-batched UDF (``decoder='sof-scan'``); only unknown
    image formats fall to the clearly-labeled stub (``decoder='stub'``).
    ONE projection, no extra join or shuffle; the UDF is evaluated once
    (single ``__d`` struct column)."""
    from pyspark.sql.functions import pandas_udf

    from tag_spark.functions.parsing import gif_screen_dims, png_ihdr_dims

    decode = pandas_udf(_decode_batch, _DECODE_STRUCT)
    empty = F.lit(b"")
    p = F.coalesce(F.col("payload"), empty)
    step = df.select(
        "asset_id",
        "kind",
        F.length(p).cast("long").alias("n_bytes"),
        F.sha2(p, 256).alias("content_sha256"),
        png_ihdr_dims(p).alias("__png"),
        gif_screen_dims(p).alias("__gif"),
        decode(F.col("kind"), F.col("payload")).alias("__d"),
    )
    header = F.coalesce(F.col("__png"), F.col("__gif"))
    return step.select(
        "asset_id",
        "kind",
        "n_bytes",
        "content_sha256",
        F.coalesce(header["width"], F.col("__d.width")).alias("width"),
        F.coalesce(header["height"], F.col("__d.height")).alias("height"),
        F.when(header.isNotNull(), F.lit("header")).otherwise(F.col("__d.decoder")).alias("decoder"),
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_sha256", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video/audio payloads: split the payload into
    n_frames equal chunks and fingerprint each — the deterministic stand-in
    for real frame extraction (ffmpeg not present). mapInPandas keeps the
    blob-to-frames fan-out vectorized and streaming."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                if not b:
                    continue
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    chunk = b[i * step : (i + 1) * step]
                    if not chunk:
                        break
                    out.append(
                        {
                            "asset_id": aid,
                            "frame_idx": i,
                            "frame_sha256": hashlib.sha256(chunk).hexdigest(),
                            "n_bytes": len(chunk),
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.filter(F.col("kind").isin("video", "audio")).select("asset_id", "payload").mapInPandas(frames, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# resize (real nearest-neighbor math, zero decode dependencies)
# ---------------------------------------------------------------------------

# RAW1: the deterministic uncompressed bitmap container used to exercise a
# REAL resize kernel without PIL/ffmpeg (which this container lacks):
#   magic "RAW1" | width u16-BE | height u16-BE | channels u8 | row-major
#   width*height*channels pixel bytes.
# Compressed formats (png/gif/jpeg) would need a real decoder to resize, so
# they fall to the clearly-labeled stub row — same honesty policy as
# _decode_batch. Reference analog: the reference stores Picture payloads
# opaquely and exposes typed metadata around them (id3v2frames.go:545-551);
# RAW1 is that shape with the pixels made arithmetically checkable.
RAW_MAGIC = b"RAW1"

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("src_width", T.IntegerType(), True),
        T.StructField("src_height", T.IntegerType(), True),
        T.StructField("out_width", T.IntegerType(), True),
        T.StructField("out_height", T.IntegerType(), True),
        T.StructField("resized", T.BinaryType(), True),
        T.StructField("resizer", T.StringType(), False),  # 'numpy-nn' | 'stub'
    ]
)


def raw_bitmap_payload(width, height, pix_ascii) -> "F.Column":
    """RAW1 container from pure JVM expressions. ``pix_ascii`` must be an
    ASCII string column of exactly width*height chars (1 channel) — ASCII
    because SQL oracles rebuild these bytes with VARCHAR functions
    (CLAUDE.md: DuckDB digests are VARCHAR-only)."""
    return F.concat(
        F.lit(RAW_MAGIC),
        _u16be_bytes(width),
        _u16be_bytes(height),
        F.lit(b"\x01"),
        F.encode(pix_ascii, "UTF-8"),
    )


def resize_raw(df: DataFrame, out_w: int = 6, out_h: int = 5) -> DataFrame:
    """Nearest-neighbor resize of RAW1 bitmaps to (out_w, out_h) — the
    resize stage of a multimodal pipeline with REAL kernel math and real
    Spark plumbing (Arrow-batched mapInPandas over binary payloads; per
    image one numpy gather, never per-pixel Python).

    Index rule (must match any independent replay exactly): output pixel
    (y, x) takes source pixel (floor(y*h/out_h), floor(x*w/out_w)) —
    integer arithmetic, exact in every engine. Non-RAW1 payloads emit a
    stub row (nulls + resizer='stub'): resizing a compressed format needs
    a real decoder, which this container does not have."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ys = np.arange(out_h, dtype=np.int64)
        xs = np.arange(out_w, dtype=np.int64)
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                if len(b) < 9 or b[:4] != RAW_MAGIC:
                    rows.append((aid, None, None, None, None, None, "stub"))
                    continue
                w = (b[4] << 8) | b[5]
                h = (b[6] << 8) | b[7]
                c = b[8]
                # malformed RAW1 (zero dims, or a buffer shorter than the
                # declared w*h*c) must yield the documented honest stub row,
                # not a ValueError/IndexError that kills the whole job —
                # truncated blobs are inevitable in an arbitrary corpus
                # (ADVICE r5)
                if w <= 0 or h <= 0 or c <= 0 or len(b) < 9 + w * h * c:
                    rows.append((aid, None, None, None, None, None, "stub"))
                    continue
                pix = np.frombuffer(b, dtype=np.uint8, count=w * h * c, offset=9)
                src = pix.reshape(h, w, c)
                out = src[(ys * h) // out_h][:, (xs * w) // out_w]
                rows.append((aid, w, h, out_w, out_h, out.tobytes(), "numpy-nn"))
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.select("asset_id", "payload").mapInPandas(kernel, schema=RESIZED_SCHEMA)
