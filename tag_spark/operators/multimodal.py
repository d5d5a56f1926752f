"""Multimodal asset handling: opaque binary payloads + typed metadata.

The reference treats embedded pictures exactly this way — an opaque blob
with (mime, type, description) metadata parsed from the container
(Picture struct, id3v2frames.go:545-551; base64 vorbis pictures,
vorbis.go:62-68; PNG sniffing, mp4.go:54-55). We scale the pattern: assets
live in a `binary` column with a metadata struct; builtin-expressible
fields (length, content hash, magic sniff) are pure JVM expressions, and
only genuinely-imperative decode work runs in Python — always over Arrow
batches (pandas UDF / `mapInPandas`), never one row at a time.

The actual image/audio decode libraries are NOT available in this
container, so `decode_image` et al. run a clearly-marked deterministic
STUB when the real library is missing — the Spark-side plumbing (schema,
batching, partitioning, UDF signature) is real and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

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


def generate_assets(spark: SparkSession, n: int = 1000, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table: payload bytes derived from
    sha2(asset_id), prefixed with a real magic number per kind. Image
    assets carry a REAL spec-conformant header — PNG signature + IHDR
    chunk (deterministic width/height u32-BE, bit depth 8, color type 6)
    or GIF89a signature + logical-screen descriptor (u16-LE dims) — so the
    header-decode path (png_ihdr_dims / gif_screen_dims) exercises real
    fixed-offset parsing, not stub pseudo-dimensions."""
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
    magic = (
        F.when((kind == "image") & (F.col("asset_id") % 2 == 0), png_header)
        .when(kind == "image", gif_header)
        .when(kind == "audio", F.lit(MAGIC["wav"]))
        .otherwise(F.lit(MAGIC["mp4"]))
    )
    body = F.sha2(F.concat(F.col("asset_id").cast("string"), F.lit(seed)), 256).cast("binary")
    # payload length varies deterministically 1-16 body repeats
    reps = (F.pmod(F.xxhash64("asset_id", F.lit("len"), F.lit(seed)), F.lit(16)) + 1).cast("int")
    payload = F.concat(magic, F.aggregate(F.sequence(F.lit(1), reps), F.lit(b""), lambda acc, _: F.concat(acc, body)))
    mime = (
        F.when((kind == "image") & (F.col("asset_id") % 2 == 0), F.lit("image/png"))
        .when(kind == "image", F.lit("image/gif"))
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
        T.StructField("decoder", T.StringType(), False),  # 'pil' | 'stub'
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


def _decode_batch(kind: pd.Series, payload: pd.Series) -> pd.DataFrame:
    """Arrow-batched decode stand-in for formats whose dimensions are NOT
    fixed-offset header fields (JPEG needs a variable-offset SOF-marker
    scan; PIL absent from this container) — the STUB derives deterministic
    pseudo-dimensions from the content hash, clearly labeled
    ``decoder='stub'``. PNG and GIF never reach this path: their dims are
    real JVM header decodes (png_ihdr_dims / gif_screen_dims)."""
    widths: list[int | None] = []
    heights: list[int | None] = []
    for k, p in zip(kind, payload):
        b = bytes(p) if p is not None else b""
        if _HAS_PIL and k == "image":  # pragma: no cover
            raise NotImplementedError("real decode path requires PIL-compatible payloads")
        digest = hashlib.sha256(b).hexdigest()
        widths.append(16 + int(digest[:4], 16) % 4080 if k == "image" else None)
        heights.append(16 + int(digest[4:8], 16) % 4080 if k == "image" else None)
    return pd.DataFrame({"width": widths, "height": heights, "decoder": "stub"})


def decode_image_features(df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Feature-extraction over image payloads.

    ``n_bytes`` and ``content_sha256`` are pure JVM expressions
    (``F.length`` / ``F.sha2`` — codegen'd, vectorized, no Python).
    Width/height are REAL header decodes for PNG (IHDR u32-BE) and GIF
    (logical-screen u16-LE) via fixed-offset JVM expressions —
    ``decoder='header'`` — with only the variable-offset formats (JPEG)
    falling to the Arrow-batched stub UDF, clearly labeled
    ``decoder='stub'``. ONE projection, no extra join or shuffle; the UDF
    is evaluated once (single ``__d`` struct column)."""
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
