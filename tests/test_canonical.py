"""Normalization equivalence across dialects — the engine's TestReadFrom
(tag_test.go:55-84): the same logical conversation, written in different
'dialects', must canonicalize byte-identically."""

import datetime

from pyspark.sql import functions as F

from tag_spark.functions.hashing import frame_digest
from tag_spark.operators.canonical import canonicalize_transcripts, extract_prefixed

TS = datetime.datetime(2024, 1, 1, 12, 0, 0)
COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "year", "text_sha1"]


def _conv(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp")


def test_dialect_variants_normalize_identically(spark):
    canonical_rows = [
        ("c1", 0, "system", "be helpful", None, TS),
        ("c1", 1, "user", "find the file", None, TS),
        ("c1", 2, "assistant", "searching now", "search", TS),
    ]
    variant_rows = [  # same logical content, messier dialect
        ("c1", 0, " SYS ", "be helpful\x00\x00", None, TS),
        ("c1", 1, "Human", "  find the file ", None, TS),
        ("c1", 2, "AI", "searching now", " WebSearch ", TS),
    ]
    a = canonicalize_transcripts(_conv(spark, canonical_rows))
    b = canonicalize_transcripts(_conv(spark, variant_rows))
    assert frame_digest(a, COLS) == frame_digest(b, COLS)


def test_unknown_values_pass_through(spark):
    # unknown roles are preserved (raw-bytes-for-unknown-frames analog,
    # id3v2.go:395-396) — the vocabulary CHECK flags them, normalization
    # must not destroy evidence
    df = _conv(spark, [("c1", 0, "RoBot", "x", "frobnicate", TS)])
    row = canonicalize_transcripts(df).first()
    assert row["role"] == "robot"
    assert row["tool"] == "frobnicate"


def test_extract_prefixed_with_aliases(spark):
    df = spark.createDataFrame(
        [(1, {"mb.artist_id": "a1", "mb.albumid": "b2", "other.junk": "z"})],
        "id long, raw map<string,string>",
    )
    out = extract_prefixed(df, "raw", "mb.", aliases={"albumid": "album_id"}).first()["extracted"]
    assert out == {"artist_id": "a1", "album_id": "b2"}


def test_canonicalization_is_idempotent(spark, transcripts):
    once = canonicalize_transcripts(transcripts)
    twice = canonicalize_transcripts(once.drop("year", "text_sha1"))
    assert frame_digest(once, COLS) == frame_digest(twice, COLS)
