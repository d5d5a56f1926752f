"""Canonical schemas for the validation engine.

The transcript fact table mirrors BASELINE.json ``input_hint``; the
violation / verdict shapes mirror the reference's error strings +
``cmd/check`` histograms (cmd/check/main.go:126-146) re-expressed as
DataFrames (FIXTURES.md §5/§6).
"""

from __future__ import annotations

from pyspark.sql import types as T

# The fact table (analog: one audio file == one conv_id group; one frame ==
# one turn row — SURVEY.md §1.3). Columns are nullable in storage so that
# violation plants are representable; NotNull is a *check*, not a schema
# property (reference keeps raw bytes for unknown frames, id3v2.go:395-396).
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Violation rows — the engine's analog of the reference's non-nil parse
# errors (e.g. id3v2.go:295 "id3: unsupported frame in ...").  Sorted by
# (check_id, conv_id, turn_idx) before any write so fixtures are
# byte-for-byte stable across partition counts (SURVEY.md §2.6).
VIOLATION_SCHEMA = T.StructType(
    [
        T.StructField("check_id", T.StringType(), False),
        T.StructField("severity", T.StringType(), False),  # error | warn
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("column", T.StringType(), True),
        T.StructField("reason", T.StringType(), True),
        # C1 canonical per-turn hash: sha1(conv_id || 0x1f || turn_idx || 0x1f || text)
        # (analog of tag.Sum's metadata-invariant digest, sum.go:14-44).
        T.StructField("text_sha1", T.StringType(), True),
    ]
)

# Per-(logical partition, check) verdict matrix (FIXTURES.md §6).  The
# logical partition is a *deterministic* bucket of conv_id — NOT Spark's
# physical spark_partition_id(), which changes with parallelism and would
# break byte-for-byte fixture equality.
VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("bucket_id", T.IntegerType(), False),
        T.StructField("check_id", T.StringType(), False),
        T.StructField("verdict", T.StringType(), False),  # PASS | WARN | FAIL
        T.StructField("rows_checked", T.LongType(), False),
        T.StructField("rows_violating", T.LongType(), False),
    ]
)

# Allowed-vocabulary dimensions (analog of the per-version declared frame
# dictionaries, id3v2frames.go:21-287, and the picture-type / atom-mean
# whitelists, id3v2frames.go:520-542, mp4.go:48-52).
DEFAULT_ROLES = ["system", "user", "assistant", "tool"]

DEFAULT_TOOLS = [
    "search",
    "bash",
    "read",
    "write",
    "edit",
    "browse",
    "python",
    "sql",
    "calculator",
    "translate",
    "summarize",
    "grep",
    "glob",
    "fetch",
    "plan",
    "diff",
    "test",
    "lint",
    "deploy",
    "notify",
]

# Number of deterministic logical buckets used for verdicts, stats and the
# checkpoint manifest. 64 is small enough that the verdict matrix is tiny
# and large enough that resume-granularity is useful at 10^12 turns (each
# bucket ~= 1.6*10^10 turns => split further by Iceberg partition in prod).
N_BUCKETS = 64
