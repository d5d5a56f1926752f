"""Structured-Streaming validation — beyond the reference (which is
batch-only: `cmd/check` is a finite directory walk, cmd/check/main.go:77-99;
SURVEY.md §2.10 scoped streaming out of the *core* engine).

This module re-uses the SAME compiled row-level checks over a stream of
transcript rows:

  row-level checks     identical fused violation array (stateless — safe in
                       a stream, the RefIntegrity broadcast joins included)
  windowed counts      violation rates per event-time window + watermark,
                       the streaming analog of the verdict matrix
  ordering checks      (Unique/Contiguous/Monotonic) need cross-row state;
                       they remain batch-side by design — at 10^12 turns the
                       checkpoint-manifest batch loop (plans/checkpoint.py)
                       is the resumable path, mirroring the reference's
                       rerun-what-changed usage rather than a 24/7 stream.

Usage (micro-batch):
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(in_dir)
    viol = streaming_violations(stream, dim_role, dim_tool)
    q = write_violation_stream(viol, out_dir, checkpoint_dir)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tag_spark.operators.checks import WindowCheck
from tag_spark.operators.suite import ValidationSuite, default_transcript_suite


def stateless(suite: ValidationSuite) -> ValidationSuite:
    """Any suite minus its window checks — the subset that is safe on an
    unbounded stream (stateful cross-row checks, including screened
    uniqueness whose eager screen cannot run on a streaming frame, stay
    batch-side by design)."""
    return ValidationSuite(
        [c for c in suite.checks if not isinstance(c, WindowCheck)],
        n_buckets=suite.n_buckets,
        key_cols=suite.key_cols,
        hash_col=suite.hash_col,
        bucket_fn=suite.bucket_fn,
    )


def streaming_suite(dim_role: DataFrame, dim_tool: DataFrame) -> ValidationSuite:
    """The default transcript suite minus its window checks."""
    return stateless(default_transcript_suite(dim_role, dim_tool))


def streaming_violations(stream: DataFrame, dim_role: DataFrame, dim_tool: DataFrame, carry_ts: bool = True) -> DataFrame:
    """Stateless violation stream: one fused projection per micro-batch —
    the same plan shape as the batch engine's stage 1. ``carry_ts`` keeps
    the event-time column for windowed rate aggregation downstream."""
    suite = streaming_suite(dim_role, dim_tool)
    return suite.violations(stream, shuffle_for_windows=False, carry_cols=("ts",) if carry_ts else ())


def violation_rate_windows(
    violations: DataFrame,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Event-time windowed violation counts with late-data tolerance — the
    streaming verdict matrix. Requires the violation stream to carry an
    event-time column (join the source ts before calling, or validate a
    stream that includes ts). Rows with a NULL event time cannot be
    assigned to any window and are excluded explicitly (they still surface
    through the ts_not_null check's own violation rows)."""
    return (
        violations.filter(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), "check_id", "severity")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), "check_id", "severity", "n_violations")
    )


def write_violation_stream(violations: DataFrame, out_path: str, checkpoint_path: str, trigger_once: bool = True):
    """Exactly-once micro-batch sink with a streaming checkpoint — the
    Structured-Streaming counterpart of the batch manifest."""
    w = (
        violations.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()
