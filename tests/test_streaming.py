"""Structured-Streaming validation path (micro-batch, availableNow)."""

from pyspark.sql import functions as F

from tag_spark.generate import dim_role, dim_tool
from tag_spark.schema import TRANSCRIPT_SCHEMA
from tag_spark.streaming.validate_stream import (
    streaming_violations,
    violation_rate_windows,
    write_violation_stream,
)


def test_stream_matches_batch_row_checks(spark, transcripts, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    transcripts.write.parquet(src)

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    viol = streaming_violations(stream, dim_role(spark), dim_tool(spark))
    q = write_violation_stream(viol, out, ckpt, trigger_once=True)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    # batch equivalent over the same row-level checks
    from tag_spark.streaming.validate_stream import streaming_suite

    want = streaming_suite(dim_role(spark), dim_tool(spark)).violations(
        spark.read.parquet(src), shuffle_for_windows=False, carry_cols=("ts",)
    )
    assert got.count() == want.count()
    g = {tuple(r) for r in got.select("check_id", "conv_id", "turn_idx").collect()}
    w = {tuple(r) for r in want.select("check_id", "conv_id", "turn_idx").collect()}
    assert g == w


def test_stream_resume_is_incremental(spark, transcripts, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    transcripts.write.parquet(src)
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    viol = streaming_violations(stream, dim_role(spark), dim_tool(spark))
    write_violation_stream(viol, out, ckpt).awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    # second run with same checkpoint: nothing new to process
    stream2 = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    viol2 = streaming_violations(stream2, dim_role(spark), dim_tool(spark))
    write_violation_stream(viol2, out, ckpt).awaitTermination(120)
    assert spark.read.parquet(out).count() == n1


def test_violation_rate_windows(spark, transcripts, tmp_path):
    src = str(tmp_path / "src")
    transcripts.write.parquet(src)
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    viol = streaming_violations(stream, dim_role(spark), dim_tool(spark))
    rates = violation_rate_windows(viol, window="10 minutes")
    q = (
        rates.writeStream.format("memory")
        .queryName("rates")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM rates").collect()
    # append mode emits only watermark-closed windows; at minimum the query
    # must run and produce a well-formed schema
    cols = {c for c in spark.sql("SELECT * FROM rates").columns}
    assert {"window_start", "window_end", "check_id", "severity", "n_violations"} <= cols
    for r in rows:
        assert r["n_violations"] > 0
