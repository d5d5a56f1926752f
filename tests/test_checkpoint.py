"""Checkpoint manifest: record, resume, idempotence."""

import tempfile

from pyspark.sql import functions as F

from tag_spark.generate import dim_role, dim_tool
from tag_spark.operators.suite import bucket_expr, default_transcript_suite
from tag_spark.plans.checkpoint import CheckpointManifest


def test_record_and_resume(spark, transcripts):
    suite = default_transcript_suite(dim_role(spark), dim_tool(spark))
    res = suite.run(transcripts)
    with tempfile.TemporaryDirectory() as d:
        m = CheckpointManifest(spark, f"{d}/manifest", snapshot_id="snap-1")
        assert m.completed_buckets() == []
        run_id = m.record_run(res)
        assert run_id
        done = m.completed_buckets()
        assert len(done) == res.bucket_counts.count()
        # resume: nothing pending
        pending = m.filter_pending(transcripts)
        assert pending.count() == 0


def test_partial_resume(spark, transcripts):
    suite = default_transcript_suite(dim_role(spark), dim_tool(spark))
    # validate only half the buckets, then resume must surface the rest
    half = transcripts.filter(bucket_expr() < 32)
    res = suite.run(half)
    with tempfile.TemporaryDirectory() as d:
        m = CheckpointManifest(spark, f"{d}/manifest")
        m.record_run(res)
        pending = m.filter_pending(transcripts)
        assert pending.count() == transcripts.filter(bucket_expr() >= 32).count()
        assert pending.filter(bucket_expr() < 32).count() == 0


def test_manifest_metrics_match_verdicts(spark, transcripts):
    suite = default_transcript_suite(dim_role(spark), dim_tool(spark))
    res = suite.run(transcripts)
    with tempfile.TemporaryDirectory() as d:
        m = CheckpointManifest(spark, f"{d}/manifest", snapshot_id="snap-xyz")
        m.record_run(res)
        man = m.read()
        total_err = man.agg(F.sum("violations_error")).first()[0]
        expect_err = res.violations.filter(F.col("severity") == "error").count()
        assert total_err == expect_err
        assert man.filter(F.col("snapshot_id") != "snap-xyz").count() == 0
