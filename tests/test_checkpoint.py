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


def test_resume_does_not_clobber_outputs(spark):
    """Regression: a resumed run must APPEND its (pending-bucket) outputs —
    overwriting would destroy the completed buckets' violations/verdicts
    while the manifest still marks them done."""
    import run_validation

    with tempfile.TemporaryDirectory() as d:
        args = ["--output", d, "--n-convs", "60"]
        assert run_validation.main(args, spark=spark) == 0
        viol_before = spark.read.parquet(f"{d}/violations").count()
        verd_before = spark.read.parquet(f"{d}/verdicts").count()
        assert viol_before > 0
        # resume with everything complete: pending set is empty, so the run
        # writes nothing new — but must not wipe the existing outputs either
        assert run_validation.main(args + ["--resume"], spark=spark) == 0
        assert spark.read.parquet(f"{d}/violations").count() == viol_before
        assert spark.read.parquet(f"{d}/verdicts").count() == verd_before


def test_filter_pending_respects_custom_bucket_fn(spark):
    """A manifest recorded under a custom bucketing must be resumed with the
    SAME bucketing or the wrong rows would be skipped/re-validated."""
    from tag_spark.operators.generic_suites import events_suite, mod_bucket

    events = spark.createDataFrame(
        [(i, i % 10, "click", None, 1.0, "{}") for i in range(100)],
        "event_id long, user_id long, event_type string, ts timestamp, value double, props string",
    )
    suite = events_suite(n_buckets=64)
    res = suite.run(events.filter(mod_bucket("user_id", 64) < 5))
    with tempfile.TemporaryDirectory() as d:
        m = CheckpointManifest(spark, f"{d}/manifest")
        m.record_run(res)
        pending = m.filter_pending(events, conv_col="user_id", n_buckets=64, bucket_fn=mod_bucket)
        assert pending.count() == events.filter(mod_bucket("user_id", 64) >= 5).count()
        assert pending.filter(mod_bucket("user_id", 64) < 5).count() == 0


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


def test_snapshot_surrogate_pins_lineage(spark, transcripts, tmp_path):
    """table_snapshot changes whenever the file listing changes; resume
    under a changed snapshot treats NOTHING as complete (the Iceberg
    snapshot-id behavior, surrogate at parquet level)."""
    import time as _time

    from tag_spark.generate import dim_role, dim_tool
    from tag_spark.operators.suite import default_transcript_suite
    from tag_spark.sources.reader import table_snapshot

    data = str(tmp_path / "t")
    transcripts.write.parquet(data)
    snap1 = table_snapshot(spark, data)
    assert snap1 == table_snapshot(spark, data), "snapshot must be stable across calls"

    suite = default_transcript_suite(dim_role(spark), dim_tool(spark))
    res = suite.run(spark.read.parquet(data))
    m = CheckpointManifest(spark, str(tmp_path / "manifest"), snapshot_id=snap1)
    m.record_run(res)

    # same snapshot: everything done, nothing pending
    assert len(m.completed_buckets(snapshot_id=snap1)) > 0
    assert m.filter_pending(spark.read.parquet(data), snapshot_id=snap1).count() == 0

    # table changes (append a file) -> new snapshot -> nothing counts as done
    _time.sleep(0.01)
    transcripts.limit(5).write.mode("append").parquet(data)
    snap2 = table_snapshot(spark, data)
    assert snap2 != snap1
    assert m.completed_buckets(snapshot_id=snap2) == []
    pending = m.filter_pending(spark.read.parquet(data), snapshot_id=snap2)
    assert pending.count() == spark.read.parquet(data).count()
