#!/usr/bin/env python
"""End-to-end validation run — the `spark-submit --py-files` entrypoint.

    spark-submit --py-files tag_spark.zip run_validation.py \
        --input /path/to/transcripts --output /path/to/out [--resume]

Without --input, generates a deterministic synthetic transcript table
(--n-convs, --seed) first. Writes:
    <output>/violations/   stable-sorted violation rows (parquet)
    <output>/verdicts/     per-(bucket, check) verdict matrix (parquet)
    <output>/manifest/     checkpoint manifest for resume (parquet)
and prints a run summary to stdout (the `cmd/check` histogram analog,
cmd/check/main.go:162-190).
"""

from __future__ import annotations

import argparse
import sys
import time

from pyspark.sql import functions as F


def main(argv: list[str] | None = None, spark=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", default=None, help="transcripts table path (default: generate synthetic)")
    p.add_argument("--format", default="parquet", choices=["parquet", "jsonl"], help="input format for --input")
    p.add_argument("--output", default="/tmp/tag_spark_out", help="output directory")
    p.add_argument("--n-convs", type=int, default=10_000, help="synthetic conversations when no --input")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--master", default=None, help="spark master (default local[$SPARK_GRAFT_CPUS])")
    p.add_argument("--resume", action="store_true", help="skip buckets already completed in the manifest")
    p.add_argument("--stats", action="store_true", help="also collect per-bucket column stats")
    p.add_argument(
        "--salt-block-size",
        type=int,
        default=None,
        help="run ordering checks through the two-phase salted window with this block size "
        "(bounds task size when single conversations are huge; output is byte-identical)",
    )
    p.add_argument(
        "--salt-auto-threshold",
        type=int,
        default=200_000,
        help="without an explicit --salt-block-size, probe the conversation-size histogram "
        "and auto-select the salted window (block size = this threshold) when the largest "
        "conversation exceeds it; 0 disables the probe (the probe costs one map-side-partial "
        "count-per-conversation aggregation)",
    )
    args = p.parse_args(argv)

    from tag_spark.session import get_spark
    from tag_spark.generate import dim_role, dim_tool, generate_transcripts
    from tag_spark.operators.suite import ValidationSuite, default_transcript_suite
    from tag_spark.plans.checkpoint import CheckpointManifest

    owns_spark = spark is None
    if owns_spark:
        spark = get_spark(app_name="tag-spark-validate", master=args.master)
    t0 = time.monotonic()

    snapshot = None
    if args.input:
        from tag_spark.sources.reader import read_transcripts, table_snapshot

        df = read_transcripts(spark, args.input, fmt=args.format)
        # lineage pin: the parquet-level snapshot surrogate (or the Iceberg
        # snapshot id in production). Resume only honors buckets validated
        # under THIS exact snapshot; any append/overwrite re-validates.
        snapshot = table_snapshot(spark, args.input)
        print(f"input snapshot: {snapshot}", flush=True)
    else:
        df = generate_transcripts(spark, n_convs=args.n_convs, seed=args.seed)

    suite = default_transcript_suite(dim_role(spark), dim_tool(spark))
    manifest = CheckpointManifest(spark, f"{args.output}/manifest", snapshot_id=snapshot)

    done = []
    if args.resume:
        done = manifest.completed_buckets(snapshot_id=snapshot)
        df = manifest.filter_pending(df, bucket_fn=suite.bucket_fn, n_buckets=suite.n_buckets, snapshot_id=snapshot)
        print(f"resume: skipping {len(done)} completed buckets", flush=True)

    # skew guard: an explicit --salt-block-size wins; otherwise one cheap
    # aggregation decides the mode, so a planted 10^6-turn conversation
    # cannot silently bottleneck a single ordering-window task
    block_size = args.salt_block_size
    if block_size is None and args.salt_auto_threshold > 0:
        from tag_spark.operators.ordering import conv_size_histogram

        max_conv = conv_size_histogram(df).agg(F.max("max_turns")).first()[0] or 0
        if max_conv > args.salt_auto_threshold:
            block_size = args.salt_auto_threshold
            print(
                f"ordering checks: salted two-phase mode auto-selected "
                f"(max conversation size {max_conv} > threshold {args.salt_auto_threshold}, "
                f"block_size={block_size})",
                flush=True,
            )
        else:
            print(
                f"ordering checks: standard window mode "
                f"(max conversation size {max_conv} <= threshold {args.salt_auto_threshold})",
                flush=True,
            )

    if block_size:
        # hot-conversation mode: row-level checks via the suite (windows
        # removed), ordering checks via the bounded-task salted window
        from tag_spark.operators.checks import WindowCheck
        from tag_spark.operators.ordering import salted_order_violations

        from pyspark.storagelevel import StorageLevel
        from tag_spark.operators.ordering import CHECKS as SALTED_CHECKS

        window_checks = [c for c in suite.checks if isinstance(c, WindowCheck)]
        # the salted implementation covers exactly the standard ordering
        # checks; a suite with additional window checks must fail loudly
        # rather than silently skipping them
        uncovered = {c.check_id for c in window_checks} - set(SALTED_CHECKS)
        if uncovered:
            raise SystemExit(f"--salt-block-size cannot run window checks {sorted(uncovered)}")
        row_suite = ValidationSuite(
            [c for c in suite.checks if not isinstance(c, WindowCheck)],
            n_buckets=suite.n_buckets,
            key_cols=suite.key_cols,
            hash_col=suite.hash_col,
        )
        salted = salted_order_violations(df, block_size=block_size)
        combined = row_suite.violations(df).unionByName(salted).persist(StorageLevel.MEMORY_AND_DISK)
        res = row_suite.assemble(df, combined, extra_checks={c.check_id: c.severity for c in window_checks})
    else:
        res = suite.run(df)

    # a resumed run that actually SKIPPED buckets only processed the pending
    # remainder — append so the completed buckets' outputs accumulate instead
    # of being clobbered. But append is only safe when something was skipped:
    # a resume that skipped nothing (changed snapshot, empty/stale manifest)
    # re-validates the FULL table and must overwrite, or the old outputs
    # would be duplicated on top of the new complete set.
    mode = "append" if (args.resume and done) else "overwrite"
    ValidationSuite.stable_violations(res.violations).write.mode(mode).parquet(f"{args.output}/violations")
    res.verdicts.orderBy("bucket_id", "check_id").write.mode(mode).parquet(f"{args.output}/verdicts")

    if args.stats:
        from tag_spark.operators.stats import collect_stats_arrow

        # stats are global aggregates over whatever THIS run processed —
        # unlike violations/verdicts they are not bucket-additive (exact
        # quantiles from disjoint subsets cannot be merged by row append),
        # so resumed runs must never mix stats rows from different scopes.
        # Always overwrite, and record the scope so a reader of a resumed
        # run's stats knows they cover only the pending subset.
        scope = "resume-pending" if (args.resume and done) else "full"
        collect_stats_arrow(df, ["turn_idx", "role", "text", "tool", "ts"]).withColumn(
            "run_scope", F.lit(scope)
        ).write.mode("overwrite").parquet(f"{args.output}/stats")

    manifest.record_run(res)
    wall = time.monotonic() - t0

    # stdout summary — error histogram, like cmd/check's decodeErrors tally
    verd = spark.read.parquet(f"{args.output}/verdicts")
    viol = spark.read.parquet(f"{args.output}/violations")
    n_rows = verd.filter(F.col("check_id") == "unique_turn").agg(F.sum("rows_checked")).first()[0] or 0
    print(f"rows validated: {n_rows}")
    print(f"wall: {wall:.2f}s  throughput: {n_rows / max(wall, 1e-9):.0f} turns/sec")
    print("verdict summary (check x verdict):")
    for r in verd.groupBy("check_id", "verdict").count().orderBy("check_id", "verdict").collect():
        print(f"  {r['check_id']:28s} {r['verdict']:4s} buckets={r['count']}")
    print("top violation reasons:")
    for r in viol.groupBy("check_id", "severity").count().orderBy(F.desc("count")).limit(20).collect():
        print(f"  {r['check_id']:28s} [{r['severity']}] rows={r['count']}")
    if owns_spark:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
