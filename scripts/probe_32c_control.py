#!/usr/bin/env python
"""32-core regression probe (round-4 verdict item 3).

Round 1 measured the bucketed suite at 1.92M turns/s on local[32]; the
round-3 controlled grid read 1.49M @32c while 16c IMPROVED to 1.86M. Is
that a code regression or the box? Answer by measuring, in the SAME
session windows, (a) the full suite and (b) a pure-JVM control that
contains zero engine code — sha1(concat_ws(cols)) + sum(length(text))
aggregated over the identical bucketed table. If the suite's 16->32 ratio
tracks the control's, the deficit is the box's shared memory bus / steal,
not the engine; if the suite alone degrades, it's a real regression.

Interleaved rounds (32,16 x N), suite and control back-to-back per session
so they share the host weather. Prints one JSON object; /tmp only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAREHOUSE = "/tmp/tag_spark_warehouse"
TABLE = "transcripts_bucketed"
ROUNDS = int(os.environ.get("PROBE_ROUNDS", "3"))
REPS = int(os.environ.get("PROBE_REPS", "2"))


def measure_session(cores: int) -> dict:
    from pyspark.sql import functions as F

    from tag_spark.generate import dim_role, dim_tool
    from tag_spark.operators.suite import default_transcript_suite
    from tag_spark.session import get_spark

    spark = get_spark(
        app_name=f"probe32-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
        extra_conf={"spark.sql.warehouse.dir": WAREHOUSE},
    )
    try:
        spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
        spark.sql(
            f"""CREATE TABLE {TABLE} (conv_id STRING, turn_idx INT, role STRING,
                text STRING, tool STRING, ts TIMESTAMP) USING parquet
                CLUSTERED BY (conv_id) SORTED BY (conv_id, turn_idx) INTO 64 BUCKETS
                LOCATION '{WAREHOUSE}/{TABLE}'"""
        )
        df = spark.table(TABLE)
        suite = default_transcript_suite(dim_role(spark), dim_tool(spark))

        def run_suite():
            suite.violations(df, shuffle_for_windows=False).write.format("noop").mode("overwrite").save()

        def run_control():
            # pure JVM, no engine code: string-heavy hash + length scan over
            # the same columns the suite touches (BASELINE.md's control)
            df.select(
                F.sha1(F.concat_ws("\x1f", "conv_id", "role", "text", "tool")).alias("h"),
                F.length("text").alias("l"),
            ).agg(F.max("h"), F.sum("l")).collect()

        out = {}
        for name, fn in (("suite", run_suite), ("control", run_control)):
            fn()  # warm: codegen JIT + page cache
            best = float("inf")
            for _ in range(REPS):
                t0 = time.monotonic()
                fn()
                best = min(best, time.monotonic() - t0)
            out[name] = round(best, 3)
        return out
    finally:
        spark.stop()


def main() -> int:
    from tag_spark.session import get_spark

    # the probe measures a PRE-STAGED bucketed table; without this guard a
    # missing warehouse fails with an opaque path-not-found only after
    # paying JVM startup, and measure_session would then register an
    # external table over a missing directory
    if not os.path.exists(os.path.join(WAREHOUSE, TABLE)):
        print(
            f"missing {WAREHOUSE}/{TABLE} — run scripts/bench_scaling.py first "
            "(it stages the bucketed transcript table this probe measures)",
            file=sys.stderr,
        )
        return 2

    boot = get_spark(app_name="probe32-boot", master="local[8]", extra_conf={"spark.sql.warehouse.dir": WAREHOUSE})
    n_turns = boot.read.parquet(f"{WAREHOUSE}/{TABLE}").count()
    boot.stop()

    best: dict[int, dict[str, float]] = {}
    samples: list = []
    for rnd in range(ROUNDS):
        for cores in (32, 16):
            m = measure_session(cores)
            samples.append({"round": rnd, "cores": cores, **m})
            cur = best.setdefault(cores, {"suite": 9e9, "control": 9e9})
            for k in ("suite", "control"):
                cur[k] = min(cur[k], m[k])
    out = {
        "n_turns": n_turns,
        "samples": samples,
        "best": {str(c): v for c, v in best.items()},
        "suite_turns_per_sec": {str(c): round(n_turns / v["suite"], 1) for c, v in best.items()},
        "ratio_16_to_32": {
            k: round(best[16][k] / best[32][k], 3) for k in ("suite", "control") if 16 in best and 32 in best
        },
    }
    print(json.dumps(out, indent=1))
    with open("/tmp/probe_32c_control.json", "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
