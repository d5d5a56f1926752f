#!/usr/bin/env python
"""Extra benchmarks for optimization work (bench.py is frozen for
measurement; this harness reuses the SAME library entry points as
bench.py's runners, isolates each query with the noop sink, labels jobs,
and can dump .explain("formatted") plans).

Usage:
  python bench_extra.py --queries transcript_suite,drift_check --attempts 3
  python bench_extra.py --all --attempts 2 --out /tmp/bench_extra.json
  python bench_extra.py --explain-dir plans/r06 --suffix before --queries all

Environment: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32). Same transcript staging paths as bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def sf_value(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def stage_inputs(spark, sf: float):
    """Same (untimed) staging as bench.py: transcripts parquet + bucketed table."""
    from tag_spark.generate import generate_transcripts

    n_convs = max(2_000, int(1_000_000 * sf / 0.1))
    tpath = f"/tmp/tag_spark_bench_transcripts_sf{sf}_n{n_convs}"
    if not os.path.exists(f"{tpath}/_SUCCESS"):
        shutil.rmtree(tpath, ignore_errors=True)
        generate_transcripts(spark, n_convs=n_convs, seed=42).write.mode("overwrite").parquet(tpath)

    table = f"transcripts_bucketed_sf{str(sf).replace('.', '_')}_n{n_convs}"
    tloc = f"/tmp/tag_spark_bench_wh/{table}"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if os.path.exists(f"{tloc}/_SUCCESS"):
        spark.sql(
            f"""CREATE TABLE {table} (conv_id STRING, turn_idx INT, role STRING,
                text STRING, tool STRING, ts TIMESTAMP) USING parquet
                CLUSTERED BY (conv_id) SORTED BY (conv_id, turn_idx) INTO 64 BUCKETS
                LOCATION '{tloc}'"""
        )
    else:
        (
            spark.read.parquet(tpath)
            .repartition(64, "conv_id")
            .write.bucketBy(64, "conv_id")
            .sortBy("conv_id", "turn_idx")
            .option("path", tloc)
            .mode("overwrite")
            .saveAsTable(table)
        )
    return tpath, table, tloc


def make_frames(spark, sf: float):
    """DataFrame-valued runners: name -> fn() returning the DataFrame to
    force (for timing) or explain (for plan capture). Mirrors bench.py's
    make_runners exactly — same library calls, same parameters."""
    from pyspark.sql import functions as F

    from tag_spark.generate import dim_role, dim_tool
    from tag_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        neardup_clusters,
        ngram_jaccard_pairs,
        simhash,
    )
    from tag_spark.operators.drift import drift_check, transcript_baseline
    from tag_spark.operators.generic_suites import events_suite, lineitem_suite, violation_keys
    from tag_spark.operators.relevance import bm25_topk, ranked, rrf_fuse
    from tag_spark.operators.similarity import cosine_topk
    from tag_spark.operators.stats import collect_stats_arrow
    from tag_spark.operators.suite import default_transcript_suite
    from tag_spark.operators.text import profile_documents

    import __spark_entry__ as gate

    GQ = gate.queries()

    tpath, table, tloc = stage_inputs(spark, sf)
    tr = spark.read.parquet(tpath)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    dc = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb_r = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rqvec = [float(x) for x in emb_r.filter(F.col("vec_id") == 0).first()["embedding"]]
    st = default_transcript_suite(dim_role(spark), dim_tool(spark))
    try:
        bk = spark.table(table)
    except Exception:
        bk = spark.read.parquet(tloc)

    frames = {
        "transcript_violations": lambda: st.violations(tr),
        "transcript_suite_bucketed": lambda: st.violations(bk, shuffle_for_windows=False),
        "events_suite": lambda: violation_keys(events_suite(), ev, ("user_id", "event_id")),
        "lineitem_suite": lambda: violation_keys(lineitem_suite(), li, ("l_orderkey", "l_linenumber")),
        "q1_pricing": lambda: li.groupBy("l_returnflag", "l_linestatus").agg(
            F.count(F.lit(1)).alias("count_order"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("sum_base_price"),
            F.avg("l_discount").alias("avg_disc"),
        ),
        "stats_arrow": lambda: collect_stats_arrow(tr, ["turn_idx", "role", "text", "tool", "ts"]),
        "text_profile": lambda: profile_documents(dc),
        "dedup_exact": lambda: exact_dedup(dc),
        "dedup_minhash_lsh": lambda: minhash_lsh_pairs(dc, threshold=0.3),
        "dedup_simhash": lambda: simhash(dc),
        "relevance_bm25": lambda: bm25_topk(dc, ["hash", "merge", "window"], k=10),
        "relevance_hybrid_rrf": lambda: rrf_fuse(
            [
                ranked(bm25_topk(dc, ["hash", "merge", "window"], k=50), "bm25"),
                ranked(cosine_topk(emb_r, rqvec, k=50), "cos_sim", id_col="vec_id"),
            ],
            k=10,
        ),
        "asof_attribution": lambda: GQ["events_asof_attribution"](spark, SF_DIR),
        "sessionization": lambda: GQ["events_sessionization"](spark, SF_DIR),
        "pii_profile": lambda: GQ["doc_pii_profile"](spark, SF_DIR),
        "doc_chunks": lambda: GQ["doc_chunks"](spark, SF_DIR),
        "doc_pack": lambda: GQ["doc_pack_offsets"](spark, SF_DIR),
        "jaccard_pairs_03": lambda: ngram_jaccard_pairs(dc, k=3, threshold=0.3, max_shingle_freq=1000),
        "dedup_clusters": lambda: neardup_clusters(
            dc, ngram_jaccard_pairs(dc, k=3, threshold=0.3, max_shingle_freq=1000)
        ),
    }

    def run_transcript():
        res = st.run(tr)
        force(res.violations)
        force(res.verdicts)
        res.violations.unpersist()

    def run_drift():
        base = transcript_baseline(tr.filter(F.xxhash64("conv_id") % 2 == 0))
        cur = transcript_baseline(tr.filter(F.xxhash64("conv_id") % 2 != 0))
        drift_check(spark, base, cur).collect()

    actions = {
        "transcript_suite": run_transcript,
        "drift_check": run_drift,
    }
    return frames, actions


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="all")
    ap.add_argument("--attempts", type=int, default=2)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--out", default=None)
    ap.add_argument("--no-time", action="store_true", help="plan capture only")
    args = ap.parse_args()

    from tag_spark.session import get_spark

    sf = sf_value(SF_DIR)
    spark = get_spark(app_name="tag-spark-bench-extra", master=f"local[{CPUS}]", shuffle_partitions=2 * CPUS)
    frames, actions = make_frames(spark, sf)

    names = list(frames) + [a for a in actions if a not in frames]
    if args.queries != "all":
        want = args.queries.split(",")
        names = [n for n in names if n in want]

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)
        for n in names:
            if n in frames:
                df = frames[n]()
                plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
                with open(os.path.join(args.explain_dir, f"{n}_{args.suffix}.txt"), "w") as fh:
                    fh.write(plan)
                print(f"explained {n}", file=sys.stderr)

    timings: dict[str, float] = {}
    if not args.no_time:
        for n in names:
            fn = actions.get(n) or (lambda n=n: force(frames[n]()))
            spark.sparkContext.setJobDescription(f"bench_extra:{n}")
            best = float("inf")
            samples = []
            for _ in range(args.attempts):
                spark.catalog.clearCache()
                t0 = time.monotonic()
                fn()
                dt = time.monotonic() - t0
                samples.append(round(dt, 3))
                best = min(best, dt)
            timings[n] = round(best, 3)
            print(f"{n}: best={best:.3f} samples={samples}", file=sys.stderr)
            spark.sparkContext.setJobDescription(None)

    out = {"sf": sf, "cpus": CPUS, "queries": timings}
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
