"""Distribution-drift checks: PSI + KS over fixed-layout histograms.

No reference analog (dhowden/tag has no drift concept) — this is the
north_star addition: compare turn-length and ts histograms of the current
table against a stored baseline snapshot. The heavy part (histogramming)
is a single Catalyst hash aggregate whose output is bounded by the bucket
count, so the PSI/KS math itself runs on tiny frames (numpy driver-side,
never on the fact table).

Bucket layout is FIXED by (lo, hi, n_buckets) so PSI is deterministic and
baselines written at one scale compare cleanly at another (FIXTURES.md §4).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

HIST_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("lo", T.DoubleType(), False),
        T.StructField("hi", T.DoubleType(), False),
        T.StructField("count", T.LongType(), False),
    ]
)

DRIFT_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType(), False),
        T.StructField("psi", T.DoubleType(), False),
        T.StructField("ks", T.DoubleType(), False),
        T.StructField("n_base", T.LongType(), False),
        T.StructField("n_cur", T.LongType(), False),
        T.StructField("drifted", T.BooleanType(), False),
    ]
)

# conventional PSI interpretation: <0.1 stable, 0.1-0.25 moderate, >0.25 drifted
DEFAULT_PSI_THRESHOLD = 0.25


def histogram(df: DataFrame, expr: Column, metric: str, lo: float, hi: float, n_buckets: int = 32) -> DataFrame:
    """Fixed-layout histogram of a numeric expression. Out-of-range values
    clamp into the edge buckets (so adversarial rows count, never vanish).
    One partial+final hash aggregate; output ≤ n_buckets rows."""
    w = (hi - lo) / n_buckets
    x = expr.cast("double")
    # NB: greatest()/least() IGNORE nulls in Spark (greatest(null,0)==0), so
    # null inputs must be gated explicitly or they silently join bucket 0
    clamped = F.least(F.greatest(F.floor((x - F.lit(lo)) / F.lit(w)), F.lit(0)), F.lit(n_buckets - 1))
    bucket = F.when(x.isNotNull(), clamped).cast("int")
    out = (
        df.select(bucket.alias("bucket"))
        .where(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    return out.select(
        F.lit(metric).alias("metric"),
        F.col("bucket"),
        (F.lit(lo) + F.col("bucket") * F.lit(w)).alias("lo"),
        (F.lit(lo) + (F.col("bucket") + 1) * F.lit(w)).alias("hi"),
        F.col("count").cast("long").alias("count"),
    )


def transcript_baseline(df: DataFrame, text_cap: int = 20_000) -> DataFrame:
    """The two north_star metrics: turn-length and ts-hour histograms."""
    h1 = histogram(df, F.length("text"), "text_len", 0.0, float(text_cap), 40)
    h2 = histogram(df, F.hour("ts"), "ts_hour", 0.0, 24.0, 24)
    return h1.unionByName(h2)


def _collect_hist(hist: DataFrame, metric: str) -> dict[int, int]:
    rows = hist.filter(F.col("metric") == metric).select("bucket", "count").collect()
    return {r["bucket"]: r["count"] for r in rows}


def psi_ks(base: dict[int, int], cur: dict[int, int], eps: float = 1e-6) -> tuple[float, float, int, int]:
    """PSI = Σ (p-q)·ln(p/q); KS = max |CDF_p - CDF_q|. Pure python on ≤
    n_buckets entries."""
    buckets = sorted(set(base) | set(cur))
    nb, nc = sum(base.values()), sum(cur.values())
    psi = 0.0
    ks = 0.0
    cb = cc = 0.0
    for b in buckets:
        p = max(base.get(b, 0) / max(nb, 1), eps)
        q = max(cur.get(b, 0) / max(nc, 1), eps)
        psi += (q - p) * math.log(q / p)
        cb += base.get(b, 0) / max(nb, 1)
        cc += cur.get(b, 0) / max(nc, 1)
        ks = max(ks, abs(cb - cc))
    return psi, ks, nb, nc


def drift_check(
    spark: SparkSession,
    baseline_hist: DataFrame,
    current_hist: DataFrame,
    psi_threshold: float = DEFAULT_PSI_THRESHOLD,
) -> DataFrame:
    """Compare two histogram frames metric-by-metric → one drift verdict row
    per metric. Histograms are bounded (≤ dozens of rows) so the collect is
    O(buckets), independent of table size."""
    metrics = sorted({r["metric"] for r in baseline_hist.select("metric").distinct().collect()})
    out = []
    for m in metrics:
        psi, ks, nb, nc = psi_ks(_collect_hist(baseline_hist, m), _collect_hist(current_hist, m))
        out.append((m, float(psi), float(ks), nb, nc, bool(psi > psi_threshold)))
    return spark.createDataFrame(out, DRIFT_SCHEMA)
