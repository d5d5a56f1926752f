"""Single-pass per-partition column stats (SURVEY.md §2.4 A6).

Two interchangeable implementations:

``collect_stats_builtin`` — pure Catalyst: one hash aggregate per bucket
with count / null-count / min / max / approx_percentile (Greenwald-Khanna,
built-in). Partial aggregation is map-side, so the shuffle moves only
per-bucket sketches — this is the 100 TB path.

``collect_stats_arrow`` — the pandas-Arrow UDAF path demanded by the
north_star: one ``applyInPandas`` pass per bucket computing the same
stats plus exact-ish quantiles from the in-bucket sample. Used when a
sketch Spark lacks (e.g. t-digest-style mergeable quantiles) is needed.
Both emit the same long-format schema so they are drop-in swappable and
cross-checked in tests.

Output: one row per (bucket_id, column) —
(count, nulls, n_distinct≈, min, max, p25, p50, p75, p95, mean)
with min/max/quantiles as strings/doubles so heterogeneous column types
fit one frame (the reference's raw map is similarly dynamically typed,
id3v1.go:100-108).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tag_spark.operators.suite import bucket_expr
from tag_spark.schema import N_BUCKETS

STATS_SCHEMA = T.StructType(
    [
        T.StructField("bucket_id", T.IntegerType(), False),
        T.StructField("column", T.StringType(), False),
        T.StructField("count", T.LongType(), False),
        T.StructField("nulls", T.LongType(), False),
        T.StructField("n_distinct", T.LongType(), True),
        T.StructField("min", T.StringType(), True),
        T.StructField("max", T.StringType(), True),
        T.StructField("mean", T.DoubleType(), True),
        T.StructField("p25", T.DoubleType(), True),
        T.StructField("p50", T.DoubleType(), True),
        T.StructField("p75", T.DoubleType(), True),
        T.StructField("p95", T.DoubleType(), True),
    ]
)

_QS = [0.25, 0.5, 0.75, 0.95]


def _is_numeric(dt: T.DataType) -> bool:
    return isinstance(dt, (T.NumericType,))


def collect_stats_builtin(
    df: DataFrame, cols: Iterable[str], n_buckets: int = N_BUCKETS, bucket_fn=None, bucket_col: str = "conv_id"
) -> DataFrame:
    """One aggregation job; all sketches are built-in and mergeable, so the
    plan is scan → partial agg → exchange(bucket_id) → final agg."""
    bucket = (bucket_fn or bucket_expr)(bucket_col, n_buckets)
    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    aggs = []
    for c in cols:
        num = _is_numeric(dtypes[c])
        val = F.col(c)
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__count"),
            F.sum(F.when(val.isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.approx_count_distinct(val).alias(f"{c}__n_distinct"),
            F.min(val).cast("string").alias(f"{c}__min"),
            F.max(val).cast("string").alias(f"{c}__max"),
            (F.avg(val.cast("double")) if num else F.lit(None).cast("double")).alias(f"{c}__mean"),
            (
                F.percentile_approx(val.cast("double"), _QS, 10_000)
                if num
                else F.lit(None).cast("array<double>")
            ).alias(f"{c}__qs"),
        ]
    wide = df.groupBy(bucket.alias("bucket_id")).agg(*aggs)

    # unpivot wide → long: one struct per column, explode (tiny frame by now)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__count").cast("long").alias("count"),
            F.col(f"{c}__nulls").cast("long").alias("nulls"),
            F.col(f"{c}__n_distinct").cast("long").alias("n_distinct"),
            F.col(f"{c}__min").alias("min"),
            F.col(f"{c}__max").alias("max"),
            F.col(f"{c}__mean").alias("mean"),
            F.element_at(f"{c}__qs", 1).alias("p25"),
            F.element_at(f"{c}__qs", 2).alias("p50"),
            F.element_at(f"{c}__qs", 3).alias("p75"),
            F.element_at(f"{c}__qs", 4).alias("p95"),
        )
        for c in cols
    ]
    return (
        wide.select("bucket_id", F.explode(F.array(*structs)).alias("s"))
        .select("bucket_id", "s.*")
        .select(*[f.name for f in STATS_SCHEMA.fields])
    )


def collect_stats_arrow(df: DataFrame, cols: Iterable[str], n_buckets: int = N_BUCKETS) -> DataFrame:
    """applyInPandas UDAF: Arrow-batched, vectorized numpy/pandas inside —
    never per-row Python. Groups are conv_id buckets, so ~n_buckets groups
    regardless of data size; each group is one streamed Arrow batch set."""
    cols = list(cols)
    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    ts_cols = {c for c in cols if isinstance(dtypes[c], (T.TimestampType, T.DateType))}
    # Timestamps go through Arrow as epoch-second doubles: year-9999
    # adversarial rows overflow Arrow's timestamp[ns], and doubles are
    # cheaper to ship than timestamps anyway (fuzz analog, sum_test.go:8-40).
    numeric = {c for c in cols if _is_numeric(dtypes[c])} | ts_cols

    def stats_fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        bucket = int(key[0])
        for c in cols:
            s = pdf[c]
            n = len(s)
            nulls = int(s.isna().sum())
            nn = s.dropna()
            row = {
                "bucket_id": bucket,
                "column": c,
                "count": n,
                "nulls": nulls,
                "n_distinct": int(nn.nunique()),
                "min": None if nn.empty else str(nn.min()),
                "max": None if nn.empty else str(nn.max()),
                "mean": None,
                "p25": None,
                "p50": None,
                "p75": None,
                "p95": None,
            }
            if c in numeric and not nn.empty:
                x = nn.astype("float64")
                row["mean"] = float(x.mean())
                q = x.quantile(_QS)
                row["p25"], row["p50"], row["p75"], row["p95"] = (float(q.iloc[i]) for i in range(4))
            out.append(row)
        return pd.DataFrame(out)

    proj = [F.col(c).cast("double").alias(c) if c in ts_cols else F.col(c) for c in cols]
    return (
        df.select(*proj, bucket_expr(n_buckets=n_buckets).alias("bucket_id"))
        .groupBy("bucket_id")
        .applyInPandas(stats_fn, schema=STATS_SCHEMA)
    )
