"""Mergeable t-digest-style quantile sketch (north_star: "t-digest
quantiles via pandas-Arrow UDAFs").

A compact scale-function t-digest: centroids (mean, weight) kept small by
merging neighbors under the k-size bound k(q) ∝ q(1-q). Two-phase, the way
10^12-row quantiles must run:

  phase 1  one Arrow-vectorized pass per physical partition builds a local
           sketch from sorted batch data (mapInPandas — numpy throughout)
  phase 2  sketches are tiny (≤ 2·compression centroids); they merge
           associatively, so a groupBy-key (or global) reduce combines them

Accuracy is that of the classic t-digest: tight at the tails, ~1/compression
relative rank error in the middle. Validated against exact quantiles in
tests/test_tdigest.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SKETCH_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("means", T.ArrayType(T.DoubleType()), False),
        T.StructField("weights", T.ArrayType(T.DoubleType()), False),
        T.StructField("total", T.DoubleType(), False),
        T.StructField("vmin", T.DoubleType(), True),
        T.StructField("vmax", T.DoubleType(), True),
    ]
)


def _compress(means: np.ndarray, weights: np.ndarray, compression: int) -> tuple[np.ndarray, np.ndarray]:
    """Merge sorted centroids under the t-digest size bound."""
    if len(means) == 0:
        return means, weights
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = weights.sum()
    out_m: list[float] = [float(means[0])]
    out_w: list[float] = [float(weights[0])]
    q_left = 0.0
    for m, w in zip(means[1:], weights[1:]):
        q_right = q_left + (out_w[-1] + w) / total
        q_mid = q_left + (out_w[-1] + w) / (2 * total)
        k_limit = 4 * total * q_mid * (1 - q_mid) / compression  # k1-ish bound
        if out_w[-1] + w <= max(k_limit, 1.0):
            merged_w = out_w[-1] + w
            out_m[-1] = (out_m[-1] * out_w[-1] + m * w) / merged_w
            out_w[-1] = merged_w
        else:
            q_left += out_w[-1] / total
            out_m.append(float(m))
            out_w.append(float(w))
    return np.asarray(out_m), np.asarray(out_w)


def tdigest_sketch(
    df: DataFrame,
    value_col: str,
    key_col: str | None = None,
    compression: int = 100,
) -> DataFrame:
    """Phase 1+2: per-partition sketches, merged per key (single key '_all'
    when key_col is None). Returns one sketch row per key."""
    kexpr = F.col(key_col).cast("string") if key_col else F.lit("_all")
    prepared = df.select(kexpr.alias("key"), F.col(value_col).cast("double").alias("v")).filter(F.col("v").isNotNull())

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[str, tuple[np.ndarray, np.ndarray, float, float]] = {}
        for pdf in batches:
            for key, grp in pdf.groupby("key"):
                v = grp["v"].to_numpy(dtype=np.float64)
                m, w = _compress(v, np.ones_like(v), compression)
                if key in acc:
                    pm, pw, lo, hi = acc[key]
                    m, w = _compress(np.concatenate([pm, m]), np.concatenate([pw, w]), compression)
                    acc[key] = (m, w, min(lo, float(v.min())), max(hi, float(v.max())))
                else:
                    acc[key] = (m, w, float(v.min()), float(v.max()))
        rows = [
            {"key": k, "means": m.tolist(), "weights": w.tolist(), "total": float(w.sum()), "vmin": lo, "vmax": hi}
            for k, (m, w, lo, hi) in acc.items()
        ]
        yield pd.DataFrame(rows, columns=[f.name for f in SKETCH_SCHEMA.fields])

    partials = prepared.mapInPandas(partial, schema=SKETCH_SCHEMA)

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        means = np.concatenate([np.asarray(x, dtype=np.float64) for x in pdf["means"]])
        weights = np.concatenate([np.asarray(x, dtype=np.float64) for x in pdf["weights"]])
        m, w = _compress(means, weights, compression)
        return pd.DataFrame(
            [
                {
                    "key": key[0],
                    "means": m.tolist(),
                    "weights": w.tolist(),
                    "total": float(w.sum()),
                    "vmin": float(pdf["vmin"].min()),
                    "vmax": float(pdf["vmax"].max()),
                }
            ]
        )

    return partials.groupBy("key").applyInPandas(merge, schema=SKETCH_SCHEMA)


def quantiles_from_sketch(sketch_rows, qs: list[float]) -> dict[str, dict[float, float]]:
    """Driver-side quantile extraction from collected sketch rows (sketches
    are tiny — this is O(keys · centroids))."""
    out: dict[str, dict[float, float]] = {}
    for r in sketch_rows:
        means = np.asarray(r["means"])
        weights = np.asarray(r["weights"])
        total = r["total"]
        cum = np.cumsum(weights) - weights / 2.0
        res = {}
        for q in qs:
            target = q * total
            if target <= cum[0]:
                res[q] = float(r["vmin"]) if r["vmin"] is not None else float(means[0])
            elif target >= cum[-1]:
                res[q] = float(r["vmax"]) if r["vmax"] is not None else float(means[-1])
            else:
                res[q] = float(np.interp(target, cum, means))
        out[r["key"]] = res
    return out


def tdigest_quantiles(df: DataFrame, value_col: str, qs: list[float], key_col: str | None = None, compression: int = 100):
    rows = tdigest_sketch(df, value_col, key_col, compression).collect()
    return quantiles_from_sketch(rows, qs)
