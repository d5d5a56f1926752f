"""Mergeable t-digest sketch vs exact quantiles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tag_spark.operators.tdigest import tdigest_quantiles, tdigest_sketch

QS = [0.01, 0.25, 0.5, 0.75, 0.99]


def test_accuracy_vs_exact(spark):
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    got = tdigest_quantiles(li, "l_extendedprice", QS)["_all"]
    exact_vals = np.asarray([r[0] for r in li.select("l_extendedprice").collect()], dtype=float)
    for q in QS:
        exact = float(np.quantile(exact_vals, q))
        # relative rank error ~1/compression; translate to a value tolerance
        # via the local spread around the quantile
        lo, hi = np.quantile(exact_vals, max(0.0, q - 0.02)), np.quantile(exact_vals, min(1.0, q + 0.02))
        assert lo - 1e-9 <= got[q] <= hi + 1e-9, (q, got[q], exact)


def test_merge_invariance_across_partitioning(spark):
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    a = tdigest_quantiles(li.repartition(2), "l_quantity", QS)["_all"]
    b = tdigest_quantiles(li.repartition(37), "l_quantity", QS)["_all"]
    for q in QS:
        # same sketch algorithm over different partitionings must land
        # within each other's error bound (not bitwise: merge order differs)
        assert abs(a[q] - b[q]) <= max(1.0, 0.05 * abs(a[q])), (q, a[q], b[q])


def test_keyed_sketches(spark):
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    got = tdigest_quantiles(li, "l_extendedprice", [0.5], key_col="l_returnflag")
    assert set(got) == {"A", "N", "R"}
    for k, qs in got.items():
        assert qs[0.5] > 0


def test_sketch_stays_small(spark):
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    row = tdigest_sketch(li, "l_extendedprice", compression=100).first()
    # greedy weight-bound keeps ~5x compression centroids (tail-heavy by
    # design); what matters is the bound is O(compression), not O(n)
    assert len(row["means"]) <= 8 * 100
    assert row["total"] == pytest.approx(60_000, abs=1)
    # 100x more data must NOT grow the sketch
    small = tdigest_sketch(
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"), "l_extendedprice", compression=100
    ).first()
    assert len(row["means"]) <= max(2 * len(small["means"]), 8 * 100)


def test_min_max_exact(spark):
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    row = tdigest_sketch(li, "l_extendedprice").first()
    mn, mx = li.agg(F.min("l_extendedprice"), F.max("l_extendedprice")).first()
    assert row["vmin"] == mn and row["vmax"] == mx
