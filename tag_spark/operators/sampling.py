"""Deterministic sampling + compression operators for training-data
pipelines. Everything here is hash-derived — no RNG state — so results are
byte-identical at any parallelism and replayable by an independent SQL
engine (the md5 trick the digest/simhash oracles already rely on).

  hash_sample          global p-fraction sample as a row-local FILTER on
                       md5(id) — no shuffle, no window, evaluated inside
                       the scan's codegen stage; the way to subsample
                       100 TB without moving a single dropped row
  stratified_sample    k rows per stratum (row_number over md5 order) —
                       balanced class subsets for training mixes
  quantize_embeddings  symmetric per-vector int8 quantization (round to
                       ±127 of max-|x| scale): 4x smaller vectors for the
                       shuffle-heavy candidate stages of ANN / dedup

Reference analog for determinism-by-construction: the reference derives
every fixture from fixed bytes, never ambient randomness (testdata digests
in tag_test.go); same rule here at table scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _md5_key(id_col: Column) -> Column:
    return F.md5(id_col.cast("string"))


def hash_sample(df: DataFrame, p: float, id_col: str) -> DataFrame:
    """Deterministic ~p-fraction sample: keep rows whose md5(id) hex string
    sorts below the p-quantile cutoff. A pure row-local FILTER fused into
    the scan's whole-stage codegen (the key is computed, so it is not a
    parquet-footer pushdown — but nothing shuffles and dropped rows never
    leave the scan stage), and the SAME rows survive on every run/engine
    (md5 hex compares lexicographically identically everywhere). Exact
    keep-probability is floor(p·16^8)/16^8."""
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"p must be in [0, 1], got {p}")
    n_buckets = 16**8
    cut = int(p * n_buckets)
    if cut >= n_buckets:
        return df  # keep-all: a 9-hex-digit cutoff would compare lexicographically, not numerically
    cutoff = format(cut, "08x")
    return df.filter(_md5_key(F.col(id_col)) < F.lit(cutoff))


def stratified_sample(df: DataFrame, strata_col: str, k: int, id_col: str) -> DataFrame:
    """k rows per stratum, selected by (md5(id), id) order within the
    stratum — a balanced, reproducible subset (training-mix construction:
    'at most k documents per language/source'). One shuffle on the stratum
    key; heavily-skewed strata cost one window task each, bounded because
    row_number needs no full sort of the stratum at the reducer (top-k
    via TakeOrdered semantics after rank filter)."""
    w = Window.partitionBy(strata_col).orderBy(_md5_key(F.col(id_col)), F.col(id_col))
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k).drop("__rn")


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Symmetric per-vector linear quantization to signed ``bits`` ints:
    scale = max|x| / (2^(bits-1) - 1), q_i = half-away-from-zero round of
    x_i / scale, spelled EXPLICITLY as sign(r)·floor(|r| + 0.5) — Spark's
    round(double) (BigDecimal HALF_UP on the shortest decimal repr) and
    DuckDB's round (C half-away-from-zero on the raw double) agree almost
    everywhere but are unpinned against each other at representable .5
    boundaries; floor arithmetic is bit-identical in both engines. Returns
    (id, scale, q array<int>). 4x (int8) smaller vectors for the
    shuffle-heavy stages — candidate reranks can dot int8 and rescale by
    scale_a·scale_b, cutting ANN candidate-join shuffle bytes by ~4x at
    identical top-k ordering within quantization error. All-zero vectors
    quantize to zeros with scale 0 (guarded; ANSI mode would otherwise
    overflow on floor(inf)). Deterministic, engine-portable math: the
    driver oracle recomputes scale and every q_i in SQL."""
    qmax = float((1 << (bits - 1)) - 1)
    vec = F.col(vec_col)
    scale = (F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double")))) / F.lit(qmax)).alias("scale")
    df2 = df.select(F.col(id_col), vec.alias("__v"), scale)

    def _q(x: Column) -> Column:
        r = x.cast("double") / F.col("scale")
        return (F.signum(r) * F.floor(F.abs(r) + F.lit(0.5))).cast("int")

    q = F.when(F.col("scale") == 0.0, F.transform(F.col("__v"), lambda x: F.lit(0))).otherwise(
        F.transform(F.col("__v"), _q)
    )
    return df2.select(F.col(id_col), F.col("scale"), q.alias("q"))
