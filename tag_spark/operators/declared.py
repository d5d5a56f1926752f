"""Declared-vs-actual count check (SURVEY.md §2.4 A4).

The reference's vorbis parser reads a declared comment count and the loop
must consume exactly that many entries (vorbis.go:41-60) — a structural
self-consistency check between metadata and payload. Table equivalent: a
conversation-level metadata dimension declares `n_turns`; the fact table's
actual per-conversation count must match. One partial-aggregated groupBy +
a broadcast-or-sortmerge FK join (J2's pointer-delegation shape, dsf.go:39-44).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tag_spark.operators.suite import bucket_expr
from tag_spark.schema import N_BUCKETS


def declared_count_violations(
    df: DataFrame,
    meta: DataFrame,
    conv_col: str = "conv_id",
    declared_col: str = "declared_turns",
    check_id: str = "declared_turn_count",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """One violation row per conversation whose actual turn count differs
    from the declared count (or which is missing from the metadata — the
    reference aborts on a truncated comment block, vorbis.go:55-58).
    Output schema matches ValidationSuite.violations()."""
    actual = df.groupBy(F.col(conv_col)).agg(F.count(F.lit(1)).alias("__actual"))
    # FULL OUTER: a conversation declared in metadata but absent from the
    # fact table ("declared 5, found 0" — the truncated-block case the
    # reference aborts on) must be flagged, not dropped by a left join
    joined = actual.join(meta.select(F.col(conv_col), F.col(declared_col).alias("__declared")), conv_col, "full_outer")
    found = F.coalesce(F.col("__actual"), F.lit(0))
    bad = joined.filter(F.col("__declared").isNull() | (found != F.col("__declared")))
    return bad.select(
        F.lit(check_id).alias("check_id"),
        F.lit("error").alias("severity"),
        F.col(conv_col).alias("conv_id"),
        F.lit(None).cast("int").alias("turn_idx"),
        F.lit(declared_col).alias("column"),
        F.when(
            F.col("__declared").isNull(),
            F.concat(F.lit("conversation missing from metadata; actual="), found.cast("string")),
        )
        .otherwise(
            F.concat(
                F.lit("declared "),
                F.col("__declared").cast("string"),
                F.lit(" turns, found "),
                found.cast("string"),
            )
        )
        .alias("reason"),
        F.lit(None).cast("string").alias("text_sha1"),
        bucket_expr(conv_col, n_buckets).alias("bucket_id"),
    )


def conversation_meta(df: DataFrame, conv_col: str = "conv_id") -> DataFrame:
    """Build a truthful metadata dim from the data itself (for tests and
    for baselining an existing healthy table)."""
    return df.groupBy(F.col(conv_col)).agg(F.count(F.lit(1)).alias("declared_turns"))
