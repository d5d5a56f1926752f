"""Pre-built suites proving the engine generalizes beyond transcripts.

These run the SAME compiled-check machinery over the driver's TPC-H-ish
testdata tables, which lets an independent SQL oracle (DuckDB) verify the
engine's actual violation output row-for-row (SURVEY.md §5 oracle plan):

 - events   — conversation analog: user_id session, event_id order
 - lineitem — conversation analog: l_orderkey group, l_linenumber order

Check reasons / hashes are engine-internal; oracle comparisons project
(check_id, severity, keys) which both sides can compute exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tag_spark.operators.checks import (
    Conditional,
    ContiguousIndex,
    InRange,
    InSet,
    Monotonic,
    NotNull,
    SEV_ERROR,
    SEV_WARN,
    Unique,
)
from tag_spark.operators.suite import ValidationSuite

EVENT_TYPES = ["click", "view", "purchase", "signup"]  # 'error' is the planted outlier


def mod_bucket(col: str, n: int) -> Column:
    """Oracle-reproducible bucket for integer keys (DuckDB has no xxhash64).

    NULL keys land in bucket 0: a NULL bucket would fall out of the
    verdict matrix's fixed 0..n-1 count aggregates and its rows would go
    silently unvalidated (caught by the generated-corpus fuzz; the fixed
    testdata has no NULL keys). The default xxhash64 bucket has no such
    hole — Spark's xxhash64 hashes a NULL input to a real value.

    Sign semantics: `%` (sign-of-dividend), NOT pmod — every oracle replay
    uses DuckDB's `%`, which keeps the sign of the dividend (-5 % 64 = -5),
    while pmod would map a negative key to 59 and silently diverge
    engine-vs-oracle (ADVICE r5). Negative buckets are counted exactly:
    ValidationSuite.run derives the verdict matrix's rows_checked from a
    column-pruned groupBy scan of the bucket expression, which enumerates
    whatever bucket ids the data produces (no fixed 0..n-1 range)."""
    return F.coalesce(F.col(col) % F.lit(n), F.lit(0)).cast("int")


def events_suite(n_buckets: int = 64) -> ValidationSuite:
    return ValidationSuite(
        checks=[
            NotNull("event_id_not_null", SEV_ERROR, col="event_id"),
            NotNull("ts_not_null", SEV_ERROR, col="ts"),
            InSet("event_type_in_vocab", SEV_ERROR, col="event_type", allowed=EVENT_TYPES),
            InRange("value_nonneg", SEV_ERROR, col="value", lo=0.0),
            Conditional("purchase_value_positive", SEV_WARN, when_sql="event_type = 'purchase'", then_sql="value > 0"),
            # Unique on a key NOT prefixed by the suite's conv key (user_id)
            # would force a second row exchange on event_id — screen='exact'
            # runs a partial-aggregated distinct-count first and only pays
            # that exchange when duplicates actually exist (still exact).
            Unique("unique_event_id", SEV_ERROR, keys=("event_id",), rank_by=("ts", "__sha1"), screen="exact"),
            Monotonic("ts_monotone", SEV_ERROR, col="ts", partition_by=("user_id",), order_by=("event_id",)),
        ],
        key_cols=("user_id", "event_id"),
        hash_col="props",
        n_buckets=n_buckets,
        bucket_fn=mod_bucket,
    )


def lineitem_suite(n_buckets: int = 64) -> ValidationSuite:
    return ValidationSuite(
        checks=[
            InSet("returnflag_in_vocab", SEV_ERROR, col="l_returnflag", allowed=["A", "N", "R"]),
            InRange("quantity_in_range", SEV_ERROR, col="l_quantity", lo=1.0, hi=50.0),
            InRange("discount_in_range", SEV_ERROR, col="l_discount", lo=0.0, hi=1.0),
            Unique("unique_lineitem", SEV_ERROR, keys=("l_orderkey", "l_linenumber"), rank_by=("l_shipdate", "__sha1")),
            ContiguousIndex(
                "linenumber_contiguous",
                SEV_WARN,
                partition_by=("l_orderkey",),
                order_by=("l_linenumber",),
                idx_col="l_linenumber",
                start=1,
            ),
            # l_linenumber has duplicate values in the synthetic data, so the
            # ordering needs a deterministic tie-break or lag() is ambiguous
            Monotonic(
                "shipdate_monotone",
                SEV_WARN,
                col="l_shipdate",
                partition_by=("l_orderkey",),
                order_by=("l_linenumber", "l_shipdate"),
            ),
        ],
        key_cols=("l_orderkey", "l_linenumber"),
        hash_col="l_returnflag",
        n_buckets=n_buckets,
        bucket_fn=mod_bucket,
    )


def violation_keys(suite: ValidationSuite, df: DataFrame, key_names: tuple[str, str]) -> DataFrame:
    """Oracle-comparable projection of the suite's violations."""
    k1, k2 = key_names
    return suite.violations(df).select(
        "check_id",
        "severity",
        F.col("conv_id").cast("long").alias(k1),
        F.col("turn_idx").cast("long").alias(k2),
    )
