"""Sinks: deterministic violation/verdict writes (S10).

The reference prints a human dump + JSON (cmd/tag/main.go:52-76) and
`cmd/check` tallies error histograms (cmd/check/main.go:162-190). Table
equivalents: stable-sorted parquet fixtures, a rollup summary matrix, and
a JSON-lines report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tag_spark.operators.suite import ValidationSuite


def write_violations(violations: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Byte-for-byte stable fixture write: global order (check_id, conv_id,
    turn_idx, reason) into a single file per sorted range. Violation sets
    are small relative to the fact table, so the global sort is cheap; the
    fact table itself is never globally sorted."""
    ValidationSuite.stable_violations(violations).write.format(fmt).mode("overwrite").save(path)


def write_verdicts(verdicts: DataFrame, path: str, fmt: str = "parquet") -> None:
    verdicts.orderBy("bucket_id", "check_id").write.format(fmt).mode("overwrite").save(path)


def summary_matrix(verdicts: DataFrame) -> DataFrame:
    """check x verdict rollup — includes the grand-total row via rollup()
    (the one grouping-sets use in the engine, SURVEY.md §2.4)."""
    return (
        verdicts.rollup("check_id", "verdict")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("rows_violating").alias("rows_violating"),
        )
        .orderBy(F.col("check_id").asc_nulls_first(), F.col("verdict").asc_nulls_first())
    )


def violation_samples_topk(
    violations: DataFrame, k: int = 5, order_cols: tuple[str, ...] = ("conv_id", "turn_idx")
) -> DataFrame:
    """§2.5 top-k sampling as a first-class operator: the first ``k``
    violations per check under a stable (order_cols) order — a window rank
    per check_id, never a global sort or driver collect. The JSON report
    below uses the same shape; this returns the sampled ROWS so the result
    is oracle-checkable."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("check_id").orderBy(*[F.col(c) for c in order_cols])
    return (
        violations.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .select("check_id", "severity", *order_cols, F.col("sample_rank").cast("long").alias("sample_rank"))
    )


def violations_report_json(violations: DataFrame, limit_per_check: int = 5) -> DataFrame:
    """Per-check JSON summary with sampled violations — the MarshalIndent
    analog (cmd/tag/main.go:69-75). Sampling = rank ≤ k per check via a
    window, never a global collect."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("check_id").orderBy("conv_id", "turn_idx")
    sampled = (
        violations.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= limit_per_check)
        .groupBy("check_id")
        .agg(F.collect_list(F.to_json(F.struct("conv_id", "turn_idx", "reason"))).alias("samples"))
    )
    totals = violations.groupBy("check_id", "severity").agg(F.count(F.lit(1)).alias("n"))
    return totals.join(sampled, "check_id", "left").select(
        "check_id",
        "severity",
        "n",
        F.to_json(F.struct("check_id", "severity", "n", "samples")).alias("json"),
    )
