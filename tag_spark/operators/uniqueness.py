"""Two-phase uniqueness: HLL++ screen, exact confirm (SURVEY.md §2.4 A2).

The reference's `cmd/check` tallies duplicate audio checksums across a whole
collection (cmd/check/main.go:130, 186). At 10^12 rows the cheap question
"are there ANY duplicates?" should not pay for the expensive question
"WHICH rows are duplicates?":

  phase 1  approx_count_distinct (HyperLogLog++, built-in, mergeable,
           map-side partial) vs count(*) — one lightweight aggregate.
  phase 2  only if phase 1 suggests duplicates (approx within rsd of
           exact), run the exact groupBy(keys) confirm and materialize
           every member of each duplicate group, ranked (dup-preserving
           semantics of id3v2.go:329-336).

At scale phase 1 is a single scan with a few bytes per partition shuffled;
phase 2 is the one real shuffle and only runs when needed.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass
class UniquenessReport:
    n_rows: int
    approx_distinct: int
    screened_clean: bool  # phase-1 verdict: plausibly no duplicates
    duplicates: DataFrame | None  # exact violation rows (None if screened clean)


def check_uniqueness(df: DataFrame, keys: list[str], rsd: float = 0.01, force_exact: bool = False) -> UniquenessReport:
    n_rows, approx = df.agg(
        F.count(F.lit(1)).alias("n"),
        # NULL fields hash as a sentinel: concat_ws silently DROPS null
        # arguments, so (NULL,'a') and ('a',NULL) would otherwise collide
        # and undercount (same hazard documented at hashing.py turn_sha1)
        F.approx_count_distinct(
            F.concat_ws("\x1f", *[F.coalesce(F.col(k).cast("string"), F.lit("<null>")) for k in keys]), rsd
        ).alias("d"),
    ).first()

    # HLL error is ±rsd; if approx ≥ n·(1-3·rsd) the data is *plausibly*
    # duplicate-free — but HLL can never prove it, so callers that need a
    # hard guarantee pass force_exact=True (the driver suite does for the
    # final verdict; the screen is a fast-path for interactive use).
    screened_clean = (approx >= n_rows * (1 - 3 * rsd)) and not force_exact
    if screened_clean:
        return UniquenessReport(n_rows, approx, True, None)

    w = Window.partitionBy(*[F.col(k) for k in keys])
    # deterministic rank: tie-break on a hash of the full row, so dup_rank
    # is stable across runs/parallelism (orderBy(lit(1)) would be arbitrary)
    row_h = F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
    wo = w.orderBy(row_h)
    dups = (
        df.withColumn("__grp", F.count(F.lit(1)).over(w))
        .filter(F.col("__grp") > 1)
        .withColumn("dup_rank", F.row_number().over(wo) - 1)
        .drop("__grp")
    )
    return UniquenessReport(n_rows, approx, False, dups)
