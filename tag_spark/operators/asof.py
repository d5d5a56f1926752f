"""As-of (most-recent-prior) join — the temporal operator Spark lacks.

For each left row, attach the payload of the latest right row with the
same key and ``right.ts <= left.ts`` (backward as-of, the market-data /
event-attribution semantics; DuckDB and pandas ``merge_asof`` call it the
same thing). The reference's analog is the ID3v1 trailer resolution: the
reader seeks the LAST metadata block at or before EOF and attributes the
whole file to it (id3v1.go:45-56 seeks EOF-128 and takes that one
trailer) — here every left event takes the last right event at or before
its own timestamp.

Spark-first design — union-sort-fill, NOT a range join:
 - A naive inequality join (``l.key = r.key AND r.ts <= l.ts`` + argmax)
   explodes to O(|L|·|R|) per key before pruning; Catalyst plans it as a
   broadcast nested loop or sort-merge with per-row backtracking.
 - Instead, tag both sides, UNION them, and run ONE window pass per key
   ordered by (ts, side): ``last(payload, ignorenulls=True)`` over
   rowsBetween(unboundedPreceding, currentRow) carries the most recent
   right payload forward into every left row. One shuffle on the key, one
   sort, zero row amplification — the plan a 100 TB event table needs.
 - Right rows sort BEFORE left rows at an equal timestamp (side 0 < 1), so
   a right row at exactly left.ts is visible — matching ``>=`` / DuckDB
   ASOF semantics.
 - Duplicate right rows on the same (key, ts) are collapsed FIRST to the
   one with the greatest tie-break column (deterministic in any engine —
   CLAUDE.md: ambiguous lag/last over duplicate keys is the classic
   nondeterminism trap). That pre-dedup is a partial-aggregable groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    payload_cols: list[str] | None = None,
    tie_break: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: left columns + ``{prefix}<payload>`` columns
    holding the payload of the latest right row with ``right.ts <= left.ts``
    per ``on`` key (null when no prior right row exists).

    ``tie_break``: right-side column that makes duplicate (key, ts) rows
    deterministic — the row with the greatest value wins. Required when
    duplicates are possible; pass None only if (key, ts) is unique.

    NULL handling follows JOIN semantics (all three caught by the
    generated-corpus fuzz; the fixed testdata has neither NULL ts nor
    NULL keys):
      * NULL-ts RIGHT rows are excluded — ``r.ts <= l.ts`` can never hold
        for an unknown time (also DuckDB native ASOF semantics); without
        the filter Spark's NULLS-FIRST union-sort made a timestampless
        right row "earlier than everything".
      * NULL-KEY right rows are excluded — a NULL key matches nothing in
        a join, but Spark's window PARTITION BY groups NULLs together and
        would have matched NULL-key lefts to NULL-key rights.
      * NULL-ts / NULL-key LEFT rows keep their row with NULL payload,
        exactly like a left row before any right row.
    """
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (on, ts_col)]

    keep = list(dict.fromkeys([*payload_cols, *([tie_break] if tie_break else [])]))
    r = right.filter(F.col(ts_col).isNotNull() & F.col(on).isNotNull()).select(on, ts_col, *keep)
    if tie_break is not None:
        # collapse duplicate (key, ts) via ONE struct-max (partial-
        # aggregable, no window): the whole winning row travels as one
        # struct keyed by tie_break. Per-column max_by was WRONG here —
        # Spark's max_by skips rows whose VALUE is NULL, so a NULL payload
        # field on the winning row silently fell back to another row's
        # value, assembling a row that never existed (caught by the
        # generated-corpus fuzz with NULL values on tied timestamps).
        # Rows with NULL tie_break are dropped: they cannot be ordered
        # deterministically, matching an oracle's max(tie_break) ignoring
        # NULLs.
        r = (
            r.filter(F.col(tie_break).isNotNull())
            .groupBy(on, ts_col)
            .agg(
                F.max(
                    F.struct(
                        F.col(tie_break).alias("__tb"),
                        *[F.col(c).alias(f"__p{i}") for i, c in enumerate(payload_cols)],
                    )
                ).alias("__m")
            )
            .select(on, ts_col, *[F.col(f"__m.__p{i}").alias(c) for i, c in enumerate(payload_cols)])
        )
    else:
        r = r.select(on, ts_col, *payload_cols)

    # tagged union: right side 0 sorts before left side 1 at equal ts,
    # giving >= (inclusive) as-of semantics. The right payload travels as
    # ONE struct column so the forward fill is per-ROW atomic — filling
    # each payload column independently with last(ignorenulls) was WRONG:
    # a NULL field on the latest right row reached back past it to an
    # OLDER row's value, assembling a row that never existed (caught by
    # the generated-corpus fuzz with NULL values on the latest match).
    from pyspark.sql import types as T

    rstruct = T.StructType([T.StructField(c, r.schema[c].dataType) for c in payload_cols])
    left_cols = left.columns
    lt = left.select(
        *left_cols,
        F.lit(None).cast(rstruct).alias("__r"),
        F.lit(1).alias("__side"),
    )
    rt = r.select(
        F.col(on),
        F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in (on, ts_col)],
        F.struct(*[F.col(c).alias(c) for c in payload_cols]).alias("__r"),
        F.lit(0).alias("__side"),
    ).select(*left_cols, "__r", "__side")

    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = lt.unionByName(rt).select(
        *left_cols,
        F.col("__side"),
        F.last("__r", ignorenulls=True).over(w).alias("__rf"),
    )
    return filled.filter(F.col("__side") == 1).select(
        *left_cols,
        *[F.col(f"__rf.{c}").alias(f"{prefix}{c}") for c in payload_cols],
    )
