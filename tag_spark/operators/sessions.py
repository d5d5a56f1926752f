"""Batch temporal operators: gap-based sessionization and binned range
join — the two classic event-time operations that look innocent in SQL and
explode at scale unless shaped for the engine.

Reference semantics analog: OGG page streams are split into logical
packets by lacing-value boundaries and grouped per serial number
(ogg.go:104-133) — sessionization is the same boundary-split per key,
with the boundary defined by a time gap instead of a lacing value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tie_break: str | None = None,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the time
    since the key's previous event exceeds ``gap_seconds``. Adds
    ``session_idx`` (0-based per key) and ``session_id``
    (``<key>#<session_idx>``).

    ONE window spec (partition by key, order by ts [+ tie_break]) drives
    both the lag and the running sum, so Catalyst plans a single
    Exchange + Sort (the CLAUDE.md shared-ordering rule). ``tie_break``
    makes duplicate (key, ts) rows deterministic — lag over duplicate
    keys is otherwise ambiguous; pass the row's unique id column.

    100 TB shape: one shuffle on the key, no self-join, no driver state.
    The batch twin of streaming/stateful.py's session tracker.

    Rows with NULL ``ts_col`` are EXCLUDED: a timestampless event has no
    place on a session timeline, and engines even disagree on where NULLs
    sort in a window (Spark NULLS FIRST vs DuckDB NULLS LAST — a latent
    cross-engine break the generated-corpus fuzz caught; the fixed
    testdata has no NULL ts). The validation suite's ``ts_not_null``
    check flags such rows upstream — screen, then sessionize.
    """
    df = df.filter(F.col(ts_col).isNotNull())
    order = [F.col(ts_col).asc()] + ([F.col(tie_break).asc()] if tie_break else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    # integer-microsecond gap test: exact in every engine — a float
    # epoch-seconds subtraction rounds differently between engines right
    # at the gap boundary
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.lag(ts_us).over(w)
    is_new = F.when(
        prev_us.isNull() | (ts_us - prev_us > F.lit(int(gap_seconds) * 1_000_000)), F.lit(1)
    ).otherwise(F.lit(0))
    # running sum of boundaries over the SAME window spec -> same Sort
    idx = (F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1).cast("long")
    return df.select(
        "*",
        idx.alias("session_idx"),
        F.concat_ws("#", F.col(key_col).cast("string"), idx.cast("string")).alias("session_id"),
    )


def session_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tie_break: str | None = None,
) -> DataFrame:
    """Per-session aggregates over `sessionize`: event count, start/end
    epoch-us, duration seconds. The groupBy re-keys on (key, session_idx)
    — a prefix of the sessionize shuffle key, so no second wide exchange
    of the event payload is needed beyond the aggregation itself."""
    s = sessionize(df, key_col, ts_col, gap_seconds, tie_break)
    ts = F.col(ts_col).cast("timestamp")
    return (
        s.groupBy(F.col(key_col), F.col("session_idx"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_micros(F.min(ts)).alias("start_us"),
            F.unix_micros(F.max(ts)).alias("end_us"),
        )
        .select(
            key_col,
            "session_idx",
            "n_events",
            "start_us",
            "end_us",
            F.round((F.col("end_us") - F.col("start_us")) / F.lit(1_000_000.0), 6).alias("duration_s"),
        )
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    on: str,
    window_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Pairs (left, right) with the same key and
    ``left.ts <= right.ts <= left.ts + window_seconds`` — the "what
    happened in the W seconds after each event" interval join.

    Spark-first shape: a naive theta join (``l.key = r.key AND r.ts
    BETWEEN l.ts AND l.ts + W``) degenerates to a per-key cross product
    with post-filtering — O(|L|·|R|) per key. Instead both sides are
    bucketed into W-second epoch bins; a right row in ``[l.ts, l.ts+W]``
    can only live in the left row's bin or the next one, so the left side
    explodes into exactly TWO (key, bin) probes and the join is a pure
    EQUI-join on (key, bin) + a residual range filter. Bounded 2x
    amplification, shuffle on (key, bin) — skew-resistant because hot
    keys spread across time bins.

    Returns left columns plus the right row's columns prefixed ``r_``.
    """
    w_us = int(window_seconds) * 1_000_000
    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))
    lb = (
        left.withColumn("__l_us", l_us)
        .withColumn("__bin", F.explode(F.array(F.floor(F.col("__l_us") / w_us), F.floor(F.col("__l_us") / w_us) + 1)))
    )
    rb = right.select(
        F.col(on).alias("__r_key"),
        r_us.alias("__r_us"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != on],
    ).withColumn("__bin", F.floor(F.col("__r_us") / w_us))
    joined = lb.join(rb, (F.col(on) == F.col("__r_key")) & (lb["__bin"] == rb["__bin"]))
    return (
        joined.filter((F.col("__r_us") >= F.col("__l_us")) & (F.col("__r_us") <= F.col("__l_us") + F.lit(w_us)))
        .drop("__bin", "__r_key", "__l_us", "__r_us")
    )
