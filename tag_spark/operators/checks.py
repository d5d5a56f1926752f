"""Declarative constraint specs compiled to vectorized Spark Column exprs.

This is the engine's extension surface — the analog of the reference's
per-format frame-parser registry (the big switch at id3v2.go:338-397 and
the versioned frame dictionaries id3v2frames.go:21-296). A check spec is a
small frozen dataclass; ``predicate(df)`` compiles it to ONE boolean Column
(true == row passes) that runs entirely inside WholeStageCodegen — no
per-row Python anywhere (BASELINE.json input_hint).

Row-level checks fuse into a single ``select`` (see suite.py); set-level
checks (Unique / ContiguousIndex / Monotonic) compile to window expressions
over ``Window.partitionBy(conv_id).orderBy(turn_idx)`` so the whole suite
costs one shuffle; RefIntegrity compiles to a broadcast-hash anti-join.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SEV_ERROR = "error"  # reference analog: non-nil error aborts the file (id3v2.go:249-251)
SEV_WARN = "warn"  # reference analog: tolerated anomaly, skip + continue (id3v2.go:277-280)


@dataclass(frozen=True)
class Check:
    """Base row-level check. ``predicate`` returns true where the row PASSES."""

    check_id: str
    severity: str = SEV_ERROR

    # ------------------------------------------------------------------
    def predicate(self, df: DataFrame) -> Column:  # pragma: no cover - abstract
        raise NotImplementedError

    def reason(self) -> Column:
        """Stable violation message (reference error-string analog)."""
        return F.lit(self.check_id)

    @property
    def column(self) -> str | None:
        return getattr(self, "col", None)


# ---------------------------------------------------------------------------
# Row-level checks (P1-P15 analogs) — compile to pure Column expressions
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class NotNull(Check):
    """Analog: required header fields / min-length guards (id3v2frames.go:570-572)."""

    col: str = ""

    def predicate(self, df: DataFrame) -> Column:
        return F.col(self.col).isNotNull()

    def reason(self) -> Column:
        return F.lit(f"{self.col} must not be null")


@dataclass(frozen=True)
class NonEmpty(Check):
    """Analog: padding stop — zero-size frame (id3v2.go:271-273)."""

    col: str = ""

    def predicate(self, df: DataFrame) -> Column:
        c = F.col(self.col)
        return c.isNull() | (F.length(c) > 0)

    def reason(self) -> Column:
        return F.lit(f"{self.col} is empty")


@dataclass(frozen=True)
class InSet(Check):
    """Literal small-set membership — analog of the `mean` whitelist
    (mp4.go:48-52) and the ID3 version enum (id.go:45-57)."""

    col: str = ""
    allowed: Sequence[str] = field(default_factory=tuple)
    allow_null: bool = True

    def predicate(self, df: DataFrame) -> Column:
        c = F.col(self.col)
        ok = c.isin(list(self.allowed))
        return (c.isNull() & F.lit(self.allow_null)) | ok

    def reason(self) -> Column:
        return F.concat(F.lit(f"{self.col} not in declared vocabulary: "), F.coalesce(F.col(self.col), F.lit("<null>")))


@dataclass(frozen=True)
class InRange(Check):
    """Bounds predicate — analog of genre-index bounds (id3v1.go:96-98) and
    year-range sanity (F9 fallback chain)."""

    col: str = ""
    lo: object = None
    hi: object = None
    allow_null: bool = True

    def predicate(self, df: DataFrame) -> Column:
        c = F.col(self.col)
        ok = F.lit(True)
        if self.lo is not None:
            ok = ok & (c >= F.lit(self.lo))
        if self.hi is not None:
            ok = ok & (c <= F.lit(self.hi))
        return (c.isNull() & F.lit(self.allow_null)) | ok

    def reason(self) -> Column:
        return F.concat(F.lit(f"{self.col} out of range [{self.lo}, {self.hi}]: "), F.coalesce(F.col(self.col).cast("string"), F.lit("<null>")))


@dataclass(frozen=True)
class LengthMax(Check):
    """Analog: 10 MB hostile-length allocation cap (util.go:45-62)."""

    col: str = ""
    max_len: int = 16_384

    def predicate(self, df: DataFrame) -> Column:
        c = F.col(self.col)
        return c.isNull() | (F.length(c) <= self.max_len)

    def reason(self) -> Column:
        return F.concat(F.lit(f"{self.col} exceeds {self.max_len} chars: len="), F.length(F.col(self.col)).cast("string"))


@dataclass(frozen=True)
class RegexDisallow(Check):
    """Row fails when the pattern matches — analog of NUL-trim hygiene
    (trimString, id3v1.go:112-114): embedded control bytes are anomalies."""

    col: str = ""
    pattern: str = "\x00"

    def predicate(self, df: DataFrame) -> Column:
        import re

        c = F.col(self.col)
        # literal patterns (no regex metacharacters) match iff the string
        # contains them — `contains` runs as a codegen'd byte scan instead
        # of a Java regex engine pass over every row (guide §1.2 step 2)
        if re.escape(self.pattern) == self.pattern:
            return c.isNull() | ~c.contains(self.pattern)
        return c.isNull() | ~c.rlike(self.pattern)

    def reason(self) -> Column:
        return F.lit(f"{self.col} matches disallowed pattern {self.pattern!r}")


@dataclass(frozen=True)
class Conditional(Check):
    """``when_sql`` implies ``then_sql`` — analog of the flag-driven frame
    constraints (v2.3 compression requires no DLI etc., id3v2.go:282-321)."""

    when_sql: str = ""
    then_sql: str = ""

    def predicate(self, df: DataFrame) -> Column:
        # gate the antecedent explicitly: the rule fires only when `when` is
        # literally TRUE. A NULL antecedent must mean "rule doesn't apply"
        # (pass), not NULL — the suite wraps predicates in
        # NOT coalesce(pred, FALSE), which would otherwise turn a NULL `when`
        # into a violation while SQL oracles (`when AND NOT coalesce(then,
        # FALSE)`) treat it as a pass.
        return ~F.coalesce(F.expr(self.when_sql), F.lit(False)) | F.expr(self.then_sql)

    def reason(self) -> Column:
        return F.lit(f"violated: {self.when_sql} implies {self.then_sql}")


@dataclass(frozen=True)
class SqlPredicate(Check):
    """Escape hatch: arbitrary SQL boolean expression (row passes when true)."""

    sql: str = "true"
    message: str | None = None

    def predicate(self, df: DataFrame) -> Column:
        return F.expr(self.sql)

    def reason(self) -> Column:
        return F.lit(self.message or f"violated: {self.sql}")


# ---------------------------------------------------------------------------
# Set-level checks — compile to window expressions (one conv_id shuffle)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class WindowCheck(Check):
    """Marker base: predicate(df) may reference window expressions that the
    suite evaluates under Window.partitionBy(keys).orderBy(order)."""

    partition_by: Sequence[str] = ("conv_id",)
    order_by: Sequence[str] = ("turn_idx",)

    def _w(self) -> Window:
        return Window.partitionBy(*self.partition_by).orderBy(*[F.col(c) for c in self.order_by])

    def window_cols(self) -> dict[str, Column]:
        """Named window expressions the suite projects ONCE (below the fail
        structs). Catalyst's window extraction creates one evaluated column
        per *occurrence* of a window expression — it does not dedupe equal
        ones — so a predicate+reason pair referencing lag() four times used
        to evaluate four identical lag columns per row. Subclasses name
        each distinct expression here and reference it via F.col() in
        predicate()/reason(); a subclass that keeps embedding raw window
        expressions still works (just with the duplicate evaluations)."""
        return {}

    def referenced_cols(self) -> set[str]:
        """Columns this check needs post-shuffle (suite projects everything
        else away before the exchange — payload columns never shuffle).
        ``__sha1`` is a virtual column the suite always provides. Subclasses
        that ignore partition_by/order_by must override."""
        cols = set(self.partition_by) | set(self.order_by)
        for attr in ("col", "idx_col"):
            v = getattr(self, attr, None)
            if v:
                cols.add(v)
        return cols


@dataclass(frozen=True)
class Unique(WindowCheck):
    """All duplicate rows materialize as violations (the reference KEEPS
    duplicates, renaming frame_0/frame_1..., id3v2.go:329-336 — we rank and
    flag every member of a duplicate group, SURVEY.md §7 hard part (b))."""

    keys: Sequence[str] = ("conv_id", "turn_idx")
    # deterministic tie-break for the rank in the violation reason; must not
    # contain the keys themselves. "__sha1" (the canonical per-row hash the
    # suite computes map-side) keeps ranks deterministic without shuffling
    # the text payload.
    rank_by: Sequence[str] = ("ts", "__sha1")
    # screen-then-confirm: a Unique whose keys are NOT prefixed by the
    # suite's conv key forces its own row exchange. With screen='exact' the
    # suite first runs count vs countDistinct (partial-aggregated — shuffles
    # agg bytes, not rows) and only pays the window exchange when duplicates
    # exist; results stay EXACT. screen='hll' uses approx_count_distinct
    # (cheaper still, mergeable sketch) but can MISS duplicate rates below
    # ~3x screen_rsd — advisory mode for interactive scale use only.
    screen: str | None = None
    screen_rsd: float = 0.01

    def referenced_cols(self) -> set[str]:
        # Unique builds its windows from keys/rank_by only; the inherited
        # partition_by/order_by defaults are unused and must not leak in
        return set(self.keys) | set(self.rank_by)

    def window_cols(self) -> dict[str, Column]:
        w = Window.partitionBy(*[F.col(k) for k in self.keys])
        # default asc (NULLS FIRST) so the rank window's required ordering is
        # byte-identical to the order-checks' sort and Spark plans ONE Sort
        wo = Window.partitionBy(*[F.col(k) for k in self.keys]).orderBy(*[F.col(c).asc() for c in self.rank_by])
        return {
            f"__w_cnt_{self.check_id}": F.count(F.lit(1)).over(w),
            f"__w_rn_{self.check_id}": F.row_number().over(wo),
        }

    def predicate(self, df: DataFrame) -> Column:
        return F.col(f"__w_cnt_{self.check_id}") == 1

    def reason(self) -> Column:
        return F.concat(
            F.lit(f"duplicate key ({','.join(self.keys)}) rank="),
            (F.col(f"__w_rn_{self.check_id}") - 1).cast("string"),
        )


@dataclass(frozen=True)
class ContiguousIndex(WindowCheck):
    """turn_idx must start at ``start`` and increase by exactly 1 — the
    frame-offset monotonicity of the sequential frame scan (id3v2.go:237-275)
    and OGG page-sequence continuity (ogg.go:109-115)."""

    idx_col: str = "turn_idx"
    start: int = 0

    def window_cols(self) -> dict[str, Column]:
        return {f"__w_prev_{self.check_id}": F.lag(F.col(self.idx_col)).over(self._w())}

    def predicate(self, df: DataFrame) -> Column:
        prev = F.col(f"__w_prev_{self.check_id}")
        first_ok = prev.isNotNull() | (F.col(self.idx_col) == self.start)
        step_ok = prev.isNull() | (F.col(self.idx_col) == prev + 1) | (F.col(self.idx_col) == prev)  # dup handled by Unique
        return first_ok & step_ok

    def reason(self) -> Column:
        prev = F.col(f"__w_prev_{self.check_id}")
        return F.when(
            prev.isNull(), F.concat(F.lit(f"sequence must start at {self.start}, got "), F.col(self.idx_col).cast("string"))
        ).otherwise(F.concat(F.lit("sequence gap: "), prev.cast("string"), F.lit(" -> "), F.col(self.idx_col).cast("string")))


@dataclass(frozen=True)
class Monotonic(WindowCheck):
    """Value must be non-decreasing in turn order — analog of byte-offset
    monotonicity during the frame walk (id3v2.go:237, 275)."""

    col: str = "ts"

    def window_cols(self) -> dict[str, Column]:
        return {f"__w_prev_{self.check_id}": F.lag(F.col(self.col)).over(self._w())}

    def predicate(self, df: DataFrame) -> Column:
        prev = F.col(f"__w_prev_{self.check_id}")
        return prev.isNull() | F.col(self.col).isNull() | (F.col(self.col) >= prev)

    def reason(self) -> Column:
        prev = F.col(f"__w_prev_{self.check_id}")
        return F.concat(F.lit(f"{self.col} regressed: "), prev.cast("string"), F.lit(" -> "), F.col(self.col).cast("string"))


# ---------------------------------------------------------------------------
# Referential checks — broadcast-hash anti-join (J1)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RefIntegrity(Check):
    """Column value must exist in a dimension table — THE core vocabulary
    check (validID3Frame, id3v2frames.go:289-296). Compiled by the suite to
    ``df.join(broadcast(dim), on, 'left')`` with a found-marker so it fuses
    with the row-level violation array (still a broadcast hash join, no extra
    shuffle, and the anti-semantics fall out of marker-is-null).

    ``version_col`` reproduces the reference's VERSIONED vocabularies (the
    per-version frame dictionaries id3v22Frames/id3v23Frames/id3v24Frames,
    id3v2frames.go:21-287): the dim then carries (version, value) pairs and
    a value is valid only for the versions that declare it."""

    col: str = ""
    dim: DataFrame | None = None
    dim_col: str | None = None
    allow_null: bool = True
    version_col: str | None = None
    dim_version_col: str | None = None

    def marker(self) -> str:
        return f"__ref_ok_{self.check_id}"

    def prejoin(self, df: DataFrame) -> DataFrame:
        dim_col = self.dim_col or self.col
        on = [self.col]
        sel = [F.col(dim_col).alias(self.col)]
        if self.version_col:
            sel.append(F.col(self.dim_version_col or self.version_col).alias(self.version_col))
            on.append(self.version_col)
        dim = self.dim.select(*sel).dropDuplicates(on).withColumn(self.marker(), F.lit(True))
        return df.join(F.broadcast(dim), on=on, how="left")

    def predicate(self, df: DataFrame) -> Column:
        c = F.col(self.col)
        return (c.isNull() & F.lit(self.allow_null)) | F.col(self.marker()).isNotNull()

    def reason(self) -> Column:
        if self.version_col:
            return F.concat(
                F.lit(f"{self.col} not declared for "),
                F.coalesce(F.col(self.version_col), F.lit("<null>")),
                F.lit(": "),
                F.coalesce(F.col(self.col), F.lit("<null>")),
            )
        return F.concat(F.lit(f"{self.col} not found in dimension: "), F.coalesce(F.col(self.col), F.lit("<null>")))
